"""DuckDB-oracle comparison harness.

Replicates the driver's t2 gate locally: run a Spark DataFrame and a DuckDB
SQL string over the same parquet tables, then compare row count, column
names, and an order-insensitive value hash (columns sorted by name, cells
canonicalized, rows sorted).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from deepcell_data_engineering_spark.catalog import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def table_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    out = df[cols]
    rows = sorted(
        "\x1f".join(_canon_cell(v) for v in row) for row in out.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            out[c] = s.map(
                lambda v: str(v) if hasattr(v, "isoformat") else v  # date/datetime objects
            )
        elif pd.api.types.is_extension_array_dtype(s):
            out[c] = s.astype(object).where(s.notna(), None)
    return out


def compare(name: str, spark_df, con, oracle_sql: str) -> CompareResult:
    spark_pd = _normalize(spark_df.toPandas())
    oracle_pd = _normalize(con.execute(oracle_sql).fetchdf())
    if len(spark_pd) != len(oracle_pd):
        return CompareResult(name, False, len(spark_pd), len(oracle_pd), "row count mismatch")
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        return CompareResult(
            name,
            False,
            len(spark_pd),
            len(oracle_pd),
            f"columns {sorted(spark_pd.columns)} vs {sorted(oracle_pd.columns)}",
        )
    hs, ho = table_hash(spark_pd), table_hash(oracle_pd)
    if hs != ho:
        # first differing row for debugging
        cols = sorted(spark_pd.columns)
        a = spark_pd[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        b = oracle_pd[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        detail = "value hash mismatch"
        for i in range(min(len(a), 50000)):
            ra = [_canon_cell(v) for v in a.iloc[i]]
            rb = [_canon_cell(v) for v in b.iloc[i]]
            if ra != rb:
                detail = f"first diff row {i}: spark={ra} oracle={rb}"
                break
        return CompareResult(name, False, len(spark_pd), len(oracle_pd), detail)
    return CompareResult(name, True, len(spark_pd), len(oracle_pd))
