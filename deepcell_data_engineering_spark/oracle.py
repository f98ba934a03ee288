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
    # Strictness contract: at least as strict as the driver's
    # canonicalizer. In particular a float64 65535.0 must NOT collapse
    # to "65535" — DuckDB HUGEINT outputs surface through fetchdf() as
    # float64, and folding them back to int strings is exactly what let
    # the round-1/2 SUM(BIGINT)->HUGEINT oracle bugs pass locally while
    # failing the driver's hash gate. Floats render via repr (shortest
    # round-trip — bit-exact discrimination), never via %g.
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        return repr(v)
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
    spark_hash: str = ""  # canonical value hash of the Spark result


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


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class for the strictness gate: integer-valued
    float64 vs int64 is a REAL driver-visible difference (the HUGEINT
    class), while int32 vs int64 is not."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"


def _array_cols(df: pd.DataFrame) -> list[str]:
    import numpy as np

    bad = []
    for c in df.columns:
        s = df[c].dropna()
        # check EVERY value, not just the first: a column whose first row
        # is scalar but later rows hold lists would still crash the
        # driver's sort_values canonicalizer. Result frames are small
        # (post-aggregation), so the full scan is cheap.
        if len(s) and bool(
            s.map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any()
        ):
            bad.append(c)
    return bad


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
    # Driver-crash guard: its pandas canonicalizer sort_values() on a
    # list-valued column raises "unhashable type: 'list'" (d43, r2).
    arr = _array_cols(spark_pd) + _array_cols(oracle_pd)
    if arr:
        return CompareResult(
            name,
            False,
            len(spark_pd),
            len(oracle_pd),
            f"array-typed output columns {sorted(set(arr))} would crash "
            "the driver canonicalizer — emit scalars",
        )
    # Dtype-class gate: catches DuckDB HUGEINT (rendered float64 by
    # fetchdf) against a Spark BIGINT even when every value is
    # integer-equal.
    kind_diff = [
        c
        for c in spark_pd.columns
        if _dtype_kind(spark_pd[c]) != _dtype_kind(oracle_pd[c])
    ]
    if kind_diff:
        return CompareResult(
            name,
            False,
            len(spark_pd),
            len(oracle_pd),
            "dtype-class mismatch "
            + ", ".join(
                f"{c}: spark={_dtype_kind(spark_pd[c])}/"
                f"oracle={_dtype_kind(oracle_pd[c])}"
                for c in kind_diff
            ),
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
        return CompareResult(
            name, False, len(spark_pd), len(oracle_pd), detail, spark_hash=hs
        )
    return CompareResult(
        name, True, len(spark_pd), len(oracle_pd), spark_hash=hs
    )
