"""``labels_long``: per-cell statistics exploded out of label masks.

The reference computes cell counts/areas with `np.unique` loops
(pipeline.py:45-47, build.py:60-74 via regionprops, dataset_builder.py:424)
— here a single Arrow-batched pass derives one row per (image unit, cell)
with area and bounding box, after which every count/median/filter operator
in SURVEY §2 is a plain Spark aggregation on a normal table:

- A5 cell counts       -> groupBy(unit).count() / countDistinct
- A1 cell size medians -> median(area) / percentile_approx(area, 0.5)
- P2 sparse filter     -> HAVING count > cutoff
- P7 min-objects       -> HAVING count >= min_objects (semi join back)
- L7 small objects     -> WHERE area >= threshold (semi join remap)

Scale: the derivation is a narrow mapInPandas (no shuffle); downstream
aggregations are partial-agg'd map-side. At 100 TB, labels_long is
materialized once to Parquet partitioned by fov and reused.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from deepcell_data_engineering_spark.sources.codecs import decode_y

LABELS_LONG_SCHEMA = StructType(
    [
        StructField("fov", StringType(), False),
        StructField("stack", IntegerType(), False),
        StructField("crop", IntegerType(), False),
        StructField("slice", IntegerType(), False),
        StructField("cell_id", LongType(), False),
        StructField("area", LongType(), False),
        StructField("rmin", IntegerType(), False),
        StructField("rmax", IntegerType(), False),
        StructField("cmin", IntegerType(), False),
        StructField("cmax", IntegerType(), False),
    ]
)


def labels_long(images: DataFrame, extra_keys: list[str] | None = None) -> DataFrame:
    """One row per (unit, nonzero cell id): area + bbox (inclusive).

    ``extra_keys``: additional input columns carried through per cell row
    (e.g. ``img_idx``/``tissue`` for the dataset-build pipeline)."""
    extra_keys = extra_keys or []
    schema = StructType(
        LABELS_LONG_SCHEMA.fields + [images.schema[k] for k in extra_keys]
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["y"] is None:
                    continue
                y = decode_y(r["y"], int(r["height"]), int(r["width"]))
                flat = y.ravel()
                nz = np.flatnonzero(flat)
                if nz.size == 0:
                    continue
                labels_nz = flat[nz]
                order = np.argsort(labels_nz, kind="stable")
                sorted_labels = labels_nz[order]
                sorted_pos = nz[order]
                uniq, starts_idx = np.unique(sorted_labels, return_index=True)
                bounds = np.append(starts_idx, sorted_labels.size)
                w = y.shape[1]
                for k, cell in enumerate(uniq):
                    pos = sorted_pos[bounds[k]:bounds[k + 1]]
                    rr, cc = pos // w, pos % w
                    rec = {
                        "fov": r["fov"],
                        "stack": int(r["stack"]),
                        "crop": int(r["crop"]),
                        "slice": int(r["slice"]),
                        "cell_id": int(cell),
                        "area": int(pos.size),
                        "rmin": int(rr.min()),
                        "rmax": int(rr.max()),
                        "cmin": int(cc.min()),
                        "cmax": int(cc.max()),
                    }
                    for k2 in extra_keys:
                        rec[k2] = r[k2]
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return images.mapInPandas(explode, schema=schema)


def cell_counts(images: DataFrame, approx: bool = False, rsd: float = 0.02) -> DataFrame:
    """Cells per image unit — `len(np.unique(y)) - 1` (A5).

    ``approx=True`` switches to the HyperLogLog++ sketch
    (approx_count_distinct): at 100 TB an exact countDistinct expands to
    a two-phase distinct shuffle per group, while the sketch is a fixed
    ~1.5 KB state merged map-side — the scale path when counts feed a
    threshold (P2 sparse filter) rather than an exact report."""
    cnt = (
        F.approx_count_distinct("cell_id", rsd=rsd)
        if approx
        else F.countDistinct("cell_id")
    )
    return (
        labels_long(images)
        .groupBy("fov", "stack", "crop", "slice")
        .agg(cnt.alias("n_cells"))
    )


def find_sparse_images(images: DataFrame, cutoff: int) -> DataFrame:
    """Units with more than ``cutoff`` cells (pipeline.py:33-51 P2) —
    returns the unit keys passing the filter (semi-joinable)."""
    return cell_counts(images).where(F.col("n_cells") > cutoff).select(
        "fov", "stack", "crop", "slice"
    )


def median_cell_size(images: DataFrame, by: list[str] | None = None, approx: bool = False) -> DataFrame:
    """A1 compute_cell_size: median per-cell area, grouped by ``by``
    (default per image unit; [] = global). ``approx=True`` switches to
    percentile_approx for the 100 TB path."""
    ll = labels_long(images)
    keys = ["fov", "stack", "crop", "slice"] if by is None else by
    agg = (
        F.percentile_approx("area", 0.5).alias("median_cell_size")
        if approx
        else F.median("area").alias("median_cell_size")
    )
    if not keys:
        return ll.agg(agg, F.count(F.lit(1)).alias("n_cells"))
    return ll.groupBy(*keys).agg(agg, F.count(F.lit(1)).alias("n_cells"))
