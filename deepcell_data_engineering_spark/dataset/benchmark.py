"""Dataset benchmarking (SURVEY §2.8 D12, §2.4 A3/A4).

Semantics source: caliban_toolbox/dataset_benchmarker.py:73-121 — per-image
detection stats summed per category, with derived
recall = correct/n_true, precision = correct/n_pred, f1 = hmean(p, r),
pixel jaccard = Σ intersection / Σ union of nonzero masks; rolled up per
tissue, per platform, and overall ('all').

The reference delegates per-image object stats to
deepcell_toolbox.metrics.Metrics.calc_object_stats (not in env); here the
per-image kernel is an IOU>0.5 greedy one-to-one matcher over the cell
pairs of (y_true, y_pred) — the standard object-detection criterion — in
one Arrow pass. The rollup is a single GROUPING SETS aggregation
(dataset_benchmarker.py:112-121 hand-rolls it as three passes).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from deepcell_data_engineering_spark.sources.codecs import decode_y

_STATS_SCHEMA = StructType(
    [
        StructField("tissue", StringType(), True),
        StructField("platform", StringType(), True),
        StructField("n_true", LongType(), False),
        StructField("n_pred", LongType(), False),
        StructField("correct", LongType(), False),
        StructField("pix_inter", LongType(), False),
        StructField("pix_union", LongType(), False),
    ]
)


def image_detection_stats(y_true: np.ndarray, y_pred: np.ndarray,
                          iou_threshold: float = 0.5) -> tuple[int, int, int, int, int]:
    """(n_true, n_pred, correct, pixel_intersection, pixel_union) for one
    image pair; correct = greedy IOU>threshold one-to-one matches."""
    true_cells = np.unique(y_true[y_true > 0])
    pred_cells = np.unique(y_pred[y_pred > 0])
    n_true, n_pred = len(true_cells), len(pred_cells)
    tmask, pmask = y_true > 0, y_pred > 0
    pix_inter = int(np.logical_and(tmask, pmask).sum())
    pix_union = int(np.logical_or(tmask, pmask).sum())
    if n_true == 0 or n_pred == 0:
        return n_true, n_pred, 0, pix_inter, pix_union

    n_t = int(y_true.max()) + 1
    n_p = int(y_pred.max()) + 1
    inter = np.zeros((n_t, n_p), dtype=np.int64)
    np.add.at(inter, (y_true.ravel(), y_pred.ravel()), 1)
    area_t = inter.sum(axis=1, keepdims=True)
    area_p = inter.sum(axis=0, keepdims=True)
    union = area_t + area_p - inter
    iou = np.zeros_like(inter, dtype=np.float64)
    np.divide(inter, union, out=iou, where=union > 0)
    iou[0, :] = 0.0
    iou[:, 0] = 0.0

    # greedy one-to-one: take pairs in decreasing IOU above threshold
    correct = 0
    used_t: set[int] = set()
    used_p: set[int] = set()
    pairs = np.argwhere(iou > iou_threshold)
    order = np.argsort(-iou[pairs[:, 0], pairs[:, 1]], kind="stable")
    for t, p in pairs[order]:
        if t not in used_t and p not in used_p:
            used_t.add(int(t))
            used_p.add(int(p))
            correct += 1
    return n_true, n_pred, correct, pix_inter, pix_union


def benchmark(
    y_true_df: DataFrame,
    y_pred_df: DataFrame,
    iou_threshold: float = 0.5,
) -> DataFrame:
    """Join true and predicted labels on the image key, compute per-image
    stats in one Arrow pass, roll up per tissue / per platform / overall
    with derived recall, precision, f1, jaccard (A3/A4).

    Inputs carry the dataset schema (img_idx, ..., y, tissue, platform);
    y_pred_df needs (img_idx, height, width, y).
    """
    pred = y_pred_df.select(
        "img_idx",
        F.col("y").alias("y_pred"),
    )
    joined = y_true_df.select(
        "img_idx", "height", "width", "y", "tissue", "platform"
    ).join(pred, on="img_idx", how="inner")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                h, w = int(r["height"]), int(r["width"])
                yt = decode_y(r["y"], h, w)
                yp = decode_y(r["y_pred"], h, w)
                n_true, n_pred, correct, pi, pu = image_detection_stats(
                    yt, yp, iou_threshold
                )
                rows.append(
                    {
                        "tissue": r["tissue"],
                        "platform": r["platform"],
                        "n_true": n_true,
                        "n_pred": n_pred,
                        "correct": correct,
                        "pix_inter": pi,
                        "pix_union": pu,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _STATS_SCHEMA.fields])

    per_image = joined.mapInPandas(stats, schema=_STATS_SCHEMA)
    per_image.createOrReplaceTempView("_benchmark_stats")
    # derived metrics exactly as dataset_benchmarker.py:97-105:
    # f1 = harmonic mean = 2pr/(p+r); jaccard = sum(inter)/sum(union)
    return per_image.sparkSession.sql(
        """WITH rolled AS (
             SELECT COALESCE(tissue, platform, 'all') AS category,
                    CASE WHEN tissue IS NOT NULL THEN 'tissue'
                         WHEN platform IS NOT NULL THEN 'platform'
                         ELSE 'all' END AS category_type,
                    SUM(n_true) AS n_true, SUM(n_pred) AS n_pred,
                    SUM(correct) AS correct,
                    SUM(pix_inter) AS pix_inter, SUM(pix_union) AS pix_union
             FROM _benchmark_stats
             GROUP BY GROUPING SETS ((tissue), (platform), ())
           )
           SELECT category, category_type,
                  n_true, n_pred, correct,
                  correct / n_true AS recall,
                  correct / n_pred AS precision,
                  CASE WHEN correct = 0 THEN 0.0
                       ELSE 2.0 * (correct / n_true) * (correct / n_pred)
                            / ((correct / n_true) + (correct / n_pred)) END AS f1,
                  pix_inter / pix_union AS jaccard
           FROM rolled
           ORDER BY category_type, category"""
    )
