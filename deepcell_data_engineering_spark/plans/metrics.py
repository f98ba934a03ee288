"""Pipeline telemetry with `observe` — metrics without extra passes.

A 100 TB pipeline cannot afford a second scan just to know how many rows
it dropped: `df.count()` before a write DOUBLES the job. `observe`
attaches aggregate metrics to the existing plan; they are computed by
the same tasks that produce the output and cost nothing extra. This is
how quality gates (null rates, drop counts, dedup ratios) ship alongside
the data they describe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame, cols: list[str]
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to a plan.
    Read ``observation.get`` AFTER an action has run the plan."""
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"n_null_{c}")
        for c in cols
    ]
    return df.observe(obs, *metrics), obs


def observed_filter(
    df: DataFrame, cond: F.Column
) -> tuple[DataFrame, Observation]:
    """Filter with free accounting: the observation reports rows seen
    and rows kept, so the drop rate of a quality gate is known from the
    producing job itself."""
    obs = Observation()
    seen = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_seen"),
        F.count(F.when(cond, 1)).alias("n_kept"),
    )
    return seen.where(cond), obs
