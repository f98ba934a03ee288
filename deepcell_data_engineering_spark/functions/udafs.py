"""Custom aggregates (SURVEY §2.10 UDAF surface).

Built-ins cover the reference's aggregation needs (`median`,
`percentile_approx`, `countDistinct`); these GROUPED_AGG pandas UDAFs
exist for the cases built-ins don't express:

- ``hmean``: harmonic mean — the reference's F1 computation
  (dataset_benchmarker.py:101 uses scipy.stats.hmean over
  [recall, precision]).
- ``exact_median``: bit-exact numpy median (ties averaged), for parity
  checks against the reference's `np.median` at small scale where
  Spark's `median` (also exact) is cross-checked.

GROUPED_AGG UDAFs arrive Arrow-batched per group and partial-aggregate
like any aggregate — usable in ``groupBy().agg()`` and unbounded windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def hmean(v: pd.Series) -> float:
    """Harmonic mean of positive values; 0.0 if any value is <= 0
    (the reference's F1 degenerates to 0 when recall or precision is 0)."""
    arr = v.to_numpy(dtype=float)
    if len(arr) == 0 or (arr <= 0).any():
        return 0.0
    return float(len(arr) / np.sum(1.0 / arr))


@pandas_udf("double")
def exact_median(v: pd.Series) -> float:
    return float(np.median(v.to_numpy(dtype=float)))
