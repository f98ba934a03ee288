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


def make_span_udtf():
    """Python UDTF (SURVEY §2.10 UDTF surface): explode a text document
    into (span_idx, span_text, n_tokens) rows — the chunking step that
    turns documents into training-window-sized spans. A UDTF is the
    right tool when one input row yields a VARIABLE number of output
    rows with computed columns (a lateral generator, not a map).

    Row-at-a-time Python is the slow path (SURVEY §2.10): the engine's
    hot chunkers stay in JVM explode/higher-order functions; this UDTF
    exists to cover the surface and for genuinely custom generators.
    Returned as a factory because ``udtf`` registration needs an active
    session-aware analyzer in some environments."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="span_idx int, span_text string, n_tokens int")
    class SpanUDTF:
        def eval(self, text: str, max_tokens: int):
            if text is None:
                return
            toks = text.split()
            for i in range(0, len(toks), max_tokens):
                chunk = toks[i : i + max_tokens]
                yield i // max_tokens, " ".join(chunk), len(chunk)

    return SpanUDTF
