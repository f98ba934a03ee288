"""Bounded-memory frequency sketches for open-vocabulary corpora.

x46's exact heavy hitters aggregate one state row per distinct term —
fine for a closed vocabulary, unbounded for the open token/URL/n-gram
spaces a 100 TB corpus produces. misra_gries_topk keeps a FIXED number
of counters per partition (the Misra-Gries summary, the deterministic
ancestor of SpaceSaving) and merges the partial summaries with an
explicit error bound:

- map side: each input partition folds its terms into a ``capacity``-
  counter summary; whenever the summary overflows, every counter decays
  by 1 (one "decrement round"). A term's summary count is a LOWER bound
  on its true partition frequency, undercounting by at most the
  partition's decrement total d_i.
- reduce side: summaries union and sum per term; the global undercount
  is at most D = sum(d_i), reported as ``max_err``. Any term with true
  frequency > D is GUARANTEED present (the classic n/capacity bound,
  tightened to the observed decrements).

So the output is (term, count_min, count_max=count_min+D) — rank
certainty up to D — with per-run deterministic results (no sampling,
no hashing). The Arrow-batched map stage is the only pass over the
data; the merge shuffles at most ``capacity`` rows per partition no
matter how large the vocabulary is.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_fold(counts: dict[str, int], term: str, capacity: int) -> int:
    """Fold one term into a Misra-Gries summary; returns the decrement
    this step charged (0 or 1)."""
    if term in counts:
        counts[term] += 1
        return 0
    if len(counts) < capacity:
        counts[term] = 1
        return 0
    # decrement round: every counter decays; zeros evicted
    dead = []
    for t in counts:
        counts[t] -= 1
        if counts[t] == 0:
            dead.append(t)
    for t in dead:
        del counts[t]
    return 1


def misra_gries_topk(
    df: DataFrame, col: str = "term", k: int = 20, capacity: int = 1024
) -> DataFrame:
    """Approximate top-k terms with deterministic error bounds under
    FIXED memory: (term, count_min, count_max, rank) for the k highest
    lower bounds; ``count_max - count_min`` = total decrements D across
    partitions. With ``capacity`` >= the distinct-term count the sketch
    never decrements and the result is EXACT (D = 0) — the property the
    oracle-checked query pins, while bounded-capacity behavior is
    pinned against exact counts in tests."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        dec = 0
        for pdf in batches:
            for term in pdf[col]:
                dec += _mg_fold(counts, term, capacity)
        out = pd.DataFrame(
            {"term": list(counts), "c": list(counts.values())}
        )
        # one decrement-total row per partition (term=None carries it)
        out = pd.concat(
            [out, pd.DataFrame({"term": [None], "c": [dec]})],
            ignore_index=True,
        )
        yield out

    partial = df.select(F.col(col).alias(col)).mapInPandas(
        summarize, schema="term string, c long"
    )
    merged = partial.groupBy("term").agg(F.sum("c").alias("c"))
    # D = sum of all partitions' decrement rows (the NULL term)
    d_total = merged.where(F.col("term").isNull()).select(
        F.coalesce(F.sum("c"), F.lit(0)).alias("d")
    )
    return (
        merged.where(F.col("term").isNotNull())
        .orderBy(F.desc("c"), "term")
        .limit(k)
        .crossJoin(F.broadcast(d_total))
        .select(
            "term",
            F.col("c").alias("count_min"),
            (F.col("c") + F.col("d")).alias("count_max"),
        )
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("count_min"), "term")),
        )
    )
