"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL for the hash-matching gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deepcell_data_engineering_spark.relational import QUERIES  # noqa: E402
from deepcell_data_engineering_spark.session import apply_engine_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the star-join aggregation (SURVEY §2b D11): customer ⋈
    nation ⋈ region with broadcast dims + grouped agg — the shape every
    100 TB star-schema query takes.
    """
    apply_engine_conf(spark)
    return QUERIES["d11_star_join_agg"].build(spark, "/root/testdata/sf0.001")


# The driver oracle-checks the first 50 registry entries per round.
# Round-8 rotation (executes the plan the round-7 verdict ordered):
# lead with the 9 queries that had NEVER been in a driver window
# (x115/x116/x118/x121–x126, preflight-green only), then the stalest
# driver-checked rows — x01 (last checked round 3), d01–d14 and
# x40–x45 (round 4) — then the oldest round-5 rows. The final 8 slots
# go to the round-8 additions x132–x139 (the r7 precedent: new
# queries with novel failure modes — filesystem round trips, bit_or
# bloom words, cross-paradigm ASOF-vs-window, ln-weight scoring —
# get their driver verdict the round they land rather than aging
# into the deferred backlog). After this round no driver verdict is
# older than round 5 (d31–d49, x02–x05, x46–x56 stay r5-green and
# lead the round-9 rotation, together with the five late round-8
# additions x140–x144 — preflight-green only, compositions of
# certified disciplines (x120 session pairing, x109 ln rounding,
# x99 ordered adjacency, x108 integer-rank percentiles, x112
# fixed-IEEE-tree statistics).
_CHECK_FIRST = [
    # never driver-checked (deferred from the round-7 window)
    "x115_markov_transitions", "x116_cusum_changepoint",
    "x118_rrf_fusion", "x121_cube_report", "x122_ntile_deciles",
    "x123_expectations_report", "x124_unpivot_metrics",
    "x125_trailing_zscore", "x126_bag_set_ops",
    # round-3-stale
    "x01_token_stats",
    # round-4-stale: d01–d14
    "d01_scan_filter", "d02_like_strings", "d03_natural_sort",
    "d04_topk", "d05_distinct", "d10_inner_join", "d11_star_join_agg",
    "d12_left_join", "d13_semi_join", "d14_anti_join",
    # round-4-stale: x40–x45
    "x40_length_trim", "x41_tumbling_rollup", "x42_sliding_rollup",
    "x43_pagerank", "x44_unigram_logprob", "x45_minhash_calibration",
    # oldest round-5 rows
    "d15_range_join", "d16_cross_join", "d17_grouped_agg",
    "d18_count_distinct_having", "d19_median", "d20_rollup",
    "d21_grouping_sets", "d22_conditional_agg", "d23_window_rank",
    "d24_window_lag_lead", "d25_window_running_max", "d26_intersect",
    "d27_except", "d28_date_agg", "d29_math_string",
    "d30_documents_agg",
    # round-8 additions — first driver verdicts
    "x132_optimize_equivalence", "x133_record_linkage_fs",
    "x134_funnel_conversion", "x135_aqp_hash_sample",
    "x136_autocorrelation", "x137_bloom_skipping",
    "x138_last_touch_attribution", "x139_label_propagation",
]


def _ordered_names() -> list[str]:
    rest = [n for n in QUERIES if n not in set(_CHECK_FIRST)]
    return _CHECK_FIRST + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERIES[name].build for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each hash-checkable query."""
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
