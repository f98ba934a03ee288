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
# Round-9 rotation (executes the plan the round-8 verdict ordered):
# lead with the six round-9 additions (x145 CDC incremental view,
# x146–x150 — the r7/r8 precedent: new shapes get their driver
# verdict the round they land), then the five late round-8 additions
# x140–x144 (preflight-green only, never in a driver window), then
# the entire round-5-stale block — d31–d49, x02–x05, x46–x56 (34
# rows, last driver-checked in round 5; shared helpers and
# load_table churn since). The final 5 slots go to the oldest
# round-6 rows (the x06 dedup/similarity head). After this round
# every driver verdict is round 6 or newer; the round-10 rotation
# should lead with the remaining r6 rows (x11–x39, x57–x72).
_CHECK_FIRST = [
    # round-9 additions — first driver verdicts
    "x145_cdc_incremental_view", "x146_skyline_frontier",
    "x147_gini_concentration", "x148_proration_hamilton",
    "x149_fuzzy_vocab_pairs", "x150_benford_digits",
    # late round-8 additions — never driver-checked
    "x140_session_stats", "x141_psi_drift", "x142_time_weighted_avg",
    "x143_ship_latency_quantiles", "x144_failure_rate_ci",
    # round-5-stale: d31–d49
    "d31_pivot", "d32_unpivot", "d33_string_agg", "d34_cube",
    "d35_approx_distinct", "d36_exists_subquery", "d37_scalar_subquery",
    "d38_ntile_percent_rank", "d39_array_hof", "d40_except_all",
    "d41_moment_stats", "d42_snapshot_diff", "d43_quantiles",
    "d44_null_semantics", "d45_share_of_total", "d46_try_cast",
    "d47_incremental_agg", "d48_apply_changes", "d49_revenue_rollup",
    # round-5-stale: x02–x05
    "x02_quality_features", "x03_lang_id", "x04_exact_dedup",
    "x05_minhash_signatures",
    # round-5-stale: x46–x56
    "x46_df_heavy_hitters", "x47_bigram_pmi", "x48_inverted_index",
    "x49_source_overlap", "x50_ann_recall",
    "x51_cluster_representatives", "x52_mixture_plan",
    "x53_incremental_lsh", "x54_stream_screen", "x55_variant_extract",
    "x56_dup_ngram_coverage",
    # oldest round-6 rows
    "x06_minhash_lsh_pairs", "x07_ngram_jaccard", "x08_simhash",
    "x09_cosine_topk", "x10_embedding_neardup",
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
