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
# Round-11 rotation (executes the plan the round-10 verdict ordered):
# the 11 rows that have NEVER had a driver verdict lead — x153, x154
# and the late-round-10 additions x156–x164 (grouped OLS, lang-source
# G-test, two-sample KS, market basket, weighted quantiles, Heaps'
# law, DELETE-feed view, Lorenz deciles, stats-pruned scan). The
# remaining 39 slots go to the oldest driver-verdict rows, all
# round-7: x73, x75–x112 in registry order. After this round the
# never-checked set is the round-11 additions x165–x183 (19: catalog
# view, scoped CDC, schema-evolution merge, Spearman, chi-squared,
# ESS, Simpson, ranking eval, classifier eval, Shannon, JSD,
# association summary, restore feed, corr matrix, pipe syntax,
# cleaning funnel, max drawdown, RANGE frame, percentile_cont) and
# the r7-stale residue is 10 rows (x113, x114, x117, x119, x120,
# x127, x128, x129, x130, x131) — the round-12 rotation should lead
# with those 29, then the oldest r8 rows (d01–d30 tier).
_CHECK_FIRST = [
    # never driver-checked (landed late round 10)
    "x153_mann_whitney_u", "x154_ref_integrity_audit",
    "x156_grouped_ols", "x157_mutual_information",
    "x158_ks_two_sample", "x159_market_basket",
    "x160_weighted_quantiles", "x161_heaps_law",
    "x162_delete_feed_view", "x163_lorenz_deciles",
    "x164_stats_pruned_scan",
    # oldest driver verdicts (round 7): x73, x75–x112
    "x73_bpe_encode", "x75_sliding_distinct",
    "x76_quality_gate_corpus", "x77_simhash_neardup",
    "x78_kcore", "x79_join_size_estimate",
    "x80_pq_adc_topk", "x81_pq_recall",
    "x82_sql_udf", "x83_kmv_intersections",
    "x84_split_leakage", "x85_skew_report",
    "x86_join_order_plan", "x87_table_profile",
    "x88_kmv_incremental", "x89_retention_cohorts",
    "x90_cbo_estimates", "x91_profile_approx_certified",
    "x92_ivfpq_topk", "x93_approx_quantile_certified",
    "x94_adaptive_salted_join", "x95_adaptive_lsh",
    "x96_ivfpq_residual_topk", "x97_python_datasource",
    "x98_polymorphic_udtf", "x99_ewma_user_value",
    "x100_cms_incremental", "x101_scd2_build",
    "x102_point_in_time_join", "x103_zorder_skipping",
    "x104_weighted_sample_incremental", "x105_mad_outliers",
    "x106_range_partition_plan", "x107_snapshot_audit",
    "x108_winsorized_stats", "x109_corpus_divergence",
    "x110_event_pattern_match", "x111_trend_slope",
    "x112_welch_ttest",
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
