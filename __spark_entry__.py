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
# Round-7 rotation: 59 queries have never been in a driver window
# (x73–x89 from round 6, x90–x131 from round 7) — more than the window
# holds. The 50 slots go to x73–x114 (42) plus the 8 new queries with
# the most NOVEL failure modes (filesystem round trips, cross-engine
# regex and ln-ranking, graph/IVM/interval compositions, the hash
# fold): x117, x119, x120, x127–x131. The 9 deferred are simple or
# compositions of already-certified operators (x115 Markov, x116
# CUSUM, x118 RRF of certified x09/x11, x121 CUBE, x122 NTILE, x123
# conditional-sum expectations, x124 UNPIVOT, x125 z-score, x126 bag
# set-ops), all green at sf0.01 via tools/check_oracle.py
# (PREFLIGHT_r07.json). Round 8 should lead with those 9, then the
# round-4/5-stale rows (x40–x45, d01–d49, x01–x05, x46–x56).
_CHECK_FIRST = [
    # x73–x89: round-6 additions, never driver-checked
    "x73_bpe_encode", "x74_fuzzy_name_join", "x75_sliding_distinct",
    "x76_quality_gate_corpus", "x77_simhash_neardup", "x78_kcore",
    "x79_join_size_estimate", "x80_pq_adc_topk", "x81_pq_recall",
    "x82_sql_udf", "x83_kmv_intersections", "x84_split_leakage",
    "x85_skew_report", "x86_join_order_plan", "x87_table_profile",
    "x88_kmv_incremental", "x89_retention_cohorts",
    # round-7 additions, never driver-checked
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
    "x112_welch_ttest", "x113_retraction_certified",
    "x114_gram_matrix",
    # round-7 session-4 additions, highest-risk shapes first
    "x127_time_travel_audit", "x128_format_interop",
    "x129_pretokenize_vocab", "x130_table_checksum",
    "x131_markov_anomaly", "x117_link_prediction",
    "x119_ivm_join_delta", "x120_session_incident_overlap",
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
