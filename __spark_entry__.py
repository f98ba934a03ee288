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
# Round-14 rotation (executes the plan the r13 entry comment ordered,
# re-derived from the CORRECTNESS_r* history this round): the 32 rows
# that have NEVER had a driver verdict lead — the round-13 additions
# x202–x233 (constraint lifecycle, stream rate feed, Kaplan-Meier,
# mutual information, Zipf slope, RFM, cohort retention, key skew,
# McNemar, Benford, Theil, streaks, funnel latency, CUPED, runs test,
# vacuum lifecycle, replace_where lifecycle, item similarity, ANOVA,
# forecast backtest, single-source risk, interarrival dispersion,
# jackknife, Wilcoxon signed-rank, Holt linear, Neyman allocation,
# JS divergence, info gain, Z-order lifecycle, Spearman rank, DOW
# seasonality, capture-recapture) — then the oldest 18 of the 46
# r9-stale rows in registry order: d35–d49 (15) plus x02/x03/x04.
# After this round no driver verdict is older than round 9 and only
# 28 r9-stale rows remain (x05–x10, x46–x56 residue et al.); the
# round-15 window should take those 28 plus the oldest r10 rows.
_CHECK_FIRST = [
    # never driver-checked (round-13 additions)
    "x202_constraint_lifecycle", "x203_stream_rate_feed",
    "x204_kaplan_meier", "x205_mutual_information",
    "x206_zipf_slope", "x207_rfm_segments",
    "x208_cohort_retention", "x209_key_skew_audit",
    "x210_mcnemar_paired", "x211_benford_digits",
    "x212_theil_index", "x213_activity_streaks",
    "x214_funnel_latency", "x215_cuped_adjustment",
    "x216_runs_test", "x217_vacuum_lifecycle",
    "x218_replace_where_lifecycle", "x219_item_similarity",
    "x220_anova_f", "x221_forecast_backtest",
    "x222_single_source_risk", "x223_interarrival_dispersion",
    "x224_jackknife_loo", "x225_wilcoxon_signed_rank",
    "x226_holt_linear", "x227_neyman_allocation",
    "x228_js_divergence", "x229_info_gain",
    "x230_zorder_lifecycle", "x231_spearman_rank_corr",
    "x232_dow_seasonality", "x233_capture_recapture",
    # oldest driver verdicts (round 9) — first 18 in registry order
    "d35_approx_distinct", "d36_exists_subquery",
    "d37_scalar_subquery", "d38_ntile_percent_rank",
    "d39_array_hof", "d40_except_all", "d41_moment_stats",
    "d42_snapshot_diff", "d43_quantiles", "d44_null_semantics",
    "d45_share_of_total", "d46_try_cast", "d47_incremental_agg",
    "d48_apply_changes", "d49_revenue_rollup",
    "x02_quality_features", "x03_lang_id", "x04_exact_dedup",
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
