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
# Round-13 rotation (executes the plan the round-12 verdict ordered):
# the 18 rows that have NEVER had a driver verdict lead — the
# round-12 additions x184–x201 (catalog rename, clone/restore
# lifecycle, Cohen's kappa, HHI/CR4, Kruskal-Wallis, log-odds
# keyness, Mann-Kendall, LCG sample, negative sampling, preference
# pairs, nearest as-of, Poisson bootstrap CI, tombstone merge feed,
# time-embargo split, SQL variables, FD histogram, UPDATE feed,
# CHECK-constraint gate) — then all 28 rows whose latest verdict is
# round 8 (d26–d30 and the r8 x-tier residue) in registry order,
# then the 4 oldest round-9 rows (d31–d34) to fill the 50-slot
# window. After this round no driver verdict is older than round 9;
# the round-14 rotation should lead with the 32 round-13 additions
# (x202–x217: constraint lifecycle, stream rate feed, Kaplan-Meier,
# mutual information, Zipf slope, RFM, cohort retention, key skew,
# McNemar, Benford, Theil, streaks, funnel latency, CUPED, runs
# test, vacuum lifecycle; and x218–x233: replace_where+timestamp
# lifecycle, item similarity, ANOVA, forecast backtest,
# single-source risk, interarrival dispersion, jackknife, Wilcoxon
# signed-rank, Holt linear, Neyman allocation, JS divergence, info
# gain, Z-order lifecycle, Spearman, DOW seasonality,
# capture-recapture), then the oldest 18 of the 46 remaining
# r9-stale rows (d35–d49 and the r9 x-tier residue) in registry
# order.
_CHECK_FIRST = [
    # never driver-checked (round-12 additions)
    "x184_catalog_rename_view", "x185_lifecycle_clone_restore",
    "x186_cohens_kappa", "x187_hhi_concentration",
    "x188_kruskal_wallis", "x189_log_odds_keyness",
    "x190_mann_kendall_trend", "x191_lcg_sample_estimate",
    "x192_negative_sampling", "x193_preference_pairs",
    "x194_asof_nearest_tolerance", "x195_poisson_bootstrap_ci",
    "x196_tombstone_merge_feed", "x197_time_embargo_split",
    "x198_sql_variables", "x199_fd_histogram",
    "x200_update_feed_view", "x201_constraint_gate",
    # oldest driver verdicts (round 8) — all 28, registry order
    "d26_intersect", "d27_except", "d28_date_agg",
    "d29_math_string", "d30_documents_agg",
    "x01_token_stats", "x40_length_trim", "x41_tumbling_rollup",
    "x42_sliding_rollup", "x43_pagerank", "x44_unigram_logprob",
    "x45_minhash_calibration", "x115_markov_transitions",
    "x116_cusum_changepoint", "x118_rrf_fusion",
    "x121_cube_report", "x122_ntile_deciles",
    "x123_expectations_report", "x124_unpivot_metrics",
    "x125_trailing_zscore", "x126_bag_set_ops",
    "x132_optimize_equivalence", "x134_funnel_conversion",
    "x135_aqp_hash_sample", "x136_autocorrelation",
    "x137_bloom_skipping", "x138_last_touch_attribution",
    "x139_label_propagation",
    # next-oldest (round 9): fill the last 4 slots
    "d31_pivot", "d32_unpivot", "d33_string_agg", "d34_cube",
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
