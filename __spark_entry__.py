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
# Round-12 rotation (executes the plan the round-11 verdict ordered):
# the 19 rows that have NEVER had a driver verdict lead — the
# round-11 additions x165–x183 (catalog view, scoped CDC,
# schema-evolution merge, Spearman, chi-squared, ESS, Simpson,
# ranking eval, classifier eval, Shannon, JSD, association summary,
# restore feed, corr matrix, pipe syntax, cleaning funnel, max
# drawdown, RANGE frame, percentile_cont) — then the 10 r7-stale
# rows (x113, x114, x117, x119, x120, x127–x131), then the oldest
# r8 rows (d01–d25) to fill the 50-slot window. After this round no
# driver verdict is older than round 8; the round-13 rotation should
# lead with the 16 round-12 additions (x184–x199: catalog rename,
# clone/restore lifecycle, kappa, HHI/CR4, Kruskal-Wallis, log-odds
# keyness, Mann-Kendall, LCG sample, negative sampling, preference
# pairs, nearest as-of, Poisson bootstrap, tombstone merge, embargo
# split, SQL variables, FD histogram) plus the late-round pair
# x200 (UPDATE feed) and x201 (CHECK-constraint gate) — 18 rows —
# then the remaining r8 rows (d26–d30 and the r8 x-tier x01–x56
# residue) in registry order.
_CHECK_FIRST = [
    # never driver-checked (round-11 additions)
    "x165_catalog_named_view", "x166_scoped_cdc_view",
    "x167_schema_evolution_merge", "x168_spearman_rho",
    "x169_chi_squared", "x170_effective_sample_size",
    "x171_simpson_diversity", "x172_ranking_eval",
    "x173_classifier_eval", "x174_shannon_entropy",
    "x175_js_divergence", "x176_association_summary",
    "x177_restore_feed_view", "x178_corr_matrix",
    "x179_pipe_rollup", "x180_cleaning_funnel",
    "x181_max_drawdown", "x182_trailing_range_frame",
    "x183_percentile_cont",
    # oldest driver verdicts (round 7 residue)
    "x113_retraction_certified", "x114_gram_matrix",
    "x117_link_prediction", "x119_ivm_join_delta",
    "x120_session_incident_overlap", "x127_time_travel_audit",
    "x128_format_interop", "x129_pretokenize_vocab",
    "x130_table_checksum", "x131_markov_anomaly",
    # next-oldest (round 8): the d01–d25 relational tier
    "d01_scan_filter", "d02_like_strings", "d03_natural_sort",
    "d04_topk", "d05_distinct", "d10_inner_join",
    "d11_star_join_agg", "d12_left_join", "d13_semi_join",
    "d14_anti_join", "d15_range_join", "d16_cross_join",
    "d17_grouped_agg", "d18_count_distinct_having", "d19_median",
    "d20_rollup", "d21_grouping_sets", "d22_conditional_agg",
    "d23_window_rank", "d24_window_lag_lead", "d25_window_running_max",
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
