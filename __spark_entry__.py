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
# Round-5 rotation: the 40 queries last driver-checked in round 3
# (d15–d49 and x01–x05) lead, so every registered query's driver verdict
# is at most one round old; the window is padded to 50 with the 10
# cheapest round-4-green queries. Everything else (all driver-green in
# round 4) follows.
_CHECK_FIRST = [
    "d15_range_join", "d16_cross_join", "d17_grouped_agg",
    "d18_count_distinct_having", "d19_median", "d20_rollup",
    "d21_grouping_sets", "d22_conditional_agg", "d23_window_rank",
    "d24_window_lag_lead", "d25_window_running_max", "d26_intersect",
    "d27_except", "d28_date_agg", "d29_math_string", "d30_documents_agg",
    "d31_pivot", "d32_unpivot", "d33_string_agg", "d34_cube",
    "d35_approx_distinct", "d36_exists_subquery", "d37_scalar_subquery",
    "d38_ntile_percent_rank", "d39_array_hof", "d40_except_all",
    "d41_moment_stats", "d42_snapshot_diff", "d43_quantiles",
    "d44_null_semantics", "d45_share_of_total", "d46_try_cast",
    "d47_incremental_agg", "d48_apply_changes", "d49_revenue_rollup",
    "x02_quality_features", "x03_lang_id",
    "x04_exact_dedup", "x05_minhash_signatures",
    # round-5 additions: first driver verdict this round
    "x46_df_heavy_hitters", "x47_bigram_pmi", "x48_inverted_index",
    "x49_source_overlap", "x50_ann_recall",
    "x51_cluster_representatives", "x52_mixture_plan",
    "x53_incremental_lsh", "x54_stream_screen", "x55_variant_extract",
    "x56_dup_ngram_coverage",
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
