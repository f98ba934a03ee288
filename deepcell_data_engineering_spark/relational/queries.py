"""Declared relational query surface (SURVEY.md §2b, D01–D30).

Each query is built with the DataFrame API (Catalyst plans it; pushdown,
pruning, broadcast and AQE apply) and carries an equivalent DuckDB oracle
SQL string for the driver's hash-matching correctness gate.

Naming contract: every computed column is aliased identically in the Spark
plan and the oracle SQL — the driver sorts columns by name before hashing.

Scale notes (100 TB posture):
- Dimension tables (region, nation, and generated dim tables) are
  explicitly ``broadcast()`` so star joins never shuffle the fact side.
- Aggregations are expressed as single groupBy/agg pipelines → Catalyst
  emits partial (map-side) aggregation before the shuffle.
- Top-k queries use orderBy+limit → Spark plans TakeOrderedAndProject
  (per-partition top-k, no global sort materialization).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deepcell_data_engineering_spark.catalog import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None → rows-only check
    doc: str = ""
    # Number of BroadcastNestedLoopJoins in this query's plan whose
    # build side is INTENTIONALLY a small-but-not-plan-provable frame
    # (a bounded query/probe set, a constant-cardinality domain
    # aggregate) — the docstring must state the bound and why it is
    # data-size-independent. The plan-contract sweep proves every
    # OTHER BNLJ build is a <=1-row subtree; an undeclared data-sized
    # nested loop fails the sweep.
    bnlj_bounded: int = 0
    # Number of UNPARTITIONED window operators in this query's plan
    # whose input frame is bounded by DOMAIN knowledge rather than
    # plan-provably (a calendar-grain rollup, a fixed metric list) —
    # the docstring must state the bound. The sweep proves every
    # OTHER global window sits over an aggregate/limit subtree; an
    # undeclared raw-fact global window fails the sweep (r12 #3).
    window_bounded: int = 0


QUERIES: dict[str, QuerySpec] = {}


def _q(
    name: str,
    oracle: Optional[str],
    doc: str = "",
    bnlj_bounded: int = 0,
    window_bounded: int = 0,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(
            name=name,
            build=fn,
            oracle=oracle,
            doc=doc,
            bnlj_bounded=bnlj_bounded,
            window_bounded=window_bounded,
        )
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# D01–D05: scan / project / filter / distinct / top-k
# ---------------------------------------------------------------------------


@_q(
    "d01_scan_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       WHERE l_quantity > 45 AND l_returnflag = 'R'
       ORDER BY l_orderkey, l_linenumber""",
    doc="Predicate pushdown + column pruning (SURVEY P-group).",
)
def d01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@_q(
    "d02_like_strings",
    """SELECT p_partkey, UPPER(p_brand) AS b, SUBSTR(p_type, 1, 5) AS t5 FROM part
       WHERE p_name LIKE '%re%' ORDER BY p_partkey""",
    doc="LIKE + string scalar functions (S23/F6 analog).",
)
def d02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%re%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("b"),
            F.substring("p_type", 1, 5).alias("t5"),
        )
        .orderBy("p_partkey")
    )


@_q(
    "d03_natural_sort",
    """SELECT c_custkey, CAST(regexp_extract(c_name, '[0-9]+', 0) AS BIGINT) AS name_num
       FROM customer ORDER BY name_num, c_custkey LIMIT 100""",
    doc="Natural-sort key via regexp_extract (misc_utils.py:35-38 sorted_nicely).",
)
def d03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.regexp_extract("c_name", "[0-9]+", 0).cast("bigint").alias("name_num"),
        )
        .orderBy("name_num", "c_custkey")
        .limit(100)
    )


@_q(
    "d04_topk",
    """SELECT o_orderkey, ROUND(o_totalprice, 2) AS tp FROM orders
       ORDER BY tp DESC, o_orderkey LIMIT 25""",
    doc="Top-k: Spark plans TakeOrderedAndProject (no full sort).",
)
def d04(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("tp"))
        .orderBy(F.col("tp").desc(), "o_orderkey")
        .limit(25)
    )


@_q(
    "d05_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
       ORDER BY l_returnflag, l_linestatus""",
    doc="DISTINCT = partial hash-aggregate before shuffle (A5 analog).",
)
def d05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# D10–D16: join family
# ---------------------------------------------------------------------------


@_q(
    "d10_inner_join",
    """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
       ORDER BY n_name""",
    doc="Inner equi join; region broadcast (J1 metadata↔paths analog).",
)
def d10(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
            "inner",
        )
        .select("n_name", "r_name")
        .orderBy("n_name")
    )


@_q(
    "d11_star_join_agg",
    """SELECT r_name, COUNT(*) AS cnt, ROUND(SUM(c_acctbal), 2) AS bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name""",
    doc="Star-schema multi-way join + agg; both dims broadcast → fact never shuffles for the join.",
)
def d11(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
        .orderBy("r_name")
    )


@_q(
    "d12_left_join",
    """SELECT c_custkey, COALESCE(COUNT(o_orderkey), 0) AS n_orders
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey ORDER BY n_orders DESC, c_custkey LIMIT 100""",
    doc="Left outer join + null-tolerant count (J2 blank-fill analog).",
)
def d12(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "c_custkey")
        .limit(100)
    )


@_q(
    "d13_semi_join",
    """SELECT c_custkey FROM customer
       WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
       ORDER BY c_custkey""",
    doc="Left-semi join / IN-subquery (P1 isin subset).",
)
def d13(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nations = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 1)
    return (
        customer.join(
            F.broadcast(nations),
            customer.c_nationkey == nations.n_nationkey,
            "left_semi",
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@_q(
    "d14_anti_join",
    """SELECT c_custkey FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 400000)
       ORDER BY c_custkey""",
    doc="Left-anti join (J3 missing-files report).",
)
def d14(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        customer.join(
            big_orders,
            customer.c_custkey == big_orders.o_custkey,
            "left_anti",
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@_q(
    "d15_range_join",
    """SELECT o.o_orderkey, COUNT(*) AS n_within_week
       FROM orders o JOIN lineitem l
         ON l.l_orderkey = o.o_orderkey
        AND l.l_shipdate >= o.o_orderdate
        AND l.l_shipdate <  o.o_orderdate + INTERVAL 7 DAY
       GROUP BY o.o_orderkey ORDER BY n_within_week DESC, o.o_orderkey LIMIT 50""",
    doc="Equi join + range (theta) residual predicate (J4 frame-window analog).",
)
def d15(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    cond = (
        (lineitem.l_orderkey == orders.o_orderkey)
        & (lineitem.l_shipdate >= orders.o_orderdate)
        & (lineitem.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 7 DAY"))
    )
    return (
        orders.join(lineitem, cond)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_within_week"))
        .orderBy(F.col("n_within_week").desc(), "o_orderkey")
        .limit(50)
    )


@_q(
    "d16_cross_join",
    """SELECT r_name, g.gen FROM region
       CROSS JOIN (SELECT 1 AS gen UNION ALL SELECT 2 UNION ALL SELECT 3) g
       ORDER BY r_name, gen""",
    doc="Cross join with a generated dim table (J5 crop-grid fan-out shape).",
)
def d16(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    gen = spark.range(1, 4).select(F.col("id").cast("int").alias("gen"))
    return region.crossJoin(F.broadcast(gen)).select("r_name", "gen").orderBy("r_name", "gen")


# ---------------------------------------------------------------------------
# D17–D22: aggregation family
# ---------------------------------------------------------------------------


@_q(
    "d17_grouped_agg",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
              ROUND(SUM(l_quantity), 2) AS sq, ROUND(AVG(l_extendedprice), 2) AS ap,
              ROUND(MIN(l_discount), 2) AS mind, ROUND(MAX(l_tax), 2) AS maxt
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1-shaped grouped agg; partial aggregation map-side (A1–A3).",
)
def d17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sq"),
            F.round(F.avg("l_extendedprice"), 2).alias("ap"),
            F.round(F.min("l_discount"), 2).alias("mind"),
            F.round(F.max("l_tax"), 2).alias("maxt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_q(
    "d18_count_distinct_having",
    """SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS np
       FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
       ORDER BY np DESC, o_custkey LIMIT 100""",
    doc="DISTINCT aggregate + HAVING (A5 cell counts, P7 min-objects).",
)
def d18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.countDistinct("o_orderpriority").alias("np"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") >= 5)
        .drop("_n")
        .orderBy(F.col("np").desc(), "o_custkey")
        .limit(100)
    )


@_q(
    "d19_median",
    """SELECT c_mktsegment, ROUND(MEDIAN(c_acctbal), 2) AS med_bal, COUNT(*) AS n
       FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    doc="Exact grouped median (A1 compute_cell_size; percentile_approx at scale).",
)
def d19(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.median("c_acctbal"), 2).alias("med_bal"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@_q(
    "d20_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COUNT(*) AS cnt
       FROM lineitem GROUP BY ROLLUP (l_returnflag) ORDER BY rf""",
    doc="ROLLUP to grand total (A4 benchmark rollup-to-'all').",
)
def d20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"), "cnt")
        .orderBy("rf")
    )


@_q(
    "d21_grouping_sets",
    """SELECT COALESCE(o_orderstatus, '-') AS st, COALESCE(o_orderpriority, '-') AS pr,
              COUNT(*) AS cnt
       FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       ORDER BY st, pr""",
    doc="GROUPING SETS — exactly the tissue/platform/all rollup the reference hand-rolls (dataset_builder.py:651-692).",
)
def d21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_d21_orders")
    return spark.sql(
        """SELECT COALESCE(o_orderstatus, '-') AS st, COALESCE(o_orderpriority, '-') AS pr,
                  COUNT(*) AS cnt
           FROM _d21_orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           ORDER BY st, pr"""
    )


@_q(
    "d22_conditional_agg",
    """SELECT l_returnflag,
              COUNT(CASE WHEN l_discount > 0.05 AND l_tax > 0.04 THEN 1 END) AS inter,
              COUNT(CASE WHEN l_discount > 0.05 OR  l_tax > 0.04 THEN 1 END) AS uni
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="Conditional counts — the jaccard intersection/union shape (A3, dataset_benchmarker.py:103-105).",
)
def d22(spark: SparkSession, sf_dir: str) -> DataFrame:
    disc = F.col("l_discount") > 0.05
    tax = F.col("l_tax") > 0.04
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(disc & tax, 1)).alias("inter"),
            F.count(F.when(disc | tax, 1)).alias("uni"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# D23–D25: window functions
# ---------------------------------------------------------------------------


@_q(
    "d23_window_rank",
    """SELECT o_custkey, o_orderkey,
              ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
              DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS dr
       FROM orders ORDER BY o_custkey, rn LIMIT 200""",
    doc="Ranking windows — dense_rank is the L1/L2 relabel primitive; row_number the A7 argmax.",
)
def d23(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_rn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_dr = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_rn).alias("rn"),
            F.dense_rank().over(w_dr).alias("dr"),
        )
        .orderBy("o_custkey", "rn")
        .limit(200)
    )


@_q(
    "d24_window_lag_lead",
    """SELECT user_id, event_id,
              LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
              LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
       FROM events ORDER BY user_id, event_id LIMIT 200""",
    doc="lag/lead — the frame t vs t+1 primitive (L3/L4 relabel propagation).",
)
def d24(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
        .limit(200)
    )


@_q(
    "d25_window_running_max",
    """SELECT l_orderkey, l_linenumber,
              ROUND(MAX(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_max
       FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200""",
    doc="Running max with explicit RANGE frame (A8 stitch label offset). RANGE, "
    "not ROWS: the testdata has duplicate (l_orderkey, l_linenumber) pairs, and "
    "a ROWS frame over tied sort keys is nondeterministic; RANGE includes peers.",
)
def d25(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.max("l_extendedprice").over(w), 2).alias("run_max"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# D26–D27: set operations
# ---------------------------------------------------------------------------


@_q(
    "d26_intersect",
    """SELECT c_nationkey AS k FROM customer
       INTERSECT
       SELECT s_nationkey AS k FROM supplier
       ORDER BY k""",
    doc="INTERSECT (set semantics).",
)
def d26(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@_q(
    "d27_except",
    """SELECT k FROM (
         SELECT DISTINCT p_size AS k FROM part
         EXCEPT
         SELECT n_nationkey AS k FROM nation
       ) t ORDER BY k""",
    doc="EXCEPT over distinct inputs (S17 union family; engine surface).",
)
def d27(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(F.col("p_size").alias("k")).distinct()
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    return p.subtract(n).orderBy("k")


# ---------------------------------------------------------------------------
# D28–D30: date/time, math/string scalars, documents
# ---------------------------------------------------------------------------


@_q(
    "d28_date_agg",
    """SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sv
       FROM events GROUP BY CAST(ts AS DATE), event_type
       ORDER BY d, event_type""",
    doc="Date truncation + agg — tumbling-window analog in batch SQL (R4).",
)
def d28(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sv"),
        )
        .orderBy("d", "event_type")
    )


@_q(
    "d29_math_string",
    """SELECT p_partkey,
              CAST(FLOOR(p_retailprice) AS BIGINT) AS fp,
              ROUND(SQRT(p_size), 3) AS sq,
              CONCAT(p_brand, '#', CAST(p_size AS STRING)) AS tag
       FROM part ORDER BY p_partkey LIMIT 100""",
    doc="floor/sqrt/round/concat — the reference's scalar math surface (§2.9).",
)
def d29(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.floor("p_retailprice").cast("bigint").alias("fp"),
            F.round(F.sqrt("p_size"), 3).alias("sq"),
            F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias("tag"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


@_q(
    "d30_documents_agg",
    """SELECT lang, COUNT(*) AS n_docs, MAX(n_chars) AS max_chars,
              ROUND(AVG(LENGTH(text)), 2) AS avg_len
       FROM documents GROUP BY lang ORDER BY lang""",
    doc="Text-table grouping (north-star text analysis entry point).",
)
def d30(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg(F.length("text")), 2).alias("avg_len"),
        )
        .orderBy("lang")
    )


@_q(
    "d31_pivot",
    """SELECT o_orderstatus,
              COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
              COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low,
              ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2) AS amt_urgent,
              ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW'), 2) AS amt_low
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    doc="PIVOT to wide conditional aggregates (long->wide reshape, the "
    "relational dual of the R-series tensor reshapes). Pivot values are "
    "pinned explicitly: an unpinned pivot() first runs a distinct-values "
    "job over the fact table — a full extra scan at 100 TB.",
)
def d31(spark: SparkSession, sf_dir: str) -> DataFrame:
    piv = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("amt"),
        )
    )
    # pivot leaves absent (status, priority) cells NULL; COUNT FILTER in
    # the oracle yields 0 there (SUM FILTER yields NULL in both engines)
    return piv.select(
        "o_orderstatus",
        F.coalesce(F.col("`1-URGENT_n`"), F.lit(0)).alias("n_urgent"),
        F.coalesce(F.col("`5-LOW_n`"), F.lit(0)).alias("n_low"),
        F.col("`1-URGENT_amt`").alias("amt_urgent"),
        F.col("`5-LOW_amt`").alias("amt_low"),
    ).orderBy("o_orderstatus")


@_q(
    "d32_unpivot",
    """SELECT p_partkey, metric, val FROM (
           SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
           UNION ALL
           SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
       ) WHERE p_partkey <= 100 ORDER BY p_partkey, metric""",
    doc="UNPIVOT wide columns into (metric, val) long form — the inverse of "
    "d31_pivot. unpivot() plans as a single Expand over one scan (each input "
    "row fans out to N output rows map-side, no shuffle, no self-union "
    "re-scan of the fact table — the UNION ALL oracle would scan twice).",
)
def d32(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.col("p_retailprice").alias("retail"),
            F.col("p_size").cast("double").alias("size"),
        )
        .unpivot("p_partkey", ["retail", "size"], "metric", "val")
        .orderBy("p_partkey", "metric")
    )


@_q(
    "d33_string_agg",
    """SELECT n_regionkey,
              string_agg(n_name, ',' ORDER BY n_name) AS nations,
              COUNT(*) AS n
       FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    doc="Ordered string aggregation (LISTAGG). collect_list gives no "
    "intra-group order guarantee under parallel merge, so the list is "
    "array_sort-ed before joining — the only way the concatenation is "
    "deterministic across partitionings (and hence across cluster sizes).",
)
def d33(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


@_q(
    "d34_cube",
    """SELECT COALESCE(o_orderstatus, '-') AS st, COALESCE(o_orderpriority, '-') AS pr,
              COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS amt
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY st, pr""",
    doc="CUBE over (status, priority) — completes the GROUPING "
    "SETS/ROLLUP/CUBE surface next to d20/d21 (the reference's benchmark "
    "rollup shape, dataset_benchmarker.py:112-121). One Expand node fans "
    "each row to its 4 grouping sets map-side; one shuffle.",
)
def d34(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("amt"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("-")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("-")).alias("pr"),
            "cnt",
            "amt",
        )
        .orderBy("st", "pr")
    )


@_q(
    "d35_approx_distinct",
    """SELECT l_returnflag,
              COUNT(DISTINCT l_partkey) AS n_exact,
              TRUE AS approx_ok
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="approx_count_distinct (HyperLogLog++) certified against the "
    "exact count: the query emits the exact distinct count plus a "
    "within-5%-tolerance flag for the sketch, so the nondeterministic-"
    "across-engines sketch value itself never enters the hash compare "
    "while its accuracy IS oracle-gated. The sketch is the A5 cell-count "
    "scale path (operators/labels.py cell_counts(approx=True)): fixed "
    "~KB state merged map-side vs a per-group distinct shuffle.",
)
def d35(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_exact"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_approx"),
        )
    )
    return agg.select(
        "l_returnflag",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(0.05)
        ).alias("approx_ok"),
    ).orderBy("l_returnflag")


@_q(
    "d36_exists_subquery",
    """SELECT o_orderstatus, COUNT(*) AS n_orders
       FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
       GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    doc="Correlated EXISTS subquery — Catalyst decorrelates it into a "
    "left-semi hash join with the predicate pushed below the join (the "
    "SQL-surface twin of d13's DataFrame semi join).",
)
def d36(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_d36_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_d36_lineitem")
    return spark.sql(
        """SELECT o_orderstatus, COUNT(*) AS n_orders
           FROM _d36_orders o
           WHERE EXISTS (SELECT 1 FROM _d36_lineitem l
                         WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
           GROUP BY o_orderstatus ORDER BY o_orderstatus"""
    )


@_q(
    "d37_scalar_subquery",
    """SELECT p_partkey, p_brand, p_size
       FROM part p
       WHERE p_size > (SELECT AVG(p2.p_size) FROM part p2
                       WHERE p2.p_brand = p.p_brand)
       ORDER BY p_partkey""",
    doc="Correlated scalar subquery (parts larger than their brand's "
    "average size) — decorrelated into an aggregate + join. Integer "
    "avg keeps the comparison exact across engines (float sums would "
    "risk ulp-level membership flips).",
)
def d37(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "part").createOrReplaceTempView("_d37_part")
    return spark.sql(
        """SELECT p_partkey, p_brand, p_size
           FROM _d37_part p
           WHERE p_size > (SELECT AVG(p2.p_size) FROM _d37_part p2
                           WHERE p2.p_brand = p.p_brand)
           ORDER BY p_partkey"""
    )


@_q(
    "d38_ntile_percent_rank",
    """SELECT c_custkey, c_nationkey, quartile,
              ROUND(pr, 6) AS pr
       FROM (SELECT c_custkey, c_nationkey,
                    NTILE(4) OVER w AS quartile,
                    PERCENT_RANK() OVER w AS pr
             FROM customer
             WINDOW w AS (PARTITION BY c_nationkey
                          ORDER BY c_acctbal, c_custkey))
       WHERE quartile = 4
       ORDER BY c_custkey""",
    doc="NTILE + PERCENT_RANK ranking windows (completes the window "
    "family next to d23/d24/d25). The window orders by (acctbal, "
    "custkey) so ties can't reorder across engines.",
)
def d38(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
        )
        .where(F.col("quartile") == 4)
        .orderBy("c_custkey")
    )


@_q(
    "d39_array_hof",
    """SELECT l_orderkey,
              LEN(qtys) AS n_items,
              qtys[LEN(qtys)] AS max_qty,
              CAST(list_sum(list_transform(qtys, q -> q * q)) AS BIGINT) AS sum_sq
       FROM (SELECT l_orderkey,
                    list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
             FROM lineitem GROUP BY l_orderkey)
       WHERE LEN(qtys) >= 6
       ORDER BY l_orderkey""",
    doc="Array column built by aggregation, then higher-order functions "
    "(array_sort / element_at / aggregate-lambda) — the §2.10 "
    "JVM-side lambda surface; everything stays in whole-stage codegen, "
    "no UDF. Quantities cast to BIGINT so the lambda arithmetic is "
    "exact in both engines.",
)
def d39(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(F.col("l_quantity").cast("bigint"))
            ).alias("qtys")
        )
        .where(F.size("qtys") >= 6)
        .select(
            "l_orderkey",
            F.size("qtys").alias("n_items"),
            F.element_at("qtys", -1).alias("max_qty"),
            F.aggregate(
                "qtys", F.lit(0).cast("bigint"), lambda acc, q: acc + q * q
            ).alias("sum_sq"),
        )
        .orderBy("l_orderkey")
    )


@_q(
    "d40_except_all",
    """SELECT c FROM (
         SELECT o_custkey AS c FROM orders
         EXCEPT ALL
         SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'F'
       ) ORDER BY c""",
    doc="EXCEPT ALL — bag (multiplicity-preserving) difference, the ALL "
    "dual of d27's set EXCEPT: a customer with 5 orders, 2 of them 'F', "
    "keeps 3 rows. Spark plans a single count-compare aggregation "
    "(no distinct collapse).",
)
def d40(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    all_c = orders.select(F.col("o_custkey").alias("c"))
    f_c = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c")
    )
    return all_c.exceptAll(f_c).orderBy("c")


@_q(
    "d41_moment_stats",
    """WITH m AS (
         SELECT l_returnflag,
                COUNT(*) AS n,
                SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS sx,
                SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS sy,
                SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)
                    * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS sxx,
                SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)
                    * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS syy,
                SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)
                    * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS sxy
         FROM lineitem GROUP BY l_returnflag
       )
       SELECT l_returnflag, n,
              CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
              ROUND(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))),
                    6) AS stddev_x,
              ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                    6) AS corr_x_y
       FROM m ORDER BY l_returnflag""",
    doc="Exactly-reproducible grouped statistics (functions/stats.py): "
    "integer power sums — exact, order-insensitive, one shuffle with "
    "map-side partials — then stddev/Pearson-corr derived by a fixed "
    "IEEE expression. Spark's builtin stddev/corr merge float partials "
    "whose low bits depend on partitioning; this formulation is "
    "bit-stable from laptop to 1000 executors.",
)
def d41(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepcell_data_engineering_spark.functions.stats import moment_stats

    li = _t(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity"), 0).cast("bigint")
    y = F.round(F.col("l_discount") * 100, 0).cast("bigint")
    return (
        moment_stats(li, x, y, ["l_returnflag"])
        .select("l_returnflag", "n", "sx", "sy", "stddev_x", "corr_x_y")
        .orderBy("l_returnflag")
    )


@_q(
    "d42_snapshot_diff",
    """WITH old AS (
         SELECT o_orderkey,
                md5(concat_ws(chr(31),
                    COALESCE(CAST(o_orderstatus AS VARCHAR), chr(0) || 'NULL'),
                    COALESCE(CAST(o_totalprice AS VARCHAR), chr(0) || 'NULL')))
                    AS h_old
         FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
       ),
       new AS (
         SELECT o_orderkey,
                md5(concat_ws(chr(31),
                    COALESCE(CAST(CASE WHEN o_orderkey % 97 = 0 THEN 'X'
                                       ELSE o_orderstatus END AS VARCHAR),
                             chr(0) || 'NULL'),
                    COALESCE(CAST(o_totalprice AS VARCHAR), chr(0) || 'NULL')))
                    AS h_new
         FROM orders
       )
       SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
              CASE WHEN h_old IS NULL THEN 'added'
                   WHEN h_new IS NULL THEN 'removed'
                   WHEN h_old <> h_new THEN 'changed' END AS change_type
       FROM old FULL OUTER JOIN new USING (o_orderkey)
       WHERE CASE WHEN h_old IS NULL THEN 'added'
                  WHEN h_new IS NULL THEN 'removed'
                  WHEN h_old <> h_new THEN 'changed' END IS NOT NULL
       ORDER BY o_orderkey""",
    doc="Snapshot diff (CDC / incremental-rebuild primitive — "
    "operators/diff.py): old = pre-1996 orders, new = all orders with a "
    "synthetic status mutation on every 97th key. Both sides reduce to "
    "(key, row-hash) before one full outer join, so only narrow "
    "relations shuffle; unchanged keys are dropped.",
)
def d42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepcell_data_engineering_spark.operators.diff import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    new = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    return (
        snapshot_diff(old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"])
        .orderBy("o_orderkey")
    )


@_q(
    "d43_quantiles",
    """SELECT l_returnflag,
              quantile_cont(l_quantity, 0.25) AS q25,
              quantile_cont(l_quantity, 0.5) AS q50,
              quantile_cont(l_quantity, 0.75) AS q75,
              TRUE AS approx_ok
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="Exact grouped quartiles (percentile with linear interpolation, "
    "emitted as three scalar columns) certified against "
    "percentile_approx: probabilities 1/4, 1/2, 3/4 have exact binary "
    "interpolation fractions, so Spark's and DuckDB's (algebraically "
    "equal, differently associated) interpolation formulas agree "
    "bitwise. Runs through functions/stats.py:grouped_quantiles, whose "
    "max_exact_group guard masks oversized groups out of the exact "
    "percentile buffer (bounded executor memory) and answers them from "
    "the approx sketch (KLL-style, fixed state, map-side merged). The "
    "CERTIFIED query disables the guard (max_exact_group=None): hashed "
    "columns must come from the exact estimator at EVERY scale factor — "
    "a guard that silently flips big groups to the sketch would make "
    "the hash partition-order-dependent at SF>=50. The guard path "
    "itself is pinned by tests/test_stats.py unit tests; the "
    "approx twin here is gated by a tolerance flag like d35, never "
    "hash-compared directly.",
)
def d43(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepcell_data_engineering_spark.functions.stats import (
        grouped_quantiles,
    )

    qs = grouped_quantiles(
        _t(spark, sf_dir, "lineitem"),
        F.col("l_quantity"),
        ["l_returnflag"],
        [0.25, 0.5, 0.75],
        ["q25", "q50", "q75"],
        max_exact_group=None,
        approx_names=["a25", "a50", "a75"],
    )
    ok = (
        (F.abs(F.col("q25") - F.col("a25")) <= F.lit(1.0))
        & (F.abs(F.col("q50") - F.col("a50")) <= F.lit(1.0))
        & (F.abs(F.col("q75") - F.col("a75")) <= F.lit(1.0))
    )
    return qs.select(
        "l_returnflag", "q25", "q50", "q75", ok.alias("approx_ok")
    ).orderBy("l_returnflag")


@_q(
    "d44_null_semantics",
    """WITH o AS (
         SELECT o_orderkey, NULLIF(o_orderstatus, 'F') AS st
         FROM orders WHERE o_orderkey < 500
       )
       SELECT COALESCE(a.st, '(null)') AS status, COUNT(*) AS n_pairs
       FROM o a JOIN o b
         ON a.st IS NOT DISTINCT FROM b.st AND a.o_orderkey < b.o_orderkey
       GROUP BY a.st ORDER BY status""",
    doc="Tri-valued-logic parity: NULLIF manufactures NULLs, the join "
    "uses null-safe equality (<=> / IS NOT DISTINCT FROM — NULLs match "
    "each other, unlike '='), groups carry the NULL key, COALESCE "
    "renders it. Spark plans EqualNullSafe as a hash-join key, so the "
    "null-matching join is still an equi-join, not a nested loop.",
)
def d44(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("st"),
        )
    )
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            F.col("a.st").eqNullSafe(F.col("b.st"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .groupBy(F.col("a.st").alias("st"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(F.coalesce("st", F.lit("(null)")).alias("status"), "n_pairs")
        .orderBy("status")
    )


@_q(
    "d45_share_of_total",
    """WITH per_seg AS (
         SELECT c_mktsegment,
                SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment
       ),
       tot AS (SELECT SUM(rev_cents) AS total_cents FROM per_seg)
       SELECT c_mktsegment, CAST(rev_cents AS BIGINT) AS rev_cents,
              ROUND(CAST(rev_cents AS DOUBLE) / CAST(total_cents AS DOUBLE), 6)
                  AS share
       FROM per_seg CROSS JOIN tot ORDER BY c_mktsegment""",
    doc="Percent-of-total per market segment. Deliberately NOT the "
    "ratio_to_report window (SUM() OVER () forces every row through ONE "
    "task — the classic global-window scale killer): the total is a "
    "1-row aggregate of the already-tiny grouped relation, attached by "
    "broadcast. Revenue summed as exact integer cents (functions/"
    "stats.py posture) so the shares are bit-stable.",
)
def d45(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_seg = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("rev_cents")
        )
    )
    tot = per_seg.agg(F.sum("rev_cents").alias("total_cents"))
    return (
        per_seg.join(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "rev_cents",
            F.round(
                F.col("rev_cents").cast("double")
                / F.col("total_cents").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("c_mktsegment")
    )


@_q(
    "d46_try_cast",
    """SELECT TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
              TRY_CAST(substr(o_orderpriority, 3) AS BIGINT) AS junk,
              COUNT(*) AS n
       FROM orders
       GROUP BY prio_num, junk ORDER BY prio_num""",
    doc="Safe parsing under ANSI mode: try_cast yields NULL instead of "
    "failing the job on malformed input ('URGENT' etc.) — the posture "
    "for schema-on-read over dirty corpora, where one bad row must not "
    "kill a 100 TB scan. The numeric prefix parses; the word suffix "
    "NULLs out.",
)
def d46(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.substring("o_orderpriority", 1, 1)
            .try_cast("bigint")
            .alias("prio_num"),
            F.expr("TRY_CAST(substr(o_orderpriority, 3, 100) AS BIGINT)").alias(
                "junk"
            ),
            )
        .groupBy("prio_num", "junk")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prio_num")
    )


@_q(
    "d47_incremental_agg",
    """SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS rev_cents
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    doc="Incremental view maintenance: the Spark side never aggregates "
    "the full table in one pass — it merges yesterday's aggregate state "
    "(orderkey < 15000) with today's delta state (the rest) via "
    "functions/stats.py:merge_grouped_sums; the oracle IS the full "
    "recompute, so the hash match proves state-merge == recompute. "
    "Count/sum states are additive (exact integer cents), which is "
    "exactly why a 100 TB daily pipeline only ever scans the delta.",
)
def d47(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepcell_data_engineering_spark.functions.stats import (
        merge_grouped_sums,
    )

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"), F.sum(cents).alias("rev_cents")
        )

    old = state(o.where(F.col("o_orderkey") < 15000))
    delta = state(o.where(F.col("o_orderkey") >= 15000))
    return (
        merge_grouped_sums([old, delta], ["o_orderstatus"], ["n", "rev_cents"])
        .orderBy("o_orderstatus")
    )


@_q(
    "d48_apply_changes",
    """SELECT o_orderkey,
              CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END
                  AS o_orderstatus,
              o_totalprice
       FROM orders ORDER BY o_orderkey""",
    doc="CDC round trip (operators/diff.py): the Spark side never sees "
    "the new snapshot whole — it diffs old vs new (d42's fixture: "
    "pre-1996 baseline, every-97th-key mutation) and MERGE-applies the "
    "change feed onto the old snapshot; the oracle is the new snapshot "
    "computed directly. Hash equality proves diff->apply is lossless, "
    "the invariant incremental pipelines stand on.",
)
def d48(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepcell_data_engineering_spark.operators.diff import (
        apply_changes,
        snapshot_diff_with_payload,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    old = orders.where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    ).drop("o_orderdate")
    new = orders.drop("o_orderdate").withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    feed = snapshot_diff_with_payload(old, new, ["o_orderkey"])
    return apply_changes(old, feed, ["o_orderkey"]).orderBy("o_orderkey")


@_q(
    "d49_revenue_rollup",
    """SELECT n_name,
              date_trunc('month', o_orderdate) AS month,
              COUNT(*) AS n_items,
              CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
                   AS BIGINT) AS rev_c4
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       GROUP BY n_name, month
       ORDER BY n_name, month""",
    doc="TPC-H-Q5-shaped reporting rollup: fact-to-fact join on the "
    "shuffle key plus broadcast dims, monthly truncation, and revenue "
    "extprice*(1-discount) carried as EXACT integer (cents x discount "
    "basis points) so the 3-join aggregate stays hash-stable — float "
    "product sums would be partitioning-dependent. The biggest join "
    "(lineitem x orders) keys both sides on orderkey; everything "
    "smaller broadcasts.",
)
def d49(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("bigint")
    )
    # no hint on customer: it broadcasts at test SF via AQE but is a
    # real shuffle join at warehouse scale; nation (25 rows at any SF)
    # is hinted.
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).alias("rev_c4"),
        )
        .orderBy("n_name", "month")
    )
