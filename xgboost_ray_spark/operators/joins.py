"""Join surface: inner / outer / semi / anti / broadcast, plus an as-of join.

SURVEY.md §2.2 S5-S8.  Strategy notes for 100 TB:

  - Fact-fact joins (lineitem x orders) shuffle on the join key; we select
    only the needed columns BEFORE the join so the shuffle carries minimal
    bytes, and AQE picks sort-merge vs shuffled-hash at runtime.
  - Dimension joins (nation, region, supplier, part at TPC-H proportions)
    are broadcast explicitly — zero shuffle of the fact side.
  - The as-of join (absent in Spark, common in event pipelines) composes
    union + window last_value, one shuffle on the partition key — no
    per-row UDFs, no cross product.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.registry import (
    DEC,
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
)


# ---------------------------------------------------------------------------
# S5 — Inner equi-join chain (lineitem ⋈ orders ⋈ customer) + agg
# ---------------------------------------------------------------------------
@register(
    "s05_inner_join",
    oracle=f"""
    SELECT
      c_mktsegment,
      o_orderpriority,
      COUNT(*) AS n_items,
      {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderpriority
    """,
    doc="3-way inner equi-join; columns pruned pre-join so the shuffle "
        "carries only join keys + 2 measures.",
    tags=("join",),
)
def s05_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n_items"), dsum(revenue, "revenue"))
    )


# ---------------------------------------------------------------------------
# S6 — Left / full outer joins
# ---------------------------------------------------------------------------
@register(
    "s06_outer_join",
    oracle="""
    SELECT
      c_custkey,
      COUNT(o_orderkey) AS n_orders,
      COALESCE(MAX(o_totalprice), 0.0) AS max_price
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 400000
    GROUP BY c_custkey
    """,
    doc="LEFT OUTER with a join-side residual predicate; customers with no "
        "qualifying orders survive with n_orders = 0.",
    tags=("join",),
)
def s06_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 400000)
    return (
        cust.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.max("o_totalprice"), F.lit(0.0)).alias("max_price"),
        )
    )


@register(
    "s06b_full_outer_join",
    oracle="""
    SELECT
      COALESCE(c.k, s.k) AS nationkey,
      COALESCE(c.n_cust, 0) AS n_cust,
      COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.k = s.k
    """,
    doc="FULL OUTER join of two aggregates (nations with only customers or "
        "only suppliers survive).",
    tags=("join",),
)
def s06b_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust.join(supp, cust.ck == supp.sk, "full").select(
        F.coalesce("ck", "sk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# S7 — Semi / anti joins
# ---------------------------------------------------------------------------
@register(
    "s07_semi_anti_join",
    oracle="""
    SELECT 'with_orders' AS op, c_custkey AS k FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'without_orders' AS op, c_custkey AS k FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="LEFT SEMI (EXISTS) and LEFT ANTI (NOT EXISTS); semi/anti never "
        "materialize the right side's columns — minimal shuffle width.",
    tags=("join",),
)
def s07_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = cust.c_custkey == orders.o_custkey
    semi = cust.join(orders, cond, "left_semi").select(
        F.lit("with_orders").alias("op"), F.col("c_custkey").alias("k")
    )
    anti = cust.join(orders, cond, "left_anti").select(
        F.lit("without_orders").alias("op"), F.col("c_custkey").alias("k")
    )
    return semi.unionAll(anti)


# ---------------------------------------------------------------------------
# S8 — Broadcast dimension join (star-schema pattern)
# ---------------------------------------------------------------------------
@register(
    "s08_broadcast_join",
    oracle=f"""
    SELECT
      r_name,
      n_name,
      COUNT(*) AS n_cust,
      {sql_davg("c_acctbal", "avg_bal")}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    doc="Explicit broadcast() of nation+region dims: the fact side never "
        "shuffles for the join — the pattern that survives 1000 executors.",
    tags=("join",),
)
def s08_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"), davg(F.col("c_acctbal"), "avg_bal"))
    )


# ---------------------------------------------------------------------------
# As-of join (custom operator; Spark has no native one)
# ---------------------------------------------------------------------------
def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` within the same ``on`` key.

    Implemented as union + window ``last_value(ignorenulls)`` ordered by
    time: one shuffle on ``on``, linear scan within partitions — no range
    cross-join blowup at scale.

    Correctness details a naive union+window spelling gets wrong (each
    was a real bug once):
      * right columns travel as ONE struct, so the attached values all
        come from the SAME right row — per-column last(ignorenulls)
        would backfill a NULL field from an older row, fabricating a
        row that never existed;
      * right rows with a NULL ``right_time`` are dropped up front —
        under nulls-first ascending order they would otherwise become a
        universal fallback match;
      * right rows with a NULL ``on`` key are dropped too: the window's
        partitionBy groups NULL keys into ONE partition, so they would
        match NULL-keyed left rows — a pair SQL equi-join semantics
        (NULL never equals NULL) must never produce. NULL-keyed left
        rows still come back, with NULL attached columns;
      * ``tiebreak`` columns (right-side) order right rows sharing the
        same (on, right_time); pass the right side's unique key for a
        deterministic result — the repo-wide determinism policy.
      * a ``right_cols`` name that already exists on the LEFT raises:
        the final attach is a withColumn, which would silently replace
        the left frame's own column (NULL when no match) — rename on
        the right side first.
    """
    clobbered = set(right_cols) & set(left.columns)
    if clobbered:
        raise ValueError(
            f"asof_join: right_cols {sorted(clobbered)} already exist on the "
            "left frame and would be silently replaced; alias them on the "
            "right side before joining"
        )
    left_types = dict(left.dtypes)
    right_types = dict(right.dtypes)  # one py4j schema fetch, not per column
    struct_cols = list(dict.fromkeys([*(tiebreak or []), *right_cols]))
    lt = left.select(
        on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[c for c in left.columns if c != on],
        F.lit(None)
        .cast(
            f"struct<{', '.join(f'{c}: {right_types[c]}' for c in struct_cols)}>"
        )
        .alias("__r"),
    )
    rt = right.filter(
        F.col(right_time).isNotNull() & F.col(on).isNotNull()
    ).select(
        on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left.columns if c != on],
        F.struct(*struct_cols).alias("__r"),
    )
    merged = lt.unionByName(rt)
    # __side separates rights (0) from lefts (1) at equal time — rights
    # first, so the as-of is inclusive (<=). The tiebreak then orders
    # right rows sharing (on, __t); the last one (max tiebreak) wins.
    # Left rows carry null tiebreak values but are already past the
    # __side key, so their relative order is irrelevant.
    order = [F.col("__t").asc(), F.col("__side").asc()] + [
        F.col("__r")[c].asc() for c in (tiebreak or [])
    ]
    w = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = merged.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    out = merged.filter(F.col("__side") == 1)
    for c in right_cols:
        out = out.withColumn(c, F.col("__r")[c])
    return out.drop("__t", "__side", "__r")


# ---------------------------------------------------------------------------
# Range (interval) join — custom operator; naive Spark planning would be a
# BroadcastNestedLoopJoin with a per-row range scan
# ---------------------------------------------------------------------------
DISCOUNT_BANDS = [
    ("none", 0.00, 0.02),
    ("low", 0.02, 0.03),
    ("mid", 0.03, 0.07),
    ("high", 0.07, 0.12),
]
_BIN_W = 0.01  # bin width for the fan-out equi-join


def range_join_bands(fact: DataFrame, value_col: str) -> DataFrame:
    """Interval join via bin fan-out: each band explodes to the fixed-width
    bins it overlaps; the fact side computes its bin directly — so the join
    is a broadcast EQUI-join on bin plus a residual range filter, instead of
    a nested-loop range probe per row. Works for arbitrary (unequal,
    overlapping) intervals; bin width trades fan-out vs residual
    selectivity."""
    spark = fact.sparkSession
    rows = []
    for name, lo, hi in DISCOUNT_BANDS:
        # math.floor, NOT int(): the fact side bins with F.floor (toward
        # -inf), so a band with a negative bound must too — int() truncates
        # toward zero and would skip the band's lowest bin, silently
        # dropping every fact row that lands in it.
        b = math.floor(lo / _BIN_W)
        while b * _BIN_W < hi:
            rows.append((name, lo, hi, b))
            b += 1
    bands = spark.createDataFrame(rows, ["band", "lo", "hi", "bin"])
    f = fact.withColumn("bin", F.floor(F.col(value_col) / _BIN_W).cast("bigint"))
    return (
        f.join(F.broadcast(bands), "bin")
        .filter((F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi")))
        .drop("bin", "lo", "hi")
    )


@register(
    "s08c_range_join",
    oracle=f"""
    WITH bands(band, lo, hi) AS (
      VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in DISCOUNT_BANDS)}
    )
    SELECT band, COUNT(*) AS n, {sql_dsum("l_extendedprice", "sum_price")}
    FROM lineitem JOIN bands
      ON l_discount >= lo AND l_discount < hi
    GROUP BY band
    """,
    doc="Range/interval join (custom; no native Spark op): discount bands "
        "of unequal width attach via bin fan-out + residual filter — a "
        "broadcast equi-join on the bin instead of a nested-loop range "
        "probe. At 100 TB the fact side never shuffles.",
    tags=("join", "custom"),
)
def s08c_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_extendedprice"
    )
    joined = range_join_bands(li, "l_discount")
    return joined.groupBy("band").agg(
        F.count("*").alias("n"),
        dsum(F.col("l_extendedprice"), "sum_price"),
    )


@register(
    "s08b_asof_join",
    oracle="""
    SELECT
      e.event_id,
      e.user_id,
      (
        SELECT MAX(o.o_orderkey)
        FROM orders o
        WHERE o.o_custkey = e.user_id
          AND o.o_orderdate = (
            SELECT MAX(o2.o_orderdate) FROM orders o2
            WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts
          )
      ) AS last_orderkey
    FROM events e
    WHERE e.event_id < 500
    """,
    doc="As-of join: each event picks the most recent order (by date, "
        "orderkey tiebreak) of the same user at or before the event time. "
        "Window-based composition — no native Spark op exists.",
    tags=("join", "custom"),
)
def s08b_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select("event_id", "user_id", "ts")
    )
    # Deterministic as-of via the reusable helper: latest o_orderdate <=
    # ts, max orderkey on date ties (tiebreak ascending -> last wins).
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.col("o_orderkey").alias("last_orderkey"),
    )
    out = asof_join(
        ev,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["last_orderkey"],
        tiebreak=["last_orderkey"],
    )
    return out.select("event_id", "user_id", "last_orderkey")


# ---------------------------------------------------------------------------
# TPC-H Q3 (shipping priority): selective 3-way join + agg + global top-10
# ---------------------------------------------------------------------------
Q3_CUTOFF = "1998-06-01"


@register(
    "s05c_tpch_q3",
    oracle=f"""
    SELECT
      l_orderkey,
      {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
      AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (o_orderpriority standing in for o_shippriority): "
        "segment + date filters push to both scans, and the final top-10 "
        "plans as TakeOrderedAndProject (per-partition top-k, 10-row "
        "merge) — the composite selective-join-aggregate every BI "
        "workload runs. The segment-pruned customer side is "
        "SF-proportional (1/5 of all customers), so it carries no "
        "broadcast hint: the static size estimate / AQE broadcast it at "
        "bench scale, while at 100 TB it shuffles on custkey — a forced "
        "broadcast of billions of rows would OOM every executor (same "
        "policy as s05d). Deterministic: l_orderkey tiebreak on equal "
        "revenue.",
    tags=("join", "agg"),
)
def s05c_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit(Q3_CUTOFF).cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# S5d — TPC-H Q5 shape: six-table join with a same-nation correlation
# ---------------------------------------------------------------------------
Q5_LO = "1996-01-01 00:00:00"
Q5_HI = "1998-01-01 00:00:00"


@register(
    "s05d_tpch_q5",
    oracle=f"""
    SELECT
      n_name,
      COUNT(*) AS n_items,
      {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '{Q5_LO}'
      AND o_orderdate <  TIMESTAMP '{Q5_HI}'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: six-table join where customer and supplier must "
        "share a nation (the correlation predicate that defeats naive join "
        "orders). Strategy for 100 TB: region->nation is the only forced "
        "broadcast (25 rows pruned to one region); supplier and customer "
        "are SF-proportional, so their joins are declared plainly and AQE "
        "picks broadcast vs shuffle from runtime sizes — at 100 TB they "
        "shuffle on their keys, at bench scale they auto-broadcast. Join "
        "order: orders(date-pruned) x customer first (the small "
        "fact-to-dim pair), then lineitem on orderkey, supplier last so "
        "the nation-equality predicate filters during the join, not "
        "after. Every input is column-pruned before any shuffle.",
    tags=("join", "agg"),
)
def s05d_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit(Q5_LO).cast("timestamp")
    hi = F.lit(Q5_HI).cast("timestamp")
    # Dimension chain first: region filter prunes nation to one region's
    # worth of keys — tiny, broadcast into the supplier join.
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n_items"), dsum(revenue, "revenue"))
    )


# ---------------------------------------------------------------------------
# S7 variant — correlated EXISTS subquery (TPC-H Q4 shape)
# ---------------------------------------------------------------------------
_Q4_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
"""


@register(
    "s07b_exists_subquery",
    oracle=_Q4_SQL,
    doc="TPC-H Q4 shape: correlated EXISTS subquery, expressed in SQL so "
        "Catalyst's RewritePredicateSubquery decorrelates it to a LEFT SEMI "
        "join on l_orderkey — the same shuffle profile as s07's explicit "
        "semi join. At 100 TB both sides shuffle once on the order key and "
        "the status/date predicates push into the scans; no per-row "
        "re-execution of the subquery ever happens. One SQL text serves "
        "Spark and the DuckDB oracle verbatim.",
    tags=("join", "subquery"),
)
def s07b_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xgboost_ray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


# ---------------------------------------------------------------------------
# S9 variant — correlated scalar subquery (TPC-H Q17 shape)
# ---------------------------------------------------------------------------
# The per-part average is accumulated in DECIMAL then divided as a double so
# Spark and DuckDB derive bit-identical thresholds (see registry.py notes).
_Q17_SQL = """
    SELECT p_brand, COUNT(*) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
             AS small_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,6)))
                           AS DOUBLE) / COUNT(l2.l_quantity))
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
    )
    GROUP BY p_brand
"""


@register(
    "s09f_scalar_subquery",
    oracle=_Q17_SQL,
    doc="TPC-H Q17 shape: correlated scalar aggregate subquery (per-part "
        "quantity threshold). Catalyst decorrelates it into ONE per-part "
        "aggregate of lineitem joined back on l_partkey — lineitem is "
        "scanned twice but the subquery never re-executes per row, so the "
        "cost at 100 TB is two scans + one shuffle on partkey, not "
        "O(rows) subqueries. Same SQL text runs on Spark and DuckDB.",
    tags=("agg", "subquery"),
)
def s09f_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xgboost_ray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


# ---------------------------------------------------------------------------
# S5 variant — TPC-H Q10: returned-item revenue, top 20 customers
# ---------------------------------------------------------------------------
Q10_LO = "1997-01-01"
Q10_HI = "1997-04-01"


@register(
    "s05e_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{Q10_LO}'
      AND o_orderdate <  TIMESTAMP '{Q10_HI}'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: who returned the most revenue last quarter. "
        "Date filter pushes into the orders scan (one quarter survives), "
        "returnflag filter into lineitem; nation broadcasts; the final "
        "top-20 is TakeOrderedAndProject — partial top-20 per partition, "
        "never a global sort. Deterministic tie-break on c_custkey keeps "
        "the LIMIT stable across engines.",
    tags=("join", "agg", "topk"),
)
def s05e_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit(Q10_LO).cast("timestamp")
    hi = F.lit(Q10_HI).cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# S6 variant — TPC-H Q13: customer order-count distribution (outer join)
# ---------------------------------------------------------------------------
@register(
    "s06d_outerjoin_histogram",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders. "
        "LEFT OUTER join keeps zero-order customers (COUNT(o_orderkey) "
        "skips their NULL rows); the first aggregate shares the join's "
        "c_custkey shuffle, and the histogram re-agg shuffles only "
        "(count, 1) pairs — bytes proportional to distinct counts, not "
        "rows. The non-join predicate rides in the join condition, so it "
        "filters the orders scan without turning the join inner.",
    tags=("join", "agg"),
)
def s06d_outerjoin_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# S12 variant — TPC-H Q18: large-quantity orders (HAVING + join back)
# ---------------------------------------------------------------------------
Q18_MIN_QTY = 250


@register(
    "s12b_having_join",
    oracle=f"""
    SELECT c_name, o_orderkey, o_totalprice, sum_qty
    FROM (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
               AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > {Q18_MIN_QTY}
    ) big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    doc="TPC-H Q18 shape: orders whose total quantity clears a threshold, "
        "with their customers. The HAVING aggregate reduces lineitem to a "
        "tiny key set BEFORE any join — at 100 TB the orders/customer "
        "joins see only qualifying keys (AQE broadcasts the survivor "
        "side), never the raw fact table. Quantity accumulates in "
        "DECIMAL so the threshold cut is bit-identical across engines.",
    tags=("agg", "having", "join"),
)
def s12b_having_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


# ---------------------------------------------------------------------------
# S4 variant — TPC-H Q19: disjunctive composite predicates
# ---------------------------------------------------------------------------
_Q19_PRED = """(
      (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 20 AND 30)
  )"""


@register(
    "s04b_disjunctive_pushdown",
    oracle=f"""
    SELECT COUNT(*) AS n_items,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_PRED}
    """,
    doc="TPC-H Q19 shape: an OR of cross-table conjunctions. Catalyst "
        "extracts the per-table residue of the disjunction — the brand/"
        "size OR-chain pushes into the part scan and the quantity "
        "OR-chain into lineitem — so both scans shrink before the join "
        "even though no single disjunct spans one table. The filtered "
        "part side is small enough to broadcast; the mixed predicate "
        "evaluates post-join only on survivors.",
    tags=("filter", "join"),
)
def s04b_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    joined = li.join(part, F.col("p_partkey") == F.col("l_partkey")).where(
        _Q19_PRED
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.agg(
        F.count("*").alias("n_items"), dsum(revenue, "revenue")
    )


# ---------------------------------------------------------------------------
# S7 variant — TPC-H Q22: rich-but-inactive customers (anti join)
# ---------------------------------------------------------------------------
Q22_CUTOFF = "2000-06-01"


@register(
    "s07c_inactive_customers",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS numcust,
           {sql_dsum("c_acctbal", "totacctbal")}
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF}'
      )
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no recent "
        "orders, by nation. The global average is ONE tiny aggregate "
        "broadcast back as a scan filter (never a per-row subquery); the "
        "NOT EXISTS is a LEFT ANTI join against date-pruned orders — at "
        "100 TB the anti side shrinks to the recent window before the "
        "shuffle. Decimal-accumulated average keeps the threshold "
        "bit-identical across engines.",
    tags=("join", "subquery", "agg"),
)
def s07c_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    threshold = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(davg(F.col("c_acctbal"), "avg_bal"))
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    rich = (
        cust.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    return (
        rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), dsum(F.col("c_acctbal"), "totacctbal"))
    )


# ---------------------------------------------------------------------------
# S5 variant — TPC-H Q7: bilateral shipping volume between two nations
# ---------------------------------------------------------------------------
Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_LO = "1996-01-01"
Q7_HI = "1998-01-01"


@register(
    "s05f_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           COUNT(*) AS n_items,
           {sql_dsum("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
          OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
        AND l_shipdate >= TIMESTAMP '{Q7_LO}'
        AND l_shipdate <  TIMESTAMP '{Q7_HI}'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: shipping volume between two specific nations by "
        "year. The nation filter is applied to BOTH dimension copies "
        "before their joins — only the 25-row nation dims carry "
        "broadcast hints; supplier and customer, though pruned to two "
        "nations, remain SF-proportional (hundreds of millions of rows "
        "at 100 TB), so their joins are declared plainly and AQE picks "
        "broadcast at bench scale vs key shuffle at 100 TB (s05d's "
        "policy). The fact tables meet in one orderkey shuffle and the "
        "bilateral OR-pair predicate evaluates on already-joined "
        "survivors, never as a cross filter.",
    tags=("join", "agg"),
)
def s05f_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit(Q7_LO).cast("timestamp")
    hi = F.lit(Q7_HI).cast("timestamp")
    nations = (Q7_NATION_A, Q7_NATION_B)
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nations)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select(F.col("n_nationkey"), F.col("n_name"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("n2_nationkey"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("n2_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select(
            "l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == Q7_NATION_A)
        & (F.col("cust_nation") == Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == Q7_NATION_B)
        & (F.col("cust_nation") == Q7_NATION_A)
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.count("*").alias("n_items"), dsum(volume, "revenue"))
    )


# ---------------------------------------------------------------------------
# S5 variant — TPC-H Q8: national market share within a region
# ---------------------------------------------------------------------------
Q8_REGION = "ASIA"
Q8_NATION = "NATION_3"
Q8_PTYPE = "PROMO"


@register(
    "s05g_tpch_q8",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CAST(nation_volume AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE)
             AS mkt_share
    FROM (
      SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             CASE WHEN n2.n_name = '{Q8_NATION}'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END
               AS nation_volume
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_PTYPE}'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: what share of a region's PROMO-part revenue did "
        "one supplier nation capture, per year. Eight-table join: the "
        "bounded dims (both nation copies, region) broadcast by hint; "
        "part (type-filtered) and supplier are SF-proportional, so their "
        "joins are unhinted — AQE broadcasts them at bench scale and "
        "shuffles them on their keys at 100 TB (s05d's policy). The two "
        "fact tables meet in a single orderkey shuffle. The share is a "
        "conditional aggregate — "
        "numerator and denominator accumulate in one pass over the "
        "joined rows in DECIMAL, and the final double division is "
        "IEEE-identical across engines, so the ratio is hash-stable.",
    tags=("join", "agg", "conditional"),
)
def s05g_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q8_PTYPE)
        .select("p_partkey")
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION
    )
    cust_nation = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_nationkey"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(cust_nation),
            F.col("c_nationkey") == F.col("cn_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("sn_nationkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    nation_volume = F.when(
        F.col("supp_nation") == Q8_NATION, F.col("volume_dec")
    ).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("volume_dec", volume)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .withColumn("nation_volume", nation_volume)
        .groupBy("o_year")
        .agg(
            (
                F.sum("nation_volume").cast("double")
                / F.sum("volume_dec").cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# S21 variant — TPC-H Q14: promotion revenue share for one ship-month
# ---------------------------------------------------------------------------
Q14_LO = "1997-01-01"
Q14_HI = "1997-02-01"


@register(
    "s21b_promo_revenue",
    oracle=f"""
    SELECT
      100.0 * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                    AS DECIMAL(28,6))) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(28,6))) AS DOUBLE)
        AS promo_revenue_pct
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '{Q14_LO}'
      AND l_shipdate <  TIMESTAMP '{Q14_HI}'
    """,
    doc="TPC-H Q14 shape: percentage of one month's revenue from PROMO "
        "parts. Ship-date range pushes into the lineitem scan (one month "
        "survives at any scale); part broadcasts; numerator and "
        "denominator are one conditional aggregate pass — the classic "
        "CASE-inside-SUM ratio. The 100.0 * decimal-sum / decimal-sum "
        "chain evaluates on identical doubles in both engines.",
    tags=("conditional", "agg", "join"),
)
def s21b_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit(Q14_LO).cast("timestamp")
    hi = F.lit(Q14_HI).cast("timestamp")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type").like("PROMO%"), revenue).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# S7 variant — TPC-H Q21 shape: sole at-fault supplier in multi-supplier
# orders (EXISTS + NOT EXISTS self-joins)
# ---------------------------------------------------------------------------
_Q21_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


@register(
    "s07d_sole_fault_supplier",
    oracle=_Q21_SQL,
    doc="TPC-H Q21 shape: suppliers who were the ONLY supplier with "
        "returned items in finished multi-supplier orders. The correlated "
        "EXISTS / NOT EXISTS pair decorrelates into a LEFT SEMI and a "
        "LEFT ANTI self-join of lineitem on l_orderkey, each carrying the "
        "suppkey-inequality as a join residual — three scans of lineitem "
        "co-partitioned on one orderkey shuffle, zero per-row subquery "
        "execution. The final top-20 is TakeOrderedAndProject. One SQL "
        "text serves Spark and DuckDB verbatim.",
    tags=("join", "subquery", "topk"),
)
def s07d_sole_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xgboost_ray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)


# ---------------------------------------------------------------------------
# S4 variant — TPC-H Q6: the canonical pushdown/scan-speed aggregate
# ---------------------------------------------------------------------------
Q6_LO = "1997-01-01"
Q6_HI = "1998-01-01"


@register(
    "s04c_tpch_q6",
    oracle=f"""
    SELECT COUNT(*) AS n_items,
           {sql_dsum("l_extendedprice * l_discount", "revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
      AND l_shipdate <  TIMESTAMP '{Q6_HI}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: forecast-revenue-change — the canonical scan-speed "
        "query. Every predicate is sargable and must reach the parquet "
        "scan (date range prunes row groups via min/max stats, discount/"
        "quantity filter what survives); the aggregate is one partial/"
        "final pair over two doubles. At 100 TB this query IS the scan: "
        "its cost bounds below every other lineitem query, which makes "
        "it the standard what-does-IO-cost yardstick. With this, every "
        "TPC-H shape expressible over the driver schema (no partsupp "
        "table, no shipmode/commitdate columns) has an entry: "
        "Q1,Q3-Q10,Q12-Q15,Q17-Q19,Q21,Q22 (Q9/Q12 adapted to the "
        "schema; Q2/Q11/Q16/Q20 need partsupp).",
    tags=("filter", "agg", "scan"),
)
def s04c_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit(Q6_LO).cast("timestamp")
    hi = F.lit(Q6_HI).cast("timestamp")
    filtered = li.filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.count("*").alias("n_items"),
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
    )


# ---------------------------------------------------------------------------
# S5 variant — TPC-H Q9 shape: product-line profit by nation and year
# ---------------------------------------------------------------------------
Q9_PART_WORD = "widget"


@register(
    "s05h_tpch_q9",
    oracle=f"""
    SELECT
      n_name,
      CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      {sql_dsum("l_extendedprice * (1 - l_discount)", "profit")}
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%{Q9_PART_WORD}%'
    GROUP BY n_name, o_year
    """,
    doc="TPC-H Q9 shape (profit = discounted revenue; the driver schema "
        "has no partsupp, so supply cost is absent): revenue of one "
        "product line grouped by supplier nation and order year. Plan "
        "strategy: the LIKE filter prunes part to a fraction, but part "
        "and supplier stay SF-proportional, so those joins are unhinted "
        "— AQE broadcasts them at bench scale and shuffles on their keys "
        "at 100 TB (s05d's policy); only the 25-row nation carries a "
        "broadcast hint. lineitem-orders is the only unavoidable "
        "fact-fact shuffle, keyed on l_orderkey. The year is extracted "
        "AFTER the join (cheap int expr), grouped as (25 nations x "
        "years) — a tiny final shuffle.",
    tags=("join", "agg"),
)
def s05h_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(Q9_PART_WORD))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(dsum(profit, "profit"))
    )


# ---------------------------------------------------------------------------
# S16 variant — TPC-H Q15: top supplier(s) by quarter revenue
# ---------------------------------------------------------------------------
Q15_LO = "1996-01-01"
Q15_HI = "1996-04-01"


@register(
    "s16b_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
        AND l_shipdate <  TIMESTAMP '{Q15_HI}'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: the supplier(s) with maximum revenue over one "
        "quarter — the classic view + scalar-subquery-max pattern. The "
        "revenue aggregate computes ONCE and is reused for both the max "
        "and the final filter (persist-free: the max is a one-row "
        "broadcast joined back, not a window over all suppliers, so no "
        "global single-partition sort exists in the plan). Ties all "
        "surface, exactly as the spec's WHERE = MAX does. The decimal-"
        "accumulated revenue makes the cross-engine equality exact.",
    tags=("join", "topk"),
)
def s16b_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit(Q15_LO).cast("timestamp")
    hi = F.lit(Q15_HI).cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# S21 variant — TPC-H Q12 shape: late shipments by priority class
# ---------------------------------------------------------------------------
Q12_LATE_DAYS = 90


@register(
    "s21c_tpch_q12",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape (the driver schema has no shipmode/commitdate, "
        "so 'late' = shipped more than 90 days after the order date and "
        "l_returnflag stands in for l_shipmode): conditional-aggregate "
        "split of late lines into high/low priority. The lateness "
        "predicate compares two columns from different tables, so it "
        "applies post-join — but both scans still prune to three "
        "columns each, and the CASE sums are one partial/final pair. "
        "CASTs pin the counts to BIGINT (DuckDB SUM(int) is HUGEINT).",
    tags=("join", "conditional", "agg"),
)
def s21c_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q12_LATE_DAYS} DAYS"
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
