"""Change-data-capture surface: snapshot merge (upsert/delete) + SCD2 history.

The reference engine has no mutation story at all (xgboost_ray is a trainer;
`matrix.py` only ever reads), but any 100 TB training-data pipeline needs
incremental maintenance of its source snapshots: apply a day's CDC feed
(inserts/updates/deletes) to the previous snapshot, and keep slowly-changing
history for point-in-time reproducibility of training sets.

Spark-first shapes:

  - MERGE is one full-outer shuffle join on the key, COALESCE picking the
    change row over the base row, with deletes filtered out. At 100 TB both
    sides shuffle once on the key — or zero times if the snapshot is stored
    bucketed by key (see tests/test_sources.py's bucketed-join audit); the
    CDC feed is usually small enough to broadcast, which AQE does on its own.
  - SCD2 is two window passes over the SAME (partition, order) spec, so
    Catalyst plans exactly one shuffle+sort on the entity key; run-boundary
    detection (lag) and interval close-out (lead) ride the same sorted
    partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.registry import register


# ---------------------------------------------------------------------------
# S6 variant — CDC upsert merge (full-outer join + coalesce)
# ---------------------------------------------------------------------------
@register(
    "s06c_cdc_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0
    ),
    changes AS (
      SELECT o_orderkey,
             o_totalprice * CAST(1.1 AS DOUBLE) AS c_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
           COALESCE(c.c_totalprice, b.o_totalprice) AS totalprice,
           CASE WHEN c.op IS NOT NULL THEN 'upsert' ELSE 'carry' END AS src
    FROM base b
    FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
    doc="MERGE INTO semantics without a table format: base snapshot "
        "full-outer-joined with a keyed change feed (op = U upsert / D "
        "delete); change rows win via COALESCE, deletes drop out, unmatched "
        "base rows carry forward. Deterministic synthetic feed derived "
        "from orders by key arithmetic so the oracle is exact. One shuffle "
        "on the merge key; a bucketed-by-key snapshot would make it zero.",
    tags=("cdc", "join"),
)
def s06c_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.filter(F.col("o_orderkey") % 3 != 0)
        .select("o_orderkey", "o_totalprice")
    )
    changes = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * F.lit(1.1)).alias("c_totalprice"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    # USING-style join key => a single coalesced o_orderkey output column.
    return (
        base.join(changes, "o_orderkey", "full_outer")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.coalesce("c_totalprice", "o_totalprice").alias("totalprice"),
            F.when(F.col("op").isNotNull(), F.lit("upsert"))
            .otherwise(F.lit("carry"))
            .alias("src"),
        )
    )


# ---------------------------------------------------------------------------
# S14 variant — SCD2 validity intervals from an event stream
# ---------------------------------------------------------------------------
# One definition of "the SCD2 history" for builders AND oracles: s14c
# publishes it, s14d reads state back out of it. Two hand-maintained
# copies drifted apart is exactly the failure mode the point-in-time
# entry exists to prevent ("rebuilt exactly as it stood at T").
SCD2_HIST_CTE = """
    WITH runs AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR LAG(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                       <> event_type
                  THEN 1 ELSE 0 END AS is_change
      FROM events
    ),
    hist AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM runs WHERE is_change = 1
    )
"""


def scd2_history(ev: DataFrame) -> DataFrame:
    """Collapse a (user_id, event_type, ts, event_id) stream into SCD2
    validity intervals: rows where the type changes open an interval
    (lag boundary detection), the next change closes it (lead). Both
    window passes share one (user_id; ts, event_id) spec, so the plan is
    a single shuffle+sort. Columns: user_id, event_type, valid_from,
    valid_to (NULL = still open)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_type = F.lag("event_type").over(w)
    chg = ev.withColumn(
        "is_change", prev_type.isNull() | (prev_type != F.col("event_type"))
    ).filter("is_change")
    return chg.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


@register(
    "s14c_scd2_intervals",
    oracle=f"""
    {SCD2_HIST_CTE}
    SELECT user_id, event_type,
           epoch_us(valid_from) AS valid_from_us,
           epoch_us(valid_to) AS valid_to_us,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_current
    FROM hist
    """,
    doc="SCD type-2 history build: collapse each user's event_type stream "
        "into validity intervals — rows where the type changes open an "
        "interval (lag boundary detection), the next change closes it "
        "(lead), the open interval is flagged current. Both window passes "
        "share one (user_id; ts, event_id) spec, so the plan is a single "
        "shuffle+sort; epoch-micros output keeps the oracle comparison "
        "integer-exact.",
    tags=("cdc", "window", "events"),
)
def s14c_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    hist = scd2_history(ev)
    return hist.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        F.when(F.col("valid_to").isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_current"),
    )


# ---------------------------------------------------------------------------
# S9 variant — incremental aggregate maintenance (partial-agg merge)
# ---------------------------------------------------------------------------
INC_CUTOFF = "2000-01-01"


@register(
    "s09g_incremental_agg",
    oracle="""
    SELECT o_orderpriority,
           -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas renders as
           -- float64 and the driver hash rejects against Spark's int64.
           CAST(SUM(n) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(total AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
           MAX(mx) AS max_price
    FROM (
      SELECT o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
               AS total,
             MAX(o_totalprice) AS mx
      FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
      GROUP BY o_orderpriority
      UNION ALL
      SELECT o_orderpriority, COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE),
             MAX(o_totalprice)
      FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      GROUP BY o_orderpriority
    )
    GROUP BY o_orderpriority
    """,
    doc="Incremental view maintenance by algebraic partial-agg merge: the "
        "historical aggregate (date < cutoff) and the day's delta "
        "aggregate (date >= cutoff) each reduce to per-key partials "
        "(count, decimal sum, max), then merge by summing counts/sums "
        "and maxing maxes — identical to re-aggregating the full table, "
        "proven by construction here. At 100 TB the historical partial "
        "is a few-KB stored table, so the daily cost is one scan of the "
        "DELTA only; the merge shuffles bytes proportional to distinct "
        "keys, never rows. Both branch aggregates push their date "
        "filter into the scan.",
    tags=("cdc", "agg", "incremental"),
)
def s09g_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit(INC_CUTOFF).cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    base = order_partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = order_partial(orders.filter(F.col("o_orderdate") >= cutoff))
    # The merge: algebraic combine of partial states — what a nightly job
    # does against a STORED base partial instead of recomputing it.
    return finalize_order_agg(merge_order_partials(base, delta))


def order_partial(df: DataFrame) -> DataFrame:
    """Per-priority partial state ``(n, total, mx)`` of an orders slice.
    ``total`` accumulates in DECIMAL(28,6) then stores as double — exact
    for money totals below ~9e9 (2^53/10^6), so merging partials is
    associative in that regime and a day's state can round-trip storage."""
    from xgboost_ray_spark.registry import dsum

    return df.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum(F.col("o_totalprice"), "total"),
        F.max("o_totalprice").alias("mx"),
    )


def merge_order_partials(*parts: DataFrame) -> DataFrame:
    """Combine partial states into a partial of the SAME shape, so the
    output can be stored and merged again next cycle (count-sum / decimal
    sum-of-sums / max-of-maxes — each algebraic)."""
    # unionByName: a partial read back from storage may carry its columns
    # in any order; a positional union would silently pair `total` with
    # `mx` (both doubles — no error, wrong report).
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    from xgboost_ray_spark.registry import dsum

    return merged.groupBy("o_orderpriority").agg(
        F.sum("n").alias("n"),
        dsum(F.col("total"), "total"),
        F.max("mx").alias("mx"),
    )


def finalize_order_agg(partial: DataFrame) -> DataFrame:
    """Present a partial state with the query's public column names."""
    return partial.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.col("total").alias("sum_price"),
        F.col("mx").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# S14 variant — point-in-time (as-of) snapshot from SCD2 history
# ---------------------------------------------------------------------------
AS_OF = "2024-01-15 00:00:00"


@register(
    "s14d_point_in_time",
    oracle=f"""
    {SCD2_HIST_CTE}
    SELECT user_id, event_type AS state_at_t
    FROM hist
    WHERE valid_from <= TIMESTAMP '{AS_OF}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{AS_OF}')
    """,
    doc="Point-in-time reconstruction: each user's state AS OF a wall "
        "time T, read from the SCD2 validity intervals (s14c's output "
        "shape) — the reproducibility primitive that lets a training set "
        "be rebuilt exactly as it stood at T. The interval predicate is "
        "sargable: against a stored history table partitioned on "
        "valid_from date, the scan prunes to intervals opened before T, "
        "and one row per user survives. Same single shuffle+sort as the "
        "history build; no join, no state explosion.",
    tags=("cdc", "window", "events"),
)
def s14d_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.lit(AS_OF).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    hist = scd2_history(ev)
    return hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("user_id", F.col("event_type").alias("state_at_t"))
