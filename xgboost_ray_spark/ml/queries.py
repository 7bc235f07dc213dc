"""Registry entries for the ML surface (S30, R18/R20/R31).

GBT training is seeded but not SQL-expressible, so these entries omit the
oracle (the driver records rows-only checks). The real correctness gate for
ML is the parity test suite (tests/test_ml.py): distributed training must
learn the reference's deterministic mapping with 100% accuracy — the
reference's own oracle pattern (tests/test_end_to_end.py:96-211).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.matrix import MatrixSpec
from xgboost_ray_spark.ml.params import GBTParams
from xgboost_ray_spark.ml.train import predict, train
from xgboost_ray_spark.registry import register

LINEITEM_FEATURES = [
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_linenumber",
]


def lineitem_training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem numeric features + derived binary label (FIXTURES.md B:
    label = l_returnflag = 'R', mirroring fixture A3's shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        *LINEITEM_FEATURES,
        (F.col("l_returnflag") == "R").cast("int").alias("label"),
    )


@register(
    "s30_gbt_train_predict",
    oracle=None,  # ML: tolerance/parity-checked in tests, rows-only here
    doc="Distributed GBT train (binary objective, 5 rounds) on lineitem + "
        "broadcast predict; returns the label x prediction confusion "
        "matrix. Parity with reference train/predict (main.py:1341,1810).",
    tags=("ml",),
)
def s30_gbt_train_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = lineitem_training_frame(spark, sf_dir)
    spec = MatrixSpec(label_cols=("label",), feature_cols=tuple(LINEITEM_FEATURES))
    result = train(
        {"objective": "binary:logistic", "max_depth": 4, "eta": 0.3},
        df,
        spec,
        num_boost_round=5,
        gbt_params=GBTParams(num_workers=2, seed=42),
    )
    scored = predict(result, df, spec)
    return (
        scored.groupBy(
            F.col("label").cast("int").alias("label"),
            F.col("prediction").cast("int").alias("prediction"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "s30b_ltr_rank",
    oracle=None,  # ML: rows-only here; monotonicity asserted in tests/test_ml.py
    doc="Learning-to-rank (R31 ranker / R15 qid clustering): orders grouped "
        "by customer as query groups, relevance = price tier; trains the "
        "ranker and returns per-group counts of correctly-ordered "
        "(hi > lo) score pairs. Parity: sklearn.py:921-1083.",
    tags=("ml", "ranking"),
)
def s30b_ltr_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xgboost_ray_spark.ml.estimators import SparkXGBRanker

    orders = load_table(spark, sf_dir, "orders")
    # Query groups = customers with >= 3 orders; relevance = price rank tier.
    df = orders.select(
        F.col("o_custkey").alias("qid"),
        F.col("o_totalprice").alias("f_price"),
        F.dayofmonth("o_orderdate").cast("double").alias("f_day"),
        (F.col("o_totalprice") > 200000).cast("int").alias("rel"),
    )
    est = SparkXGBRanker(n_estimators=10, max_depth=3)
    est.fit(df, "rel", qid_col="qid")
    scored = est.predict(df)
    return (
        scored.groupBy("rel")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("prediction"), 4).alias("avg_score"),
        )
        .orderBy("rel")
    )


# ---------------------------------------------------------------------------
# S30c/d — closed-form linear model: the sufficient-statistics train path
# ---------------------------------------------------------------------------
_OLS_STATS_SQL = """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6)))
                AS DOUBLE) AS sxy,
           CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))
                AS DOUBLE) AS sxx
    FROM lineitem GROUP BY l_returnflag
"""


def ols_coefficients(li: DataFrame) -> DataFrame:
    """Per-returnflag simple linear regression l_extendedprice ~ l_quantity
    via the normal equations over sufficient statistics.

    This IS how linear models train at 100 TB: ONE partial-aggregated pass
    reduces the data to per-group (n, Sx, Sy, Sxy, Sxx) — bytes
    proportional to groups, never rows — and the solve is arithmetic on
    those scalars. The sums accumulate in DECIMAL(28,6) (exact for
    integral quantities x 2dp prices), so unlike iterative fitters the
    learned coefficients are bit-reproducible across engines, partition
    layouts and cluster sizes. Slope/intercept are continuous values,
    rounded to 6dp for the hash. Reference analogue: train() reduces
    gradients with allreduce (main.py:1341); here the 'allreduce' is
    Spark's partial aggregation.
    """
    from xgboost_ray_spark.registry import dsum

    stats = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum(F.col("l_quantity"), "sx"),
        dsum(F.col("l_extendedprice"), "sy"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice"), "sxy"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), "sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    return stats.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@register(
    "s30c_linear_model_train",
    oracle=f"""
    WITH s AS ({_OLS_STATS_SQL})
    SELECT l_returnflag, n,
           ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
           ROUND((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6)
             AS intercept
    FROM s
    """,
    doc="Distributed model training with an EXACT oracle: per-group OLS "
        "(price ~ quantity) solved from sufficient statistics — one "
        "partial-agg pass, decimal-exact sums, closed-form solve. The "
        "hash-checkable member of the ML family (GBT entries are "
        "rows-only: tree fitting is not SQL-expressible).",
    tags=("ml", "train"),
)
def s30c_linear_model_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return ols_coefficients(li)


@register(
    "s30d_linear_model_score",
    oracle=f"""
    WITH s AS ({_OLS_STATS_SQL}),
    m AS (
      SELECT l_returnflag,
             (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
             (sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n AS intercept
      FROM s
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(sqrt(SUM((l.l_extendedprice
                           - (m.intercept + m.slope * l.l_quantity))
                          * (l.l_extendedprice
                             - (m.intercept + m.slope * l.l_quantity)))
                      / COUNT(*)), 4) AS rmse
    FROM lineitem l JOIN m USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    doc="Distributed scoring of the trained linear model: the per-group "
        "coefficients (a few rows) BROADCAST back onto the fact scan — "
        "the train->predict round trip of the reference (broadcast "
        "booster, main.py:1750-1806) with a closed-form model, so even "
        "the predictions are oracle-checkable. Emits per-group RMSE; "
        "residual float sums are continuous, rounded to 4dp.",
    tags=("ml", "predict"),
)
def s30d_linear_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    from xgboost_ray_spark.registry import dsum

    stats = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum(F.col("l_quantity"), "sx"),
        dsum(F.col("l_extendedprice"), "sy"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice"), "sxy"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), "sxx"),
    )
    slope = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    model = stats.select(
        "l_returnflag",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )
    resid = F.col("l_extendedprice") - (
        F.col("intercept") + F.col("slope") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(model), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sqrt(F.sum(resid * resid) / F.count("*")), 4).alias(
                "rmse"
            ),
        )
    )
