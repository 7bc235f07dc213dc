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
