"""Learning-to-rank with query groups — the port of the reference's ranking
example (examples in sklearn.py:921-1083 / simple ranking tests): qid-tagged
rows, per-group ordering learned by the ranker.

Run: python examples/simple_ranking.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from xgboost_ray_spark import get_spark
from xgboost_ray_spark.ml.estimators import SparkXGBRanker


def main() -> None:
    spark = get_spark(app_name="example-ranking")

    rng = np.random.default_rng(42)
    rows = []
    for qid in range(100):
        for rel in (0, 1, 2):
            f1 = rel + rng.normal(scale=0.1)
            f2 = rng.normal()
            rows.append((int(qid), float(f1), float(f2), int(rel)))
    df = spark.createDataFrame(rows, ["qid", "f1", "f2", "rel"])

    est = SparkXGBRanker(n_estimators=20, max_depth=3)
    est.fit(df, "rel", qid_col="qid")

    from pyspark.sql import functions as F

    scored = est.predict(df)
    agreement = (
        scored.groupBy("qid")
        .agg(
            F.max(F.when(F.col("rel") == 2, F.col("prediction"))).alias("hi"),
            F.max(F.when(F.col("rel") == 0, F.col("prediction"))).alias("lo"),
        )
        .select(F.avg((F.col("hi") > F.col("lo")).cast("double")))
        .first()[0]
    )
    print(f"Fraction of groups ranked correctly (hi > lo): {agreement:.3f}")


if __name__ == "__main__":
    main()
