"""Train + evaluate a distributed GBT classifier — the port of the
reference's examples/simple.py (xgboost_ray examples/simple.py:10-46):
numpy features -> role-tagged matrix -> distributed train with an eval set
-> checkpoint the model.

Run: python examples/simple.py [--num-workers 2]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from xgboost_ray_spark import GBTParams, MatrixSpec, get_spark, predict, train
from xgboost_ray_spark.sources.readers import from_numpy


def main(num_workers: int) -> None:
    spark = get_spark(app_name="example-simple")

    # Synthetic binary task (the reference uses sklearn breast_cancer; this
    # container has no sklearn, so generate a learnable dataset).
    rng = np.random.default_rng(42)
    x = rng.normal(size=(2000, 8))
    y = (x[:, 0] + 2.0 * x[:, 3] - x[:, 5] > 0).astype(int)
    data = np.column_stack([x, y])

    df = from_numpy(spark, data)  # columns f0..f8
    df = df.withColumnRenamed("f8", "label")
    train_df, test_df = df.randomSplit([0.75, 0.25], seed=42)

    spec = MatrixSpec(label_cols=("label",))
    result = train(
        {"objective": "binary:logistic", "max_depth": 4, "eta": 0.3},
        train_df,
        spec,
        num_boost_round=10,
        evals=[(test_df, "eval")],
        gbt_params=GBTParams(
            num_workers=num_workers, max_restarts=0,
            checkpoint_path="/tmp/simple_gbt_model",
        ),
    )

    scored = predict(result, test_df, spec)
    from pyspark.sql import functions as F

    err = (
        scored.select(
            F.avg((F.col("prediction") != F.col("label")).cast("double"))
        ).first()[0]
    )
    print(f"Final validation error: {err:.4f}")
    print(f"Eval metrics: {result.evals_result}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-workers", type=int, default=2)
    main(parser.parse_args().num_workers)
