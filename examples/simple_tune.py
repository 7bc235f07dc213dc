"""Hyperparameter search over distributed trials — the port of the
reference's examples/simple_tune.py (Ray Tune grid becomes the
ml.tuning grid; each trial is a distributed fit).

Run: python examples/simple_tune.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from xgboost_ray_spark import get_spark
from xgboost_ray_spark.ml.estimators import SparkXGBClassifier
from xgboost_ray_spark.ml.tuning import grid_search, param_grid
from xgboost_ray_spark.sources.readers import from_numpy


def main() -> None:
    spark = get_spark(app_name="example-tune")

    rng = np.random.default_rng(42)
    x = rng.normal(size=(2000, 6))
    y = ((x[:, 0] * x[:, 1] > 0) & (x[:, 2] > -0.5)).astype(int)
    df = from_numpy(spark, np.column_stack([x, y])).withColumnRenamed(
        "f6", "label"
    )

    grid = param_grid(max_depth=[2, 4, 6], learning_rate=[0.1, 0.3])
    res = grid_search(
        SparkXGBClassifier, df, "label", grid, metric="auc",
    )
    print(f"Best AUC {res.best_metric:.4f} with params {res.best_params}")
    for t in res.trials:
        print(f"  {t.params} -> {t.metric:.4f}")


if __name__ == "__main__":
    main()
