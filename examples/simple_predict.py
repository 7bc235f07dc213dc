"""Load a checkpointed model and run distributed prediction — the port of
the reference's examples/simple_predict.py: model loads once, broadcasts to
executors, predictions stay a DataFrame column.

Run AFTER examples/simple.py: python examples/simple_predict.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from xgboost_ray_spark import MatrixSpec, get_spark, predict
from xgboost_ray_spark.sources.readers import from_numpy


def main() -> None:
    spark = get_spark(app_name="example-simple-predict")

    from pyspark.ml.classification import GBTClassificationModel

    model = GBTClassificationModel.load("/tmp/simple_gbt_model")

    rng = np.random.default_rng(7)
    x = rng.normal(size=(500, 8))
    df = from_numpy(spark, np.column_stack([x, np.zeros(len(x))]))
    df = df.withColumnRenamed("f8", "label")

    spec = MatrixSpec(label_cols=("label",))
    scored = predict(model, df, spec)
    scored.groupBy("prediction").count().show()


if __name__ == "__main__":
    main()
