"""xgboost_ray_spark — a PySpark-native distributed ML / data-processing engine.

Re-expresses the capability surface of ray-project/xgboost_ray (distributed
gradient-boosted-tree training/prediction/ranking over sharded dataframes,
multi-format ingestion, fault-tolerant iteration) idiomatically on Apache
Spark: DataFrame/SQL for the relational substrate, Arrow/pandas-UDFs for the
Python hot path, barrier execution for collective training, Structured
Streaming for streams.

Reference parity map (cites into /root/reference):
  - ``RayDMatrix`` (xgboost_ray/matrix.py:697)      -> :class:`MatrixSpec`
  - ``train`` / ``predict`` (xgboost_ray/main.py:1341,1810)
                                                     -> :func:`train` / :func:`predict`
  - ``RayParams`` (xgboost_ray/main.py:450)          -> :class:`GBTParams`
  - ``RayShardingMode`` (xgboost_ray/matrix.py:106)  -> :class:`ShardingMode`
  - sklearn estimators (xgboost_ray/sklearn.py:451-1083)
                                                     -> :mod:`xgboost_ray_spark.ml.estimators`

Everything relational (joins, aggregates, windows, dedup, similarity search,
text analysis) is declared through the DataFrame API so Catalyst handles
pushdown, pruning, join selection and AQE — see ``operators/``.
"""

from xgboost_ray_spark.matrix import MatrixSpec, ShardingMode, combine_data
from xgboost_ray_spark.ml.params import GBTParams
from xgboost_ray_spark.ml.train import predict, train
from xgboost_ray_spark.session import get_spark
from xgboost_ray_spark.version import __version__

__all__ = [
    "MatrixSpec",
    "ShardingMode",
    "GBTParams",
    "combine_data",
    "train",
    "predict",
    "get_spark",
    "__version__",
]
