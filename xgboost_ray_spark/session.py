"""SparkSession factory tuned for the engine.

Defaults are scale-aware: AQE on (runtime re-plan + skew-join handling),
shuffle partitions sized to cores for local mode (a cluster deployment
overrides via ``extra_conf`` or ``spark-defaults``), Arrow enabled for every
pandas interchange, UTC session timezone so results compare bit-stable
against external engines (DuckDB oracle, parquet readers).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # 128 MB input splits: keeps task count proportional to data, not files.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.ui.enabled": "false",
    # Older events fixtures stored TIMESTAMP(NANOS); Spark has no nanos type,
    # so read as long and convert in the catalog (DuckDB truncates ns->us the
    # same way).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Testdata timestamps are naive (isAdjustedToUTC=false) micros; read them
    # as UTC instants so event-time functions and pushdown work off the scan.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
}


def get_spark(
    app_name: str = "xgboost_ray_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or all cores) so the
    same entry points run in tests and in the driver harness; on a real
    cluster the caller passes its own master / relies on spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    master = master or f"local[{cpus}]"
    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
