"""Sink writers — the output half of the source/sink surface.

The reference's only persistent output is the checkpointed booster
(main.py:612-626); data-shaped outputs stay in the object store. A 100 TB
pipeline needs real sinks, so these provide the Spark-native write surface
with scale-safe defaults:

  - partitioned parquet (the lakehouse default): ``partition_by`` for
    pruning, optional bucketing for co-located downstream joins
  - csv/json for interchange
  - ``mode`` passthrough (error/overwrite/append/ignore)

Every writer takes ``max_records_per_file`` so output files stay bounded —
the classic small-file/giant-file guardrails at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def _base(df: DataFrame, mode: str, max_records_per_file: int | None):
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    return w


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    partition_by: Sequence[str] | None = None,
    compression: str = "snappy",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink. ``partition_by`` columns become directory
    partitions — downstream scans prune them for free."""
    w = _base(df, mode, max_records_per_file).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "error",
    format: str = "parquet",
) -> None:
    """Bucketed managed table: pre-shuffles on ``bucket_cols`` once at write
    so downstream equi-joins/aggregations on those keys skip their shuffle
    entirely — the co-located-join strategy for repeated 100 TB joins."""
    w = df.write.mode(mode).format(format).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    header: bool = True,
    max_records_per_file: int | None = None,
) -> None:
    _base(df, mode, max_records_per_file).option("header", header).csv(path)


def write_json(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    max_records_per_file: int | None = None,
) -> None:
    _base(df, mode, max_records_per_file).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    partition_by: Sequence[str] | None = None,
    compression: str = "zlib",
    max_records_per_file: int | None = None,
) -> None:
    """ORC sink — symmetric with sources.readers.read_orc (the reference's
    format breadth, data_sources/__init__.py:13-24, covered read AND
    write)."""
    w = _base(df, mode, max_records_per_file).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
