"""Query registry: one entry per declared operator (SURVEY.md §2.2).

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the equivalent
ANSI-SQL oracle string for DuckDB.  The driver (and ``tests/test_oracle.py``)
runs both sides and compares row counts, schemas and order-insensitive value
hashes — so builders MUST alias every computed column to the same name the
oracle uses, and float arithmetic goes through :func:`dsum`-style
exact-decimal accumulation so both engines produce bit-identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver records a weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()


QUERIES: dict[str, QuerySpec] = {}

_SHIPPED_APPS: set[str] = set()

# Runtime-settable confs every builder needs regardless of who constructed the
# SparkSession (the driver harness passes a bare one). Anything requiring a
# JVM restart (driver memory, UI) stays in session.get_spark; these are the
# correctness-critical subset that spark.conf.set can apply live.
_RUNTIME_CONF = {
    # events.parquet stores TIMESTAMP(NANOS) — unreadable without this.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Bit-stable timestamps vs the DuckDB oracle on any host timezone.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
}


def prepare_session(spark: SparkSession) -> None:
    """Apply runtime-settable engine confs to an externally built session."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf may be restricted on some deployments; never fail a query


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to Python workers via ``addPyFile``.

    Operators built on mapInPandas/applyInPandas reference module-level
    functions, which cloudpickle serializes *by reference* — the worker must
    be able to ``import xgboost_ray_spark`` regardless of the driver
    process's cwd/sys.path. On a real cluster this is exactly how the
    package deploys (py-files); in local mode it is a no-op-cost guard.
    """
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED_APPS:
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"xgboost_ray_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "xgboost_ray_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED_APPS.add(app)


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare_session(spark)
            ensure_workers_can_import(spark)
            return fn(spark, sf_dir)

        build.__name__ = fn.__name__
        build.__doc__ = fn.__doc__
        QUERIES[name] = QuerySpec(
            name=name, build=build, oracle=oracle, doc=doc, tags=tags
        )
        return fn

    return _wrap


# ---------------------------------------------------------------------------
# Cross-engine numeric stability helpers
#
# SUM over doubles is order-dependent; Spark and DuckDB would differ in the
# last ulps and break value-hash comparison.  Accumulating in DECIMAL is
# exact and associative, so both engines agree bit-for-bit, and the final
# decimal -> double cast is correctly-rounded-nearest in both.
#
# Deliberately NO final round(): engine ROUND(double) disagrees across
# engines at decimal midpoints (Spark rounds the double's shortest decimal
# repr, DuckDB the true binary value), and money data (2-decimal inputs,
# <=6-decimal products) lands on exact midpoints. Casting the expression to
# DECIMAL(28,6) is exact for this data, so no rounding step is needed at
# all. round() remains fine for genuinely continuous values
# (transcendentals, cosine sims) where midpoints have measure zero.
# ---------------------------------------------------------------------------

DEC = "decimal(28,6)"


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal SUM -> double (no rounding; see note above)."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Exact decimal SUM -> double, / COUNT (IEEE division is identical
    across engines given identical operands)."""
    total = F.sum(col.cast(DEC)).cast("double")
    return (total / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return the registry."""
    # Imports live here (not module top) to avoid circulars: operator modules
    # import ``register`` from this module.
    from xgboost_ray_spark.operators import (  # noqa: F401
        dedup,
        joins,
        multimodal,
        profile,
        relational,
        sampling,
        similarity,
        skew,
        text,
        windows,
    )
    from xgboost_ray_spark import streaming as _streaming  # noqa: F401
    from xgboost_ray_spark.streaming import queries as _squeries  # noqa: F401
    from xgboost_ray_spark.ml import queries as _mlqueries  # noqa: F401

    return dict(QUERIES)
