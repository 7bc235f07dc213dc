"""Local twin of the driver's DuckDB-oracle comparison.

Mirrors the t2 contract: run the Spark query and the oracle SQL on the same
parquet tables, then compare row count, column-name set, and values after
sorting columns by name and rows by all columns. Values must match EXACTLY
(the driver hashes them) — floats included, which is why query builders
route arithmetic through decimal accumulation + rounding.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import pandas as pd

from xgboost_ray_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _normalize_cell(v):
    """Normalize a cell to a ``(kind, value)`` tag pair.

    The kind tag makes the comparison TYPE-STRICT, matching the driver's
    string-hash semantics where ``0`` (int64) and ``0.0`` (float64) hash
    differently. Round 3 shipped a red driver row (s33) precisely because
    the old comparator used Python ``==``, under which ``0 == 0.0`` — an
    oracle whose DuckDB HUGEINT window sum leaked float64 passed locally
    and failed the driver. Kinds: null / bool / int / float / str / ts /
    bytes / seq. ``bool`` is tagged before ``int`` (bool subclasses int in
    Python, and "True" vs "1" hash differently driver-side).
    """
    if v is None or v is pd.NaT:
        return ("null", None)
    if isinstance(v, decimal.Decimal):
        # Both engines emit Decimal only when the query builder casts to
        # an explicit DECIMAL type; scale is part of the contract.
        return ("dec", str(v))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            # DELIBERATE looseness: NaN folds into the null tag because
            # pandas erases the NULL/NaN distinction in float64 columns on
            # BOTH sides (toPandas and fetchdf render NULL doubles as NaN)
            # — tagging NaN distinctly would false-fail legitimately-NULL
            # double columns. The cost: a builder that truly emits NaN
            # where the oracle emits NULL passes here; the repo convention
            # (no NaN-producing expressions — DECIMAL money sums, guarded
            # divisions) is what actually keeps that case out.
            return ("null", None)
        # repr, not the float itself: driver-faithful (it hashes the string
        # form, under which -0.0 != 0.0 while Python's == calls them equal)
        # and consistent with the repr-based row sort below — a numeric
        # cell value would let equal-under-== rows sort differently per
        # side and report spurious mismatches.
        return ("float", repr(v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    if hasattr(v, "isoformat"):
        # Unify date vs midnight-datetime (pandas coerces DATE columns to
        # datetime64; Spark keeps datetime.date) — both sides normalize the
        # same way, so comparison stays sound.
        return ("ts", pd.Timestamp(v).isoformat())
    if isinstance(v, (list, tuple)):
        return ("seq", tuple(_normalize_cell(x) for x in v))
    if type(v).__module__ == "numpy":
        # DuckDB fetchdf materializes LIST columns as numpy arrays and
        # scalars as numpy types; fold both into plain Python so cell
        # equality is well-defined. numpy integer/floating kinds collapse
        # to the same tags as their Python scalars via .item().
        if getattr(v, "ndim", 0):
            return ("seq", tuple(_normalize_cell(x) for x in v.tolist()))
        return _normalize_cell(v.item())
    return (type(v).__name__, v)


def normalize_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_normalize_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    # repr is an injective deterministic key over the tagged cells, so
    # equal multisets always sort identically on both sides (a collision-
    # prone key could pair equal rows in different orders).
    return sorted(rows, key=repr)


def compare(spark_df, oracle: str, sf_dir: str) -> None:
    spark_pdf = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = normalize_frame(spark_pdf)
    d_rows = normalize_frame(duck_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)}/{len(s_rows)} rows differ; first 3: {mismatches[:3]}"
    )
