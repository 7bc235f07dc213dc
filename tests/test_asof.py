"""Unit tests for the reusable as-of join — each case is a bug the naive
union+window spelling had: chimera fills from mixed right rows, NULL
right-times acting as universal matches, and nondeterministic time ties."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from xgboost_ray_spark.operators.joins import asof_join


def _left(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "lt", "lid"])
    )


def _right(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "rt", "price", "qty"]).astype(
            {"price": "float64"}
        )
    )


def test_attached_values_come_from_one_right_row(spark):
    """A NULL field in the matched right row must stay NULL — not be
    backfilled from an older right row (the per-column last(ignorenulls)
    chimera)."""
    left = _left(spark, [(1, 3, 100)])
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1], "rt": [1, 2], "price": [10.0, 20.0],
             "qty": [5.0, None]}
        )
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["price", "qty"], tiebreak=["rt"],
    ).collect()
    assert len(out) == 1
    assert out[0].price == 20.0
    assert out[0].qty is None, "qty must come from the t=2 row (NULL)"


def test_null_right_time_never_matches(spark):
    """A right row with NULL time is not 'earliest' — it matches nothing."""
    left = _left(spark, [(1, 5, 100)])
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rt": [None, 7], "price": [99.0, 1.0],
                      "qty": [0.0, 0.0]})
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["price"], tiebreak=["rt"],
    ).collect()
    assert len(out) == 1
    # rt=7 > lt=5 and rt=NULL is dropped -> no match at all.
    assert out[0].price is None


def test_null_keys_never_match_each_other(spark):
    """NULL join keys must not pair up: W.partitionBy groups NULL keys
    into ONE window partition, so without the right-side isNotNull guard
    a NULL-keyed right row would attach to a NULL-keyed left row — a
    match SQL equi-join semantics (NULL never equals NULL) forbids. The
    NULL-keyed left row still comes back, with NULL attachments."""
    left = spark.createDataFrame(
        [(None, 5, 100), (1, 5, 101)], "k int, lt int, lid int"
    )
    right = spark.createDataFrame(
        [(None, 1, 99.0, 0.0), (1, 2, 10.0, 0.0)],
        "k int, rt int, price double, qty double",
    )
    out = {
        r.lid: r
        for r in asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            right_cols=["price"], tiebreak=["rt"],
        ).collect()
    }
    assert len(out) == 2, "NULL-keyed left rows must be preserved"
    assert out[100].price is None, "NULL key matched a NULL-keyed right row"
    assert out[101].price == 10.0


def test_time_ties_break_deterministically(spark):
    """Right rows sharing (k, rt) must resolve by the tiebreak column —
    identical results under any partitioning."""
    left = _left(spark, [(1, 5, 100)])
    rows = [(1, 5, float(p), 0.0) for p in (7, 3, 9, 1)]
    right = _right(spark, rows)
    for parts in (1, 4, 7):
        out = asof_join(
            left.repartition(parts), right.repartition(parts),
            on="k", left_time="lt", right_time="rt",
            right_cols=["price"], tiebreak=["price"],
        ).collect()
        assert out[0].price == 9.0, "max tiebreak value must win"


def test_inclusive_boundary_and_basic_attach(spark):
    """rt == lt matches (as-of is <=); the latest earlier row wins."""
    left = _left(spark, [(1, 2, 100), (1, 10, 101), (2, 1, 102)])
    right = _right(
        spark, [(1, 2, 20.0, 0.0), (1, 7, 70.0, 0.0), (2, 5, 50.0, 0.0)]
    )
    out = {
        r.lid: r.price
        for r in asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            right_cols=["price"], tiebreak=["rt"],
        ).collect()
    }
    assert out == {100: 20.0, 101: 70.0, 102: None}


def test_right_cols_colliding_with_left_raise(spark):
    """A right_cols name already on the left would be silently replaced
    by the attach withColumn (NULL when no match) — the helper must fail
    loud instead."""
    import pytest

    left = spark.createDataFrame(
        pd.DataFrame([(1, 3, 9.0)], columns=["k", "lt", "price"])
    )
    right = _right(spark, [(1, 2, 10.0, 5.0)])
    with pytest.raises(ValueError, match="already exist on the left"):
        asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            right_cols=["price"], tiebreak=["rt"],
        )


def test_range_join_bands_exact_edges_match_pure_python(spark):
    """range_join_bands pinned at every band edge: a value exactly at a
    band's lower bound joins that band (inclusive lo), a value exactly at
    the upper bound joins the NEXT band only (half-open hi — adjacent
    bands never double-attach), values outside every band drop, and
    values exactly on interior bin multiples (the fan-out lattice) attach
    once, never once per bin. Verified against a pure-Python evaluation
    of the [lo, hi) definition."""
    from xgboost_ray_spark.operators.joins import (
        DISCOUNT_BANDS,
        range_join_bands,
    )

    edges = sorted({b for _, lo, hi in DISCOUNT_BANDS for b in (lo, hi)})
    values = sorted(
        set(
            edges  # every lo/hi exactly
            + [e - 1e-9 for e in edges]  # a hair under each edge
            + [0.01, 0.04, 0.05, 0.10]  # interior bin-lattice multiples
            + [-0.005, 0.12, 0.99]  # outside every band
        )
    )
    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "id long, v double"
    )
    got = {
        (r["id"], r["band"]) for r in range_join_bands(fact, "v").collect()
    }
    want = {
        (i, name)
        for i, v in enumerate(values)
        for name, lo, hi in DISCOUNT_BANDS
        if lo <= v < hi
    }
    assert got == want, (
        f"missing={sorted(want - got)} extra={sorted(got - want)}"
    )
    # each in-band value attached exactly once (no per-bin duplicates)
    assert len(got) == len({i for i, _ in got})
