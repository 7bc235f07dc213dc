"""Failure-mode guards for the profiling kernels.

The integer 3-sigma predicate (``exact_outlier_flags``) is exact only
while its cross-multiplied terms fit DECIMAL(38,0). Past that bound the
two engines used to diverge in failure MODE: DuckDB's HUGEINT errors
loudly while Spark's non-ANSI decimal yields NULL — which made the
comparison false and silently unflagged real outliers. These tests pin
the fix: in-range inputs still produce the exact mask, and overflow now
raises on the Spark side too (fails closed, matching the oracle).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xgboost_ray_spark.operators.profile import exact_outlier_flags


def test_outlier_flags_exact_in_range(spark):
    # Max attainable z-score in a group is (n-1)/sqrt(n), so a single
    # spike needs n >= 11 to clear 3 sigma: 12 zeros + one 1000 gives
    # z = 923/277 = 3.33.
    rows = [("g", 0)] * 12 + [("g", 1000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        (r.v, r.is_outlier)
        for r in exact_outlier_flags(df, "grp", "v").collect()
    }
    assert (1000, True) in got
    assert (0, False) in got


def test_outlier_flags_overflow_raises_not_silently_unflags(spark):
    # dev = n*v - s1 = 3*5e18 - 5e18 = 1e19; dev^2 = 1e38 overflows
    # DECIMAL(38,0) (max 1e38 - 1). Must raise in BOTH session modes, not
    # return is_outlier False/NULL:
    #   * ANSI on (Spark 4 default): Spark's own decimal-overflow error;
    #   * ANSI off (legacy sessions): overflow yields NULL, and the
    #     kernel's explicit guard converts that to a loud raise_error —
    #     the mode the DuckDB oracle divergence was about.
    big = 5 * 10**18
    rows = [("g", big), ("g", -big), ("g", big)]
    df = spark.createDataFrame(rows, "grp string, v long")
    with pytest.raises(Exception, match="overflow|OUT_OF_RANGE|OVERFLOW"):
        exact_outlier_flags(df, "grp", "v").collect()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="DECIMAL\\(38,0\\) overflow"):
            exact_outlier_flags(df, "grp", "v").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_outlier_flags_null_values_do_not_trip_the_guard(spark):
    # NULL inputs legitimately produce NULL predicate sides; the overflow
    # guard must not mistake them for overflow.
    rows = [("g", 0)] * 12 + [("g", 1000), ("g", None)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = exact_outlier_flags(df, "grp", "v")
    flags = {r.v: r.is_outlier for r in out.collect()}
    assert flags[None] is None
    assert flags[1000] is True


def test_outlier_flags_n_counts_only_non_null_values(spark):
    """n must be COUNT(value), not COUNT(*): S1/S2 skip NULLs, so an
    inflated n computes wrong mean/stddev — group {0, 10, NULL x 98} has
    true stats over 2 values (z(10) ~= 0.71, NOT an outlier), but with
    n=100 the integer predicate flags 10 as a 3-sigma outlier."""
    rows = [("g", 0), ("g", 10)] + [("g", None)] * 98
    df = spark.createDataFrame(rows, "grp string, v long")
    flags = {
        r.v: r.is_outlier
        for r in exact_outlier_flags(df, "grp", "v").collect()
    }
    assert flags[10] is False
    assert flags[0] is False


def test_s32b_empty_snapshot_reports_zero_not_null(spark, tmp_path):
    """Admission-gate degenerate case (round-5 ADVICE): an EMPTY snapshot
    must report n_violations = 0 for every check, matching the oracle's
    scalar COUNT(*) subqueries — SUM(CASE WHEN ...) alone yields NULL over
    an empty frame."""
    from xgboost_ray_spark.catalog import load_table
    from xgboost_ray_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    for t in ("orders", "lineitem"):
        load_table(spark, sf, t).limit(0).write.parquet(
            str(tmp_path / f"{t}.parquet")
        )
    out = all_queries()["s32b_data_quality"].build(spark, str(tmp_path))
    got = {r.check_name: r.n_violations for r in out.collect()}
    assert len(got) == 5
    assert all(v == 0 for v in got.values()), got


def test_profile_warns_on_unpersisted_expensive_input(spark, caplog):
    """profile() executes its input plan twice by design (docstring
    contract, measured 3x win over the one-aggregate SortAggregate plan
    for pruned scans). For a derived frame that doubles real work, so the
    call must emit the foot-gun warning when the analyzed plan carries a
    join/aggregate/shuffle node AND the frame is unpersisted — and stay
    silent for the two sanctioned shapes (pruned scan; persisted derived
    frame)."""
    import logging

    from xgboost_ray_spark.operators.profile import profile

    logger = "xgboost_ray_spark.operators.profile"
    a = spark.range(10).withColumnRenamed("id", "k")
    joined = a.join(spark.range(10).withColumnRenamed("id", "k"), "k")

    with caplog.at_level(logging.WARNING, logger=logger):
        profile(joined, (("k", True),))
    assert any(
        "executes its input plan TWICE" in r.getMessage()
        for r in caplog.records
    ), "no foot-gun warning for an unpersisted joined input"

    # dropDuplicates and orderBy shuffle the full input too — in the
    # ANALYZED plan they appear as Deduplicate/Sort, not Aggregate
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger=logger):
        profile(a.dropDuplicates(["k"]), (("k", True),))
    assert any(
        "Deduplicate" in r.getMessage() for r in caplog.records
    ), "no warning for an unpersisted dropDuplicates input"

    # sanctioned shape 1: a plain scan-like frame -> silent, even when
    # an IDENTIFIER contains a node name (node matching is anchored to
    # the plan-tree position, not bare substrings)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger=logger):
        profile(
            a.withColumnRenamed("k", "JoinKey"), (("JoinKey", True),)
        )
    assert not caplog.records, [r.getMessage() for r in caplog.records]

    # sanctioned shape 2: the documented mitigation (persist) -> silent
    joined.persist()
    try:
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger=logger):
            profile(joined, (("k", True),))
        assert not caplog.records, [r.getMessage() for r in caplog.records]

        # sanctioned shape 3 (round-11): a frame DERIVED from the
        # persisted parent — cache substitution puts the Join below an
        # InMemoryRelation boundary in withCachedData, and both profile
        # branches hit the cache, so no warning (this was the docstring's
        # known over-warn; the cached subtree's embedded physical plan
        # must not count either)
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger=logger):
            profile(joined.select("k").filter(F.col("k") >= 0), (("k", True),))
        assert not caplog.records, [r.getMessage() for r in caplog.records]

        # ...but expensive work ABOVE the cache boundary genuinely runs
        # twice and must still warn
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger=logger):
            profile(joined.dropDuplicates(["k"]), (("k", True),))
        assert any(
            "Deduplicate" in r.getMessage() for r in caplog.records
        ), "no warning for expensive work above a cached parent"
    finally:
        joined.unpersist()

    # sanctioned shape 4 (round-11, the ADVICE r10 catalog-cache class):
    # a frame DERIVED from a CATALOG-cached view (cacheTable, not
    # DataFrame.persist). A direct spark.table() of the cached view
    # already reports the cache through df.storageLevel (the fast
    # path), so the over-warn class is the derived frame — its own
    # storageLevel is NONE, but withCachedData substitutes the view's
    # InMemoryRelation below it, so no warning
    joined.createOrReplaceTempView("profile_guard_cached_v")
    try:
        spark.catalog.cacheTable("profile_guard_cached_v")
        derived = spark.table("profile_guard_cached_v").filter(
            F.col("k") >= 0
        )
        assert not (
            derived.storageLevel.useMemory or derived.storageLevel.useDisk
        ), "precondition: the DERIVED frame must not be the fast-path case"
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger=logger):
            profile(derived, (("k", True),))
        assert not caplog.records, [r.getMessage() for r in caplog.records]
    finally:
        # uncache may legitimately have nothing to release if cacheTable
        # itself failed; the view drop must still run either way
        try:
            spark.catalog.uncacheTable("profile_guard_cached_v")
        except Exception:
            pass
        spark.catalog.dropTempView("profile_guard_cached_v")


def test_strip_cached_subtrees_sibling_and_degenerate_lines():
    """String-level pins for the ``_strip_cached_subtrees`` depth
    heuristic (VERDICT r11 #7 + ADVICE r11): (a) a sibling node at the
    SAME depth as a cached subtree's root — including a second
    InMemoryRelation — ends the skip and is processed itself; (b) a
    degenerate render line (blank, or prefix-set characters only)
    inside a cached subtree must not prematurely end the skip and
    re-expose the cached plan's expensive nodes to the warn regex."""
    from xgboost_ray_spark.operators.profile import (
        _EXPENSIVE_NODE_RE,
        _strip_cached_subtrees,
    )

    # (a) multi-child plan: cached left child, expensive right SIBLING at
    # equal depth. The sibling's Aggregate sits above any cache boundary
    # -> must survive the strip; the cached subtree's Sort/Exchange must
    # not.
    plan = "\n".join([
        "Project [k]",
        "+- Join Inner, (k = k)",
        "   :- InMemoryRelation [k], StorageLevel(disk, memory)",
        "   :     +- Sort [k ASC], false",
        "   :        +- Exchange hashpartitioning(k, 32)",
        "   +- Aggregate [k], [k, count(1) AS c]",
        "      +- Range (0, 10)",
    ])
    stripped = _strip_cached_subtrees(plan)
    assert "Aggregate" in stripped, "sibling after the boundary was lost"
    assert "Join" in stripped
    assert "Sort" not in stripped and "Exchange" not in stripped
    assert "InMemoryRelation" not in stripped
    hits = set(_EXPENSIVE_NODE_RE.findall(stripped))
    assert hits == {"Join", "Aggregate"}, hits

    # (a') two InMemoryRelation siblings at equal depth: the second must
    # start its OWN skip, not be emitted as a resumed line.
    plan = "\n".join([
        "Join Inner, (a = b)",
        ":- InMemoryRelation [a], StorageLevel(memory)",
        ":     +- Sort [a ASC], false",
        "+- InMemoryRelation [b], StorageLevel(memory)",
        "      +- Window [row_number()], [b]",
    ])
    stripped = _strip_cached_subtrees(plan)
    assert stripped == "Join Inner, (a = b)", stripped

    # (b) degenerate lines inside the cached subtree: a bare ':'
    # continuation and a fully blank line both lstrip to an empty body,
    # so their prefix length carries no depth signal. Before the r12 fix
    # they ended the skip and re-exposed the Exchange below them.
    plan = "\n".join([
        "Project [k]",
        "+- InMemoryRelation [k], StorageLevel(memory)",
        "   :     +- Sort [k ASC], false",
        "   :",
        "",
        "   :        +- Exchange hashpartitioning(k, 32)",
        "+- Range (0, 10)",
    ])
    stripped = _strip_cached_subtrees(plan)
    assert "Exchange" not in stripped, stripped
    assert "Sort" not in stripped
    assert "Range" in stripped, "equal-depth resume after degenerate lines"
    assert not _EXPENSIVE_NODE_RE.findall(stripped)
