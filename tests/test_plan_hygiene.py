"""Catalog-wide physical-plan hygiene sweep.

The targeted audits in tests/test_plans.py pin ~40 specific plan shapes;
this sweep is the blanket rule over the WHOLE batch catalog: no entry may
plan a ``CartesianProduct`` (all-pairs blowup — the one join shape that
cannot survive a 100 TB corpus) or a ``BatchEvalPython`` (row-at-a-time
Python UDF — the slow path this engine bans in favor of Arrow-batched
pandas UDFs / mapInArrow, which plan as ArrowEvalPython / FlatMapGroupsIn
Pandas / MapInArrow nodes and are allowed).

Both allowlists are EMPTY as of round 7 (sweep of all 145 batch entries
at sf0.001: zero hits, zero build errors). Adding an entry here requires
a written scale justification in SCALE.md — the s27c all-pairs demo, the
one by-design near-quadratic plan, already avoids CartesianProduct by
joining on a literal key bucket, so even it does not need a slot.

Cost note: building every plan also materializes the dedup/ANN spill
fixtures, so this is one of the slower tests in the suite (~60-90 s at
sf0.001 under the shared local[8] fixture). It replaces 145 would-be
individual tests; keep it as ONE test so the fixture builds amortize.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from xgboost_ray_spark.registry import all_queries

# Physical-plan node substrings that must not appear, mapped to the
# entries permitted to contain them (none today — see module docstring).
_BANNED_NODES: dict[str, frozenset[str]] = {
    "CartesianProduct": frozenset(),
    "BatchEvalPython": frozenset(),
}


def test_no_cartesian_or_rowwise_python_in_any_batch_plan(spark):
    violations: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    checked = 0
    for name, spec in all_queries().items():
        if "streaming" in spec.tags:
            continue  # unbounded plans need a started query; covered by
            # test_streaming.py's per-entry progress checks instead.
        try:
            df = spec.build(spark, SF_SMOKE)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # a build error is itself a failure
            errors[name] = repr(exc)[:200]
            continue
        checked += 1
        found = [
            node
            for node, allowed in _BANNED_NODES.items()
            if node in plan and name not in allowed
        ]
        if found:
            violations[name] = found
    assert not errors, f"catalog entries failed to build: {errors}"
    assert not violations, (
        "banned physical nodes found (justify in SCALE.md before "
        f"allowlisting): {violations}"
    )
    assert checked >= 140, f"sweep shrank unexpectedly: {checked} entries"
