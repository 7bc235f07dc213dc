"""Static audit: every executor-cache lifecycle site is allowlisted.

A ``persist()``/``cache()`` without a matching release leaks executor
storage memory for the life of the session — invisible at sf0.1 (the
whole table fits), real at 100 TB where the storage pool evicts shuffle
and recompute churn begins. The SCALE.md iterative contracts ("persists
its multiply-read inputs", "localCheckpoint handback") are claims about
exactly these sites; this test pins them the same way the
driver-materialization and broadcast-hint audits pin theirs, so a NEW
cache site fails CI with the burden of proof on the author. Every
retention spelling is covered: the DataFrame methods
(persist/cache/unpersist/localCheckpoint), the catalog calls
(cacheTable/uncacheTable), reliable ``checkpoint()``, and the SQL
``CACHE TABLE`` text form (a separate string scan — the AST walk can't
see inside SQL).

Counts are call SITES per (file, function, method), not runtime pairing
(an in-loop persist legitimately carries several unpersist sites on the
different loop-exit paths — dup_clusters has 2 persist sites against 5
unpersist sites and is leak-free). What each audited group guarantees:

  * ml/train.py/train — the assembled training frame persists
    MEMORY_AND_DISK before the iterative fit, released in the finally.
  * ml/tuning.py/grid_search — train/val frames cached across the
    grid's fits, both released after the loop.
  * operators/dedup.py/dup_clusters — the exploded edge frame persists
    across the loop's per-round reads (since r15 the pair frame needs
    no cache of its own: one explode pass replaces the twice-reading
    union); per-round label frames persist inside the loop and EVERY
    exit path (converged, round-cap, checkpoint rotation) releases the
    superseded frame;
    the returned frame is a localCheckpoint handback so lineage (and
    the persisted inputs) can be dropped while the result stays live.
  * operators/graph.py/pagerank — pre-keyed edge and node frames
    persist across rounds, released after the localCheckpoint
    handback of the final ranks.
  * operators/similarity.py/kmeans_assign — the quantized points
    persist across seeding passes + Lloyd rounds, released before
    returning the (literal-centroid, cache-independent) assignment;
    a second unpersist sits on the empty-input raise path (round 11),
    so the guard releases the cache before erroring out.

The handback pattern is the repo rule for RETURNED frames: never return
a frame whose plan still reads a cache the function just released —
localCheckpoint (eager) first, then unpersist.
"""

from __future__ import annotations

import ast

from tests.audit_utils import call_name, call_sites, string_constants

_ATTRS = (
    "persist",
    "cache",
    "unpersist",
    "localCheckpoint",
    "checkpoint",
    "cacheTable",
    "uncacheTable",
)

# (file, enclosing function, method) -> audited CALL COUNT.
ALLOWED: dict[tuple[str, str, str], int] = {
    ("ml/train.py", "train", "persist"): 1,
    ("ml/train.py", "train", "unpersist"): 1,
    ("ml/tuning.py", "grid_search", "cache"): 2,
    ("ml/tuning.py", "grid_search", "unpersist"): 2,
    ("operators/dedup.py", "dup_clusters", "localCheckpoint"): 2,
    ("operators/dedup.py", "dup_clusters", "persist"): 2,
    ("operators/dedup.py", "dup_clusters", "unpersist"): 5,
    ("operators/graph.py", "pagerank", "localCheckpoint"): 1,
    ("operators/graph.py", "pagerank", "persist"): 2,
    ("operators/graph.py", "pagerank", "unpersist"): 2,
    ("operators/similarity.py", "kmeans_assign", "persist"): 1,
    ("operators/similarity.py", "kmeans_assign", "unpersist"): 2,
}


def _match_lifecycle(node: ast.Call) -> str | None:
    name = call_name(node)
    return name if name in _ATTRS else None


def test_cache_lifecycle_sites_are_audited():
    sites = call_sites(_match_lifecycle)
    wrong = {
        k: (sites.get(k, 0), ALLOWED.get(k, 0))
        for k in set(sites) | set(ALLOWED)
        if sites.get(k, 0) != ALLOWED.get(k, 0)
    }
    assert not wrong, (
        "cache-lifecycle call counts off their audited values "
        "{(file, function, method): (found, audited)} — for each new "
        "site, show the release on every exit path and (for returned "
        "frames) the localCheckpoint handback, document it in this "
        "module's audit list, then re-pin; prune removed sites so the "
        f"list never rots: {wrong}"
    )


def test_no_sql_cache_table():
    """The SQL text spelling of the same retention class. None exist;
    any new one must move to an auditable call-site spelling or extend
    this test with its lifecycle justification."""
    hits = string_constants("cache table")
    assert not hits, f"SQL CACHE TABLE statements found: {hits}"
