"""Barrier-execution topology tests — the R18 training plumbing exercised
WITHOUT xgboost (absent from this container): rank assignment, allGather
exchange, and barrier synchronization are exactly what ml/barrier.py builds
its Rabit ring on (reference topology: xgboost_ray/main.py:1061-1337)."""

from __future__ import annotations

import json


def test_barrier_ranks_and_allgather(spark):
    """Every barrier task must see a unique rank and the full roster via
    allGather — the tracker-env distribution step of train_barrier."""
    df = spark.range(100).repartition(4)

    def exchange(iterator):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        rank = ctx.partitionId()
        roster = ctx.allGather(json.dumps({"rank": rank}))
        yield {
            "rank": rank,
            "world": len(roster),
            "ranks_seen": sorted(json.loads(r)["rank"] for r in roster),
            "n_rows": sum(1 for _ in iterator),
        }

    results = df.rdd.barrier().mapPartitions(exchange).collect()
    assert sorted(r["rank"] for r in results) == [0, 1, 2, 3]
    for r in results:
        assert r["world"] == 4
        assert r["ranks_seen"] == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in results) == 100


def test_barrier_sync_point(spark):
    """ctx.barrier() must hold tasks until all arrive (the pre-training
    sync before the collective ring forms)."""
    import time

    df = spark.range(8).repartition(2)

    def staged(iterator):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        if ctx.partitionId() == 0:
            time.sleep(1.0)  # rank 0 arrives late
        before = time.time()
        ctx.barrier()
        after = time.time()
        # rank 1 must have waited for rank 0
        yield {"rank": ctx.partitionId(), "waited": after - before}

    results = {r["rank"]: r["waited"] for r in
               df.rdd.barrier().mapPartitions(staged).collect()}
    assert results[1] > 0.5, "the early task must block at the barrier"
