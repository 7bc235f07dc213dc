"""Unit tests for the iterative fixed-point operators (pagerank, k-means)
on crafted graphs where the exact result is hand-computable — covering
paths the fixture-driven oracle sweep can't reach (starved clusters,
symmetric fixed points, dangling-free invariants).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xgboost_ray_spark.operators.graph import (
    PR_BASE,
    PR_SCALE,
    pagerank,
)
from xgboost_ray_spark.operators.similarity import kmeans_assign


def test_pagerank_two_node_cycle_is_fixed_point(spark):
    """A <-> B: each node's whole rank flows to the other, so rank stays
    at SCALE forever — base + damp*SCALE = SCALE exactly in the integer
    arithmetic (150000 + 85*1000000 div 100)."""
    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    out = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert out == {1: PR_SCALE, 2: PR_SCALE}


def test_pagerank_star_concentrates_rank_on_hub(spark):
    """Bidirectional star (hub 0, leaves 1..4): the hub must end with
    strictly more rank than any leaf, leaves all equal by symmetry, and
    total mass never exceeds the injected mass (shares only lose floor
    remainders)."""
    leaves = [1, 2, 3, 4]
    rows = [(0, l) for l in leaves] + [(l, 0) for l in leaves]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    out = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert len(out) == 5
    leaf_ranks = {out[l] for l in leaves}
    assert len(leaf_ranks) == 1, "symmetric leaves must tie exactly"
    assert out[0] > out[1]
    assert sum(out.values()) <= 5 * PR_SCALE
    assert all(r >= PR_BASE for r in out.values())


def test_kmeans_starved_cluster_keeps_seed_centroid(spark):
    """All three seeds are identical points, so in round 1 every point
    ties onto cluster 0 and clusters 1 and 2 STARVE — the update must
    carry their seed centroids forward (the COALESCE path) instead of
    dividing by zero or dropping them. In round 2 those kept centroids
    (still at the duplicate point) win the tight points back from
    cluster 0's dragged mean — observable proof the starved centroids
    survived."""
    rows = [
        (0, [0.1, 0.1]),
        (1, [0.1, 0.1]),
        (2, [0.1, 0.1]),
        (3, [-0.4, -0.4]),
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = kmeans_assign(vecs, k=3, iters=2).collect()
    assert len(out) == 4
    by_vec = {r["vec_id"]: r for r in out}
    # identical points get identical (cluster, dist), ties -> lowest id
    assert (
        by_vec[0]["cluster"] == by_vec[1]["cluster"] == by_vec[2]["cluster"]
    )
    assert by_vec[0]["dist"] == by_vec[1]["dist"] == by_vec[2]["dist"]
    # the tight points sit exactly on a carried-forward seed centroid:
    # cluster 1 (not 0) wins them in round 2, at exact zero distance
    assert by_vec[0]["cluster"] == 1
    assert by_vec[0]["dist"] == 0
    # the far point stays with cluster 0's dragged mean
    assert by_vec[3]["cluster"] == 0


def test_kmeans_assigns_each_point_to_nearest_centroid(spark):
    """Two well-separated blobs, K=2: every point must land with its blob
    and converged within-cluster distances are exact integers."""
    rows = [(i, [0.3 + 0.001 * i, 0.3]) for i in range(3)] + [
        (10 + i, [-0.3 - 0.001 * i, -0.3]) for i in range(3)
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = kmeans_assign(vecs, k=2, iters=2).collect()
    blob_a = {r["cluster"] for r in out if r["vec_id"] < 10}
    blob_b = {r["cluster"] for r in out if r["vec_id"] >= 10}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
