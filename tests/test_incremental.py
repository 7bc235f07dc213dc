"""Two-cycle incremental-maintenance tests.

The s09g (IVM partial-agg merge) and s26k (incremental LSH near-dup)
entries are built around a persisted base state plus one delta, and the
oracle sweep exercises exactly one cycle. These tests run TWO cycles —
apply delta 1, persist the state through parquet, apply delta 2 — and
assert the result equals a full batch recompute, which is the invariant
that makes the nightly-job pattern trustworthy: state that survives
storage and a second merge without drifting from the recomputed truth.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.operators.cdc import (
    finalize_order_agg,
    merge_order_partials,
    order_partial,
)
from xgboost_ray_spark.operators.dedup import (
    bucket_pairs,
    lsh_bands,
    minhash_candidate_pairs,
    minhash_signatures,
)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_order_agg_two_cycle_matches_full_recompute(spark, tmp_path):
    """partial ∘ merge ∘ store ∘ merge == one full recompute.

    Slices the orders table into three date ranges; cycle 1 merges the
    base partial with delta 1 and WRITES the merged state to parquet
    (the nightly job's stored artifact); cycle 2 reads it back and
    merges delta 2. The final report must equal finalizing one partial
    over the whole table.
    """
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    d1 = F.lit("1996-01-01").cast("timestamp")
    d2 = F.lit("1997-01-01").cast("timestamp")
    base = orders.filter(F.col("o_orderdate") < d1)
    delta1 = orders.filter(
        (F.col("o_orderdate") >= d1) & (F.col("o_orderdate") < d2)
    )
    delta2 = orders.filter(F.col("o_orderdate") >= d2)
    # The slices must actually partition the table, or the test is vacuous.
    assert base.count() > 0 and delta1.count() > 0 and delta2.count() > 0

    state_path = os.path.join(str(tmp_path), "order_state_v1")
    merge_order_partials(order_partial(base), order_partial(delta1)).write.parquet(
        state_path
    )
    state1 = spark.read.parquet(state_path)  # the persisted nightly state
    final = finalize_order_agg(
        merge_order_partials(state1, order_partial(delta2))
    )

    expected = finalize_order_agg(order_partial(orders))
    cols = ["o_orderpriority", "n_orders", "sum_price", "max_price"]
    assert _rows(final, cols) == _rows(expected, cols)


def test_neardup_two_cycle_matches_full_recompute(spark, tmp_path):
    """Two ingest cycles over a persisted LSH band index reproduce the
    batch pair set exactly.

    Corpus split: base (doc_id % 5 in 1..3), delta1 (% 5 == 4),
    delta2 (% 5 == 0). Cycle k appends delta k's bands to the stored
    index and emits only pairs touching delta k. The union
    base-only ∪ cycle1 ∪ cycle2 must equal the full batch pair set:
    every pair involves its latest-ingested endpoint's cycle, so the
    three runs tile the pair space with no gaps and no extras (bucket
    caps can't diverge at this sf — asserted via the observation).
    """
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    base = docs.filter((F.col("doc_id") % 5).isin(1, 2, 3))
    delta1 = docs.filter(F.col("doc_id") % 5 == 4)
    delta2 = docs.filter(F.col("doc_id") % 5 == 0)
    # The three slices must partition the corpus — a delta overlapping the
    # base would make its cycle vacuous (its pairs already in base_pairs).
    assert base.count() + delta1.count() + delta2.count() == docs.count()
    assert delta1.count() > 0 and delta2.count() > 0

    index0_path = os.path.join(str(tmp_path), "lsh_index_v0")
    lsh_bands(minhash_signatures(base)).write.parquet(index0_path)
    index0 = spark.read.parquet(index0_path)

    def cycle(index, delta, mod_val, version):
        """One ingest day: band the delta, emit its pairs against the
        stored index, append to the index (via parquet, as the job would)."""
        delta_path = os.path.join(str(tmp_path), f"lsh_index_v{version}")
        dbands_local = lsh_bands(minhash_signatures(delta))
        dbands_local.write.parquet(delta_path)
        dbands = spark.read.parquet(delta_path)
        all_bands = index.unionByName(dbands)
        touched = all_bands.join(
            F.broadcast(dbands.select("band_id", "bv").distinct()),
            ["band_id", "bv"],
        )
        pairs = bucket_pairs(
            touched,
            obs_prefix=f"test_incr_cycle{version}",
            pair_predicate=f"p.a % 5 = {mod_val} OR p.b % 5 = {mod_val}",
        )
        return pairs, all_bands

    pairs1, index1 = cycle(index0, delta1, 4, 1)
    pairs2, _ = cycle(index1, delta2, 0, 2)
    base_pairs = bucket_pairs(index0, obs_prefix="test_incr_base")

    cols = ["doc_a", "doc_b"]
    incremental = set(
        _rows(base_pairs, cols) + _rows(pairs1, cols) + _rows(pairs2, cols)
    )
    full = set(_rows(minhash_candidate_pairs(docs), cols))
    assert incremental == full


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
