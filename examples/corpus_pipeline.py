"""End-to-end training-corpus pipeline over the documents table — the
data-prep counterpart of the reference's training examples: everything
that happens BEFORE a matrix reaches train() (the reference assumes
pre-cleaned input; see xgboost_ray examples/simple.py:10-46).

Stages, each a registry operator reused as a library function:

  1. profile the raw corpus (s32 kernel)              — sanity gate
  2. duplicate clusters: Jaccard pairs -> connected
     components (s26d + s26g kernels)                 — find near-dups
  3. canonical keep: one doc per cluster              — drop the rest
  4. deterministic stratified downsample (s31b)       — rebalance langs
  5. hash split train/valid/test (s31)                — reproducible split
  6. sequence packing into token-budget chunks (s33)  — batch construction

Every stage is a DataFrame -> DataFrame transform: the whole pipeline is
ONE lazy plan per output, Catalyst sees across stage boundaries, and
nothing is collected to the driver except the final summary counts.

Run: python examples/corpus_pipeline.py [--sf-dir /root/testdata/sf0.001]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from pyspark.sql import functions as F

from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.operators.dedup import dup_clusters, ngram_jaccard_pairs
from xgboost_ray_spark.operators.sampling import (
    TOKEN_BUDGET,
    hash_split,
    stratified_sample,
)
from xgboost_ray_spark.operators.profile import profile
from xgboost_ray_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark(app_name="example-corpus-pipeline")
    docs = load_table(spark, sf_dir, "documents")

    # 1. Profile gate: refuse to proceed if any doc_id/text is null.
    prof = profile(docs, (("doc_id", True), ("n_chars", True), ("lang", False)))
    nulls = {r["col_name"]: r["n_null"] for r in prof.collect()}
    assert nulls["doc_id"] == 0 and nulls["n_chars"] == 0, nulls

    # 2-3. Near-dup clusters -> keep the smallest doc_id per cluster.
    pairs = ngram_jaccard_pairs(docs.select("doc_id", "text"))
    clusters = dup_clusters(pairs.select("doc_a", "doc_b"))
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_root"))
    kept = docs.join(drop.select("doc_id"), "doc_id", "left_anti")

    # 4. Downsample over-represented languages (deterministic, per-key).
    sampled = stratified_sample(kept, "doc_id", {"en": 50}, "lang", 100)

    # 5. Reproducible 80/10/10 split.
    split = hash_split(sampled, "doc_id")

    # 6. Pack each split into ~TOKEN_BUDGET-token chunks per source.
    from pyspark.sql import Window as W

    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    run = F.sum("n_tokens").over(
        W.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = (
        split.select("doc_id", "source", "split", n_tokens.alias("n_tokens"))
        .withColumn("chunk_id", F.floor((run - F.col("n_tokens")) / TOKEN_BUDGET))
    )

    summary = {
        r["split"]: (r["n_docs"], r["n_chunks"])
        for r in packed.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source", "chunk_id").alias("n_chunks"),
        )
        .collect()
    }
    total = docs.count()
    dropped = drop.count()
    print(f"corpus={total} dropped_dups={dropped} splits={summary}")
    assert set(summary) == {"train", "valid", "test"}
    assert sum(v[0] for v in summary.values()) <= total - dropped
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    main(ap.parse_args().sf_dir)
