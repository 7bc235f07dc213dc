"""Entity-feature engineering for a training matrix — the feature-store
pass that runs between raw facts and train() (the reference's examples
start from ready-made numpy/pandas features, e.g. its simple.py:10-46;
this is how those columns get built at 100 TB).

Stages, each a registry operator reused as a library function:

  1. graph centrality: fixed-point PageRank over the customer⟷supplier
     purchase graph (the s24g builder, called directly) — entity importance
  2. behavior embedding cluster: fixed-point k-means assignment over the
     embeddings table (s27j kernel)                  — categorical cluster id
  3. spend discretization: per-NATION equal-frequency deciles of customer
     spend (s31h shape: ntile over a total order within each group)
  4. anomaly mask: exact 3-sigma outlier flag on spend (the s32d kernel,
     `exact_outlier_flags`) — rows a monitoring gate would quarantine are
     DROPPED before assembly
  5. assemble: one wide feature frame keyed by customer, split
     train/valid/test by key hash (s31 kernel)       — reproducible folds

Every derived feature here is bit-reproducible by construction (integer
fixed-point state, cross-multiplied integer predicates, md5 splits), so
the SAME rows with the SAME values come out on any cluster size or
partition layout — the property that makes a training set auditable
months later.

Run: python examples/feature_engineering.py [--sf-dir /root/testdata/sf0.001]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.operators.graph import s24g_pagerank
from xgboost_ray_spark.operators.profile import exact_outlier_flags
from xgboost_ray_spark.operators.sampling import hash_split
from xgboost_ray_spark.operators.similarity import kmeans_assign
from xgboost_ray_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark(app_name="example-feature-engineering")

    # 1. PageRank over the purchase graph -> per-customer centrality.
    # The registered builder IS the library function: one graph
    # definition, shared with the oracle-checked entry.
    ranks = s24g_pagerank(spark, sf_dir)
    cust_rank = ranks.filter(F.col("node") % 2 == 0).select(
        (F.col("node") / 2).cast("bigint").alias("custkey"),
        F.col("rank").alias("graph_rank"),
    )

    # 2. Embedding cluster id (embeddings keyed by vec_id; the example
    # treats vec_id as a customer surrogate — in production this is the
    # entity's behavioral embedding).
    clusters = kmeans_assign(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ).select(F.col("vec_id").alias("custkey"), "cluster")

    # 3. Customer spend -> per-nation equal-frequency decile (the s31h
    # shape: deterministic ntile over a total order WITHIN each group —
    # never a global single-partition sort).
    spend = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("spend"))
    )
    nations = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    spend = spend.join(F.broadcast(nations), "custkey").withColumn(
        "spend_decile",
        F.ntile(10)
        .over(
            W.partitionBy("c_nationkey").orderBy(
                F.asc_nulls_last("spend"), "custkey"
            )
        )
        .cast("bigint"),
    )

    # 4. Anomaly mask: quarantine customers whose spend is a 3-sigma
    # outlier within their nation (exact integer predicate — the s32d
    # kernel on micro-unit fixed-point spend).
    spend = spend.withColumn(
        "spend_mu", (F.col("spend") * 1_000_000).cast("bigint")
    )
    masked = (
        exact_outlier_flags(spend, "c_nationkey", "spend_mu")
        .filter(~F.col("is_outlier"))
        .select("custkey", "spend_decile")
    )
    n_quarantined = spend.count() - masked.count()

    # 5. Assemble + reproducible split (md5-hash on the key).
    feats = (
        cust_rank.join(clusters, "custkey", "left")
        .join(masked, "custkey", "inner")
        .select("custkey", "graph_rank", "cluster", "spend_decile")
    )
    split = hash_split(feats, "custkey")
    counts = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    n_feats = feats.count()
    assert n_feats > 0 and sum(counts.values()) == n_feats
    return {
        "n_features": n_feats,
        "n_quarantined": n_quarantined,
        "splits": counts,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    out = main(ap.parse_args().sf_dir)
    print(out)
