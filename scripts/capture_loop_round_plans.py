#!/usr/bin/env python
"""Capture ONE iteration-round physical plan for the iterative operators
whose registered entries return localCheckpoint handbacks — the returned
frame's explain shows only a checkpoint scan, so the loop body's shape is
captured here instead: build the round-1 frame exactly as the loop
composes it (old spelling vs current), write
plans/r15/<name>_round_{before,after}.txt.

Captured: s26g (the union-into-aggregate round SHIPPED there). The
equivalent s24g experiment was measured a wash once corrected for the
dangling-dst node-set semantics and was NOT shipped (pagerank keeps the
r14 two-join round; full record in OPTIMIZATION_r15.md), so no s24g
round capture exists here.

The "before" spelling is reconstructed inline (the r14 two-join round);
"after" comes from the shipped operators. Inputs are the same sf0.1
frames the bench uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xgboost_ray_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def write(name: str, text: str) -> None:
    path = os.path.join(OUT, name)
    with open(path, "w") as f:
        f.write(text)
    print("wrote", path, f"({len(text)} bytes)")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_loop_round_plans")

    # --- s26g CC round 1 over a stand-in edge frame ----------------------
    # The pair generator is shared with s26d and unchanged; the captured
    # shape is the round body, so a small literal edge frame keeps the
    # capture cheap while showing the identical operator topology.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], ["doc_a", "doc_b"]
    )
    edges_b = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .persist()
    )
    labels_b = (
        edges_b.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    nbr_min = (
        edges_b.join(labels_b.select(F.col("doc_id").alias("src"), "label"), "src")
        .groupBy(F.col("dst").alias("doc_id"))
        .agg(F.min("label").alias("nbr_min"))
    )
    round_before = labels_b.join(nbr_min, "doc_id", "left").select(
        "doc_id",
        F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
    )
    write("s26g_dup_clusters_round_before.txt", fmt(round_before))
    edges_b.unpersist()

    edges_a = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                    F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist()
    )
    labels_a = (
        edges_a.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    round_after = (
        edges_a.join(labels_a.select(F.col("doc_id").alias("src"), "label"), "src")
        .select(F.col("dst").alias("doc_id"), "label")
        .union(labels_a)
        .groupBy("doc_id")
        .agg(F.min("label").alias("label"))
    )
    write("s26g_dup_clusters_round_after.txt", fmt(round_after))
    edges_a.unpersist()


if __name__ == "__main__":
    main()
