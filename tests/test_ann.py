"""GEMM-backed batch top-k (functions/ann.py) parity tests."""

from __future__ import annotations


# ---------------------------------------------------------------------------
# GEMM top-k parity vs the JVM-expression brute force (functions/ann.py)
# ---------------------------------------------------------------------------
def test_gemm_topk_matches_jvm_bruteforce(spark):
    """The BLAS scale path must return the same neighbors (and scores to
    float tolerance) as the exact JVM zip_with/aggregate cosine."""
    import numpy as np
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from xgboost_ray_spark.catalog import load_table
    from xgboost_ray_spark.functions.ann import gemm_topk
    from xgboost_ray_spark.functions.vector import cosine
    from xgboost_ray_spark.registry import ensure_workers_can_import

    ensure_workers_can_import(spark)
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    queries = [
        np.array(r.embedding, dtype=np.float64)
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    k = 5
    got = gemm_topk(emb, np.stack(queries), k=k).toPandas()

    for qi, qvec in enumerate(queries):
        jvm = (
            emb.withColumn(
                "cos",
                cosine(F.array(*[F.lit(float(x)) for x in qvec]), F.col("embedding")),
            )
            .orderBy(F.desc("cos"), "vec_id")
            .limit(k)
            .toPandas()
        )
        mine = (
            got[got.query_id == qi]
            .sort_values(["cos", "vec_id"], ascending=[False, True])
            .reset_index(drop=True)
        )
        assert list(mine.vec_id) == list(jvm.vec_id), f"query {qi} neighbor set"
        assert np.allclose(mine.cos.to_numpy(), jvm.cos.to_numpy(), atol=1e-9)
