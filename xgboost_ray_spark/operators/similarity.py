"""Similarity search over the ``embeddings`` table (SURVEY.md §2.2 S27).

  - Brute-force cosine top-k: broadcast the query set against the corpus;
    the dot product is a JVM-side ``zip_with``/``aggregate`` expression —
    no Python in the hot path.
  - LSH (random-hyperplane) bucketed top-k: the 100TB path. Hyperplane
    signs derive from md5 (deterministic, engine-independent), bucket sums
    accumulate in DECIMAL so bucketing is bit-stable — which makes even the
    LSH variant fully value-hash checkable against DuckDB.

At cluster scale the brute-force variant is O(|Q| * |corpus|) with the
corpus scanned once per batch of queries (fine for |Q| in the thousands);
the LSH variant prunes the corpus per query to one bucket — the shuffle is
keyed on the 8-bit bucket id, and a production deployment raises the plane
count / adds multi-probe as corpus density grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.registry import register

N_PLANES = 8
TOP_K = 5
_HEX = "0123456789abcdef"

# Sequential-double dot product of two float arrays, cast elementwise to
# double first (exact). Spark evaluates aggregate() left-to-right, matching
# DuckDB's list_dot_product loop.
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)


def _dot(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``/``corpus``: (vec_id, embedding array<float>). The query set
    is broadcast; ranking uses full-precision sim with vec_id tiebreak, the
    emitted sim is rounded for cross-engine hash stability.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    sim = _dot("qe", "ce") / (
        F.sqrt(_dot("qe", "qe")) * F.sqrt(_dot("ce", "ce"))
    )
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim_full", sim)
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("sim_full", 4).alias("sim"), "rk")
    )


@register(
    "s27_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce FROM embeddings
    ), sims AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qe, ce)
               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))
               AS sim_full
      FROM q, c WHERE query_id != neighbor_id
    )
    SELECT query_id, neighbor_id, ROUND(sim_full, 4) AS sim, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim_full DESC, neighbor_id
      ) AS rk
      FROM sims
    )
    WHERE rk <= {TOP_K}
    """,
    doc="Brute-force cosine top-5 for query vectors vec_id<10 (broadcast "
        "nested-loop, JVM-side aggregate dot product).",
    tags=("similarity",),
)
def s27_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb.filter(F.col("vec_id") < 10), emb)


# ---------------------------------------------------------------------------
# LSH random-hyperplane bucketing
# ---------------------------------------------------------------------------
def plane_signs(spark: SparkSession, dim: int, n_planes: int = N_PLANES) -> DataFrame:
    """(plane, pos, sign ±1) — md5-derived pseudo-random hyperplane signs."""
    planes = spark.range(n_planes).select(F.col("id").alias("plane"))
    poss = spark.range(dim).select(F.col("id").alias("pos"))
    cell = planes.crossJoin(poss)
    nib = F.instr(
        F.lit(_HEX), F.substring(F.md5(F.concat_ws("_", "plane", "pos")), 1, 1)
    ) - 1
    return cell.select(
        "plane", "pos", F.when(nib >= 8, 1).otherwise(-1).alias("sign")
    )


def lsh_buckets(spark: SparkSession, vectors: DataFrame) -> DataFrame:
    """(vec_id, bucket): sign-bit bucket of each vector under N_PLANES
    hyperplanes. Projections accumulate in DECIMAL(28,12) — bit-stable in
    any engine, so bucket assignment is deterministic everywhere.
    """
    dim = 64  # embeddings fixture dim; production: F.size(embedding) probe
    signs = plane_signs(spark, dim)
    flat = vectors.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    )
    proj = (
        flat.join(F.broadcast(signs), "pos")
        .groupBy("vec_id", "plane")
        .agg(
            F.sum(
                (F.col("v").cast("double") * F.col("sign")).cast("decimal(28,12)")
            ).alias("proj")
        )
    )
    return (
        proj.withColumn("bit", F.when(F.col("proj") >= 0, 1).otherwise(0))
        .withColumn("term", F.expr("bit * shiftleft(1, cast(plane as int))"))
        .groupBy("vec_id")
        .agg(F.sum("term").cast("int").alias("bucket"))
    )


def lsh_cosine_topk(
    spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket."""
    qb = lsh_buckets(spark, queries).withColumnRenamed("vec_id", "query_id")
    cb = lsh_buckets(spark, corpus).withColumnRenamed("vec_id", "neighbor_id")
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    cand = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
    )
    sim = _dot("qe", "ce") / (F.sqrt(_dot("qe", "qe")) * F.sqrt(_dot("ce", "ce")))
    w = W.partitionBy("query_id").orderBy(F.col("sim_full").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("sim_full", sim)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("sim_full", 4).alias("sim"), "rk")
    )


def _lsh_oracle() -> str:
    return f"""
    WITH signs AS (
      SELECT p.plane, s.pos,
             CASE WHEN strpos('{_HEX}',
                    substring(md5(CAST(p.plane AS VARCHAR) || '_' || CAST(s.pos AS VARCHAR)), 1, 1)) - 1 >= 8
                  THEN 1 ELSE -1 END AS sign
      FROM (SELECT unnest(generate_series(0, {N_PLANES - 1})) AS plane) p,
           (SELECT unnest(generate_series(0, 63)) AS pos) s
    ), ex AS (
      SELECT vec_id, embedding,
             unnest(generate_series(1, LEN(embedding))) AS i
      FROM embeddings
    ), flat AS (
      SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
      FROM ex
    ), proj AS (
      SELECT vec_id, plane,
             SUM(CAST(v * sign AS DECIMAL(28,12))) AS proj
      FROM flat JOIN signs USING (pos)
      GROUP BY vec_id, plane
    ), bucket AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN proj >= 0 THEN 1 ELSE 0 END * (1 << CAST(plane AS INT))) AS INT) AS bucket
      FROM proj GROUP BY vec_id
    ), qb AS (
      SELECT vec_id AS query_id, bucket FROM bucket WHERE vec_id < 10
    ), cand AS (
      SELECT qb.query_id, cb.vec_id AS neighbor_id
      FROM qb JOIN bucket cb USING (bucket)
      WHERE qb.query_id != cb.vec_id
    ), emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), sims AS (
      SELECT query_id, neighbor_id,
             list_dot_product(qe.e, ce.e)
               / (sqrt(list_dot_product(qe.e, qe.e)) * sqrt(list_dot_product(ce.e, ce.e)))
               AS sim_full
      FROM cand
      JOIN emb qe ON qe.vec_id = query_id
      JOIN emb ce ON ce.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, ROUND(sim_full, 4) AS sim, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim_full DESC, neighbor_id
      ) AS rk
      FROM sims
    )
    WHERE rk <= {TOP_K}
    """


@register(
    "s27b_lsh_topk",
    oracle=_lsh_oracle(),
    doc=f"LSH (random-hyperplane, {N_PLANES} planes) bucketed approximate "
        "top-5 — deterministic md5-derived planes + DECIMAL projections make "
        "even the approximate path exactly oracle-checkable. 100TB path: "
        "bucket join prunes the corpus ~2^planes-fold per query.",
    tags=("similarity", "lsh"),
)
def s27b_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_cosine_topk(spark, emb.filter(F.col("vec_id") < 10), emb)


@register(
    "s27c_embedding_neardup",
    oracle="""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 150
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
             4) AS sim
    FROM emb a JOIN emb b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
          >= 0.6
    """,
    doc="Embedding-cosine near-duplicate pairs (sim >= 0.6) over a bounded "
        "slice; the unbounded version runs behind the LSH bucketer (s27b).",
    tags=("similarity", "dedup"),
)
def s27c_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 150)
        .select("vec_id", "embedding")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("qe"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("ce"))
    sim = _dot("qe", "ce") / (F.sqrt(_dot("qe", "qe")) * F.sqrt(_dot("ce", "ce")))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim_full", sim)
        .filter(F.col("sim_full") >= 0.6)
        .select("vec_a", "vec_b", F.round("sim_full", 4).alias("sim"))
    )
