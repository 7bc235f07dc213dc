"""Deterministic sampling & dataset-split operators (training-pipeline S31).

A 100 TB training corpus needs reproducible splits and samples: the split a
document lands in must be a pure function of its key, not of partitioning,
executor count, or RNG seeding — so re-running the pipeline (or running it
on a different cluster) assigns every row identically. All three operators
key on ``md5`` of a stable id (the one hash bit-identical in Spark and
DuckDB), making them exactly oracle-checkable, and all are pure built-in
column expressions: whole-stage codegen, one shuffle per groupBy/window,
no Python.

Reference analogue: xgboost_ray shards rows with ``_get_sharding_indices``
(reference ``matrix.py:1088-1110``) and builds eval sets from separate
matrices (``main.py:704-706``); it has no split/sample utility — callers
pre-split in pandas. At Spark scale the split must happen inside the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.registry import register, sql_davg

# md5(key) folded to 15 hex chars (60 bits, sign-safe in a BIGINT) — THE
# shared Spark/DuckDB hash-bucket idiom (splits, sampling, CV folds); one
# definition so the membership function can never quietly fork.
def spark_bucket(col: Column, mod: int = 100) -> Column:
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % mod
    )


def sql_bucket(expr: str, mod: int = 100) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 15))"
        f" AS BIGINT) % {mod}"
    )


# ---------------------------------------------------------------------------
# Train / valid / test split (80/10/10) by key hash
# ---------------------------------------------------------------------------
def hash_split(df: DataFrame, key: str, train: int = 80, valid: int = 10) -> DataFrame:
    """Add a ``split`` column assigning each row train/valid/test by the md5
    bucket of ``key``. Stable under repartitioning and cluster size; a row's
    split never changes when the corpus grows (per-key property)."""
    bucket = spark_bucket(F.col(key))
    split = (
        F.when(bucket < train, F.lit("train"))
        .when(bucket < train + valid, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


@register(
    "s31_hash_split",
    oracle=f"""
    WITH b AS (
      SELECT n_chars,
             {sql_bucket("doc_id")} AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           {sql_davg("n_chars", "avg_chars")}
    FROM b
    GROUP BY 1
    """,
    doc="Deterministic 80/10/10 train/valid/test split of documents by "
        "md5(doc_id) bucket; per-split count + exact decimal-avg doc length. "
        "Pure column expressions — the split is computed inside the scan "
        "stage, no shuffle beyond the final 3-group agg.",
    tags=("sampling", "pipeline"),
)
def s31_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sum_dec = F.sum(F.col("n_chars").cast("decimal(28,6)")).cast("double")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            (sum_dec / F.count("n_chars")).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Stratified sampling: per-stratum rates, deterministic membership
# ---------------------------------------------------------------------------
def stratified_sample(df: DataFrame, key: str, rates: dict[str, int],
                      stratum: str, default_pct: int) -> DataFrame:
    """Keep ~pct% of each stratum, membership decided by md5(key) bucket —
    the downsample-overrepresented-languages step of a corpus pipeline.
    ``rates`` maps stratum value -> percentage kept."""
    threshold = F.lit(default_pct)
    for value, pct in rates.items():
        threshold = F.when(F.col(stratum) == value, F.lit(pct)).otherwise(threshold)
    return df.filter(spark_bucket(F.col(key)) < threshold)


@register(
    "s31b_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {sql_bucket("doc_id")}
          < (CASE WHEN lang = 'en' THEN 10 ELSE 40 END)
    """,
    doc="Deterministic stratified sample: keep 10% of 'en' docs, 40% of "
        "every other language, membership = md5(doc_id) bucket < rate. "
        "The filter is a pure scan-stage predicate (no shuffle at all).",
    tags=("sampling", "pipeline"),
)
def s31b_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "doc_id", {"en": 10}, "lang", 40)


# ---------------------------------------------------------------------------
# k-per-group deterministic sample (hash-ordered window)
# ---------------------------------------------------------------------------
K_PER_GROUP = 3


@register(
    "s31c_group_sample",
    oracle=f"""
    SELECT source, doc_id
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= {K_PER_GROUP}
    """,
    doc=f"Deterministic {K_PER_GROUP}-per-source sample: row_number over an "
        "md5-ordered window — a reproducible 'few examples per source' "
        "inspection sample. One shuffle on source; at scale the window "
        "partial-aggregates per partition before the shuffle via the "
        "rank-limit pushdown (Spark WindowGroupLimit).",
    tags=("sampling", "pipeline"),
)
def s31c_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    order = [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")]
    rn = F.row_number().over(W.partitionBy("source").orderBy(*order))
    return (
        docs.withColumn("rn", rn)
        .filter(F.col("rn") <= K_PER_GROUP)
        .select("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing (greedy fill per source)
# ---------------------------------------------------------------------------
TOKEN_BUDGET = 512


@register(
    "s33_sequence_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(LEN(regexp_split_to_array(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), r AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS run
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           -- DuckDB windowed SUM(BIGINT) is HUGEINT; without the CAST the
           -- chunk_id column reaches pandas as float64 and hash-mismatches
           -- Spark's int64 even when every value is identical.
           CAST((run - n_tokens) // {TOKEN_BUDGET} AS BIGINT) AS chunk_id
    FROM r
    """,
    doc=f"Sequence packing: greedy-fill documents (doc_id order) into "
        f"~{TOKEN_BUDGET}-token training chunks per source — chunk_id = "
        "floor(tokens-before-me / budget) over a running window sum. The "
        "batch-construction step of an LLM data pipeline; integer-only "
        "arithmetic, exact. One shuffle on source; packing is an "
        "in-partition scan.",
    tags=("sampling", "pipeline"),
)
def s33_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    return sequence_pack(docs, TOKEN_BUDGET)


def sequence_pack(docs: DataFrame, budget: int = TOKEN_BUDGET) -> DataFrame:
    """Assign each (doc_id, source, n_tokens) row its training chunk:
    chunk_id = floor(tokens-before-me-in-source / budget), docs taken in
    doc_id order per source. Pure function of the rows — independent of
    partition layout (the window orders totally on (source, doc_id))."""
    run = F.sum("n_tokens").over(
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    before_me = run - F.col("n_tokens")  # tokens already packed in my source
    return docs.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(before_me / budget).cast("bigint").alias("chunk_id"),
    )


# ---------------------------------------------------------------------------
# Overlapping-window document chunking (context-window preparation)
# ---------------------------------------------------------------------------
CHUNK_TOKENS = 32   # tokens per chunk (model context window stand-in)
CHUNK_STRIDE = 24   # tokens between chunk starts (overlap = 32 - 24 = 8)


@register(
    "s33b_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, ' ') AS toks,
             CAST(LEN(regexp_split_to_array(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, toks, n_tokens,
             unnest(generate_series(
               0, GREATEST(0, CAST(CEIL(
                    (CAST(n_tokens AS DOUBLE) - {CHUNK_TOKENS})
                      / {CHUNK_STRIDE}) AS BIGINT)))) AS chunk_idx
      FROM t
    )
    SELECT doc_id, chunk_idx,
           CAST(LEAST({CHUNK_TOKENS}, n_tokens - chunk_idx * {CHUNK_STRIDE})
                AS BIGINT) AS chunk_len,
           md5(array_to_string(
             list_slice(toks,
                        chunk_idx * {CHUNK_STRIDE} + 1,
                        chunk_idx * {CHUNK_STRIDE}
                          + LEAST({CHUNK_TOKENS},
                                  n_tokens - chunk_idx * {CHUNK_STRIDE})),
             ' ')) AS chunk_hash
    FROM c
    """,
    doc=f"Overlapping-window chunking: each document's token stream is cut "
        f"into {CHUNK_TOKENS}-token chunks every {CHUNK_STRIDE} tokens "
        f"(8-token overlap) — the context-window preparation step before "
        "training/embedding. chunk_hash = md5 of the reconstructed chunk "
        "text proves the slice is exact, keeping output narrow. The last "
        "chunk is the FIRST one reaching the document end — ceil((n - "
        "chunk)/stride), clamped at 0 — so no emitted chunk is fully "
        "contained in its predecessor (a naive floor((n-1)/stride) bound "
        "emits a pure-duplicate tail chunk for ~1/3 of document lengths, "
        "feeding duplicated content to training). explode(sequence()) "
        "fans out rows inside the scan stage: no shuffle, no Python, "
        "output rows ~= corpus_tokens/stride. At 100 TB this is the same "
        "one-pass narrow map per input split.",
    tags=("sampling", "pipeline"),
)
def s33b_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    ).withColumn("n_tokens", F.size("toks").cast("bigint"))
    start = F.col("chunk_idx") * CHUNK_STRIDE
    chunk_len = F.least(F.lit(CHUNK_TOKENS), F.col("n_tokens") - start)
    last_idx = F.greatest(
        F.lit(0).cast("bigint"),
        F.ceil(
            (F.col("n_tokens").cast("double") - CHUNK_TOKENS) / CHUNK_STRIDE
        ).cast("bigint"),
    )
    return (
        docs.withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0).cast("bigint"), last_idx)),
        )
        .select(
            "doc_id",
            "chunk_idx",
            chunk_len.cast("bigint").alias("chunk_len"),
            F.md5(
                F.array_join(
                    F.slice(F.col("toks"), (start + 1).cast("int"),
                            chunk_len.cast("int")),
                    " ",
                )
            ).alias("chunk_hash"),
        )
    )


# ---------------------------------------------------------------------------
# Domain-mixture resampling with oversampling epochs
# ---------------------------------------------------------------------------
# Target number of training documents per language. Budgets are sized
# against the synthetic corpus' language counts (en ~2/5, others ~1/7
# each — sf0.01: en 218, de 70, es 73, fr 64, zh 75; sf0.1: en 2059,
# de 702, es 744, fr 742, zh 753) so BOTH mixing behaviors are
# exercised at every tested scale: en/de/es/fr are downsampled
# (budget < count), while zh — budget above even its sf0.1 count — is
# oversampled by cycling its documents over multiple epochs, the
# low-resource-language repeat pattern of LLM data mixing. (The
# original budgets sat below every count at every scale, so the epoch
# fan-out was dead code no correctness round could regress.)
MIXTURE_BUDGET = {"en": 150, "de": 50, "es": 50, "fr": 50, "zh": 2000}


def _budget_case_sql() -> str:
    arms = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in MIXTURE_BUDGET.items()
    )
    return f"CASE {arms} ELSE 0 END"


@register(
    "s31d_domain_mixture",
    oracle=f"""
    WITH r AS (
      SELECT lang, doc_id,
             {_budget_case_sql()} AS budget,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS cnt
      FROM documents
    )
    SELECT lang, doc_id,
           unnest(generate_series(0, (budget - rn) // cnt)) AS epoch
    FROM r
    WHERE rn <= budget
    """,
    doc="Domain-mixture resampling to fixed per-language budgets: each "
        "language keeps its md5-ordered first `budget` slots, and when "
        "the budget exceeds the corpus (zh: 2000 vs 75 docs at sf0.01) "
        "documents cycle over extra epochs (doc emitted for every epoch "
        "e with e*count+rn <= budget) — deterministic oversampling for "
        "low-resource domains, exactly `budget` output rows per "
        "oversampled domain. One shuffle on lang for the window; the "
        "epoch fan-out is explode(sequence()) in the same stage. The "
        "reproducible data-mixing step of an LLM pipeline.",
    tags=("sampling", "pipeline"),
)
def s31d_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    budget = F.lit(0)
    for k, v in MIXTURE_BUDGET.items():
        budget = F.when(F.col("lang") == k, F.lit(v)).otherwise(budget)
    order = [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")]
    w = W.partitionBy("lang")
    return (
        docs.withColumn("budget", budget.cast("bigint"))
        .withColumn("rn", F.row_number().over(w.orderBy(*order)).cast("bigint"))
        .withColumn("cnt", F.count("*").over(w))
        .filter(F.col("rn") <= F.col("budget"))
        .select(
            "lang",
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.floor((F.col("budget") - F.col("rn")) / F.col("cnt")),
                )
            ).alias("epoch"),
        )
    )


# ---------------------------------------------------------------------------
# S31 variant — leak-free temporal split with purge gap
# ---------------------------------------------------------------------------
SPLIT_T = "2000-06-01"
PURGE_DAYS = 30


@register(
    "s31e_temporal_split",
    oracle=f"""
    SELECT CASE
             WHEN o_orderdate <  TIMESTAMP '{SPLIT_T}' - INTERVAL {PURGE_DAYS} DAY
               THEN 'train'
             WHEN o_orderdate >= TIMESTAMP '{SPLIT_T}' THEN 'test'
             ELSE 'purged'
           END AS split,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    GROUP BY 1
    """,
    doc="Leak-free temporal split: train strictly before the cutoff "
        f"minus a {PURGE_DAYS}-day embargo, test strictly after the "
        "cutoff, the gap purged — the standard guard against lookahead "
        "leakage when labels aggregate a trailing window (a train row "
        "whose label window crosses the cutoff would leak test-period "
        "information). Pure date arithmetic inside the scan stage; the "
        "only shuffle is the 3-group summary. Against a date-"
        "partitioned table the three predicates become partition "
        "pruning.",
    tags=("sampling", "pipeline", "temporal"),
)
def s31e_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xgboost_ray_spark.registry import dsum

    cutoff = F.lit(SPLIT_T).cast("timestamp")
    train_end = cutoff - F.expr(f"INTERVAL {PURGE_DAYS} DAYS")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    split = (
        F.when(F.col("o_orderdate") < train_end, F.lit("train"))
        .when(F.col("o_orderdate") >= cutoff, F.lit("test"))
        .otherwise(F.lit("purged"))
    )
    return (
        orders.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sample without replacement (Efraimidis–Spirakis, deterministic)
# ---------------------------------------------------------------------------
WS_K = 100


@register(
    "s31f_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars, es_key
    FROM (
      SELECT doc_id, lang, n_chars,
             ROUND(
               LN((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) + 0.5) / 1152921504606846976.0)
                 / n_chars, 12) AS es_key
      FROM documents
      WHERE n_chars > 0
    )
    ORDER BY es_key DESC, doc_id
    LIMIT {WS_K}
    """,
    doc="Weighted sample without replacement via the Efraimidis–Spirakis "
        "exponential-key trick: each doc draws u = md5-derived uniform in "
        "(0,1) and competes with key ln(u)/weight (monotone transform of "
        "u^(1/w)); the global top-k by key IS an exact weighted sample. "
        "Deterministic — u is a pure function of doc_id, so the sample is "
        "reproducible across clusters, partitionings and reruns, and "
        "exactly oracle-checkable (ln and the division are IEEE-identical "
        "on identical operands). Scale: no shuffle of the corpus — the "
        "top-k is TakeOrderedAndProject (per-partition partial top-k, "
        "driver merges k*partitions rows); weight here is n_chars, i.e. "
        "length-proportional sampling for token-budget curation.",
    tags=("sampling", "topk"),
)
def s31f_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "n_chars")
    )
    return weighted_sample(docs, key="doc_id", weight="n_chars", k=WS_K)


def weighted_sample(df: DataFrame, key: str, weight: str, k: int) -> DataFrame:
    """Efraimidis–Spirakis weighted sample without replacement: each row
    draws a deterministic md5-derived uniform u from its key and competes
    with es_key = ln(u)/weight; the global top-k by es_key IS an exact
    weighted sample. Pure function of (key, weight) — reproducible across
    partitionings, cluster sizes and reruns."""
    h60 = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    # 2^60 = 1152921504606846976; +0.5 keeps u strictly inside (0, 1).
    u = (h60 + F.lit(0.5)) / F.lit(1152921504606846976.0)
    # ln differs from DuckDB's in the last ulp (neither libm is
    # correctly rounded); 12-decimal rounding is safe for continuous
    # values (midpoints have measure zero — see registry.py notes).
    es_key = F.round(F.log(u) / F.col(weight), 12)
    return (
        df.withColumn("es_key", es_key)
        .orderBy(F.col("es_key").desc(), F.col(key))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling (contrastive training pairs)
# ---------------------------------------------------------------------------
NEG_PER_ANCHOR = 3
_NEG_MULT = 1103515245
_NEG_STEP = 2654435761


@register(
    "s31g_negative_pairs",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS c FROM documents),
    negs AS (
      SELECT doc_id, j,
             CAST((doc_id::DECIMAL(38,0) * {_NEG_MULT} + j * {_NEG_STEP})
                  % c AS BIGINT) AS neg_id
      FROM documents
      CROSS JOIN n
      CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j)
    )
    SELECT negs.doc_id, CAST(j AS INT) AS neg_rank, neg_id,
           d.source AS neg_source, d.lang AS neg_lang
    FROM negs
    JOIN documents d ON d.doc_id = neg_id
    WHERE neg_id <> negs.doc_id
    """,
    doc="Contrastive-training negative sampling: each anchor document "
        "draws NEG_PER_ANCHOR pseudo-random partners via an affine hash "
        "ring over the dense doc_id space — deterministic (same negatives "
        "every epoch/cluster/rerun, so experiments reproduce), collision-"
        "free with the anchor by construction filter, and uniform enough "
        "for in-batch negatives. Scale: the corpus count is ONE scalar "
        "aggregate broadcast into a per-row expression (never a per-row "
        "subquery); the 3x fan-out happens inside the scan stage; the "
        "only shuffle is the equi-join fetching negative metadata, which "
        "at 100 TB co-partitions on the id like any fact-fact join. A "
        "mod-ring over dense ids is the standard trick when ids are "
        "compact; sparse ids would hash-bucket first (see s31 helpers).",
    tags=("sampling", "contrastive"),
)
def s31g_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.select(F.count("*").alias("c"))
    anchors = (
        docs.select("doc_id")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            F.explode(F.array(*[F.lit(j) for j in range(1, NEG_PER_ANCHOR + 1)]))
            .alias("j"),
            "c",
        )
        .select(
            "doc_id",
            F.col("j").cast("int").alias("neg_rank"),
            # DECIMAL(38,0) keeps doc_id * MULT exact for any real id
            # space — int64 would wrap above doc_id ~8.4e9 (silently in
            # Spark, an error in DuckDB), producing negative neg_ids
            # that match nothing and quietly starve anchors of
            # negatives.
            (
                (
                    F.col("doc_id").cast("decimal(38,0)") * _NEG_MULT
                    + F.col("j").cast("decimal(38,0)") * _NEG_STEP
                )
                % F.col("c")
            )
            .cast("bigint")
            .alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
    )
    meta = docs.select(
        F.col("doc_id").alias("m_id"),
        F.col("source").alias("neg_source"),
        F.col("lang").alias("neg_lang"),
    )
    return anchors.join(meta, F.col("neg_id") == F.col("m_id")).select(
        "doc_id", "neg_rank", "neg_id", "neg_source", "neg_lang"
    )


# ---------------------------------------------------------------------------
# Equal-frequency feature discretization (exact ntile binning)
# ---------------------------------------------------------------------------
N_BINS = 10


@register(
    "s31h_quantile_bins",
    oracle=f"""
    SELECT event_id, event_type, value,
           CAST(ntile({N_BINS}) OVER (
             PARTITION BY event_type
             -- NULLS LAST pinned on BOTH sides: Spark's ASC default is
             -- NULLS FIRST, DuckDB's is NULLS LAST — a NULL value would
             -- silently shift every bucket boundary in its group.
             ORDER BY value ASC NULLS LAST, event_id
           ) AS BIGINT) AS bin
    FROM events
    """,
    doc=f"Equal-frequency discretization: each event's value mapped to its "
        f"per-group decile (ntile({N_BINS}) over a TOTAL order — value "
        "then id — so bucket boundaries are deterministic and the "
        "assignment hash-matches across engines). One window shuffle on "
        "the group key. ntile sorts each group; at 100 TB the production "
        "variant computes approx-percentile cutpoints in one aggregate "
        "pass and broadcasts them back (the s09e histogram-threshold "
        "pattern) — same feature, sort-free, at the cost of boundary "
        "approximation.",
    tags=("events", "sampling", "features"),
)
def s31h_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w = W.partitionBy("event_type").orderBy(
        F.asc_nulls_last("value"), "event_id"
    )
    return ev.withColumn("bin", F.ntile(N_BINS).over(w).cast("bigint"))
