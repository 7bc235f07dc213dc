"""Mega-bucket guards for the bucketed pair generators (MinHash LSH bands,
SimHash Hamming blocks).

These pin the skew guard as executable behavior, not a docstring claim:
the cap actually drops oversized buckets, the ``observe()`` metrics report
the drop in-job (zero extra scans), and default observation names are
unique so the operator composes with itself in one plan.
"""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import Observation
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.operators.dedup import (
    minhash_candidate_pairs,
    simhash64,
    simhash_hamming_pairs,
)


def _docs(spark, n=None):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    return docs.limit(n) if n else docs


def test_minhash_observe_metrics_report(spark):
    obs = Observation("mh_guard")
    pairs = minhash_candidate_pairs(_docs(spark), observation=obs)
    pairs.count()
    got = obs.get
    assert got["mega_buckets_dropped"] >= 0
    assert got["max_bucket_size"] >= 2  # fixture has real duplicate docs


def test_minhash_cap_drops_mega_buckets(spark):
    # Cap of 2: any band bucket with >2 docs must be dropped AND counted.
    obs = Observation("mh_guard_tight")
    docs = _docs(spark, n=200)
    capped = minhash_candidate_pairs(docs, max_bucket=2, observation=obs)
    n_capped = capped.count()
    dropped = obs.get["mega_buckets_dropped"]
    n_full = minhash_candidate_pairs(docs).count()
    assert dropped > 0, "fixture duplicates must exceed a cap of 2"
    assert n_capped < n_full, "capped run must emit fewer candidate pairs"


def test_hamming_observe_metrics_report(spark):
    obs = Observation("hm_guard")
    pairs = simhash_hamming_pairs(_docs(spark), observation=obs)
    pairs.count()
    got = obs.get
    assert got["hamming_mega_buckets_dropped"] >= 0
    assert got["hamming_max_bucket_size"] >= 2


def test_hamming_cap_drops_mega_buckets(spark):
    # A 16-bit fingerprint's 6-bit top block has only 64 values — a tight
    # cap must trigger on the fixture and shrink the pair set.
    obs = Observation("hm_guard_tight")
    docs = _docs(spark, n=300)
    capped = simhash_hamming_pairs(docs, max_bucket=3, observation=obs)
    n_capped = capped.count()
    dropped = obs.get["hamming_mega_buckets_dropped"]
    n_full = simhash_hamming_pairs(docs).count()
    assert dropped > 0
    assert n_capped < n_full


def test_default_observation_names_compose(spark):
    # Two instances of the same operator in one plan: default observe()
    # names must not collide (fixed names raise AnalysisException).
    docs = _docs(spark, n=100)
    a = minhash_candidate_pairs(docs)
    b = minhash_candidate_pairs(docs)
    assert a.union(b).count() >= a.count()
    ha = simhash_hamming_pairs(docs)
    hb = simhash_hamming_pairs(docs)
    assert ha.union(hb).count() >= ha.count()


def test_spill_rebuilds_do_not_accumulate_dirs(spark):
    """Stable spill keys: rebuilding the same registered query (bench loops,
    determinism sweeps) must reuse the same scratch dir, not mint a new one
    per build."""
    import os

    from xgboost_ray_spark.catalog import SCRATCH_DIR
    from xgboost_ray_spark.registry import all_queries

    build = all_queries()["s26d_ngram_jaccard"].build

    def spill_dirs():
        try:
            return {
                n for n in os.listdir(SCRATCH_DIR) if n.startswith("spill_")
            }
        except FileNotFoundError:
            return set()

    build(spark, SF_SMOKE).count()
    after_first = spill_dirs()
    build(spark, SF_SMOKE).count()
    after_second = spill_dirs()
    assert after_second == after_first, (
        "rebuilding s26d over the same input minted new spill dirs: "
        f"{sorted(after_second - after_first)}"
    )


def test_spill_shared_key_does_not_break_live_reader(spark):
    """Two operators sharing one (tag, key) spill — s26d and s26g both
    resolve to the 'jaccard_shingles' dir for the same input — must not
    overwrite the dir under a frame whose reader already captured the old
    part-file listing. Repro from round-5 ADVICE: build s26d, build s26g,
    THEN collect s26d — the overwrite made that collect fail with
    FAILED_READ_FILE.FILE_NOT_EXIST. spill() now reuses a path already
    written by this process."""
    from xgboost_ray_spark.registry import all_queries

    q = all_queries()
    first = q["s26d_ngram_jaccard"].build(spark, SF_SMOKE)
    n_before = first.count()
    q["s26g_dup_clusters"].build(spark, SF_SMOKE).count()
    # The earlier frame must still be collectible after the sibling built.
    assert first.count() == n_before


def test_spill_rebuild_self_heals_after_external_gc(spark):
    """A CONCURRENT process's sweep_scratch (cross-session GC keyed on ITS
    epoch — e.g. the test_foreign_cwd subprocess building any registered
    query) deletes this process's spill dirs while ``_SPILLED_PATHS`` still
    lists them. The next build must detect the missing dir and rewrite,
    not trust the in-memory record — the full-suite failure mode that broke
    s26d/s26g/s26l after test_foreign_cwd ran."""
    import os
    import shutil

    from xgboost_ray_spark.catalog import SCRATCH_DIR
    from xgboost_ray_spark.operators import dedup
    from xgboost_ray_spark.registry import all_queries

    build = all_queries()["s26d_ngram_jaccard"].build
    assert build(spark, SF_SMOKE).count() > 0
    spilled = [
        p
        for p in dedup._SPILLED_PATHS
        if p.startswith(os.path.join(SCRATCH_DIR, "spill_jaccard_shingles"))
    ]
    assert spilled, "s26d must register its keyed spill"
    for p in spilled:  # simulate the foreign process's GC
        shutil.rmtree(p, ignore_errors=True)
    assert build(spark, SF_SMOKE).count() > 0  # self-heals by rewriting


def test_spill_reuse_verifies_completion_marker(spark, monkeypatch):
    """Verify-on-read: the reuse leg must trust a dir only when the
    completion marker the finished write stamped is still there. A dir
    tampered with AFTER our write (a foreign sweep mis-judging liveness,
    a manual partial delete can remove any subset of files while isdir
    stays true) must downgrade to a rewrite — the missing-dir self-heal
    path — not be served to the consumer as silent partial data."""
    import os

    from xgboost_ray_spark.catalog import SCRATCH_DIR
    from xgboost_ray_spark.operators import dedup
    from xgboost_ray_spark.registry import all_queries

    build = all_queries()["s26d_ngram_jaccard"].build
    expected = build(spark, SF_SMOKE).count()
    assert expected > 0
    # Unit leg: the three freshness states of one (tag, key). The
    # .scratch dirs persist across suite RUNS, so clear any prior run's
    # leftovers first — this test's own final re-mark writes markers.
    import shutil

    path, fresh = dedup.scratch_once("marker_unit", "k1")
    shutil.rmtree(path, ignore_errors=True)
    assert fresh, "never-written path must be fresh"
    os.makedirs(path, exist_ok=True)
    dedup.mark_scratch_written(path)
    assert os.path.isfile(os.path.join(path, dedup.COMPLETE_MARKER))
    _, fresh = dedup.scratch_once("marker_unit", "k1")
    assert not fresh, "completed write must be reused"
    os.remove(os.path.join(path, dedup.COMPLETE_MARKER))  # tamper
    _, fresh = dedup.scratch_once("marker_unit", "k1")
    assert fresh, "marker gone -> reuse must downgrade to rewrite"

    # Marker-write FAILURE leg: when the marker itself can't be written
    # (ENOSPC/EACCES), the in-memory record must stay the authority —
    # otherwise every later build would see "marker missing", rewrite,
    # and overwrite part files under earlier builds' live readers.
    import builtins

    path2, fresh = dedup.scratch_once("marker_unit_fail", "k1")
    shutil.rmtree(path2, ignore_errors=True)  # prior run's marker
    assert fresh
    os.makedirs(path2, exist_ok=True)
    real_open = builtins.open

    def failing_open(p, *a, **kw):
        if str(p).endswith(dedup.COMPLETE_MARKER):
            raise OSError("disk full")
        return real_open(p, *a, **kw)

    with monkeypatch.context() as mp:
        mp.setattr(builtins, "open", failing_open)
        dedup.mark_scratch_written(path2)
    assert path2 in dedup._MARKERLESS
    assert not os.path.isfile(os.path.join(path2, dedup.COMPLETE_MARKER))
    _, fresh = dedup.scratch_once("marker_unit_fail", "k1")
    assert not fresh, "failed marker write must NOT force perpetual rewrites"
    # a later successful mark restores verify-on-read for the dir
    dedup.mark_scratch_written(path2)
    assert path2 not in dedup._MARKERLESS
    assert os.path.isfile(os.path.join(path2, dedup.COMPLETE_MARKER))

    # Integration leg: the registered s26d spill self-heals through the
    # same predicate — tamper its marker, the next build rewrites and
    # still produces identical results with the marker restored.
    spilled = [
        p
        for p in dedup._SPILLED_PATHS
        if p.startswith(os.path.join(SCRATCH_DIR, "spill_jaccard_shingles"))
    ]
    assert spilled, "s26d must register its keyed spill"
    for p in spilled:
        marker = os.path.join(p, dedup.COMPLETE_MARKER)
        assert os.path.isfile(marker), "finished write must stamp marker"
        os.remove(marker)
    assert build(spark, SF_SMOKE).count() == expected
    for p in spilled:
        assert os.path.isfile(os.path.join(p, dedup.COMPLETE_MARKER))


def test_keyless_spill_same_object_reuses_not_overwrites(spark):
    """A keyless digest hashes the analyzed plan, which Spark memoizes on
    the Dataset — so spilling the SAME DataFrame object twice hashes to
    one path. The second call must REUSE the dir, not overwrite it: an
    overwrite deletes the part files the first result's reader already
    listed (the live-reader hazard spill() exists to prevent). This is
    why keyless paths are recorded in ``_SPILLED_PATHS`` too."""
    import shutil

    from xgboost_ray_spark.operators import dedup

    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    before = set(dedup._SPILLED_PATHS)
    try:
        a = dedup.spill(df, "testguard_keyless")
        new = set(dedup._SPILLED_PATHS) - before
        assert len(new) == 1 and "testguard_keyless" in next(iter(new))
        path = next(iter(new))
        listing = sorted(os.listdir(path))
        b = dedup.spill(df, "testguard_keyless")  # same object, same digest
        assert sorted(os.listdir(path)) == listing, "second spill rewrote"
        # The first result must still be collectable after the second call.
        assert a.count() == 10 and b.count() == 10
    finally:
        for p in set(dedup._SPILLED_PATHS) - before:
            dedup._SPILLED_PATHS.discard(p)
            shutil.rmtree(p, ignore_errors=True)


def test_sweep_scratch_removes_stale_spills(spark, tmp_path):
    """prepare_session GCs spill dirs whose mtime predates this process
    AND is beyond the grace window — a dir that merely predates the epoch
    but is YOUNG belongs to a concurrently running session (the
    test_foreign_cwd subprocess seeing its parent's seconds-old spills)
    and must survive, or the subprocess deletes the parent's dirs out
    from under its live readers."""
    import os

    from xgboost_ray_spark import catalog
    from xgboost_ray_spark.catalog import (
        SCRATCH_DIR,
        SWEEP_GRACE_SEC,
        sweep_scratch,
    )

    os.makedirs(SCRATCH_DIR, exist_ok=True)
    stale = os.path.join(SCRATCH_DIR, "spill_testguard_deadbeef0000")
    os.makedirs(stale, exist_ok=True)
    old = catalog._SESSION_EPOCH - 2 * SWEEP_GRACE_SEC
    os.utime(stale, (old, old))
    # Concurrent-parent case: predates this process's epoch, but recent.
    # Epoch-only GC (the pre-r7 behavior) deleted exactly this dir.
    concurrent = os.path.join(SCRATCH_DIR, "spill_testguard_cafe00000000")
    os.makedirs(concurrent, exist_ok=True)
    young = catalog._SESSION_EPOCH - 5
    os.utime(concurrent, (young, young))
    # A fresh dir (this session's epoch or later) must survive the sweep.
    fresh = os.path.join(SCRATCH_DIR, "spill_testguard_feed00000000")
    os.makedirs(fresh, exist_ok=True)
    # Liveness beats age: a dir old enough to be reaped by the mtime rules
    # but stamped with a LIVE owner pid (a long-running concurrent session
    # — e.g. this very process) must survive; the same dir with a dead
    # owner is garbage.
    live_owner = os.path.join(SCRATCH_DIR, "spill_testguard_a11ce0000000")
    os.makedirs(live_owner, exist_ok=True)
    with open(os.path.join(live_owner, ".owner_pid"), "w") as fh:
        fh.write(str(os.getpid()))
    os.utime(live_owner, (old, old))
    dead_owner = os.path.join(SCRATCH_DIR, "spill_testguard_dead00000000")
    os.makedirs(dead_owner, exist_ok=True)
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()  # reaped: the pid no longer names a running process
    with open(os.path.join(dead_owner, ".owner_pid"), "w") as fh:
        fh.write(str(proc.pid))
    os.utime(dead_owner, (old, old))
    # Pid recycling: a marker naming a LIVE pid but the WRONG per-boot
    # start time belongs to a dead session whose pid was recycled — it
    # must be reaped, not kept alive for the recycler's lifetime. The
    # matching (pid, start_ticks) pair is this very process and survives.
    own_ticks = catalog._proc_start_ticks(os.getpid())
    recycled = os.path.join(SCRATCH_DIR, "spill_testguard_rec1c1e00000")
    live_ticks = os.path.join(SCRATCH_DIR, "spill_testguard_11fe71c50000")
    if own_ticks is not None:  # /proc present (Linux)
        os.makedirs(recycled, exist_ok=True)
        with open(os.path.join(recycled, ".owner_pid"), "w") as fh:
            fh.write(f"{os.getpid()} {own_ticks - 12345}")
        os.utime(recycled, (old, old))
        os.makedirs(live_ticks, exist_ok=True)
        with open(os.path.join(live_ticks, ".owner_pid"), "w") as fh:
            fh.write(f"{os.getpid()} {own_ticks}")
        os.utime(live_ticks, (old, old))
    try:
        catalog._SCRATCH_SWEPT = False  # re-arm the once-per-process guard
        assert sweep_scratch() >= 2
        assert not os.path.exists(stale)
        assert not os.path.exists(dead_owner)
        assert os.path.exists(concurrent)
        assert os.path.exists(fresh)
        assert os.path.exists(live_owner)
        if own_ticks is not None:
            assert not os.path.exists(recycled), "recycled pid kept garbage"
            assert os.path.exists(live_ticks)
        # Second call in the same process is a no-op by design.
        assert sweep_scratch() == 0
    finally:
        import shutil

        for d in (stale, concurrent, fresh, live_owner, dead_owner,
                  recycled, live_ticks):
            shutil.rmtree(d, ignore_errors=True)


def test_simhash64_pairs_recall_vs_bruteforce(spark):
    """Blocked 64-bit candidate generation must equal brute-force all-pairs
    at distance <= 2 (pigeonhole guarantee, no capped buckets at n=150)."""
    docs = _docs(spark, n=150)
    fp = simhash64(docs).cache()
    blocked = {
        (r.doc_a, r.doc_b)
        for r in simhash_hamming_pairs(
            docs, bits=64, fingerprints=fp
        ).collect()
    }
    a, b = fp.alias("a"), fp.alias("b")
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("dist"),
        )
        .filter(F.col("dist") <= 2)
        .collect()
    }
    fp.unpersist()
    assert blocked == brute


def test_layout_scratch_keyed_per_sf_interleaved_builds(spark):
    """Layout round-trip entries (scratch CSV/JSONL/partitioned-parquet
    rewrites) must key their scratch dirs by sf: with a constant path, a
    build at another sf OVERWRITES the files a previously built,
    still-lazy result will read at action time — returning the wrong
    sf's rows or failing on the vanished part files."""
    from tests.conftest import SF_ORACLE
    from xgboost_ray_spark.catalog import load_table
    from xgboost_ray_spark.registry import all_queries

    q = all_queries()
    for entry in ("s01c_partition_pruning", "s01g_jsonl_scan"):
        first = q[entry].build(spark, SF_SMOKE)
        expected = first.count()
        q[entry].build(spark, SF_ORACLE).count()
        got = first.count()
        assert got == expected, (
            f"{entry}: sf0.001 result changed after an sf0.01 build "
            f"({expected} -> {got} rows) — scratch path shared across sfs"
        )
    # Sanity: the two sfs genuinely differ for the checked table, so a
    # shared path could not have passed by content coincidence.
    assert (
        load_table(spark, SF_SMOKE, "orders").count()
        != load_table(spark, SF_ORACLE, "orders").count()
    )


def test_layout_rebuild_reuses_scratch_under_live_reader(spark):
    """A same-sf REBUILD of a layout entry must reuse the written scratch
    dir, not rewrite it: mode('overwrite') mints new part filenames,
    invalidating the listing a previously built frame's reader captured
    (the spill() FILE_NOT_EXIST hazard, now shared via scratch_once)."""
    from xgboost_ray_spark.registry import all_queries

    q = all_queries()
    first = q["s01c_partition_pruning"].build(spark, SF_SMOKE)
    n = first.count()
    q["s01c_partition_pruning"].build(spark, SF_SMOKE).count()
    assert first.count() == n


def test_dup_clusters_leaves_no_cachemanager_entry(spark):
    """dup_clusters hands back a localCheckpoint, not the persisted final
    labels: a CacheManager entry keyed by the final round's canonical
    plan would survive the call and silently serve cached blocks to the
    SAME plan in a later rebuild (bench min-of-3, the determinism
    sweep's perturbed rebuilds) — skipping re-execution of the final
    round. After a full build+collect, the table cache must be empty."""
    from xgboost_ray_spark.operators.dedup import dup_clusters

    spark.catalog.clearCache()
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)],
        "doc_a bigint, doc_b bigint",
    )
    roots = {
        r.doc_id: r.cluster_root for r in dup_clusters(pairs).collect()
    }
    assert roots == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "dup_clusters left a persisted frame registered with the "
        "CacheManager after returning"
    )


def test_prefix_filter_lossless_on_adversarial_corpora(spark):
    """PPJoin prefix filtering claims PROVABLE losslessness vs the naive
    all-pairs join (s26l shares s26d's oracle on that basis). The sf-dir
    oracle exercises one data distribution; this drives the two kernels
    over corpora crafted at the theorem's edges — an exact Jaccard tie
    at the threshold (>= must keep it), just-below-threshold pairs
    (must drop), identical docs, docs shorter than the shingle width
    (one whole-text shingle by _gram_expr's greatest(...,1) clamp), a
    stop-word shingle shared by every doc (prefix pruning's target),
    in-doc duplicate words (distinct collapse), and a seeded random
    near-dup corpus — across thresholds including a repeating-decimal
    rational (1/3) and t=1.0 (prefix length collapses to 1)."""
    import random

    from xgboost_ray_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    # J(tie4) vs J(tie5): |{w1 w2,w2 w3,w3 w4}| bigrams etc. — with n=1
    # word-set semantics are easy to construct exactly; n=2 covers the
    # sliding-window shingle path. Both widths run below.
    crafted = [
        (1, "w1 w2 w3 w4"),        # vs doc 2: unigram J = 3/5 (tie at 0.6)
        (2, "w1 w2 w3 w5"),
        (3, "w1 w2 w9 w10"),       # vs doc 1: J = 2/6 = 1/3 (tie at 1/3)
        (4, "w1 w2 w3 w4"),        # identical to doc 1: J = 1
        (5, "zz"),                 # shorter than any n: one whole-text shingle
        (6, "zz"),                 # identical short doc: J = 1
        (7, "w1 w1 w1 w2 w2 w3 w4"),  # duplicate words collapse to doc 1's set
        (8, "qq rr ss tt uu"),     # disjoint from everything but the hot word
        (9, "hot " * 3 + "only hot words here"),  # hot shingle stress
        (10, "hot qq rr ss tt"),
    ]
    rng = random.Random(26)
    vocab = ["a", "b", "c", "d", "e", "f"]
    randoms = [
        (100 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9))))
        for i in range(30)
    ]

    def pairs(fn, docs_df, n, t):
        rows = fn(docs_df, n=n, threshold=t).collect()
        return sorted((r.doc_a, r.doc_b, r.jaccard) for r in rows)

    for corpus in (crafted, crafted + randoms):
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        for n, t in ((1, 0.6), (1, 1 / 3), (2, 0.5), (1, 1.0)):
            naive = pairs(ngram_jaccard_pairs, docs, n, t)
            pruned = pairs(prefix_filtered_jaccard_pairs, docs, n, t)
            assert pruned == naive, (
                f"prefix filter diverged from all-pairs at n={n} t={t}: "
                f"only_naive={set(naive) - set(pruned)} "
                f"only_pruned={set(pruned) - set(naive)}"
            )
        # sanity: the crafted ties actually exercise the >= boundary
        if corpus is crafted:
            tie_pairs = {(a, b) for a, b, _ in pairs(
                ngram_jaccard_pairs, docs, 1, 0.6)}
            assert (1, 2) in tie_pairs, "exact-tie pair must survive"


def test_suffix_family_filter_boundary_pair_survives(spark):
    """The r15 suffix-family bound (SCALE.md contract) at exact equality:
    docs a = {a1 a2 p1 p2 t1 t2}, b = {b1 b2 p1 p2 t1 t2} at n=1,
    t=0.5. In the 2-doc corpus the unique tokens (df=1) rank first, so
    each prefix (p = 6-3+1 = 4) is {unique1, unique2, p1, p2}: the
    shared-prefix count is c=2 and the LAST shared prefix token p2 sits
    at rank rax=rbx=4 in both docs. The bound reads
    (den+num)*(c + min(sza-rax, szb-rbx)) = 3*(2+2) = 12 against
    num*(sza+szb) = 12 — EXACT equality — and the pair's true Jaccard
    is 4/8 = 0.5, an exact tie at the threshold. The pair must survive
    the filter AND the verify: an off-by-one in the shared-prefix count,
    a swapped max-code unpacking (rax/rbx), or a strict > in place of >=
    each over-prunes exactly this pair while leaving typical corpora
    untouched — the adversarial corpus test alone would not isolate it."""
    from xgboost_ray_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a1 a2 p1 p2 t1 t2"), (2, "b1 b2 p1 p2 t1 t2")],
        "doc_id long, text string",
    )
    pruned = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_filtered_jaccard_pairs(docs, n=1, threshold=0.5).collect()
    )
    naive = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, n=1, threshold=0.5).collect()
    )
    assert pruned == naive == [(1, 2, 0.5)], (
        f"boundary pair lost or distorted: pruned={pruned} naive={naive}"
    )


def test_prefix_filter_encoded_verify_matches_string_verify(spark):
    """The r14 scale adoption (SCALE.md r14 contract): the verify arrays
    carry audited xxhash64 shingle ids instead of strings. Intersection
    and size arithmetic are invariant under any injective relabeling, so
    the encoded output must equal the r9–r13 string-array output — every
    pair, every rounded jaccard value — on a corpus with threshold ties,
    identical docs, sub-shingle-width docs and hot shingles. (The
    adversarial-losslessness test above already proves the DEFAULT
    encoded path against the naive kernel; this pins the two verify
    spellings against each other so a future encoding change that
    perturbed rounded values, not just membership, is caught by name.)"""
    from xgboost_ray_spark.operators.dedup import prefix_filtered_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4"),
            (2, "w1 w2 w3 w5"),
            (3, "w1 w2 w9 w10"),
            (4, "w1 w2 w3 w4"),
            (5, "zz"),
            (6, "zz"),
            (7, "hot " * 3 + "only hot words here"),
            (8, "hot w9 w10 only"),
        ],
        "doc_id long, text string",
    )
    for n, t in ((1, 0.6), (2, 0.5), (1, 1.0)):
        enc = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in prefix_filtered_jaccard_pairs(
                docs, n=n, threshold=t, encode_verify=True
            ).collect()
        )
        raw = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in prefix_filtered_jaccard_pairs(
                docs, n=n, threshold=t, encode_verify=False
            ).collect()
        )
        assert enc == raw, f"encoded verify diverged at n={n} t={t}"
        if t == 0.6:
            assert (1, 2, 0.6) in enc, "threshold tie must survive encoding"


def test_gid_injectivity_audit_raises_on_collision(spark):
    """The collision audit is the exactness guarantee behind the encoded
    verify: a non-injective id expression must HARD-FAIL the build (a
    silent collision would under-count intersections or merge shingles),
    and the real xxhash64 must pass on a real shingle frame. The forced
    collision uses the injectable id_expr seam — Spark's xxhash64 seed is
    fixed, so a true 64-bit collision can't be staged with test-sized
    data."""
    import pytest
    from pyspark.sql import functions as F

    from xgboost_ray_spark.operators.dedup import _audit_gid_injective

    dfreq = spark.createDataFrame(
        [("aa bb",), ("bb cc",), ("cc dd",)], "g string"
    )
    _audit_gid_injective(dfreq)  # real hash: injective on 3 shingles
    with pytest.raises(RuntimeError, match="not injective"):
        _audit_gid_injective(dfreq, id_expr=F.lit(1))
    # boundary: an empty shingle frame (empty corpus) audits clean
    _audit_gid_injective(dfreq.filter(F.lit(False)))


def test_hamming_multi_index_lossless_vs_brute_force(spark):
    """The multi-index pigeonhole claim, pinned against brute force: with
    the bucket cap out of the way, every pair within max_dist bits must
    surface from the block equi-buckets. The sf oracle replicates the
    SAME blocking in SQL, so a block-split bug (overlap, missed bits,
    boundary off-by-one) could hide on both sides — brute force cannot.
    Crafted cases flip bits AT block boundaries and spread flips across
    all-but-one block; randoms cover 16-bit (dense collisions) and
    64-bit (sign bit exercised) fingerprints."""
    import random
    from itertools import combinations

    from xgboost_ray_spark.operators.dedup import simhash_hamming_pairs

    def signed64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    def brute(fps, d):
        return sorted(
            (a_id, b_id, bin((a ^ b) & ((1 << 64) - 1)).count("1"))
            for (a_id, a), (b_id, b) in combinations(sorted(fps), 2)
            if bin((a ^ b) & ((1 << 64) - 1)).count("1") <= d
        )

    rng = random.Random(8)
    base16 = 0b1010_0110_0101_1001
    crafted16 = [
        (1, base16),
        (2, base16 ^ 0b0000_0000_0001_1000),    # 2 flips straddling a
        (3, base16 ^ 0b0001_1000_0000_0000),    # 4-bit block boundary
        (4, base16 ^ 0b1000_0000_1000_0001),    # 3 flips, 3 blocks: d=3
        (5, base16 ^ 0b1000_0100_0010_0001),    # 1 flip per block: d=4
        (6, (1 << 16) - 1),
        (7, 0),
    ]
    rand16 = [(100 + i, rng.getrandbits(16)) for i in range(60)]
    bases64 = [rng.getrandbits(64) for _ in range(8)]
    near64 = [
        (200 + i, b ^ sum(1 << p for p in rng.sample(range(64), rng.randint(0, 4))))
        for i, b in enumerate(bases64 * 4)
    ]

    cases = [
        (crafted16, 16, 3),
        (crafted16, 16, 2),
        (rand16, 16, 2),
        (near64, 64, 3),
    ]
    for fps, bits, max_dist in cases:
        fp_df = spark.createDataFrame(
            [(i, signed64(v)) for i, v in fps], "doc_id long, simhash long"
        )
        got = sorted(
            (r.doc_a, r.doc_b, r.dist)
            for r in simhash_hamming_pairs(
                fp_df.limit(0),  # docs unused when fingerprints given
                max_dist=max_dist,
                bits=bits,
                max_bucket=10**6,
                fingerprints=fp_df,
            ).collect()
        )
        want = brute(fps, max_dist)
        assert got == want, (
            f"bits={bits} max_dist={max_dist}: "
            f"missed={set(want) - set(got)} extra={set(got) - set(want)}"
        )


def test_lsh_never_misses_exact_duplicates(spark):
    """MinHash-LSH is approximate on NEAR dups, but exact on exact dups:
    identical shingle sets give identical minhash rows, hence identical
    band values, hence at least one shared bucket — a pair of exact
    duplicates can never be missed, whatever the banding parameters.
    (Identical SETS, not identical strings: word-permuted docs with the
    same shingle multiset also qualify only when the n-gram sets match.)"""
    from xgboost_ray_spark.operators.dedup import minhash_candidate_pairs

    body = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, body),
            (2, body),                        # exact duplicate of 1
            (3, "completely different text about spark partitions"),
            (4, body),                        # second exact duplicate
            (5, "another unrelated document entirely here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(docs).select("doc_a", "doc_b").collect()
    }
    assert {(1, 2), (1, 4), (2, 4)} <= got, (
        f"exact-duplicate pair missing from LSH candidates: {got}"
    )


def test_dup_clusters_high_diameter_chain(spark):
    """Min-label propagation needs O(diameter) rounds. A path graph is
    the worst case per node count: the min label crawls one hop per
    round. Pin both contracts — a chain within max_iter converges to
    the single root, and one beyond max_iter raises the loud
    non-convergence error instead of returning partial labels."""
    import pytest

    from xgboost_ray_spark.operators.dedup import dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a bigint, doc_b bigint"
    )
    roots = {r.doc_id: r.cluster_root for r in dup_clusters(chain).collect()}
    assert roots == {i: 0 for i in range(9)}

    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(chain, max_iter=3)


def test_ppjoin_producer_leg_failure_propagates(spark, monkeypatch):
    """The s26l builder runs its three independent producer legs (pref
    spill, toks spill, injectivity audit) as concurrent jobs from a
    ThreadPoolExecutor (guide §2.6). VERDICT r15 #6: a leg failure must
    PROPAGATE to the caller as an exception — never hang the build or
    silently return a plan over missing scratch. The with-block joins
    all threads and .result() re-raises, so the failure mode is loud and
    bounded by construction; this pins that contract against a future
    respelling (e.g. fire-and-forget submits or a swallowed future)."""
    import pytest

    from xgboost_ray_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4"), (2, "w1 w2 w3 w5")],
        "doc_id long, text string",
    )

    real_spill = dedup.spill

    for failing_tag in ("ppjoin_pref", "ppjoin_toks"):
        def exploding_spill(df, tag, key=None, _fail=failing_tag):
            if tag == _fail:
                raise RuntimeError(f"injected {_fail} producer failure")
            return real_spill(df, tag, key=key)

        monkeypatch.setattr(dedup, "spill", exploding_spill)
        with pytest.raises(RuntimeError, match="injected"):
            dedup.prefix_filtered_jaccard_pairs(docs, n=1, threshold=0.5)
        monkeypatch.setattr(dedup, "spill", real_spill)
