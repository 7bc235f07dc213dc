#!/usr/bin/env python
"""Tile /root/testdata/sf0.1 into a 10x "sf1.0" probe corpus (VERDICT r12 #4).

The driver's generator is not available in-container, so the next-decade
scaling probe derives its corpus from the largest driver-generated scale
by KEY-SHIFTED REPLICATION: ten replicas of every fact table, each with
its key domains offset by ``r * (max_key + 1)`` so joins stay consistent
within a replica and never cross replicas. region/nation are copied
as-is (fixed-size at every TPC-H scale factor).

Design notes — each probe target's workload must scale ~LINEARLY, the
way the real generator would scale it, or the probe measures an
artifact of the tiling instead of the operator:

  * documents (s26g dup-clusters, s26l PPJoin): replica 0 keeps the
    original text; replicas 1-9 get every whitespace token suffixed
    with a per-replica tag (``q<r>``). An injective token rename
    preserves within-replica Jaccard/shingle structure EXACTLY while
    making cross-replica Jaccard 0 — so near-dup pairs, cluster count,
    and PPJoin candidates scale exactly 10x. Naive tiling (identical
    text) would instead put every doc in a 10-clique and grow candidate
    pairs ~100x — a different workload, not a bigger one. Tokenization
    in dedup.py is whitespace ``split(text, ' ')``, so the suffix
    survives; n_chars is recomputed (source invariant: n_chars ==
    len(text)).
  * lineitem + orders + customer + supplier (s24g PageRank, s30 GBT):
    shifting custkey AND suppkey per replica grows the bipartite
    purchase graph to 10x nodes and 10x edges with the same degree
    distribution (TPC-H scales both sides linearly). Keeping suppliers
    shared would instead grow supplier degree 10x — a skew probe, not
    a scale probe.
  * events (s25d stateful sessions): user_id shifted per replica, ts
    kept — 10x session keys over the same time window, same per-key
    event density, so state size scales linearly and watermark shape
    is unchanged.
  * embeddings (s27j k-means): vec_id shifted, vectors copied. Lloyd
    cost is N*K*dim; duplicate points scale N faithfully. (Not suited
    for near-dup ANN probes — cross-replica distances are 0 — but no
    probe target is one.)

Usage: python scripts/gen_scale_probe.py [out_dir] [replicas]
Defaults: /tmp/scale_probe/sf1.0, 10. Deterministic, no RNG.
"""

from __future__ import annotations

import os
import shutil
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# Source scale dir; tests point this at sf0.001 for a fast 2-replica tile.
SRC = os.environ.get("GEN_SCALE_PROBE_SRC", "/root/testdata/sf0.1")

# table -> columns to offset by r * (max(col over the SOURCE key domain
# owner) + 1); every foreign key uses its OWNER table's domain size so
# replicas stay join-consistent.
KEY_DOMAINS = {
    "c_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

TILED = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]
COPIED = ["region", "nation"]


def salt_text(text: str, r: int) -> str:
    """Injective per-replica token rename: ``w -> w + '\\x01' + r``.

    The \\x01 separator cannot appear in natural text tokens, so a salted
    token can never collide with an original one and (w, r) -> salted is
    injective — cross-replica Jaccard is 0 BY CONSTRUCTION, not just
    empirically. (The round-13 probe corpora used a plain ``q<r>`` suffix;
    their linearity was verified by counts instead — shingle/prefix/
    candidate rows all exactly 10.000x per decade, SCALE.md.)
    """
    tag = f"\x01{r}"
    return " ".join(w + tag for w in text.split(" "))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe/sf1.0"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)

    domain_size: dict[str, int] = {}
    for col, (owner, owner_col) in KEY_DOMAINS.items():
        key = f"{owner}.{owner_col}"
        if key not in domain_size:
            tbl = pq.read_table(
                os.path.join(SRC, f"{owner}.parquet"), columns=[owner_col]
            )
            domain_size[key] = int(pa.compute.max(tbl[owner_col]).as_py()) + 1
        domain_size[col] = domain_size[key]

    for t in COPIED:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
        print(f"{t}: copied")

    for t in TILED:
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        schema = src.schema
        df0 = src.to_pandas()
        # Stream one replica per row group instead of concatenating all
        # replicas in memory: output bytes and row order (replica-major)
        # are identical to the old concat+write, but peak memory is one
        # replica, which is what makes a 1000-replica sf100 tile from
        # sf0.1 feasible (the r15 third-decade probe).
        dest = os.path.join(out, f"{t}.parquet")
        n_written = 0
        with pq.ParquetWriter(dest, schema) as writer:
            for r in range(replicas):
                df = df0.copy(deep=False)
                for col in df.columns:
                    if col in KEY_DOMAINS:
                        df[col] = df0[col] + r * domain_size[col]
                if t == "documents" and r > 0:
                    df = df.copy()
                    df["text"] = [salt_text(s, r) for s in df0["text"]]
                    df["n_chars"] = df["text"].str.len().astype("int64")
                part = pa.Table.from_pandas(
                    df, schema=schema, preserve_index=False
                )
                writer.write_table(part)
                n_written += len(part)
        print(f"{t}: {len(src)} -> {n_written} rows")


if __name__ == "__main__":
    main()
