"""Guards for the scaling-probe corpus generator (scripts/gen_scale_probe.py).

The probe's conclusions (SCALE.md round-13 note) are only as good as the
tiling's linearity invariants: replicas must be key-disjoint and
join-consistent, and the documents token rename must be injective so
within-replica Jaccard structure is preserved exactly while
cross-replica overlap is zero. These run on sf0.001 with 2 replicas —
pandas-only, no Spark session.
"""

import importlib.util
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "gen_scale_probe", os.path.join(REPO, "scripts", "gen_scale_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_salt_text_is_injective_and_whitespace_stable():
    """The per-replica token rename must be injective on tokens (two
    distinct tokens can never collide after salting — else within-replica
    Jaccard would move) and must not change the token COUNT (doc size sz
    drives the prefix length p in the PPJoin)."""
    gen = _load_gen()
    tokens = ["the", "theq", "a", "aq1", "q1", ""]
    for r in (1, 9):
        salted = gen.salt_text(" ".join(tokens), r).split(" ")
        assert len(salted) == len(tokens)
        assert len(set(salted)) == len(set(tokens)), (
            "token rename collided — within-replica structure would move"
        )
        # cross-replica disjointness: r-salted tokens never equal originals
        assert not set(salted) & set(tokens)


@pytest.fixture(scope="module")
def tiled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("probe") / "sf2x")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_scale_probe.py"),
         out, "2"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "GEN_SCALE_PROBE_SRC": "/root/testdata/sf0.001"},
    )
    assert res.returncode == 0, res.stderr
    return out


def test_tiled_keys_disjoint_and_join_consistent(tiled):
    li = pd.read_parquet(os.path.join(tiled, "lineitem.parquet"))
    orders = pd.read_parquet(os.path.join(tiled, "orders.parquet"))
    src_li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert len(li) == 2 * len(src_li)
    # replica key ranges must not overlap
    base = int(src_li.l_orderkey.max()) + 1
    r0, r1 = li.l_orderkey[: len(src_li)], li.l_orderkey[len(src_li):]
    assert r0.max() < base <= r1.min()
    # every lineitem orderkey must still resolve against orders (the
    # offset used the OWNER domain, not the local column max)
    assert set(li.l_orderkey).issubset(set(orders.o_orderkey))


def test_tiled_documents_preserve_structure(tiled):
    docs = pd.read_parquet(os.path.join(tiled, "documents.parquet"))
    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    n = len(src)
    assert len(docs) == 2 * n
    # replica 0 byte-identical; replica 1 salted with n_chars recomputed
    assert (docs.text.iloc[:n].values == src.text.values).all()
    assert (docs.n_chars == docs.text.str.len()).all()
    # injective rename preserves per-doc distinct-token COUNT (Jaccard
    # sets keep their sizes) while sharing zero tokens with replica 0
    t0 = set(docs.text.iloc[0].split(" "))
    t1 = set(docs.text.iloc[n].split(" "))
    assert len(t0) == len(t1) and not t0 & t1
