"""Guards for the committed scaling-probe ledger (PROBE_LEDGER.json).

Round 15 closed big-decade probe coverage for the whole catalog: every
registry entry carries a measured sf0.1->sf1.0->sf10 response in the
ledger, and SCALE.md's headline claim ("catalog-complete, zero
superlinear segments") cites it. These pins keep that claim honest
against future drift: a registry entry added without a probe, a
renamed entry orphaning its ledger row, or a stale counter would each
fail here rather than silently eroding the coverage statement.

Pure-JSON checks — no Spark session; the registry import is metadata
only.
"""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "PROBE_LEDGER.json")

# A decade factor is "N.NNx", optionally followed by adjudication prose
# (e.g. "8.06x (quiet retake; ...)"). Two rows legitimately deviate:
# the untimed mega-bucket guard demo (null factors, GUARD-DEMO note)
# and s26l's d2, which is pure adjudication prose for the r14-mitigated
# sf10 segment.
_FACTOR = re.compile(r"^\d+(\.\d+)?x\b")
_PROSE_FACTOR_OK = {("s26l_prefix_filter_join", "d2")}
# rows-only-by-design registry entries (no DuckDB oracle; golden pins
# gate them instead) — the only statuses allowed to differ from "pass".
_ROWS_ONLY = {
    "s10b_approx_count_distinct",
    "s25c_stream_watermark_append",
    "s30_gbt_train_predict",
    "s30b_ltr_rank",
}


def _ledger():
    with open(LEDGER) as f:
        return json.load(f)


def test_ledger_entries_match_registry_exactly():
    """Ledger keys == registry names, both directions: a new operator
    needs a probe row (freeze discipline: contract + evidence in the
    same round), and a ledger row may not outlive its entry."""
    from xgboost_ray_spark.registry import all_queries

    led = set(_ledger()["entries"])
    reg = set(all_queries())
    assert led == reg, (
        f"ledger/registry drift: ledger-only={sorted(led - reg)}, "
        f"registry-only={sorted(reg - led)}"
    )


def test_big_decade_coverage_is_catalog_complete():
    """The r15 milestone: every entry has a non-null big_decades with
    parseable decade factors. An entry probed 'later' (null) would
    silently reopen the 'awaiting a future batch' tail the round
    closed."""
    d = _ledger()
    missing = [k for k, v in d["entries"].items() if not v.get("big_decades")]
    assert not missing, f"entries without big-decade probes: {missing}"
    for name, v in d["entries"].items():
        bd = v["big_decades"]
        assert bd.get("note"), f"{name}: big_decades.note must adjudicate"
        if bd["d1"] is None or bd["d2"] is None:
            # Only the untimed guard demo may skip factors, and its note
            # must say so explicitly.
            assert "GUARD-DEMO" in bd["note"], (name, bd)
            continue
        for leg in ("d1", "d2"):
            if (name, leg) in _PROSE_FACTOR_OK:
                assert bd[leg].strip(), (name, leg)
                continue
            assert _FACTOR.match(bd[leg]), (name, leg, bd[leg])


def test_counters_are_consistent():
    d = _ledger()
    assert d["n_entries"] == len(d["entries"])
    assert d["n_big_decade_probed"] == sum(
        1 for v in d["entries"].values() if v.get("big_decades")
    )
    assert d["n_big_decade_probed"] == d["n_entries"]


def test_sweep_walls_present_and_clean():
    """Both sweep columns (the small-decade canary) stay populated and
    clean — the ledger's regression-canary role depends on them. A
    status other than "pass" is allowed only for the rows-only-by-design
    entries (no DuckDB oracle; gated by golden pins instead), and even
    those must record a positive row count, never a failure."""
    rows_only = re.compile(r"^rows_only\(\d+\)$")
    for name, v in _ledger()["entries"].items():
        for col in ("status_sf0.01", "status_sf0.1"):
            if v[col] == "pass":
                continue
            assert name in _ROWS_ONLY, (name, col, v[col])
            assert rows_only.match(v[col]), (name, col, v[col])
        assert v["sweep_sf0.01_s"] > 0, name
        assert v["sweep_sf0.1_s"] > 0, name
