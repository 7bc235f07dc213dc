"""Audit: duplicated expensive subtrees in executed plans, catalog-wide.

The r4->r5 tf-idf regression was this failure class: a frame consumed by
two branches LOOKS shared in the DataFrame code, but column pruning
rewrites one branch's partial aggregate (e.g. to distinct-only), the
subtrees stop being canonically equal, exchange/stage reuse never fires,
and the expensive generator (corpus explode, fact scan) silently runs
twice. The same audit later caught s28l (double corpus explode) and s32b
(4x lineitem scan).

For each registry entry at sf0.001 this materializes the result and
inspects the FINAL adaptive plan: counts Generate nodes and per-path
parquet scans. ReusedExchange'd subtrees don't inflate the counts —
they are genuinely shared.

Flags (>=2 Generates or >=3 scans of one path) need TRIAGE, not reflex
fixes — known by-design cases:
  * spill re-reads (s26d/g/l): re-reading a materialized intermediate is
    the point of spill();
  * linear explode chains (s26b/e): successive Generates over
    progressively transformed frames, each source scanned once;
  * per-operator demo branches (s17): four set-op semantics over the
    same inputs, one pruned scan each;
  * inherent self-joins (s07d = TPC-H Q21's three lineitem references);
  * multi-stage ANN (s27d/e/g/i): memoized 1-row dim probe + stats +
    search scans; the index is persisted at scale;
  * role scans (s31g, s26i, s28l's no-explode total): different pruned
    column sets of one table feeding different roles;
  * SORT_AGG flags (round-8 class): s32_profile's Expand and
    SortAggregates live in DIFFERENT branches by design (the split that
    FIXED this class); s09d/s27e sort only by a low-cardinality group
    key and still shuffle one row per (partition, group).

Usage: python scripts/audit_plan_duplication.py [sf_dir] [only_prefix]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from xgboost_ray_spark.registry import all_queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    flagged = []
    for name, spec in all_queries().items():
        if only and not name.startswith(only):
            continue
        try:
            df = spec.build(spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"{name:32s} ERR {repr(e)[:100]}", flush=True)
            continue
        n_gen = len(re.findall(r"(?:\*\(\d+\) )?Generate ", final))
        # Row-at-a-time Python is never acceptable; Arrow nodes
        # (ArrowEvalPython, MapInPandas/Arrow, FlatMapGroupsInPandas*)
        # are the sanctioned Python surfaces.
        n_slow_py = final.count("BatchEvalPython")
        scans: dict[str, int] = {}
        for m in re.finditer(
            r"Scan parquet[^\n]*?InMemoryFileIndex(?:\(\d+ paths?\))?"
            r"\[([^\]]*)",
            final,
        ):
            path = m.group(1).split(",")[0].strip()
            scans[path] = scans.get(path, 0) + 1
        worst = max(scans.values(), default=0)
        mark = ""
        # Sort-based aggregation where hash was expected (round-8 find):
        # a non-UnsafeRow-mutable aggregate buffer (string/struct min-max)
        # silently degrades the WHOLE aggregate to SortAggregate — fatal
        # when it also carries a count-DISTINCT Expand (k rows per input
        # row, sorted on wide keys; the s32_profile case, 3x slower).
        # Known-benign: grouping-free global aggs (no sort at zero keys,
        # s32's min/max branch) and low-cardinality group keys where the
        # one-row-per-group shuffle still dominates (s09d, s27e).
        n_sortagg = final.count("SortAggregate")
        # Coarse co-occurrence check (string-level; the two may sit in
        # different plan branches — s32_profile's split shape does, by
        # design: its Expand lives in the hash-aggregated distinct
        # branch, its SortAggregates in the grouping-free min/max one).
        sort_expand = n_sortagg > 0 and "Expand" in final
        if n_gen >= 2 or worst >= 3 or n_slow_py or sort_expand:
            mark = "  <== FLAG (triage against the by-design list)"
            flagged.append((name, n_gen, scans))
        slow = f" SLOW_PYTHON={n_slow_py}" if n_slow_py else ""
        sagg = f" SORT_AGG={n_sortagg}" if n_sortagg else ""
        print(
            f"{name:32s} gen={n_gen} max_scan={worst}{slow}{sagg}{mark}",
            flush=True,
        )

    print(f"\n{len(flagged)} flagged:")
    for name, n_gen, scans in flagged:
        short = {p.rsplit("/", 1)[-1]: c for p, c in scans.items()}
        print(f"  {name}: generates={n_gen} scans={short}")


if __name__ == "__main__":
    main()
