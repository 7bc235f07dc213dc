#!/usr/bin/env python
"""Next-decade scaling probe for the heavy iterative set (VERDICT r12 #4).

Times the six expensive iterative/ML queries at two scale directories
under the SAME protocol (bench.timed_build, one session per scale, one
warmup, min of 3 round-robin passes) and prints one JSON line per scale
plus the per-query scaling factor across the jump. Pair it with
scripts/gen_scale_probe.py, which tiles sf0.1 into a 10x corpus whose
per-operator workload is measured to scale exactly linearly (near-dup
pairs and cluster counts 10.000x — see SCALE.md round-13 note).

Usage: python scripts/scale_probe.py [base_sf_dir] [big_sf_dir] [ops]

``ops`` (optional, comma-separated registry names) overrides the default
iterative six — round 14 uses it to point the same protocol at the
heavy shuffle-bound RELATIONAL entries (VERDICT r13 #4: s05d six-table
join, s28e TF-IDF, s11c grouping sets, s09 Q1) so the relational scale
story is measured, not inferred from the sf0.01->sf0.1 band.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = [
    "s30_gbt_train_predict",
    "s24g_pagerank",
    "s26g_dup_clusters",
    "s26l_prefix_filter_join",
    "s27j_kmeans",
    "s25d_stateful_sessions",
]
if len(sys.argv) > 3:
    PROBE = [n for n in sys.argv[3].split(",") if n]
    # Validate the override at parse time (ADVICE r14): a typo'd name
    # otherwise surfaces as a raw KeyError mid-probe, after the base
    # scale has already burned minutes of Spark time.
    from xgboost_ray_spark.registry import all_queries as _aq

    _unknown = [n for n in PROBE if n not in _aq()]
    if _unknown:
        sys.exit(
            f"unknown registry names in ops override: {_unknown} "
            "(see xgboost_ray_spark.registry.all_queries())"
        )


def run_scale(sf_dir: str) -> dict[str, float]:
    from bench import WARMUP_QUERY, timed_build
    from xgboost_ray_spark.registry import all_queries
    from xgboost_ray_spark.session import get_spark

    specs = all_queries()
    spark = get_spark(app_name=f"scale_probe_{os.path.basename(sf_dir)}")
    specs[WARMUP_QUERY].build(spark, sf_dir).count()
    samples: dict[str, list[float]] = {n: [] for n in PROBE}
    for _ in range(3):
        for name in PROBE:
            samples[name].append(round(timed_build(spark, specs, name, sf_dir), 3))
    out = {n: min(v) for n, v in samples.items()}
    print(json.dumps({
        "sf_dir": sf_dir,
        "queries": out,
        "samples": samples,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe/sf1.0"
    small = run_scale(base)
    large = run_scale(big)
    print(json.dumps({
        "scaling_factor": {
            n: round(large[n] / small[n], 2) for n in PROBE if small[n] > 0
        }
    }))


if __name__ == "__main__":
    main()
