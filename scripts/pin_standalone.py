#!/usr/bin/env python
"""Measure a BASELINE.md standalone comparator for one registered query.

Protocol (written down so pins and bench numbers stop being compared
across contexts — see BASELINE.md "Measurement protocol"):

  * fresh process, ONE query per invocation;
  * the bench session config (``session.get_spark``, local[$SPARK_GRAFT_CPUS],
    AQE on, shuffle partitions = cores);
  * JVM warmup outside timing (one s09_groupby_agg count, like bench.py);
  * three timed executions of the query (build + noop write), min reported —
    this is the STANDALONE context: no other headline queries share the
    session, so scratch-dir spills, shuffle files, and executor-memory
    pressure from unrelated plans cannot inflate the number.

Usage: python scripts/pin_standalone.py <query_name> [sf_dir]
Prints one JSON line: {"query": ..., "sf_dir": ..., "samples": [...],
"min": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from xgboost_ray_spark.operators.dedup import reset_spill_reuse
    from xgboost_ray_spark.registry import all_queries

    specs = all_queries()
    if name not in specs:  # fail fast, BEFORE the Spark session spin-up
        raise SystemExit(
            f"unknown query {name!r}; valid names:\n  "
            + "\n  ".join(sorted(specs))
        )

    from xgboost_ray_spark.session import get_spark

    spark = get_spark(app_name=f"pin_{name}")
    specs["s09_groupby_agg"].build(spark, sf_dir).count()  # JVM warmup

    samples = []
    for _ in range(3):
        # Full-plan samples: spill producers re-execute every pass (see
        # bench.py run_once for why reuse must be reset when timing).
        reset_spill_reuse()
        t0 = time.perf_counter()
        df = specs[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "samples": samples,
                "min": min(samples),
                # 1-min load BEFORE this process's own work is indistinct,
                # so report the triple at exit: a loadavg far above this
                # session's core budget, or samples that RISE across
                # passes, mark the session contended — discard and re-run
                # (BASELINE.md measurement protocol).
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
