#!/usr/bin/env python
"""Regenerate OPERATORS.md from the query registry.

Usage: python scripts/gen_operators_md.py > OPERATORS.md
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xgboost_ray_spark.registry import all_queries  # noqa: E402


def main() -> None:
    specs = all_queries()
    n_oracle = sum(1 for s in specs.values() if s.oracle)
    print("# Operator catalog")
    print()
    print(
        f"{len(specs)} registered operators; {n_oracle} with exact DuckDB "
        "value-hash oracles, the rest rows-only by design (ML training, "
        "approximate sketches, watermark-dependent streaming emission)."
    )
    print()
    print("Generated from the registry: "
          "`python scripts/gen_operators_md.py > OPERATORS.md`.")
    print()
    print("| query | check | tags | notes |")
    print("|---|---|---|---|")
    for name in sorted(specs):
        s = specs[name]
        check = "oracle" if s.oracle else "rows-only"
        tags = ", ".join(s.tags)
        # Escape '|' — docs quoting expressions like |x-mean| > K*stddev
        # would otherwise split into phantom table columns.
        doc = " ".join(s.doc.split()).replace("|", "\\|")
        print(f"| `{name}` | {check} | {tags} | {doc} |")


if __name__ == "__main__":
    main()
