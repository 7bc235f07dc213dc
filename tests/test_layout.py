"""Z-order clustering evidence: per-row-group range shrinkage.

The point of a z-order rewrite is parquet min/max data skipping on EVERY
clustered dimension. That is mechanically measurable without running a
query: read the written files' row-group statistics (pyarrow footers) and
compare each row group's normalized (max-min) span against an unclustered
control write. With 8 files and 2 interleaved dimensions, each z-ordered
file should cover roughly sqrt(1/8) ~ 0.35 of each dimension's range;
random-layout files cover ~1.0.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from xgboost_ray_spark.catalog import load_table
from xgboost_ray_spark.sources.layout import write_zordered, zorder_cluster

COLS = ("l_partkey", "l_suppkey")


def _mean_rowgroup_span(path: str, col: str, lo: float, hi: float) -> float:
    """Mean normalized (max-min)/(hi-lo) across all row groups of all
    files under ``path`` for ``col``."""
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    spans.append(
                        (c.statistics.max - c.statistics.min) / (hi - lo)
                    )
    assert spans, f"no row-group stats found for {col} under {path}"
    return sum(spans) / len(spans)


def test_zorder_shrinks_rowgroup_ranges_on_both_dims(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", *COLS
    )
    bounds = li.agg(
        *[F.min(c).alias(f"lo_{c}") for c in COLS],
        *[F.max(c).alias(f"hi_{c}") for c in COLS],
    ).collect()[0]

    control = os.path.join(str(tmp_path), "control")
    zpath = os.path.join(str(tmp_path), "zorder")
    # Control: same file count, hash layout (no clustering).
    li.repartition(8).write.parquet(control)
    write_zordered(li, zpath, list(COLS), num_files=8)

    for c in COLS:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        base = _mean_rowgroup_span(control, c, lo, hi)
        clustered = _mean_rowgroup_span(zpath, c, lo, hi)
        # Hash layout covers ~the full range per row group; z-order must
        # at least halve the span on BOTH dimensions simultaneously.
        assert base > 0.9, (c, base)
        assert clustered < 0.6 * base, (c, clustered, base)


def test_zorder_cluster_preserves_rows(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", *COLS
    )
    out = zorder_cluster(li, list(COLS), num_files=8)
    assert out.columns == li.columns  # helper columns dropped
    a = sorted(map(tuple, li.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b


def test_zorder_value_rejects_bit_overflow(spark):
    """bits * n_cols > 63 would flip the bigint sign (position 63) or wrap
    mod-64 (positions >= 64), silently destroying the clustering — the
    helper must refuse loudly."""
    import pytest
    from pyspark.sql import functions as F

    from xgboost_ray_spark.sources.layout import zorder_value

    codes = [F.lit(i).cast("bigint") for i in range(4)]
    with pytest.raises(ValueError, match="63"):
        zorder_value(codes, bits=16)  # 4 x 16 = 64: sign-bit position
    with pytest.raises(ValueError, match="63"):
        zorder_value(codes[:3], bits=22)  # 3 x 22 = 66: mod-64 wrap
    # 63 interleaved bits exactly is fine
    zorder_value(codes[:3], bits=21)
