"""Table catalog over the driver-generated parquet testdata.

Loads the TPC-H-ish star schema + events / documents / embeddings tables
(see /root/repo/TESTDATA.md) and registers them as temp views. All reads go
through ``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning and partition-sized splits for free — at 100 TB these become real
parquet row-group skips, not driver-side filtering.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Repo-local scratch root for operators that materialize artifacts
# (indexes, compacted files, stream sinks). Derived from this file's
# location so a relocated checkout keeps working; single definition so
# the path can't drift between modules.
SCRATCH_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)

# Epoch for scratch garbage collection: anything under SCRATCH_DIR whose
# mtime predates this process belongs to a finished session and can go.
_SESSION_EPOCH = time.time()
_SCRATCH_SWEPT = False

# Grace window for the sweep: a dir younger than this is NOT garbage even
# if it predates this process, because the session that wrote it may still
# be running beside us — a subprocess that builds a registered query
# (tests/test_foreign_cwd.py, a driver run, pin_standalone.py) starts
# seconds after its parent wrote spills, and epoch-only GC deleted the
# parent's dirs out from under its live readers. Stale dirs the sweep
# exists for are hours-to-days old, so an hour of grace costs nothing and
# closes the concurrent-process race (plus the TOCTOU between spill()'s
# isdir reuse check and the consumer's read). The grace window alone
# still reaped a LONG-lived concurrent session's early spills (older
# than the window but still live), so spill() also stamps each dir with
# an ``.owner_pid`` marker and the sweep skips dirs whose owner process
# is still running — liveness, not age, is the real criterion; mtime +
# grace remains the fallback for dirs without a marker.
SWEEP_GRACE_SEC = 3600.0


def _proc_start_ticks(pid: int) -> int | None:
    """Process start time in clock ticks since boot (``/proc/<pid>/stat``
    field 22) — the kernel's per-boot process identity alongside the pid,
    so a recycled pid is distinguishable from the original owner. None
    where /proc is absent (non-Linux) or unreadable."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            data = fh.read()
        # comm (field 2) may contain spaces/parens; fields resume after
        # the LAST ')'. rest[0] is state (field 3), so field 22 is
        # rest[19].
        rest = data[data.rindex(b")") + 2:].split()
        return int(rest[19])
    except (OSError, ValueError, IndexError):
        return None


def _spill_owner_alive(path: str) -> bool:
    """True if the ``.owner_pid`` marker inside a spill dir names a
    process that is still running (written by ``dedup.spill``). A dead,
    missing, or unreadable marker returns False — the mtime rules then
    decide.

    Markers carry ``pid start_ticks`` so a recycled pid does not
    masquerade as the owner: without the start-time check, a pid recycled
    to a long-lived daemon would keep the dead session's garbage alive
    for as long as that daemon runs, not "one extra sweep". Pid-only
    markers (pre-r7 layouts, non-Linux writers) fall back to bare
    ``os.kill(pid, 0)`` liveness."""
    try:
        with open(os.path.join(path, ".owner_pid")) as fh:
            parts = fh.read().split()
        pid = int(parts[0])
        recorded_ticks = int(parts[1]) if len(parts) > 1 else None
    except (OSError, ValueError, IndexError):
        return False
    if pid <= 0:
        return False
    if recorded_ticks is not None:
        current = _proc_start_ticks(pid)
        if current is not None:
            # Same pid + same per-boot start time == same process. A
            # mismatch means the owner died and the pid was recycled.
            return current == recorded_ticks
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by another user
    except OSError:
        return False
    return True


def sweep_scratch() -> int:
    """Garbage-collect spill directories left behind by earlier sessions.

    ``spill()`` materializes multiply-consumed intermediates under
    ``SCRATCH_DIR/spill_*``; keys are stable within a session (input path +
    operator params), so a session's footprint is bounded — but nothing in
    a session can know when a *previous* session's lazily-evaluated readers
    are gone. This sweep runs once per process (from
    ``registry.prepare_session``) and removes every ``spill_*`` entry
    whose owner process (``.owner_pid`` marker) is no longer running AND
    whose mtime predates this process AND is older than
    ``SWEEP_GRACE_SEC``. The liveness check is the real criterion — a
    long-lived concurrent session's early spills are older than any
    fixed grace window but must survive a freshly started subprocess's
    sweep; mtime + grace is the fallback for marker-less dirs (pre-r7
    layouts, failed marker writes), where a young dir may still belong
    to a concurrently running session (a test/driver/pin subprocess
    starts seconds after its parent spilled — epoch-only GC broke the
    parent's live readers mid-suite).
    """
    global _SCRATCH_SWEPT
    if _SCRATCH_SWEPT:
        return 0
    _SCRATCH_SWEPT = True
    import shutil

    removed = 0
    try:
        entries = os.listdir(SCRATCH_DIR)
    except FileNotFoundError:
        return 0
    for name in entries:
        if not name.startswith("spill_"):
            continue
        path = os.path.join(SCRATCH_DIR, name)
        try:
            mtime = os.path.getmtime(path)
            if (
                mtime < _SESSION_EPOCH
                and time.time() - mtime > SWEEP_GRACE_SEC
                and not _spill_owner_alive(path)
            ):
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
        except OSError:
            continue
    return removed


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        # Older testdata generations stored events.ts as TIMESTAMP(NANOS);
        # externally created sessions (e.g. a harness passing its own
        # SparkSession) reject that type without this runtime-settable conf.
        # Set it defensively on every events read — through the guarded
        # helper, so a restricted session fails loudly instead of corrupting
        # timestamps. Harmless for micros-typed data — so on a
        # conf-restricted session, escalate only if THIS table actually
        # stores nanos (footer probe); micros-typed data reads correctly
        # without the conf and must not fail on an irrelevant setting.
        from xgboost_ray_spark.registry import set_runtime_conf

        try:
            set_runtime_conf(
                spark, "spark.sql.legacy.parquet.nanosAsLong", "true"
            )
        except RuntimeError:
            if _events_ts_is_nanos(table_path(sf_dir, name)):
                raise
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _fold_nanos_ts(df)
    # Single NTZ-cast site: normalize_event_ts's legacy nanos fold above
    # never produces NTZ, so one normalize_timestamps covers every table.
    return normalize_timestamps(df)


def _events_ts_is_nanos(path: str) -> bool:
    """Footer probe: does the events parquet at ``path`` (file or Spark
    part-file directory) store ``ts`` as TIMESTAMP(NANOS)? Driver-side
    pyarrow schema read of one footer — no Spark job. Unreadable/absent
    footers return True (conservative: keep the loud failure)."""
    import glob

    try:
        import pyarrow.parquet as pq

        files = (
            sorted(glob.glob(os.path.join(path, "*.parquet")))
            if os.path.isdir(path)
            else [path]
        )
        if not files:
            return True
        field = pq.read_schema(files[0]).field("ts")
        return str(field.type) == "timestamp[ns]"
    except Exception:
        return True


def _fold_nanos_ts(df: DataFrame) -> DataFrame:
    """ns->us fold only (TIMESTAMP(NANOS) read as long under nanosAsLong);
    integer floor division matches DuckDB's nanos truncation exactly."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Fold every generation of events.ts storage to a UTC TIMESTAMP.

    The testdata has shipped ts as TIMESTAMP(NANOS) — read as a long under
    nanosAsLong; converted ns -> us with integer floor division, exactly
    DuckDB's nanos truncation — and, since the 2026-08-13 regen, as naive
    TIMESTAMP(MICROS) (the NTZ cast). Public entry point for streaming
    readers; ``load_table`` composes the same two steps itself."""
    return normalize_timestamps(_fold_nanos_ts(df))


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to UTC TIMESTAMP.

    The testdata parquet stores naive (isAdjustedToUTC=false) microsecond
    timestamps. The engine reads them as instants directly via
    ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` (zero plan impact,
    full filter pushdown); this cast is the fallback for restricted sessions
    where that conf cannot be applied — value-preserving because the session
    timezone is pinned to UTC, and a no-op when the conf took effect."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table lazily. No data moves until an action runs."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for the SQL API."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
