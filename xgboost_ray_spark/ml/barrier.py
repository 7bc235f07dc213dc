"""True distributed XGBoost under Spark barrier execution.

Port of the reference's training topology (xgboost_ray/main.py:1061-1337)
onto Spark primitives, import-gated on the ``xgboost`` package (absent in
this container — structure is real, exercised only where xgboost exists):

  reference                                   here
  ---------                                   ----
  RayXGBoostActor per shard (main.py:862)     one barrier task per partition
  Rabit tracker subprocess (main.py:256-290)  xgboost.tracker.RabitTracker on
                                              the driver, env shipped to tasks
  rank from actor index (main.py:1233)        BarrierTaskContext.partitionId()
  tracker env via actor args                  BarrierTaskContext.allGather()
  OMP_NUM_THREADS pinning (main.py:355-362)   set from cpus_per_worker inside
                                              the task
  checkpoint queue (main.py:612-626)          rank-0 writes model bytes to
                                              checkpoint_path every k rounds
  failure retry loop (main.py:1606-1713)      Spark re-runs the barrier stage;
                                              resume picks up the checkpoint
                                              and decrements rounds
                                              (boost_rounds_left arithmetic,
                                              main.py:1604-1612)
"""

from __future__ import annotations

import os
import pickle
import socket
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xgboost_ray_spark.matrix import MatrixSpec
from xgboost_ray_spark.ml.params import GBTParams


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def train_barrier(
    params: dict,
    dtrain: DataFrame,
    spec: MatrixSpec,
    num_boost_round: int,
    gbt: GBTParams,
    evals: list[tuple[DataFrame, str]] | None = None,
    callbacks: list | None = None,
):
    """Barrier-mode ``xgb.train`` with collective allreduce across tasks."""
    import xgboost as xgb
    from xgboost.tracker import RabitTracker

    from xgboost_ray_spark.ml.callback import (
        DistributedCallbackContainer,
        WorkerContext,
    )
    from xgboost_ray_spark.ml.train import TrainResult

    num_workers = gbt.num_workers
    feats = spec.features_of(spec.prepare(dtrain))
    label_col = spec.label_cols[0]
    cols = list(feats) + [label_col] + (
        [spec.weight_col] if spec.weight_col else []
    )
    # Train + every eval set ride the same barrier stage: tag each frame,
    # union, and shard all of them across the same num_workers tasks — the
    # reference hands each actor its train shard plus an eval shard per set
    # (main.py:704-739). The tag column is the only overhead.
    tagged = spec.prepare(dtrain).select(*cols).withColumn(
        "__set__", F.lit("train")
    )
    eval_names: list[str] = []
    for eval_df, eval_name in evals or []:
        if eval_name == "train":
            raise ValueError("eval set name 'train' is reserved")
        eval_names.append(eval_name)
        tagged = tagged.unionByName(
            spec.prepare(eval_df).select(*cols).withColumn(
                "__set__", F.lit(eval_name)
            )
        )
    prepared = tagged.repartition(num_workers)

    # Resume from checkpoint: decrement remaining rounds like the reference
    # (main.py:1604-1612).
    prev_model_bytes = None
    rounds_left = num_boost_round
    ckpt = gbt.checkpoint_path
    if ckpt and os.path.exists(ckpt):
        with open(ckpt, "rb") as fh:
            prev_model_bytes, done_rounds = pickle.load(fh)
        rounds_left = max(num_boost_round - done_rounds, 0)

    tracker = RabitTracker(host_ip=socket.gethostname(), n_workers=num_workers)
    tracker.start()
    tracker_args = tracker.worker_args()

    cpus = gbt.cpus_per_worker or 0
    weight_col = spec.weight_col

    def run_partition(batches):
        # ``batches`` is an iterator of Arrow-backed pandas frames — the
        # JVM->Python hop stays columnar (mapInPandas), matching
        # predict_barrier; no per-row asDict conversion anywhere.
        from pyspark import BarrierTaskContext
        import pandas as pd

        ctx = BarrierTaskContext.get()
        rank = ctx.partitionId()
        # Per-worker lifecycle hooks with the true rank (callback.py:14-58).
        container = DistributedCallbackContainer(callbacks)
        cb_ctx = WorkerContext(rank=rank, num_workers=num_workers)
        container.on_init(cb_ctx)
        if cpus:
            os.environ["OMP_NUM_THREADS"] = str(cpus)  # main.py:355-362
        container.before_data_loading(cb_ctx)
        parts = list(batches)
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
        else:
            # Typed empty frame: a bare pd.DataFrame(columns=...) yields
            # object dtype, which xgb.DMatrix rejects — the worker whose
            # round-robin partition is empty (rows < num_workers) must still
            # join the collective with a valid 0-row DMatrix.
            pdf = pd.DataFrame(
                {c: pd.Series(dtype="float64") for c in cols}
                | {"__set__": pd.Series(dtype=object)}
            )
        container.after_data_loading(cb_ctx)
        ctx.barrier()
        container.before_train(cb_ctx)
        with xgb.collective.CommunicatorContext(**tracker_args):

            def make_dmatrix(frame):
                return xgb.DMatrix(
                    frame[feats],
                    label=frame[label_col],
                    weight=frame[weight_col] if weight_col else None,
                    missing=spec.missing,
                )

            dmat = make_dmatrix(pdf[pdf["__set__"] == "train"])
            watchlist = [(dmat, "train")] + [
                (make_dmatrix(pdf[pdf["__set__"] == n]), n) for n in eval_names
            ]
            evals_result: dict = {}
            booster = xgb.train(
                params,
                dmat,
                num_boost_round=rounds_left,
                evals=watchlist,
                evals_result=evals_result,
                xgb_model=pickle.loads(prev_model_bytes) if prev_model_bytes else None,
            )
        container.after_train(cb_ctx, result=None)
        if rank == 0:
            yield pd.DataFrame(
                {"result": [pickle.dumps((booster, evals_result, cb_ctx.queued))]}
            )

    start = time.perf_counter()
    results = prepared.mapInPandas(
        run_partition, schema="result binary", barrier=True
    ).collect()
    elapsed = time.perf_counter() - start
    booster, evals_result, queued = pickle.loads(results[0]["result"])

    if ckpt:
        with open(ckpt, "wb") as fh:
            pickle.dump((pickle.dumps(booster), num_boost_round), fh)

    return TrainResult(
        model=booster,
        evals_result=evals_result,
        train_time_s=elapsed,
        backend="xgb",
        num_workers=num_workers,
        queued=queued,
    )


def predict_barrier(booster_bytes: bytes, data: DataFrame, spec: MatrixSpec,
                    output_col: str = "prediction") -> DataFrame:
    """Broadcast-booster prediction via mapInPandas (main.py:1750-1806).

    The model ships once per executor through the broadcast (the reference's
    single ``ray.put`` of the model, main.py:1790); each Arrow batch scores
    in-process. Output stays a column — no combine_data reorder.
    """
    import pandas as pd

    spark = data.sparkSession
    bc = spark.sparkContext.broadcast(booster_bytes)
    feats = spec.features_of(spec.prepare(data))
    schema = data.schema.add(output_col, "double")

    def score(batches):
        import xgboost as xgb

        booster = pickle.loads(bc.value)
        for pdf in batches:
            dmat = xgb.DMatrix(pdf[feats], missing=spec.missing)
            out = pdf.copy()
            out[output_col] = booster.predict(dmat)
            yield out

    return data.mapInPandas(score, schema=schema)
