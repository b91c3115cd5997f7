"""Streaming stateful EWMA: micro-batched + checkpoint-restarted processing
equals the batch closed form — the chunk-invariance contract (SURVEY §1.2)
surviving Spark's state store, including a job restart."""

import os

import numpy as np
import pandas as pd
import pytest

from ezmsg_sigproc_spark.operators.ewma import ewma_corrected_np
from ezmsg_sigproc_spark.streaming.stateful_ops import streaming_ewma


def test_streaming_ewma_chunk_invariant_across_restart(spark, tmp_path):
    rng = np.random.default_rng(5)
    n = 400
    keys = ["a", "b"]
    frames = []
    for k in keys:
        frames.append(pd.DataFrame({
            "key": k, "ts": np.arange(n, dtype=float), "value": rng.standard_normal(n),
        }))
    full = pd.concat(frames).reset_index(drop=True)

    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    os.makedirs(src)

    schema = "key string, ts double, value double"
    first = full[full.ts < n // 2]
    second = full[full.ts >= n // 2]
    spark.createDataFrame(first, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "batch1"))

    def run_once():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
            str(src / "*"))
        q = (
            streaming_ewma(stream, alpha=0.3)
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # first job: only the first half exists
    run_once()
    # stop, new data arrives, restart from the checkpoint: state (zi, n_seen)
    # must resume exactly where the first job left off
    spark.createDataFrame(second, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "batch2"))
    run_once()

    got = (
        spark.read.parquet(str(sink)).toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    )
    assert len(got) == len(full)
    for k in keys:
        exp = ewma_corrected_np(
            full[full.key == k].sort_values("ts")["value"].to_numpy(), 0.3)
        np.testing.assert_allclose(
            got[got.key == k]["ewma"].to_numpy(), exp, rtol=1e-9,
            err_msg=f"key={k}")


def test_streaming_downsample_phase_carry(spark, tmp_path):
    from ezmsg_sigproc_spark.streaming.stateful_ops import streaming_downsample

    n = 100
    full = pd.DataFrame({"key": "a", "ts": np.arange(n, dtype=float),
                         "value": np.arange(n, dtype=float)})
    src, sink, ckpt = tmp_path / "s", tmp_path / "o", tmp_path / "c"
    os.makedirs(src)
    schema = "key string, ts double, value double"
    # 7-row chunks: the phase counter must carry across micro-batches
    for i, lo in enumerate(range(0, n, 7)):
        spark.createDataFrame(full.iloc[lo:lo + 7], schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / f"b{i:03d}"))
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1) \
        .parquet(str(src / "*"))
    q = (streaming_downsample(stream, q=3)
         .writeStream.format("parquet").option("path", str(sink))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = spark.read.parquet(str(sink)).toPandas().sort_values("ts")
    np.testing.assert_array_equal(got["value"].to_numpy(), np.arange(0, n, 3.0))
