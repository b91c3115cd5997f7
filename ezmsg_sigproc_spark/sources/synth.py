"""Deterministic synthetic signal generators — Spark-native, seedless.

Reference test helpers (SURVEY.md §2.9): ``Counter``, ``WhiteNoise``,
``Oscillator`` (``tests/helpers/synth.py:20-140``),
``SignalInjectorTransformer`` (``signalinjector.py:18-50``),
``DenormalizeTransformer`` (``denormalize.py:14-80``), ``TriggerProducer``
(``sampler.py:240-274``).

Everything derives from ``spark.range`` + column expressions; "randomness" is
md5-hash-derived so any run regenerates identical data (the repo-wide
determinism convention). White noise uses the Box-Muller transform over two
hash-uniform columns — all JVM-side.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _u01(col: Column, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + 0.5) / float(1 << 32)


def counter(spark: SparkSession, n: int, fs: float, n_ch: int = 1, key: str = "counter") -> DataFrame:
    """Monotonic ramp — the reference's Counter generator."""
    base = spark.range(n).crossJoin(
        spark.range(n_ch).select(F.col("id").cast("string").alias("ch"))
    )
    return base.select(
        F.lit(key).alias("key"), "ch",
        (F.col("id") / fs).alias("ts"),
        F.col("id").cast("double").alias("value"),
    )


def white_noise(spark: SparkSession, n: int, fs: float, n_ch: int = 1,
                sigma: float = 1.0, key: str = "noise") -> DataFrame:
    """Gaussian noise via Box-Muller over hash-uniforms (deterministic)."""
    base = spark.range(n).crossJoin(
        spark.range(n_ch).select(F.col("id").cast("string").alias("ch"))
    )
    ident = F.concat_ws("_", "id", "ch")
    u1, u2 = _u01(ident, "u1"), _u01(ident, "u2")
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)
    return base.select(
        F.lit(key).alias("key"), "ch",
        (F.col("id") / fs).alias("ts"),
        (z * sigma).alias("value"),
    )


def oscillator(spark: SparkSession, n: int, fs: float, freq: float,
               amp: float = 1.0, phase: float = 0.0, n_ch: int = 1,
               key: str = "osc") -> DataFrame:
    """Sinusoid generator (reference Oscillator)."""
    base = spark.range(n).crossJoin(
        spark.range(n_ch).select(F.col("id").cast("string").alias("ch"))
    )
    t = F.col("id") / fs
    return base.select(
        F.lit(key).alias("key"), "ch", t.alias("ts"),
        (amp * F.sin(2.0 * math.pi * freq * t + phase)).alias("value"),
    )


def inject_signal(df: DataFrame, freq: float, amp: float,
                  ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Add a sinusoid onto an existing stream (reference
    signalinjector.py:18-50)."""
    return df.withColumn(
        value_col,
        F.col(value_col) + amp * F.sin(2.0 * math.pi * freq * F.col(ts_col)),
    )


def denormalize(df: DataFrame, ch_col: str = "ch", value_col: str = "value",
                gain_range: tuple[float, float] = (0.5, 2.0),
                offset_range: tuple[float, float] = (-10.0, 10.0)) -> DataFrame:
    """Per-channel hash-derived gain/offset (reference denormalize.py:14-80) —
    turns normalized test signals into realistically-scaled ones."""
    g = _u01(F.col(ch_col), "gain") * (gain_range[1] - gain_range[0]) + gain_range[0]
    o = _u01(F.col(ch_col), "offset") * (offset_range[1] - offset_range[0]) + offset_range[0]
    return df.withColumn(value_col, F.col(value_col) * g + o)


def trigger_producer(spark: SparkSession, t0: float, t1: float, period: float) -> DataFrame:
    """Periodic triggers (reference sampler.py:240-274 TriggerProducer)."""
    n = int((t1 - t0) / period) + 1
    return spark.range(n).select(
        F.col("id").alias("trigger_id"),
        (F.lit(t0) + F.col("id") * period).alias("trig_ts"),
    )
