"""Rolling z-score over the last k samples (sliding scaler).

Reference: ``RollingScalerProcessor`` (``src/ezmsg/sigproc/rollingscaler.py:
76-215``) — Welford/Chan incremental batch stats over the trailing
``k_samples``; each incoming chunk is normalized with the statistics
accumulated from *previous* chunks (the update happens after normalization),
and raw passthrough until ``min_samples`` have been seen. With 1-sample chunks
the streaming semantics are exactly: sample i is normalized by the mean /
population-std of samples ``[i-k, i-1]`` once ``i >= min_samples``, std
clipped to ≥1e-8, non-finite z → 0, optional symmetric clip.

Batch formulation: a per-key ordered window frame ``rowsBetween(-k, -1)`` —
native Catalyst window aggregates (no UDF). The Welford/Chan machinery in the
reference is an *implementation* detail of streaming constant-memory update;
the computed statistics are plain mean/stddev_pop over the trailing window,
which is what we express declaratively.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(
    df: DataFrame,
    k: int,
    min_samples: int = 1,
    clip: float | None = None,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "z",
) -> DataFrame:
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(-k, -1)
    )
    wn = Window.partitionBy(*key_cols).orderBy(ts_col)
    v = F.col(value_col)
    mu = F.avg(v).over(w)
    sd = F.stddev_pop(v).over(w)
    n_before = F.row_number().over(wn) - F.lit(1)
    sd_safe = F.greatest(sd, F.lit(1e-8))
    z = (v - mu) / sd_safe
    z = F.when(F.isnan(z) | (F.abs(z) == float("inf")), F.lit(0.0)).otherwise(z)
    if clip is not None:
        z = F.greatest(F.least(z, F.lit(float(clip))), F.lit(-float(clip)))
    # warmup: fewer than min_samples prior samples → passthrough raw value
    z = F.when(n_before < min_samples, v).otherwise(z)
    return df.withColumn(out_col, z)
