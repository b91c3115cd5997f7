"""EWMA smoothing, adaptive standard scaler, detrend — stateful recurrences.

Reference semantics:

- ``EWMATransformer`` (``src/ezmsg/sigproc/ewma.py:192-272``):
  ``alpha = 1 - exp(-dt/tau)`` (``ewma.py:40-48``); recurrence
  ``y_t = α·x_t + (1-α)·y_{t-1}`` from ``y_{-1}=0``, then Adam-style bias
  correction ``y_t /= 1 - (1-α)^(t+1)`` with *global* cumulative sample index
  t (``ewma.py:262-271``). Algebraically the corrected output is the
  weight-normalized exponential average
  ``y_t = Σ_j (1-α)^(t-j) x_j / Σ_j (1-α)^(t-j)``.
- ``AdaptiveStandardScalerTransformer`` (``scaler.py:98-176``): z-score from
  two EWMAs (of x and x²): ``z = (x-μ)/σ`` where ``σ² = E[x²]-μ²``; where
  σ² ≤ 0 the output is 0.
- ``DetrendTransformer`` (``detrend.py:10-19``): ``x - EWMA(x)``.

Spark realization: an IIR recurrence has unbounded feedback, so this is the
documented pandas-UDF slow path (SURVEY.md §2.3), lifted at PARTITION level
(``serieslift.group_apply_sorted``): one mapInPandas over key-partitioned,
(key, ts)-sorted data, so Python is entered per Arrow batch rather than per
key, and the kernel — a *vectorized* O(n) blockwise-rescaled cumulative sum,
no per-row Python — still sees each key's complete ordered series. On a
cluster parallelism = partitions; millions of urls spread evenly.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def alpha_from_tau(tau: float, dt: float) -> float:
    """Reference ``ewma.py:40-48``."""
    return 1.0 - math.exp(-dt / tau)


def ewma_corrected_np(x: np.ndarray, alpha: float) -> np.ndarray:
    """Bias-corrected EWMA of a 1-D float64 array (global index 0-based).

    Computes ``S_t = Σ_{j≤t} (1-α)^(t-j) x_j`` and ``W_t = (1-(1-α)^(t+1))/α``
    via block-rescaled cumulative sums: within a block of B samples,
    ``S_t = (1-α)^t · cumsum(x_j (1-α)^{-j})`` stays in float range because B
    is capped so ``(1-α)^{-B}`` cannot overflow; the carry between blocks is a
    single scalar recurrence step. Vectorized O(n), no Python per-row loop.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return x
    beta = 1.0 - alpha
    if beta <= 0.0:
        return x.copy()
    # block size: keep beta**-B < 1e250
    max_b = int(250 / -math.log10(beta)) if beta < 1.0 else n
    B = max(1, min(n, max_b, 65536))
    out = np.empty(n, dtype=np.float64)
    carry = 0.0  # S_{t-1} entering the block
    pos = 0
    while pos < n:
        blk = x[pos : pos + B]
        m = blk.size
        j = np.arange(m, dtype=np.float64)
        inv = beta ** (-j)
        s = (beta**j) * np.cumsum(blk * inv)
        if carry != 0.0:
            s = s + carry * beta ** (j + 1.0)
        out[pos : pos + m] = s
        carry = s[-1]
        pos += m
    t = np.arange(1, n + 1, dtype=np.float64)
    w = (1.0 - beta**t) / alpha
    return out / w


def _ewma_kernel_factory(alpha: float, ts_col: str, value_cols: Sequence[str], out_cols: Sequence[str]):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        for vc, oc in zip(value_cols, out_cols):
            pdf[oc] = ewma_corrected_np(pdf[vc].to_numpy(np.float64), alpha)
        return pdf

    return kernel


def ewma(
    df: DataFrame,
    tau: float | None = None,
    dt: float | None = None,
    alpha: float | None = None,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "ewma",
) -> DataFrame:
    """Bias-corrected EWMA per key along time (reference EWMATransformer)."""
    if alpha is None:
        if tau is None or dt is None:
            raise ValueError("give alpha, or tau and dt")
        alpha = alpha_from_tau(tau, dt)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    kernel = _ewma_kernel_factory(alpha, ts_col, [value_col], [out_col])
    from .serieslift import group_apply_sorted

    return group_apply_sorted(df, kernel, key_cols, ts_col, schema)


def detrend(
    df: DataFrame,
    tau: float,
    dt: float,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "detrended",
) -> DataFrame:
    """``x - EWMA(x)`` (reference ``detrend.py:10-19``)."""
    out = ewma(df, tau=tau, dt=dt, key_cols=key_cols, ts_col=ts_col,
               value_col=value_col, out_col="_trend")
    return out.withColumn(out_col, F.col(value_col) - F.col("_trend")).drop("_trend")


def adaptive_standard_scaler(
    df: DataFrame,
    tau: float | None = None,
    dt: float | None = None,
    alpha: float | None = None,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "z",
) -> DataFrame:
    """Online z-score from two EWMAs (reference ``scaler.py:98-176``):
    z = (x - μ)/sqrt(E[x²] - μ²), 0 where variance ≤ 0."""
    if alpha is None:
        if tau is None or dt is None:
            raise ValueError("give alpha, or tau and dt")
        alpha = alpha_from_tau(tau, dt)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(np.float64)
        mu = ewma_corrected_np(x, alpha)
        ex2 = ewma_corrected_np(x * x, alpha)
        var = ex2 - mu * mu
        mask = var > 0
        std = np.sqrt(np.where(mask, var, 0.0))
        z = np.where(mask, (x - mu) / np.where(mask, std, 1.0), 0.0)
        pdf[out_col] = z
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    from .serieslift import group_apply_sorted

    return group_apply_sorted(df, kernel, key_cols, ts_col, schema)
