"""Downsample / decimate — keep every q-th sample by *global* per-key index.

Reference semantics (``src/ezmsg/sigproc/downsample.py:46-105``): a rotating
counter ``s_idx`` carries the phase across chunks, so the kept samples are
exactly those whose global sample index ``i`` (0-based, in stream order,
counted from stream start per key) satisfies ``i % q == phase``. The output
time axis has ``gain = q * gain_in`` and offset = timestamp of the first kept
sample. ``q`` derives from ``factor`` or ``int(1 / (gain * target_rate))``.

Batch formulation: chunk-invariance makes the global-index modulo the
*definition*; we compute the global index with a per-key ordered
``row_number`` (one shuffle on the key, which any per-key ordered operator
needs) and filter — all JVM-side, whole-stage-codegen.

Scale note: the shuffle partitions by series key (url/domain), so 1000
executors each sort only their keys' rows; no global sort. Skewed keys are
handled upstream by salting (plans/rollup_tiers) or AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def factor_from_target_rate(gain: float, target_rate: float) -> int:
    """Reference ``downsample.py:57-73``: q = int(1/(gain*target_rate)), min 1."""
    q = int(1 / (gain * target_rate))
    return max(q, 1)


def downsample(
    df: DataFrame,
    q: int,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    phase: int = 0,
    idx_col: str | None = None,
) -> DataFrame:
    """Keep rows where global per-key sample index % q == phase.

    If ``idx_col`` is given it is used as the (precomputed) 0-based global
    index — this lets a pipeline reuse one row_number across several ordered
    operators instead of re-sorting.
    """
    if q <= 1:
        return df
    if idx_col is None:
        w = Window.partitionBy(*key_cols).orderBy(ts_col)
        gidx = F.row_number().over(w) - F.lit(1)
    else:
        gidx = F.col(idx_col)
    return (
        df.withColumn("_ds_gidx", gidx)
        .filter((F.col("_ds_gidx") % q) == phase)
        .drop("_ds_gidx")
    )


def decimate(
    df: "DataFrame",
    q: int,
    fs: float,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "decimated",
) -> "DataFrame":
    """Decimate = Chebyshev-I anti-alias lowpass → every-q-th sample.

    Reference ``decimate.py:14-70``: cheby1(order=8, ripple_tol=0.05 dB,
    Wn=0.4·target_rate) ahead of Downsample; the filter is skipped entirely
    when the downsample factor is < 2 (``decimate.py:26-31``).
    """
    from .filters import apply_series_kernel, sosfilt, sosfilt_zi
    from .filters2 import cheby_sos

    if q < 2:
        out = df.withColumn(out_col, F.col(value_col))
        return downsample(out, q, key_cols, ts_col)
    target_rate = fs / q
    sos = cheby_sos(8, 0.05, 0.4 * target_rate, "lowpass", fs=fs, cheby_type="cheby1")

    def kernel(x):
        if x.size == 0:
            return x
        return sosfilt(sos, x, sosfilt_zi(sos) * x[0])

    filt = apply_series_kernel(df, kernel, key_cols=key_cols, ts_col=ts_col,
                               value_col=value_col, out_col=out_col)
    return downsample(filt, q, key_cols, ts_col)
