"""Multichannel (wide) kernels: one ``array<double>`` column holds the whole
channel vector, matching the reference's (time, ch) matrix semantics directly.

The reference's kernels are vectorized across channels in one numpy call
(e.g. ``lfilter(..., axis=axis_idx)`` filters all channels at once,
``src/ezmsg/sigproc/ewma.py:243-249``). The long format (one row per channel)
is the right shape for channel-keyed *aggregation*; for per-key *recurrence*
kernels over many channels, the wide shape is strictly better: one group per
key instead of key×ch, one Arrow transfer, one 2-D numpy call. These lifts
provide that path.

Conversions are native Catalyst: long→wide is a groupBy + array_agg pivot,
wide→long is ``posexplode``.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def long_to_wide(
    df: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    ch_col: str = "ch",
    value_col: str = "value",
    vec_col: str = "values",
) -> DataFrame:
    """(key, ts, ch, value) → (key, ts, values array ordered by ch)."""
    return (
        df.groupBy(*key_cols, ts_col)
        .agg(F.array_sort(F.collect_list(F.struct(ch_col, value_col))).alias("_s"))
        .withColumn(vec_col, F.transform(F.col("_s"), lambda s: s[value_col]))
        .withColumn("_chs", F.transform(F.col("_s"), lambda s: s[ch_col]))
        .drop("_s")
    )


def wide_to_long(
    df: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    vec_col: str = "values",
    ch_col: str = "ch",
    value_col: str = "value",
) -> DataFrame:
    ex = df.select(*key_cols, ts_col, F.posexplode(vec_col).alias("_pos", value_col), F.col("_chs"))
    return ex.withColumn(ch_col, F.element_at("_chs", F.col("_pos") + 1)).drop("_pos", "_chs")


def apply_matrix_kernel(
    df: DataFrame,
    kernel_np,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    vec_col: str = "values",
    out_col: str = "out",
) -> DataFrame:
    """Lift a 2-D numpy kernel (matrix (n_time, n_ch) → matrix) to a per-key
    operator over the wide shape: one Arrow batch and one numpy call per key
    covers every channel (the reference's axis-vectorized execution)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        mat = np.stack(pdf[vec_col].to_numpy())
        out = kernel_np(mat)
        pdf[out_col] = list(out)
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} array<double>"
    return df.groupBy(*key_cols).applyInPandas(fn, schema=schema)


def ewma_wide(df: DataFrame, alpha: float, **kw) -> DataFrame:
    """Bias-corrected EWMA over all channels in one kernel call — identical
    math to operators/ewma.ewma, vectorized across the channel axis."""
    from .ewma import ewma_corrected_np

    def kernel(mat: np.ndarray) -> np.ndarray:
        out = np.empty_like(mat)
        # block-rescaled cumsum is 1-D; loop channels (few) not rows (many)
        for c in range(mat.shape[1]):
            out[:, c] = ewma_corrected_np(mat[:, c], alpha)
        return out

    return apply_matrix_kernel(df, kernel, **kw)


def sosfilt_wide(df: DataFrame, sos: np.ndarray, **kw) -> DataFrame:
    """SOS cascade across all channels per key, x0-scaled zi per channel —
    channel-vectorized: one time loop drives every channel at once
    (filters.sosfilt_mat)."""
    from .filters import sosfilt_mat, sosfilt_zi

    zi0 = sosfilt_zi(sos)

    def kernel(mat: np.ndarray) -> np.ndarray:
        if mat.size == 0:
            return mat
        zi = zi0[:, :, None] * mat[0][None, None, :]
        return sosfilt_mat(sos, mat, zi)

    return apply_matrix_kernel(df, kernel, **kw)
