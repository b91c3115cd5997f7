"""The bin-grid law: single source of truth for fixed-duration bin boundaries.

Re-expresses the reference's ``BinSchedule`` (reference:
``src/ezmsg/sigproc/util/binning.py:75-206``) as pure column arithmetic.

Boundary definition (must match bit-for-bit): with ``spb`` samples per bin
(fractional when ``fractional=True``), the global per-key sample index of the
m-th bin boundary is ``B(m) = int(m * spb)`` (float multiply, then truncate —
the reference computes ``(m * spb).astype(np.int64)``). Sample ``i`` belongs to
bin ``m`` iff ``B(m) <= i < B(m+1)``.

Because ``int(m*spb) <= i  ⟺  m*spb < i+1`` (for non-negative values), the
closed-form inverse is ``m = ceil((i+1)/spb) - 1`` under real arithmetic. Under
float64 the division can land an ulp off the reference's multiplication, so we
apply a one-step correction in each direction against the *forward* formula
``trunc(m*spb)`` — the same float64 ops the reference runs, so the result is
identical for any chunking (chunk-invariance contract, SURVEY.md §1.2).

Output axis labels (reference ``binning.py:165-190``):
 - fractional: ``output_gain = bin_duration``; sample-locked:
   ``output_gain = int(bin_duration*fs)/fs``.
 - bin m's nominal start time = ``stream_t0 + m * output_gain`` where
   ``stream_t0`` is the timestamp of the key's global sample 0.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def samples_per_bin(bin_duration: float, fs: float, fractional: bool = True) -> float:
    """``spb`` per reference ``binning.py:116-139`` (incl. sample-locked clamp)."""
    spb = bin_duration * fs
    if not fractional:
        spb = float(int(spb))
        if spb < 1.0:
            spb = 1.0
    return spb


def output_gain(bin_duration: float, fs: float, fractional: bool = True) -> float:
    spb = samples_per_bin(bin_duration, fs, fractional)
    return bin_duration if fractional else spb / fs


def bin_index_col(global_idx: Column, spb: float) -> Column:
    """Bin index m of global sample index ``global_idx`` under B(m)=int(m*spb).

    ``global_idx`` must be the per-key 0-based sample index in stream order
    (e.g. ``row_number().over(Window.partitionBy(key).orderBy(ts)) - 1``).

    Stays entirely in whole-stage codegen (no UDF): closed-form estimate plus a
    one-step float correction against the forward boundary formula.
    """
    i = global_idx.cast("double")
    est = F.ceil((i + F.lit(1.0)) / F.lit(float(spb))).cast("bigint") - F.lit(1)
    est = F.greatest(est, F.lit(0))
    # forward boundaries around the estimate, using the reference's exact float op
    b_est = (est.cast("double") * F.lit(float(spb))).cast("bigint")
    b_next = ((est + 1).cast("double") * F.lit(float(spb))).cast("bigint")
    m = F.when(b_next <= global_idx, est + 1).when(b_est > global_idx, est - 1).otherwise(est)
    return m


def bin_index_np(global_idx: np.ndarray, spb: float) -> np.ndarray:
    """Numpy twin of :func:`bin_index_col` for pandas-UDF kernels and oracles."""
    i = np.asarray(global_idx, dtype=np.float64)
    est = np.ceil((i + 1.0) / spb).astype(np.int64) - 1
    est = np.maximum(est, 0)
    b_est = (est * spb).astype(np.int64)
    b_next = ((est + 1) * spb).astype(np.int64)
    m = np.where(b_next <= global_idx, est + 1, np.where(b_est > global_idx, est - 1, est))
    return m.astype(np.int64)


def bin_index_sql(idx_expr: str, spb: float) -> str:
    """ANSI-SQL rendering of the same law (for DuckDB oracles).

    ``idx_expr`` is a SQL expression for the 0-based global sample index.
    """
    s = repr(float(spb))
    # NB: DuckDB's double→BIGINT cast *rounds*; Spark/numpy truncate. The law
    # is defined with truncation (int(m*spb)), so trunc() is explicit here.
    est = f"(CAST(trunc(greatest(ceil((({idx_expr})+1.0)/{s}), 1.0)) AS BIGINT) - 1)"
    return (
        f"(CASE WHEN CAST(trunc(CAST({est}+1 AS DOUBLE)*{s}) AS BIGINT) <= ({idx_expr})"
        f" THEN {est}+1"
        f" WHEN CAST(trunc(CAST({est} AS DOUBLE)*{s}) AS BIGINT) > ({idx_expr})"
        f" THEN {est}-1"
        f" ELSE {est} END)"
    )


def bin_boundaries_np(n_bins: int, spb: float) -> np.ndarray:
    """B(m) = int(m*spb) for m in [0, n_bins] — direct port of the law for tests
    (reference ``binning.py:184-190``)."""
    m = np.arange(n_bins + 1)
    return (m * spb).astype(np.int64)
