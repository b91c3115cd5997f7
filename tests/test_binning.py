"""Bin-grid law tests — mirrors reference tests/unit/test_bin_schedule.py:
closed-form boundaries, chunk invariance, off-nominal rates, fractional vs
sample-locked divergence (the fs=30030 discriminating case)."""

import numpy as np
import pytest

from ezmsg_sigproc_spark.functions.binning import (
    bin_boundaries_np,
    bin_index_np,
    output_gain,
    samples_per_bin,
)

RATES = [19.0, 100.0, 500.0, 1000.0, 30000.0, 30012.0, 30030.0]


@pytest.mark.parametrize("fs", RATES)
@pytest.mark.parametrize("bin_dur", [0.05, 0.1, 1.0])
def test_bin_index_matches_boundary_law(fs, bin_dur):
    spb = samples_per_bin(bin_dur, fs, fractional=True)
    n = 50_000
    idx = np.arange(n)
    m = bin_index_np(idx, spb)
    bounds = bin_boundaries_np(int(n / spb) + 3, spb)
    m_ref = np.searchsorted(bounds, idx, side="right") - 1
    np.testing.assert_array_equal(m, m_ref)


def test_chunk_invariance():
    """Assigning bins from the global index is chunking-free by construction;
    pin it the way the reference pins 50k×1-sample ≡ 1×50k-sample chunks
    (test_bin_schedule.py:98-104): a streaming port of BinSchedule.advance
    over arbitrary chunkings must agree with the batch law."""
    spb = samples_per_bin(0.1, 30012.0, fractional=True)
    n = 10_000
    batch = bin_index_np(np.arange(n), spb)

    for block in [1, 7, 64, 100, n]:
        # direct port of the reference's advance() bookkeeping
        m_done, n_carry, got = 0, 0, []
        pos = 0
        while pos < n:
            n_new = min(block, n - pos)
            in_done = int(m_done * spb)
            avail_end = in_done + n_carry + n_new
            cuts = []
            if avail_end >= int((m_done + 1) * spb):
                k_est = max(int((avail_end + 1) / spb) - m_done, 0) + 2
                ms = m_done + 1 + np.arange(k_est)
                cand = (ms * spb).astype(np.int64)
                cuts = (cand[cand <= avail_end] - in_done).tolist()
            work = n_carry + n_new
            if cuts:
                for i, c in enumerate(cuts):
                    start = 0 if i == 0 else cuts[i - 1]
                    got.extend([m_done + i] * (c - start))
                n_carry = work - cuts[-1]
                m_done += len(cuts)
            else:
                n_carry = work
            pos += n_new
        got.extend([m_done] * n_carry)  # open partial bin
        np.testing.assert_array_equal(np.asarray(got), batch, err_msg=f"block={block}")


def test_fractional_vs_sample_locked_diverge_at_30012():
    """At fs=30012 the fractional and sample-locked grids must differ in gain
    (the historic Window vs EventRate divergence, binning.py:9-15)."""
    g_frac = output_gain(0.1, 30012.0, fractional=True)
    g_lock = output_gain(0.1, 30012.0, fractional=False)
    assert g_frac == 0.1
    assert g_lock == int(0.1 * 30012.0) / 30012.0
    assert g_frac != g_lock


def test_sample_locked_clamps_to_one_sample():
    assert samples_per_bin(0.0001, 100.0, fractional=False) == 1.0


def test_spark_column_matches_numpy(spark):
    from pyspark.sql import functions as F

    from ezmsg_sigproc_spark.functions.binning import bin_index_col

    for spb in [2.5, 7.5, 59.94005994005994, 997.3]:
        df = spark.range(20_000).select(bin_index_col(F.col("id"), spb).alias("m"))
        got = np.array([r.m for r in df.collect()])
        exp = bin_index_np(np.arange(20_000), spb)
        np.testing.assert_array_equal(got, exp, err_msg=f"spb={spb}")
