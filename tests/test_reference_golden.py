"""Reference golden-vector sweeps, ported 1:1 from the reference's own
discriminating parametrizations (VERDICT r1 item 6):

- downsample factor/target-rate sweep (`/root/reference/tests/unit/
  test_downsample.py:13-15,62-71`): output ≡ sig[::factor] with the exact
  factor-derivation rule;
- the window-sizing oracle (`tests/unit/test_window.py:41-60` +
  `tests/helpers/util.py:112-171`): window contents and start indices against
  a whole-signal numpy sliding_window_view oracle across win_dur × win_shift
  × zero_pad × fs (batch scope: win_shift set; zero_pad ∈ {'shift','none'} —
  'input' and shift=None are chunk-dependent per the reference's own warning,
  documented non-ports);
- the binned-aggregate global-bin oracle (`tests/unit/
  test_binned_aggregate.py:44-71`) at the discriminating fs=30012 where
  samples-per-bin is fractional.

The oracles are re-derived numpy implementations of the published semantics,
not copies of the reference helpers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from numpy.lib.stride_tricks import sliding_window_view
from pyspark.sql import functions as F

from ezmsg_sigproc_spark.operators.aggregate import binned_aggregate
from ezmsg_sigproc_spark.operators.downsample import downsample, factor_from_target_rate
from ezmsg_sigproc_spark.operators.window import sliding_windows


def _long_df(spark, data: np.ndarray, fs: float):
    """(n_time, n_ch) → long rows (key, ts, value), key = channel label."""
    n, nch = data.shape
    recs = pd.DataFrame({
        "key": np.repeat([f"ch{j}" for j in range(nch)], n),
        "ts": np.tile(np.arange(n) / fs, nch),
        "value": data.T.ravel().astype(float),
    })
    return spark.createDataFrame(recs)


# ------------------------------------------------------------- downsample ----

@pytest.mark.parametrize("target_rate,factor", [
    (19.0, None), (9.5, None), (6.3, None),
    (19.0, 1), (9.5, 1), (6.3, 1),
    (19.0, 2), (9.5, 2), (6.3, 2),
])
def test_downsample_reference_sweep(spark, target_rate, factor):
    in_fs = 19.0
    num_samps = int(np.ceil(4.0 * in_fs))
    nch = 6  # the reference's 2 ch × 3 feat flattened to long-format keys
    sig = np.arange(num_samps * nch, dtype=float).reshape(num_samps, nch)
    expected_factor = int(in_fs // target_rate) if factor is None else factor
    # the factor-derivation rule (reference downsample.py:57-73)
    assert factor_from_target_rate(1.0 / in_fs, target_rate) == max(int(in_fs // target_rate), 1)

    df = _long_df(spark, sig, in_fs)
    out = downsample(df, expected_factor, key_cols=["key"], ts_col="ts").toPandas()
    got = out.pivot(index="ts", columns="key", values="value").sort_index()
    got = got[[f"ch{j}" for j in range(nch)]].to_numpy()
    np.testing.assert_array_equal(got, sig[::expected_factor])


# ------------------------------------------------------ window sizing oracle ----

def _expected_windows(data: np.ndarray, win_len: int, shift_len: int, zero_pad: str):
    """Whole-signal oracle: zero-prepend (win_len − n_cut) per the reference's
    zero_pad_until semantics, slide, stride by shift. Returns
    (windows[n_win, win_len, nch], start_idx[n_win]) with start indices
    counted on the UNPADDED signal (may be negative)."""
    n = data.shape[0]
    n_cut = shift_len if zero_pad == "shift" else win_len
    n_keep = max(win_len - n_cut, 0)
    padded = np.concatenate([np.zeros((n_keep, data.shape[1])), data], axis=0)
    wins = sliding_window_view(padded, win_len, axis=0)  # (n_pos, nch, win_len)
    wins = np.moveaxis(wins, -1, 1)[::shift_len]  # stride → (n_win, win_len, nch)
    starts = (np.arange(0, padded.shape[0] - win_len + 1, shift_len) - n_keep)
    # emit rule: a window is complete once its end index exists in the stream
    keep = starts + win_len <= n
    return wins[keep], starts[keep]


@pytest.mark.parametrize("fs", [100.0, 500.0])
@pytest.mark.parametrize("zero_pad", ["shift", "none"])
@pytest.mark.parametrize("win_dur,win_shift", [
    (0.3, 0.2), (1.0, 0.2), (0.3, 1.0), (1.0, 1.0),
])
def test_window_sizing_reference_oracle(spark, fs, zero_pad, win_dur, win_shift):
    nchans = 5
    shift_len = int(win_shift * fs)
    win_len = int(win_dur * fs)
    data_len = 2 * max(win_len, 60) + shift_len - 1  # reference sizing rule
    data = np.arange(nchans * data_len, dtype=float).reshape((data_len, nchans), order="F")

    exp_wins, exp_starts = _expected_windows(data, win_len, shift_len, zero_pad)

    df = _long_df(spark, data, fs)
    out = sliding_windows(df, win_len, shift_len, key_cols=["key"], ts_col="ts",
                          zero_pad=zero_pad, drop_partial=True).toPandas()
    out["gidx"] = np.rint(out["ts"].to_numpy() * fs).astype(int)

    n_win_got = out["win_id"].nunique()
    assert n_win_got == exp_wins.shape[0], (n_win_got, exp_wins.shape[0])

    for w in range(exp_wins.shape[0]):
        start = exp_starts[w]
        sub = out[out.win_id == w]
        got = np.zeros((win_len, nchans))
        for j in range(nchans):
            rows = sub[sub.key == f"ch{j}"].sort_values("gidx")
            # absent rows are the virtual zero-pad; place present samples at
            # their in-window offset
            got[rows["gidx"].to_numpy() - start, j] = rows["value"].to_numpy()
        np.testing.assert_array_equal(got, exp_wins[w])
        # window start index on the stream
        present = sub[sub.key == "ch0"]["gidx"].to_numpy()
        assert present.min() == max(start, 0)
        assert present.max() == start + win_len - 1


# ------------------------------------------------- binned-aggregate oracle ----

def _ref_binned(x: np.ndarray, spb: float) -> np.ndarray:
    """Global-bin ground truth: mean over [int((m−1)·spb), int(m·spb))."""
    n_bins = int(x.shape[0] / spb)
    return np.stack([
        x[int((m - 1) * spb): int(m * spb)].mean(axis=0) for m in range(1, n_bins + 1)
    ], axis=0)


@pytest.mark.parametrize("fs", [30000.0, 30012.0])
def test_binned_aggregate_global_oracle(spark, fs):
    bin_dur = 0.02
    sig = np.random.default_rng(0).standard_normal((30000, 3))
    spb = bin_dur * fs
    ref = _ref_binned(sig, spb)

    df = _long_df(spark, sig, fs)
    out = binned_aggregate(df, bin_dur, fs, ["mean"], key_cols=["key"],
                           ts_col="ts", value_col="value", fractional=True).toPandas()
    got = out.pivot(index="bin_m", columns="key", values="mean").sort_index()
    got = got[[f"ch{j}" for j in range(3)]].to_numpy()
    # the batch engine flushes the trailing partial bin at end-of-input; the
    # streaming reference holds it in the buffer — compare the complete bins
    np.testing.assert_allclose(got[: ref.shape[0]], ref, rtol=0, atol=1e-12)
    assert got.shape[0] - ref.shape[0] in (0, 1)
