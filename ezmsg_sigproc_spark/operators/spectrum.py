"""Spectral operators: windowed FFT, spectrogram, band power.

Reference (SURVEY.md §2.8):

- ``SpectrumTransformer`` (``src/ezmsg/sigproc/spectrum.py:135-265``): apply a
  window function (hamming/hanning/bartlett/blackman/rect) then rfft; output
  transform raw/real/imag/power/dB where power = |X|² and
  dB = 10·log10(|X|²/scale).
- ``SpectrogramTransformer`` (``spectrogram.py:47-68``): Window → Spectrum.
- ``BandPowerTransformer`` (``bandpower.py:41-66``): Spectrogram →
  RangedAggregate over frequency bands.
- ``RMSBandPowerTransformer`` (``singlebandpow.py:44-84``): bandpass → square
  → tumbling window mean → sqrt (the canonical rollup chain) — built by
  composing :mod:`filters` + :mod:`aggregate` instead, see
  ``__spark_entry__.q_rms_bandpower``.

Spark realization: tumbling segmentation is column math (window.py); the FFT
itself runs per (key, window) group in one vectorized numpy ``rfft`` over a
2-D stack inside ``applyInPandas`` — one Arrow batch per key, all windows of
that key transformed in a single ``np.fft.rfft(matrix, axis=1)`` call.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .window import tumbling_windows

_WINDOW_FNS = {
    "rect": lambda n: np.ones(n),
    "hamming": np.hamming,
    "hanning": np.hanning,
    "bartlett": np.bartlett,
    "blackman": np.blackman,
}


def spectrum(
    df: DataFrame,
    win_len: int,
    fs: float,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    window_fn: str = "hamming",
    output: str = "power",
    out_axis: str = "pos",
    norm: str = "backward",
) -> DataFrame:
    """Tumbling-window spectrum: one output row per (key, win_id, freq_idx)
    with ``freq_hz`` and the transformed magnitude.

    ``output``: 'power' (|X|²), 'db' (10·log10|X|²), 'real', 'imag', 'abs'.
    ``out_axis``: 'pos' (rfft, default) or 'full' (two-sided fft) — the
    reference's SpectralOutput pos/full modes (spectrum.py:135-265).
    ``norm``: numpy fft norm ∈ {'backward', 'ortho', 'forward'}.
    """
    seg = tumbling_windows(df, win_len, key_cols, ts_col, win_col="win_id", drop_partial=True)
    taps = _WINDOW_FNS[window_fn](win_len)
    if out_axis == "full":
        freqs = np.fft.fftfreq(win_len, d=1.0 / fs)
    else:
        freqs = np.fft.rfftfreq(win_len, d=1.0 / fs)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["win_id", ts_col], kind="mergesort")
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        n_win = pdf["win_id"].nunique()
        mat = pdf[value_col].to_numpy(np.float64).reshape(n_win, win_len)
        if out_axis == "full":
            X = np.fft.fft(mat * taps[None, :], axis=1, norm=norm)
        else:
            X = np.fft.rfft(mat * taps[None, :], axis=1, norm=norm)
        if output == "power":
            out = np.abs(X) ** 2
        elif output == "db":
            out = 10.0 * np.log10(np.maximum(np.abs(X) ** 2, 1e-300))
        elif output == "real":
            out = X.real
        elif output == "imag":
            out = X.imag
        else:
            out = np.abs(X)
        win_ids = np.repeat(pdf["win_id"].unique(), len(freqs))
        res = pd.DataFrame(
            {
                **{c: np.repeat(v, len(win_ids)) for c, v in keys.items()},
                "win_id": win_ids,
                "freq_idx": np.tile(np.arange(len(freqs)), n_win),
                "freq_hz": np.tile(freqs, n_win),
                "spec": out.ravel(),
            }
        )
        return res

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in key_cols
    )
    schema = key_schema + ", win_id bigint, freq_idx int, freq_hz double, spec double"
    return seg.groupBy(*key_cols).applyInPandas(kernel, schema=schema)


def band_power(
    df: DataFrame,
    win_len: int,
    fs: float,
    bands: Sequence[tuple[float, float]],
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Spectrogram → mean power per frequency band (reference bandpower.py:41-66)."""
    from .aggregate import ranged_aggregate

    spec = spectrum(df, win_len, fs, key_cols, ts_col, value_col, output="power")
    return ranged_aggregate(
        spec,
        bands,
        ["mean"],
        key_cols=[*key_cols, "win_id"],
        value_col="spec",
        band_on="freq_hz",
    )


def _morlet_kernel(freq_hz: float, fs: float, n_cycles: float = 5.0) -> np.ndarray:
    """Complex Morlet wavelet sampled at fs (the pywt 'cmor'-family shape the
    reference CWT uses, wavelets.py:22-60): exp(j2πft)·exp(−t²/2σ²), σ set so
    the envelope spans ~n_cycles of the target frequency; L1-normalized."""
    sigma = n_cycles / (2 * np.pi * freq_hz)
    half = int(np.ceil(4 * sigma * fs))
    t = np.arange(-half, half + 1) / fs
    psi = np.exp(2j * np.pi * freq_hz * t) * np.exp(-0.5 * (t / sigma) ** 2)
    return psi / np.sum(np.abs(psi))


def cwt_morlet(
    df: DataFrame,
    fs: float,
    freqs: Sequence[float],
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Continuous wavelet transform (reference CWTTransformer,
    wavelets.py:22-60): per-(key, freq, time) |coefficient| via complex Morlet
    convolution — the filterbank-of-wavelets realization, one vectorized
    convolution per scale inside the per-key kernel."""
    import pandas as pd

    kernels = {float(f): _morlet_kernel(float(f), fs) for f in freqs}

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(np.float64)
        frames = []
        for f, psi in kernels.items():
            pad = len(psi) // 2
            xp = np.concatenate([np.full(pad, x[0] if x.size else 0.0), x,
                                 np.full(pad, x[-1] if x.size else 0.0)])
            coef = np.abs(np.convolve(xp, psi, mode="valid"))[: x.size]
            frames.append(pd.DataFrame({
                **{c: pdf[c] for c in key_cols},
                ts_col: pdf[ts_col],
                "freq_hz": f,
                "abs_coef": coef,
            }))
        return pd.concat(frames, ignore_index=True)

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in key_cols
    )
    schema = key_schema + f", {ts_col} double, freq_hz double, abs_coef double"
    return df.groupBy(*key_cols).applyInPandas(kern, schema=schema)
