"""IIR/FIR smoothing filters — Butterworth-style kernels as pandas UDFs.

Reference (SURVEY.md §2.3): all filters share the ``FilterTransformer`` core —
stateful IIR/FIR with carried state ``zi``, initialized from the steady-state
response scaled by the first sample so a DC offset doesn't ring
(``src/ezmsg/sigproc/filter.py:337-557``, zi init 362-447);
``ButterworthFilterTransformer`` designs coefficients with
``scipy.signal.butter`` from ``cuton``/``cutoff``
(``butterworthfilter.py:47-69``); ``GaussianSmoothingFilter`` builds a
Gaussian FIR kernel with sigma in seconds (``gaussiansmoothing.py:16-60``).

scipy is not available in this environment, so the design math is implemented
from first principles (public textbook algorithms):

- Butterworth analog prototype poles ``p_k = exp(iπ(2k+n+1)/(2n))``,
- frequency pre-warp ``ω = 2·fs·tan(π·Wn/fs)`` and lp→lp/hp/bp transforms,
- bilinear transform to the z-plane, conjugate-pair pairing into SOS biquads,
- ``sosfilt`` = cascade of direct-form-II-transposed biquads with ``zi``
  steady-state init (ports of the published scipy semantics, not of code).

Spark realization: an IIR has unbounded feedback → per-key ordered recurrence
in ``applyInPandas`` (SURVEY.md §2.3). The numerator (FIR) part of every
section is vectorized with ``np.convolve``; only the order-2 denominator
recurrence runs as a scalar loop. FIR filters (Gaussian smoothing, moving
average) are fully vectorized convolutions.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


# ---------------------------------------------------------------- design ----

def _butter_analog_poles(order: int) -> np.ndarray:
    k = np.arange(order)
    return np.exp(1j * math.pi * (2 * k + order + 1) / (2 * order))


def butter_sos(order: int, wn, btype: str = "lowpass", fs: float = 2.0) -> np.ndarray:
    """Butterworth digital design → SOS array (n_sections, 6), scipy-compatible
    semantics: ``wn`` in the same units as ``fs`` (critical frequency)."""
    p = _butter_analog_poles(order)
    z = np.array([], dtype=complex)
    k_gain = 1.0
    fs2 = 2.0 * fs

    # gain terms are deliberately not tracked through the transforms; the
    # passband gain is normalized exactly at the end via the frequency response
    if btype in ("lowpass", "highpass"):
        w = fs2 * math.tan(math.pi * float(wn) / fs)
        if btype == "lowpass":
            p = w * p
        else:
            p = w / p
            z = np.zeros(order, dtype=complex)
    elif btype in ("bandpass", "bandstop"):
        lo, hi = (fs2 * math.tan(math.pi * float(x) / fs) for x in wn)
        bw = hi - lo
        w0 = math.sqrt(lo * hi)
        if btype == "bandpass":
            # lp2bp: each pole p → pair solving s^2 - p*bw*s + w0^2 = 0
            disc = np.sqrt((p * bw / 2) ** 2 - w0**2 + 0j)
            p = np.concatenate([p * bw / 2 + disc, p * bw / 2 - disc])
            z = np.zeros(order, dtype=complex)
        else:
            disc = np.sqrt((bw / (2 * p)) ** 2 - w0**2 + 0j)
            p = np.concatenate([bw / (2 * p) + disc, bw / (2 * p) - disc])
            z = np.concatenate([1j * w0 * np.ones(order), -1j * w0 * np.ones(order)])
    else:
        raise ValueError(f"btype {btype!r}")

    # bilinear transform s → 2fs(z-1)/(z+1)
    def bl(x):
        return (fs2 + x) / (fs2 - x)

    num_degree = len(z)
    den_degree = len(p)
    zd = bl(z)
    pd_ = bl(p)
    # gain at transform: k * prod(fs2 - z)/prod(fs2 - p)
    kd = k_gain * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    # zeros at infinity map to z=-1
    zd = np.concatenate([zd, -np.ones(den_degree - num_degree)])

    sos = _zpk2sos(zd, pd_, kd)

    # normalize exact passband gain (unit at DC for lp/bs, at Nyquist for hp,
    # at center for bp) — corrects any accumulated gain-term simplification
    if btype == "lowpass" or btype == "bandstop":
        ref_w = 0.0
    elif btype == "highpass":
        ref_w = math.pi
    else:
        ref_w = 2 * math.pi * math.sqrt(float(wn[0]) * float(wn[1])) / fs
    g = abs(sos_freq_response(sos, np.array([ref_w]))[0])
    sos[0, :3] /= g
    return sos


def _zpk2sos(z: np.ndarray, p: np.ndarray, k: float) -> np.ndarray:
    """Pair conjugate poles/zeros into second-order sections (simplified
    pairing adequate for Butterworth-family designs)."""

    def conj_pairs(arr):
        arr = np.asarray(arr, dtype=complex)
        used = np.zeros(len(arr), dtype=bool)
        pairs, singles = [], []
        order = np.argsort(-np.abs(arr))
        for i in order:
            if used[i]:
                continue
            used[i] = True
            if abs(arr[i].imag) < 1e-12:
                singles.append(arr[i].real)
                continue
            # find conjugate
            cand = np.where(~used & (np.abs(arr - arr[i].conj()) < 1e-8))[0]
            if len(cand):
                used[cand[0]] = True
                pairs.append((arr[i], arr[i].conj()))
            else:
                singles.append(arr[i].real)
        # combine leftover reals into pairs
        while len(singles) >= 2:
            pairs.append((singles.pop(), singles.pop()))
        return pairs, singles

    pp, ps = conj_pairs(p)
    zp, zs = conj_pairs(z)
    n_sections = (len(p) + 1) // 2
    sos = []
    for i in range(n_sections):
        if pp:
            p1, p2 = pp.pop(0)
            a = np.real(np.poly([p1, p2]))
        elif ps:
            a = np.real(np.poly([ps.pop(0)]))
            a = np.append(a, 0.0)
        else:
            a = np.array([1.0, 0.0, 0.0])
        if zp:
            z1, z2 = zp.pop(0)
            b = np.real(np.poly([z1, z2]))
        elif zs:
            b = np.real(np.poly([zs.pop(0)]))
            b = np.append(b, 0.0)
        else:
            b = np.array([1.0, 0.0, 0.0])
        sos.append(np.concatenate([b, a]))
    sos = np.asarray(sos, dtype=np.float64)
    sos[0, :3] *= k
    return sos


def sos_freq_response(sos: np.ndarray, w: np.ndarray) -> np.ndarray:
    """H(e^{jw}) of an SOS cascade (for design validation)."""
    ejw = np.exp(-1j * w)
    h = np.ones_like(ejw, dtype=complex)
    for b0, b1, b2, a0, a1, a2 in sos:
        h *= (b0 + b1 * ejw + b2 * ejw**2) / (a0 + a1 * ejw + a2 * ejw**2)
    return h


# --------------------------------------------------------------- kernels ----

def sosfilt_zi(sos: np.ndarray) -> np.ndarray:
    """Steady-state (unit step) initial conditions per section — semantics of
    the published sosfilt_zi: feeding a constant x keeps output constant."""
    n = sos.shape[0]
    zi = np.zeros((n, 2))
    scale = 1.0
    for s in range(n):
        b0, b1, b2, _, a1, a2 = sos[s]
        h = (b0 + b1 + b2) / (1 + a1 + a2)
        z2 = b2 - a2 * h
        z1 = b1 - a1 * h + z2
        zi[s, 0] = scale * z1
        zi[s, 1] = scale * z2
        scale *= h
    return zi


def sosfilt(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None) -> np.ndarray:
    """Cascade of direct-form-II-transposed biquads. The FIR numerator of each
    section is vectorized (np.convolve); only the order-2 feedback recurrence
    is a scalar loop."""
    y = np.asarray(x, dtype=np.float64).copy()
    n = y.size
    if n == 0:
        return y
    for s in range(sos.shape[0]):
        b0, b1, b2, _, a1, a2 = sos[s]
        z1 = zi[s, 0] if zi is not None else 0.0
        z2 = zi[s, 1] if zi is not None else 0.0
        out = np.empty(n)
        xs = y
        for i in range(n):
            xi = xs[i]
            yi = b0 * xi + z1
            z1 = b1 * xi - a1 * yi + z2
            z2 = b2 * xi - a2 * yi
            out[i] = yi
        y = out
    return y


def sosfilt_mat(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None) -> np.ndarray:
    """SOS cascade over a (n_time, n_ch) matrix — the reference's
    axis-vectorized execution (``lfilter(..., axis=axis_idx)``): the time
    recurrence is sequential but every step runs vectorized across all
    channels, so wide data costs ~the same as one channel.

    ``zi``: (n_sections, 2, n_ch) initial conditions, or None for zeros.
    """
    x = np.asarray(x, dtype=np.float64)
    n, _ = x.shape
    y = x.copy()
    for s in range(sos.shape[0]):
        b0, b1, b2, _, a1, a2 = sos[s]
        z1 = zi[s, 0].copy() if zi is not None else np.zeros(x.shape[1])
        z2 = zi[s, 1].copy() if zi is not None else np.zeros(x.shape[1])
        xs = y
        out = np.empty_like(xs)
        for i in range(n):
            xi = xs[i]
            yi = b0 * xi + z1
            z1 = b1 * xi - a1 * yi + z2
            z2 = b2 * xi - a2 * yi
            out[i] = yi
        y = out
    return y


def butter_filter_np(x: np.ndarray, order: int, wn, btype: str, fs: float) -> np.ndarray:
    """Design + filter with x0-scaled steady-state zi (reference
    filter.py:362-447: ``zi = sosfilt_zi(sos) * x0`` so DC offset doesn't ring)."""
    sos = butter_sos(order, wn, btype, fs=fs)
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return x
    zi = sosfilt_zi(sos) * x[0]
    return sosfilt(sos, x, zi)


def gaussian_kernel(sigma_s: float, dt: float, width_sigmas: float = 4.0) -> np.ndarray:
    """Gaussian FIR taps, sigma in seconds (reference gaussiansmoothing.py:16-60);
    normalized to unit sum. Default sigma=0.01 s ⇒ ~13.2 Hz lowpass."""
    m = max(1, int(round(width_sigmas * sigma_s / dt)))
    t = np.arange(-m, m + 1) * dt
    k = np.exp(-0.5 * (t / sigma_s) ** 2)
    return k / k.sum()


def fir_filter_np(x: np.ndarray, taps: np.ndarray, mode: str = "causal") -> np.ndarray:
    """Vectorized FIR. ``causal``: y_t = Σ_k taps[k]·x_{t-k} with edge clamp to
    x[0] (matching the reference's zi edge handling); ``same``: zero-phase
    centered convolution."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return x
    if mode == "same":
        pad = len(taps) // 2
        xp = np.concatenate([np.full(pad, x[0]), x, np.full(pad, x[-1])])
        return np.convolve(xp, taps, mode="valid")[: x.size]
    xp = np.concatenate([np.full(len(taps) - 1, x[0]), x])
    return np.convolve(xp, taps, mode="valid")


# ----------------------------------------------------------- spark lifts ----

def apply_series_kernel(
    df: DataFrame,
    kernel_np,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "filtered",
) -> DataFrame:
    """Lift any 1-D numpy kernel (array → array) to a per-key ordered
    ``applyInPandas`` operator — the engine's extension API, mirroring the
    reference's ``stateful_op`` embedding template (SURVEY.md §2.10)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        pdf[out_col] = kernel_np(pdf[value_col].to_numpy(np.float64))
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    return df.groupBy(*key_cols).applyInPandas(fn, schema=schema)


def butterworth(
    df: DataFrame,
    order: int,
    cuton: float | None = None,
    cutoff: float | None = None,
    fs: float = 1.0,
    **kw,
) -> DataFrame:
    """Butterworth lp/hp/bp/bs from cuton/cutoff, reference
    ``butterworthfilter.py:47-69``: cutoff only → lowpass; cuton only →
    highpass; both (cuton < cutoff) → bandpass; both (cuton > cutoff) →
    bandstop."""
    if cuton is None and cutoff is not None:
        btype, wn = "lowpass", cutoff
    elif cuton is not None and cutoff is None:
        btype, wn = "highpass", cuton
    elif cuton is not None and cutoff is not None:
        if cuton <= cutoff:
            btype, wn = "bandpass", (cuton, cutoff)
        else:
            btype, wn = "bandstop", (cutoff, cuton)
    else:
        raise ValueError("need cuton and/or cutoff")
    return apply_series_kernel(df, lambda x: butter_filter_np(x, order, wn, btype, fs), **kw)


def gaussian_smooth(df: DataFrame, sigma_s: float, dt: float, **kw) -> DataFrame:
    taps = gaussian_kernel(sigma_s, dt)
    return apply_series_kernel(df, lambda x: fir_filter_np(x, taps, "same"), **kw)
