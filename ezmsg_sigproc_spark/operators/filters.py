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
in ``applyInPandas`` (SURVEY.md §2.3). There is NO per-sample Python loop in
the hot path: each biquad's numerator is a vectorized shift-and-add, and the
order-2 feedback is solved with a Hillis–Steele parallel prefix scan over the
affine recurrence v_i = A·v_{i-1} + u_i (2×2 companion matrices, O(n log n)
vectorized numpy ops) — the same parallel-scan linear-recurrence technique the
reference uses for its GPU IIR (``src/ezmsg/sigproc/filter.py:88-182``;
algorithm from Blelloch, "Prefix Sums and Their Applications", 1990).
FIR filters (Gaussian smoothing, moving average) are vectorized convolutions.
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


def _sosfilt_loop(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None) -> np.ndarray:
    """Reference per-sample DF2T loop (1-D). Kept as the independent oracle
    for the scan implementation and for tiny inputs where loop overhead wins."""
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


def _biquad_scan(coef, x: np.ndarray, z1i, z2i) -> np.ndarray:
    """One DF2T biquad over ``x`` of shape (n, m), fully vectorized.

    The DF2T recurrence with initial conditions (z1i, z2i) is algebraically
    identical to the direct-form recurrence
        y_i = f_i - a1·y_{i-1} - a2·y_{i-2},   y_{-1} = y_{-2} = 0,
    with forcing  f_0 = b0·x_0 + z1i,  f_1 = b0·x_1 + b1·x_0 + z2i,
    f_i = b0·x_i + b1·x_{i-1} + b2·x_{i-2}  (i ≥ 2).

    The AR(2) feedback is solved with a Hillis–Steele inclusive scan over
    affine maps v_i = A·v_{i-1} + [f_i, 0], A = [[-a1, -a2], [1, 0]]: each
    doubling step is a vectorized batch of 2×2 matrix products, so the whole
    recurrence is O(n log n) numpy FLOPs with zero per-sample Python.
    Chunked over time (carrying the boundary state exactly via A^k terms the
    scan already produces) so peak memory stays ~32 MB regardless of n·m.
    """
    b0, b1, b2, a1, a2 = coef
    n, m = x.shape
    f = b0 * x
    if n > 1:
        f[1:] += b1 * x[:-1]
    if n > 2:
        f[2:] += b2 * x[:-2]
    f[0] += z1i
    if n > 1:
        f[1] += z2i
    y = np.empty_like(f)
    yp1 = np.zeros(m)  # y_{-1}
    yp2 = np.zeros(m)  # y_{-2}
    chunk = int(max(64, min(n, (1 << 21) // max(m, 1))))
    for lo in range(0, n, chunk):
        fc = f[lo : lo + chunk]
        k = fc.shape[0]
        # P_i: 2×2 companion-matrix products kept as four flat arrays so every
        # doubling step is pure elementwise FMA (batched np.matmul on 2×2
        # stacks is ~10× slower — dispatch overhead dominates tiny matrices)
        p00 = np.full(k, -a1)
        p01 = np.full(k, -a2)
        p10 = np.ones(k)
        p11 = np.zeros(k)
        flat = m == 1
        c0 = fc[:, 0].copy() if flat else fc.copy()
        c1 = np.zeros_like(c0)
        d = 1
        while d < k:
            a00, a01, a10, a11 = p00[d:], p01[d:], p10[d:], p11[d:]
            b00, b01, b10, b11 = p00[:-d], p01[:-d], p10[:-d], p11[:-d]
            u0, u1 = c0[:-d], c1[:-d]
            if flat:
                c0n = c0[d:] + a00 * u0 + a01 * u1
                c1n = c1[d:] + a10 * u0 + a11 * u1
            else:
                c0n = c0[d:] + a00[:, None] * u0 + a01[:, None] * u1
                c1n = c1[d:] + a10[:, None] * u0 + a11[:, None] * u1
            q00 = a00 * b00 + a01 * b10
            q01 = a00 * b01 + a01 * b11
            q10 = a10 * b00 + a11 * b10
            q11 = a10 * b01 + a11 * b11
            c0[d:], c1[d:] = c0n, c1n
            p00[d:], p01[d:], p10[d:], p11[d:] = q00, q01, q10, q11
            d <<= 1
        # v_i = c_i + A^{i+1} v_{-1}; (p00, p01) hold A^{i+1}'s top row
        if flat:
            yc = (c0 + p00 * yp1[0] + p01 * yp2[0])[:, None]
        else:
            yc = c0 + p00[:, None] * yp1 + p01[:, None] * yp2
        y[lo : lo + k] = yc
        if k >= 2:
            yp1, yp2 = yc[-1].copy(), yc[-2].copy()
        else:
            yp1, yp2 = yc[-1].copy(), yp1
    return y


def sosfilt(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None) -> np.ndarray:
    """Cascade of direct-form-II-transposed biquads over a 1-D series.
    Vectorized: numerator as shift-and-add, feedback via parallel prefix scan
    (``_biquad_scan``); no per-sample Python in the hot path."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return x.copy()
    if n < 64:
        return _sosfilt_loop(sos, x, zi)
    y = x.reshape(n, 1)
    for s in range(sos.shape[0]):
        z1 = float(zi[s, 0]) if zi is not None else 0.0
        z2 = float(zi[s, 1]) if zi is not None else 0.0
        b0, b1, b2, _, a1, a2 = sos[s]
        y = _biquad_scan((b0, b1, b2, a1, a2), y, z1, z2)
    return y[:, 0]


def sosfilt_mat(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None) -> np.ndarray:
    """SOS cascade over a (n_time, n_ch) matrix — the reference's
    axis-vectorized execution (``lfilter(..., axis=axis_idx)``), here fully
    vectorized across BOTH time (prefix scan) and channels. Short chunks
    (n < 128, e.g. the reference's 30-sample online blocks) use the per-step
    channel-vectorized loop instead — fewer temporaries wins at that size.

    ``zi``: (n_sections, 2, n_ch) initial conditions, or None for zeros.
    """
    x = np.asarray(x, dtype=np.float64)
    n, m = x.shape
    y = x.copy()
    for s in range(sos.shape[0]):
        b0, b1, b2, _, a1, a2 = sos[s]
        z1 = zi[s, 0].copy() if zi is not None else np.zeros(m)
        z2 = zi[s, 1].copy() if zi is not None else np.zeros(m)
        if n < 128:
            out = np.empty_like(y)
            xs = y
            for i in range(n):
                xi = xs[i]
                yi = b0 * xi + z1
                z1 = b1 * xi - a1 * yi + z2
                z2 = b2 * xi - a2 * yi
                out[i] = yi
            y = out
        else:
            y = _biquad_scan((b0, b1, b2, a1, a2), y, z1, z2)
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
    from .serieslift import group_apply_sorted

    return group_apply_sorted(df, fn, key_cols, ts_col, schema)


def butterworth(
    df: DataFrame,
    order: int,
    cuton: float | None = None,
    cutoff: float | None = None,
    fs: float = 1.0,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "filtered",
) -> DataFrame:
    """Butterworth lp/hp/bp/bs from cuton/cutoff, reference
    ``butterworthfilter.py:47-69``: cutoff only → lowpass; cuton only →
    highpass; both (cuton < cutoff) → bandpass; both (cuton > cutoff) →
    bandstop.

    Executed key-batched: every Arrow batch's keys form one (time × keys)
    matrix and the prefix-scan SOS cascade runs once per batch, vectorized
    across both axes (causal, so ragged tail padding is inert); per-key
    x0-scaled zi comes from the matrix's first row."""
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
    sos = butter_sos(order, wn, btype, fs=fs)
    zi0 = sosfilt_zi(sos)

    def kern_mat(mat: np.ndarray) -> np.ndarray:
        zi = zi0[:, :, None] * mat[0][None, None, :]
        return sosfilt_mat(sos, mat, zi)

    from .serieslift import apply_matrix_kernel

    return apply_matrix_kernel(df, kern_mat, key_cols, ts_col, value_col, out_col)


def gaussian_smooth(df: DataFrame, sigma_s: float, dt: float, **kw) -> DataFrame:
    taps = gaussian_kernel(sigma_s, dt)
    return apply_series_kernel(df, lambda x: fir_filter_np(x, taps, "same"), **kw)
