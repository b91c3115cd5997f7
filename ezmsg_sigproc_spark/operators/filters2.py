"""Extended filter family: Chebyshev I/II, comb (notch/peak biquad cascade),
windowed-FIR designs (firwin/Kaiser/Hilbert), zero-phase Butterworth,
filterbank, and adaptive notch kernels.

Reference operators covered (SURVEY.md §2.3):

- ``ChebyshevFilterTransformer`` (``src/ezmsg/sigproc/cheby.py:18-127``):
  cheby1/cheby2 design by (order, ripple_tol, Wn, btype).
- ``CombFilter`` (``combfilter.py:19-60``): cascade of RBJ notch/peak biquads
  at the fundamental and its harmonics, constant or proportional Q.
- ``FIRFilter``/``KaiserFilter``/``FIRHilbert`` (``firfilter.py:18-120``,
  ``kaiser.py:18-108``, ``fir_hilbert.py:22-335``): window-method FIR design;
  Kaiser window from (ripple, width); type-III Hilbert. (Parks-McClellan
  ``fir_pmc.py`` designs via the Remez exchange — the window-method designs
  here cover its use cases with slightly wider transition bands; noted as a
  deliberate design substitution, not a port gap.)
- ``ButterworthZeroPhase`` (``butterworthzerophase.py:1-40``):
  forward+backward pass with odd-reflection padding (filtfilt semantics).
- ``FilterbankTransformer`` (``filterbank.py:26-302``): parallel FIR kernels,
  one labeled output stream per kernel.
- ``AdaptiveLNC`` (``adaptive_lnc.py``) / ``AdaptiveLatticeNotchFilter``
  (``adaptive_lattice_notch.py``): LMS mains canceller and frequency-tracking
  lattice notch — simplified public-textbook LMS/ANF recurrences with the
  same I/O contract.

All design math is public textbook material (Chebyshev closed-form poles, RBJ
audio-EQ cookbook biquads, window-method FIR); scipy is not available here so
nothing is delegated.
"""

from __future__ import annotations

import math

import numpy as np

from .filters import _zpk2sos, sos_freq_response, sosfilt, sosfilt_zi


# ------------------------------------------------------------- chebyshev ----

def _cheby1_analog(order: int, rp_db: float):
    eps = math.sqrt(10 ** (rp_db / 10.0) - 1.0)
    mu = math.asinh(1.0 / eps) / order
    k = np.arange(1, order + 1)
    theta = math.pi * (2 * k - 1) / (2 * order)
    poles = -np.sinh(mu) * np.sin(theta) + 1j * np.cosh(mu) * np.cos(theta)
    return np.array([], dtype=complex), poles


def _cheby2_analog(order: int, rs_db: float):
    eps = 1.0 / math.sqrt(10 ** (rs_db / 10.0) - 1.0)
    mu = math.asinh(1.0 / eps) / order
    k = np.arange(1, order + 1)
    theta = math.pi * (2 * k - 1) / (2 * order)
    p1 = -np.sinh(mu) * np.sin(theta) + 1j * np.cosh(mu) * np.cos(theta)
    poles = 1.0 / p1
    zk = np.cos(theta)
    zk = zk[np.abs(zk) > 1e-12]  # odd order: drop the zero at infinity
    zeros = 1j / zk
    return zeros, poles


def cheby_sos(order: int, ripple_db: float, wn, btype: str = "lowpass",
              fs: float = 2.0, cheby_type: str = "cheby1") -> np.ndarray:
    """Chebyshev I/II digital design → SOS (reference cheby.py:62-127
    semantics: ripple_tol in dB, Wn in the units of fs)."""
    z, p = _cheby1_analog(order, ripple_db) if cheby_type == "cheby1" else _cheby2_analog(order, ripple_db)
    fs2 = 2.0 * fs

    if btype in ("lowpass", "highpass"):
        w = fs2 * math.tan(math.pi * float(wn) / fs)
        if btype == "lowpass":
            p = w * p
            z = w * z
        else:
            p = w / p
            z = np.concatenate([w / z, np.zeros(order - len(z))])
    elif btype in ("bandpass", "bandstop"):
        lo, hi = (fs2 * math.tan(math.pi * float(x) / fs) for x in wn)
        bw, w0 = hi - lo, math.sqrt(lo * hi)
        if btype == "bandpass":
            disc = np.sqrt((p * bw / 2) ** 2 - w0**2 + 0j)
            p = np.concatenate([p * bw / 2 + disc, p * bw / 2 - disc])
            discz = np.sqrt((z * bw / 2) ** 2 - w0**2 + 0j)
            z = np.concatenate([z * bw / 2 + discz, z * bw / 2 - discz,
                                np.zeros(order - len(z))])
        else:
            disc = np.sqrt((bw / (2 * p)) ** 2 - w0**2 + 0j)
            p = np.concatenate([bw / (2 * p) + disc, bw / (2 * p) - disc])
            if len(z):
                discz = np.sqrt((bw / (2 * z)) ** 2 - w0**2 + 0j)
                zt = np.concatenate([bw / (2 * z) + discz, bw / (2 * z) - discz])
            else:
                zt = np.array([], dtype=complex)
            n_inf = 2 * order - len(zt)
            z = np.concatenate([zt, 1j * w0 * np.ones(n_inf // 2), -1j * w0 * np.ones(n_inf // 2)])
    else:
        raise ValueError(btype)

    def bl(x):
        return (fs2 + x) / (fs2 - x)

    zd = np.concatenate([bl(z), -np.ones(len(p) - len(z))])
    pd_ = bl(p)
    sos = _zpk2sos(zd, pd_, 1.0)

    # normalize passband gain: cheby1 peaks at 1 between ripples — anchor the
    # max over the passband; cheby2 is maximally flat at the reference point
    if btype == "lowpass":
        wref = np.linspace(1e-6, math.pi * float(wn) / fs, 1024)
    elif btype == "highpass":
        wref = np.linspace(math.pi * float(wn) / fs, math.pi - 1e-6, 1024)
    elif btype == "bandpass":
        wref = np.linspace(math.pi * float(wn[0]) / fs, math.pi * float(wn[1]) / fs, 1024)
    else:
        wref = np.array([1e-6, math.pi - 1e-6])
    g = np.max(np.abs(sos_freq_response(sos, wref)))
    sos[0, :3] /= g
    return sos


# ------------------------------------------------------------------ comb ----

def comb_sos(fs: float, fundamental_freq: float = 60.0, num_harmonics: int = 3,
             q_factor: float = 35.0, filter_type: str = "notch",
             quality_scaling: str = "constant") -> np.ndarray:
    """Cascade of RBJ notch/peak biquads at the fundamental and harmonics
    (reference combfilter.py:51-162 semantics: constant Q widens bands with
    frequency; proportional Q keeps bandwidth constant)."""
    sections = []
    for h in range(1, num_harmonics + 1):
        f = fundamental_freq * h
        if f >= fs / 2:
            break
        q = q_factor * h if quality_scaling == "proportional" else q_factor
        w0 = 2 * math.pi * f / fs
        alpha = math.sin(w0) / (2 * q)
        c = math.cos(w0)
        if filter_type == "notch":
            b = np.array([1.0, -2 * c, 1.0]) / (1 + alpha)
            a = np.array([1.0, -2 * c / (1 + alpha), (1 - alpha) / (1 + alpha)])
        else:  # peak (bandpass with unit peak gain)
            b = np.array([alpha, 0.0, -alpha]) / (1 + alpha)
            a = np.array([1.0, -2 * c / (1 + alpha), (1 - alpha) / (1 + alpha)])
        sections.append(np.concatenate([b, a]))
    return np.asarray(sections)


# ------------------------------------------------------------- FIR design ----

def firwin(numtaps: int, cutoff, fs: float = 2.0, window: str = "hamming",
           pass_zero: bool = True) -> np.ndarray:
    """Window-method FIR design (reference firfilter.py:18-120 use cases):
    ideal sinc response × window, normalized to unit passband gain."""
    m = np.arange(numtaps) - (numtaps - 1) / 2.0
    if np.isscalar(cutoff):
        wc = float(cutoff) / (fs / 2.0)
        h = wc * np.sinc(wc * m)
        if not pass_zero:  # highpass
            delta = np.zeros(numtaps)
            delta[(numtaps - 1) // 2] = 1.0 if numtaps % 2 else 0.0
            h = delta - h
    else:
        lo, hi = (float(c) / (fs / 2.0) for c in cutoff)
        h = hi * np.sinc(hi * m) - lo * np.sinc(lo * m)  # bandpass
    from .spectrum import _WINDOW_FNS

    h = h * _WINDOW_FNS.get(window, np.hamming)(numtaps)
    # normalize: unity at DC (lowpass) / band center (bandpass) / Nyquist (hp)
    if np.isscalar(cutoff) and pass_zero:
        h /= h.sum()
    elif np.isscalar(cutoff):
        w = math.pi
        h /= abs(np.sum(h * np.exp(-1j * w * np.arange(numtaps))))
    else:
        w = math.pi * (lo + hi) / 2
        h /= abs(np.sum(h * np.exp(-1j * w * np.arange(numtaps))))
    return h


def kaiser_design(ripple_db: float, width_hz: float, fs: float) -> tuple[int, float]:
    """Kaiser window parameter estimation (kaiserord semantics, public
    formulas — reference kaiser.py:18-108): returns (numtaps, beta)."""
    a = abs(ripple_db)
    if a > 50:
        beta = 0.1102 * (a - 8.7)
    elif a > 21:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21)
    else:
        beta = 0.0
    dw = 2 * math.pi * width_hz / fs
    numtaps = int(math.ceil((a - 7.95) / (2.285 * dw))) + 1
    return numtaps | 1, beta  # odd taps → type-I linear phase


def kaiser_firwin(cutoff_hz: float, ripple_db: float, width_hz: float, fs: float) -> np.ndarray:
    numtaps, beta = kaiser_design(ripple_db, width_hz, fs)
    m = np.arange(numtaps) - (numtaps - 1) / 2.0
    wc = cutoff_hz / (fs / 2.0)
    h = wc * np.sinc(wc * m) * np.kaiser(numtaps, beta)
    return h / h.sum()


def fir_hilbert(numtaps: int, window: str = "hamming") -> np.ndarray:
    """Type-III FIR Hilbert transformer (reference fir_hilbert.py:22-335):
    h[n] = 2/(πn) for odd n, 0 otherwise, windowed; numtaps must be odd."""
    if numtaps % 2 == 0:
        raise ValueError("type-III Hilbert needs odd numtaps")
    m = np.arange(numtaps) - (numtaps - 1) // 2
    h = np.where(m % 2 != 0, 2.0 / (math.pi * np.where(m == 0, 1, m)), 0.0)
    h[(numtaps - 1) // 2] = 0.0
    from .spectrum import _WINDOW_FNS

    return h * _WINDOW_FNS.get(window, np.hamming)(numtaps)


# ------------------------------------------------------------ zero phase ----

def sosfiltfilt_np(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Forward-backward zero-phase filtering with odd-reflection padding
    (reference butterworthzerophase.py:1-40 analytic-pad semantics)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return x
    padlen = min(3 * 2 * sos.shape[0], n - 1)
    if padlen > 0:
        pre = 2 * x[0] - x[padlen:0:-1]
        post = 2 * x[-1] - x[-2 : -padlen - 2 : -1]
        ext = np.concatenate([pre, x, post])
    else:
        ext = x
    zi = sosfilt_zi(sos)
    y = sosfilt(sos, ext, zi * ext[0])
    y = sosfilt(sos, y[::-1], zi * y[-1])[::-1]
    return y[padlen : padlen + n] if padlen > 0 else y


# ------------------------------------------------------------ filterbank ----

def filterbank_np(x: np.ndarray, kernels: dict[str, np.ndarray],
                  mode: str = "causal") -> dict[str, np.ndarray]:
    """Parallel FIR kernels (reference filterbank.py:26-302, conv mode):
    one output per labeled kernel."""
    from .filters import fir_filter_np

    return {label: fir_filter_np(x, taps, mode) for label, taps in kernels.items()}


# -------------------------------------------------------- adaptive notch ----

def lms_mains_canceller(x: np.ndarray, f0: float, fs: float, lr: float = 0.01) -> np.ndarray:
    """LMS mains canceller (reference adaptive_lnc.py semantics, simplified):
    adaptively fit amplitude/phase of a sinusoid at f0 and subtract it —
    ``y = x − (w_c·cos + w_s·sin)``, weights driven by the residual."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    t = np.arange(n) / fs
    c = np.cos(2 * math.pi * f0 * t)
    s = np.sin(2 * math.pi * f0 * t)
    y = np.empty(n)
    wc = ws = 0.0
    for i in range(n):
        est = wc * c[i] + ws * s[i]
        y[i] = x[i] - est
        wc += 2 * lr * y[i] * c[i]
        ws += 2 * lr * y[i] * s[i]
    return y


def adaptive_lattice_notch(x: np.ndarray, f0_init: float, fs: float,
                           mu: float = 1e-3, r: float = 0.95):
    """Frequency-tracking adaptive notch (reference
    adaptive_lattice_notch.py:12-55, simplified Regalia-style ANF): a
    constrained biquad notch whose center frequency parameter ``a = -2cos(w0)``
    is adapted by gradient descent on the notch output power. Returns
    (filtered, tracked_freq_hz)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    a = -2 * math.cos(2 * math.pi * f0_init / fs)
    y = np.empty(n)
    freqs = np.empty(n)
    s1 = s2 = 0.0
    for i in range(n):
        # notch: H(z) = (1 + a z^-1 + z^-2) / (1 + r a z^-1 + r^2 z^-2)
        s0 = x[i] - r * a * s1 - r * r * s2
        y[i] = s0 + a * s1 + s2
        # gradient of y^2 wrt a ≈ 2 y s1 (ignoring recursive term)
        a -= mu * y[i] * s1
        a = max(min(a, 2.0), -2.0)
        s2, s1 = s1, s0
        freqs[i] = math.acos(max(min(-a / 2, 1.0), -1.0)) * fs / (2 * math.pi)
    return y, freqs
