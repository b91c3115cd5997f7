"""Extended filter family tests: Chebyshev, comb, FIR designs, Hilbert,
zero-phase, filterbank, adaptive notch (reference SURVEY §2.3 long tail)."""

import math

import numpy as np
import pytest

from ezmsg_sigproc_spark.operators.filters import (
    butter_sos,
    fir_filter_np,
    sos_freq_response,
)
from ezmsg_sigproc_spark.operators.filters2 import (
    adaptive_lattice_notch,
    cheby_sos,
    comb_sos,
    filterbank_np,
    fir_hilbert,
    firwin,
    kaiser_firwin,
    lms_mains_canceller,
    sosfiltfilt_np,
)


def _gain(sos, w):
    return abs(sos_freq_response(sos, np.array([w]))[0])


def test_cheby1_ripple_bounded_and_steep():
    sos = cheby_sos(4, 1.0, 0.2, "lowpass", fs=2.0, cheby_type="cheby1")
    w = np.linspace(1e-4, math.pi * 0.2 * 0.98, 200)
    pb = np.abs(sos_freq_response(sos, w))
    assert pb.max() <= 1.0 + 1e-5  # max anchored on a finite grid
    assert pb.min() >= 10 ** (-1.05 / 20)  # ripple ≤ 1 dB
    assert _gain(sos, 0.5 * math.pi) < 0.01


def test_cheby2_stopband_attenuation():
    sos = cheby_sos(4, 40.0, 0.2, "lowpass", fs=2.0, cheby_type="cheby2")
    w = np.linspace(math.pi * 0.2, math.pi - 1e-4, 300)
    sb = np.abs(sos_freq_response(sos, w))
    assert sb.max() <= 10 ** (-39.5 / 20)
    assert _gain(sos, 1e-6) == pytest.approx(1.0, abs=1e-6)


def test_comb_notch_kills_harmonics_only():
    sos = comb_sos(1000.0, 60.0, 3, q_factor=35.0, filter_type="notch")
    for f in (60, 120, 180):
        assert _gain(sos, 2 * math.pi * f / 1000) < 1e-3
    assert _gain(sos, 2 * math.pi * 90 / 1000) > 0.99


def test_comb_peak_section_semantics():
    """The reference cascades iirpeak sections (combfilter.py:83-93) — a
    single section has unit gain at its harmonic and rejects elsewhere; a
    cascade multiplies sections (each harmonic is attenuated by the *other*
    sections' peaks, exactly as in the reference)."""
    one = comb_sos(1000.0, 60.0, 1, q_factor=35.0, filter_type="peak")
    assert _gain(one, 2 * math.pi * 60 / 1000) == pytest.approx(1.0, abs=1e-6)
    assert _gain(one, 2 * math.pi * 90 / 1000) < 0.05
    two = comb_sos(1000.0, 60.0, 2, q_factor=35.0, filter_type="peak")
    assert _gain(two, 2 * math.pi * 90 / 1000) < _gain(one, 2 * math.pi * 90 / 1000)


def test_firwin_lowpass_response():
    h = firwin(41, 100.0, fs=1000.0)
    assert h.sum() == pytest.approx(1.0)
    np.testing.assert_allclose(h, h[::-1])  # linear phase
    hf = abs(np.sum(h * np.exp(-1j * math.pi * 0.9 * np.arange(41))))
    assert hf < 0.01


def test_kaiser_design_meets_spec():
    h = kaiser_firwin(100.0, 60.0, 20.0, 1000.0)
    assert h.sum() == pytest.approx(1.0)
    # stopband (cutoff + width) attenuation ≥ ~55 dB for a 60 dB design
    w = 2 * math.pi * 115 / 1000
    hf = abs(np.sum(h * np.exp(-1j * w * np.arange(len(h)))))
    assert hf < 10 ** (-50 / 20)


def test_hilbert_envelope_flat_for_tone():
    taps = fir_hilbert(63)
    t = np.arange(3000) / 1000.0
    x = np.sin(2 * np.pi * 50 * t)
    xh = fir_filter_np(x, taps, mode="same")
    env = np.sqrt(x**2 + xh**2)[200:-200]
    assert env.mean() == pytest.approx(1.0, abs=1e-2)
    assert env.std() < 1e-2


def test_sosfiltfilt_zero_phase_no_delay():
    sos = butter_sos(4, 0.1, "lowpass", fs=2.0)
    t = np.arange(2000)
    x = np.sin(2 * np.pi * 0.01 * t)
    y = sosfiltfilt_np(sos, x)
    lagged_corr = [np.dot(np.roll(y, d)[50:-50], x[50:-50]) for d in (-3, 0, 3)]
    assert np.argmax(lagged_corr) == 1  # peak correlation at zero lag
    np.testing.assert_allclose(sosfiltfilt_np(sos, np.full(100, 2.5)), 2.5, rtol=1e-9)


def test_filterbank_labels_and_partition_of_energy():
    t = np.arange(4096) / 1000.0
    x = np.sin(2 * np.pi * 10 * t) + np.sin(2 * np.pi * 200 * t)
    kernels = {"low": firwin(41, 50.0, fs=1000.0), "high": firwin(41, 100.0, fs=1000.0, pass_zero=False)}
    out = filterbank_np(x, kernels, mode="same")
    assert set(out) == {"low", "high"}
    core = slice(100, -100)
    lo_power = np.mean(out["low"][core] ** 2)
    hi_power = np.mean(out["high"][core] ** 2)
    assert lo_power == pytest.approx(0.5, rel=0.05)  # the 10 Hz tone
    assert hi_power == pytest.approx(0.5, rel=0.05)  # the 200 Hz tone


def test_lms_cancels_tone_preserves_signal():
    t = np.arange(4000) / 1000.0
    sig = np.sin(2 * np.pi * 5 * t)
    mains = 2 * np.sin(2 * np.pi * 50 * t + 0.7)
    y = lms_mains_canceller(sig + mains, 50.0, 1000.0, lr=0.02)
    tail = slice(2000, None)
    resid = np.dot(y[tail], np.sin(2 * np.pi * 50 * t + 0.7)[tail]) * 2 / 2000
    kept = np.dot(y[tail], sig[tail]) * 2 / 2000
    assert abs(resid) < 0.02
    assert kept == pytest.approx(1.0, abs=0.05)


def test_adaptive_lattice_notch_tracks_frequency():
    t = np.arange(3000)
    tone = np.sin(2 * np.pi * 0.12 * t)
    y, freqs = adaptive_lattice_notch(tone, f0_init=0.1, fs=1.0, mu=2e-3)
    assert freqs[-1] == pytest.approx(0.12, abs=1e-3)
    assert np.sqrt(np.mean(y[2000:] ** 2)) < 0.05


def test_remez_equiripple_and_beats_window_method():
    from ezmsg_sigproc_spark.operators.remez import remez

    h = remez(41, [(0.0, 0.1), (0.15, 0.5)], [1.0, 0.0], fs=1.0)
    w = np.linspace(1e-4, math.pi, 2000)
    H = np.abs([np.sum(h * np.exp(-1j * om * np.arange(len(h)))) for om in w])
    pb_dev = max(abs(H[w <= 2 * math.pi * 0.1] - 1).max(), 0)
    sb_dev = H[w >= 2 * math.pi * 0.15].max()
    # alternation theorem: equal ripple in both bands (weights 1:1)
    assert pb_dev == pytest.approx(sb_dev, rel=0.02)
    # strictly better than the window method at equal taps
    h2 = firwin(41, 0.125, fs=1.0)
    H2 = np.abs([np.sum(h2 * np.exp(-1j * om * np.arange(41))) for om in w])
    assert sb_dev < 0.3 * H2[w >= 2 * math.pi * 0.15].max()


def test_remez_weighted_stopband():
    from ezmsg_sigproc_spark.operators.remez import remez

    h = remez(41, [(0.0, 0.1), (0.15, 0.5)], [1.0, 0.0], weights=[1.0, 10.0], fs=1.0)
    w = np.linspace(1e-4, math.pi, 2000)
    H = np.abs([np.sum(h * np.exp(-1j * om * np.arange(len(h)))) for om in w])
    pb_dev = abs(H[w <= 2 * math.pi * 0.1] - 1).max()
    sb_dev = H[w >= 2 * math.pi * 0.15].max()
    # 10x stopband weight → stopband ripple ~10x smaller than passband
    assert pb_dev / sb_dev == pytest.approx(10.0, rel=0.1)


def test_remez_bandpass():
    from ezmsg_sigproc_spark.operators.remez import remez

    h = remez(61, [(0.0, 0.08), (0.13, 0.27), (0.32, 0.5)], [0.0, 1.0, 0.0], fs=1.0)
    w = np.linspace(1e-4, math.pi, 2000)
    H = np.abs([np.sum(h * np.exp(-1j * om * np.arange(len(h)))) for om in w])
    band = (w >= 2 * math.pi * 0.13) & (w <= 2 * math.pi * 0.27)
    stop = (w <= 2 * math.pi * 0.08) | (w >= 2 * math.pi * 0.32)
    assert abs(H[band] - 1).max() < 0.05
    assert H[stop].max() < 0.05
