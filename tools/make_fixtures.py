"""Generate ``ezmsg_sigproc_spark/fixtures_inline.py`` — expected values for
the driver-oracle suites whose kernels are not SQL-expressible (IIR cascades,
adaptive filters, FFT, wavelets, FBCCA).

Method (VERDICT r1 item 5): compute the expected outputs OUTSIDE Spark — pure
numpy over pandas series read straight from the testdata parquet — and embed
them in the oracle SQL as a VALUES table. The driver then value-checks
``spark ≡ numpy`` through DuckDB exactly like any other oracle.

Independence level (documented per family):
 - IIR variants use ``_sosfilt_loop`` — the per-sample DF2T reference loop,
   a fully independent implementation from the production prefix-scan kernel.
 - FIR / adaptive / spectral / wavelet / FBCCA variants reuse the same pure
   numpy helper functions the Spark kernels call; the fixture therefore pins
   the DISTRIBUTION plumbing (grouping, ordering, windowing, column mapping),
   while kernel-level fidelity for those families is pinned by the pytest
   golden/property suites.

Each fixture row carries ``events_n`` — the row count of the events table it
was computed from — so one oracle string serves every scale factor: the SQL
filters ``WHERE events_n = (SELECT count(*) FROM events)``.

Run:  python tools/make_fixtures.py   (rewrites fixtures_inline.py; commit it)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ezmsg_sigproc_spark.operators.fbcca import fbcca_scores_np  # noqa: E402
from ezmsg_sigproc_spark.operators.filters import (  # noqa: E402
    _sosfilt_loop,
    butter_sos,
    fir_filter_np,
    sosfilt_zi,
)
from ezmsg_sigproc_spark.operators.filters2 import (  # noqa: E402
    adaptive_lattice_notch,
    cheby_sos,
    comb_sos,
    fir_hilbert,
    firwin,
    lms_mains_canceller,
)
from ezmsg_sigproc_spark.functions.hashing import series_vhash  # noqa: E402
from ezmsg_sigproc_spark.operators.filters2 import kaiser_firwin  # noqa: E402
from ezmsg_sigproc_spark.operators.spectrum import _morlet_kernel  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ezmsg_sigproc_spark", "fixtures_inline.py")


def _filtfilt_loop(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """sosfiltfilt semantics (odd-reflection pad, x0-scaled zi) but built on
    the independent per-sample loop."""
    n = x.size
    padlen = min(3 * 2 * sos.shape[0], n - 1)
    if padlen > 0:
        pre = 2 * x[0] - x[padlen:0:-1]
        post = 2 * x[-1] - x[-2 : -padlen - 2 : -1]
        ext = np.concatenate([pre, x, post])
    else:
        ext = x
    zi = sosfilt_zi(sos)
    y = _sosfilt_loop(sos, ext, zi * ext[0])
    y = _sosfilt_loop(sos, y[::-1], zi * y[-1])[::-1]
    return y[padlen : padlen + n] if padlen > 0 else y


def _aggs(y: np.ndarray):
    """Order-sensitive summary of a filtered series: n, mean, last value,
    index-weighted mean (catches permutation errors a plain mean cannot)."""
    n = int(y.size)
    w = np.arange(1, n + 1, dtype=np.float64)
    return n, float(y.mean()), float(y[-1]), float((y * w).sum() / w.sum())


def load_events(sf_dir: str):
    df = duckdb.sql(
        f"SELECT user_id, epoch(ts) AS ts, value "
        f"FROM read_parquet('{sf_dir}/events.parquet') ORDER BY user_id, ts"
    ).df()
    return df


def iir_rows(df, events_n):
    sos_butter = butter_sos(4, 0.05, "lowpass", fs=1.0)
    sos_cheby = cheby_sos(4, 1.0, 0.05, "lowpass", fs=1.0, cheby_type="cheby1")
    sos_comb = comb_sos(1.0, fundamental_freq=0.1, num_harmonics=3, q_factor=10.0)
    sos_dec = cheby_sos(8, 0.05, 0.4 * 0.25, "lowpass", fs=1.0, cheby_type="cheby1")
    rows = []
    for uid, g in df.groupby("user_id", sort=True):
        x = g["value"].to_numpy(np.float64)
        variants = {
            "butter_lp4": _sosfilt_loop(sos_butter, x, sosfilt_zi(sos_butter) * x[0]),
            "cheby1_lp4": _sosfilt_loop(sos_cheby, x, sosfilt_zi(sos_cheby) * x[0]),
            "comb_notch": _sosfilt_loop(sos_comb, x, sosfilt_zi(sos_comb) * x[0]),
            "butter_zerophase": _filtfilt_loop(sos_butter, x),
            "decimate_q4": _sosfilt_loop(sos_dec, x, sosfilt_zi(sos_dec) * x[0])[::4],
        }
        for name, y in variants.items():
            n, mean, last, wmean = _aggs(y)
            # decimals=2 for the cross-implementation hash — see the margin
            # note in entry_suites.iir_filters_suite
            rows.append((name, int(uid), events_n, n, mean, last, wmean,
                         series_vhash(y, decimals=2)))
    return rows


def fir_rows(df, events_n):
    hil = fir_hilbert(31)
    fb = {
        "low": firwin(17, 0.05, fs=1.0),
        "mid": firwin(17, (0.05, 0.15), fs=1.0),
        "high": firwin(17, 0.15, fs=1.0, pass_zero=False),
    }
    kai = kaiser_firwin(0.05, ripple_db=60.0, width_hz=0.02, fs=1.0)
    rows = []
    for uid, g in df.groupby("user_id", sort=True):
        x = g["value"].to_numpy(np.float64)
        n = x.size
        env = np.sqrt(x * x + fir_filter_np(x, hil, "same") ** 2)
        _, mean, last, wmean = _aggs(env)
        eh = series_vhash(env)
        rows += [
            ("hilbert_envelope", int(uid), events_n, "mean", mean, eh),
            ("hilbert_envelope", int(uid), events_n, "last", last, eh),
            ("hilbert_envelope", int(uid), events_n, "wmean", wmean, eh),
        ]
        for band, taps in fb.items():
            y = fir_filter_np(x, taps, "same")
            rows.append(("filterbank", int(uid), events_n, band,
                         float(np.mean(np.abs(y))), series_vhash(y)))
        yk = fir_filter_np(x, kai, "same")
        rows.append(("kaiser_lp", int(uid), events_n, "mean_abs",
                     float(np.mean(np.abs(yk))), series_vhash(yk)))
        t = np.arange(n)
        tone = 25.0 * np.sin(2 * np.pi * 0.1 * t)
        y = lms_mains_canceller(x + tone, f0=0.1, fs=1.0, lr=0.05)
        rows.append(("lms_canceller", int(uid), events_n, "residual_tone_power",
                     float(np.mean((y - x)[n // 2:] ** 2)), series_vhash(y)))
        tone2 = np.sin(2 * np.pi * 0.15 * t)
        _, freqs = adaptive_lattice_notch(tone2, f0_init=0.1, fs=1.0, mu=2e-3)
        rows.append(("lattice_notch", int(uid), events_n, "tracked_freq",
                     float(freqs[-1]), series_vhash(freqs)))
    return rows


def spectral_rows(df, events_n):
    rows = []
    # spectrum_power_64: users < 20, hamming, rfft power, mean over windows
    taps64 = np.hamming(64)
    for uid, g in df[df.user_id < 20].groupby("user_id", sort=True):
        x = g["value"].to_numpy(np.float64)
        nwin = x.size // 64
        if nwin == 0:
            continue
        mat = x[: nwin * 64].reshape(nwin, 64)
        p = np.abs(np.fft.rfft(mat * taps64[None, :], axis=1)) ** 2
        mean_p = p.mean(axis=0)
        for fi in range(mean_p.size):
            rows.append(("spectrum_power_64", int(uid), events_n, fi, 0, float(mean_p[fi])))
            # j=1: positional checksum of the full per-window power series
            # (decimals=0, folded mod 2^31 on both sides so the double-typed
            # v column carries it exactly at any scale factor)
            rows.append(("spectrum_power_64", int(uid), events_n, fi, 1,
                         float(series_vhash(p[:, fi], decimals=0, mod=2**31))))
    # spectrogram win 32 (users < 10): i = win_id*32, j = freq_idx
    taps32 = np.hamming(32)
    freqs32 = np.fft.rfftfreq(32, d=1.0)
    bands = [(0.0, 0.1), (0.1, 0.3), (0.3, 0.5)]
    for uid, g in df[df.user_id < 10].groupby("user_id", sort=True):
        x = g["value"].to_numpy(np.float64)
        nwin = x.size // 32
        if nwin == 0:
            continue
        mat = x[: nwin * 32].reshape(nwin, 32)
        p = np.abs(np.fft.rfft(mat * taps32[None, :], axis=1)) ** 2
        for wi in range(nwin):
            for fi in range(p.shape[1]):
                rows.append(("spectrogram32", int(uid), events_n, wi * 32, fi, float(p[wi, fi])))
        # band_power: first matching band, inclusive bounds (ranged_aggregate)
        band_of = np.full(freqs32.size, -1)
        for bi, (lo, hi) in enumerate(bands):
            for fi, f in enumerate(freqs32):
                if band_of[fi] < 0 and lo <= f <= hi:
                    band_of[fi] = bi
        for wi in range(nwin):
            for bi in range(len(bands)):
                sel = p[wi, band_of == bi]
                if sel.size:
                    rows.append(("band_power", int(uid), events_n, wi, bi, float(sel.mean())))
    return rows


def _ricker(points: int, a: float) -> np.ndarray:
    vec = np.arange(0, points) - (points - 1.0) / 2
    amp = 2 / (np.sqrt(3 * a) * np.pi**0.25)
    return amp * (1 - (vec / a) ** 2) * np.exp(-0.5 * (vec / a) ** 2)


def cwt_rows(df, events_n):
    rows = []
    scales = [2.0, 4.0, 8.0]
    kernels = {f"a{a:g}": _ricker(int(10 * a), a) for a in scales}
    for uid, g in df[df.user_id < 20].groupby("user_id", sort=True):
        x = g["value"].to_numpy(np.float64)
        for k, taps in kernels.items():
            y = np.abs(fir_filter_np(x, taps, "same"))
            rows.append(("cwt_ricker", int(uid), events_n, k, float(y.mean()),
                         series_vhash(y)))
    morlets = {f"f{f:g}": _morlet_kernel(f, 1.0) for f in (0.05, 0.1, 0.2)}
    for uid, g in df[df.user_id < 10].groupby("user_id", sort=True):
        x = g["value"].to_numpy(np.float64)
        for k, psi in morlets.items():
            pad = len(psi) // 2
            xp = np.concatenate([np.full(pad, x[0]), x, np.full(pad, x[-1])])
            coef = np.abs(np.convolve(xp, psi, mode="valid"))[: x.size]
            rows.append(("cwt_morlet", int(uid), events_n, k, float(coef.mean()),
                         series_vhash(coef)))
    return rows


def fbcca_rows(df, events_n):
    rows = []
    freqs = [0.05, 0.1, 0.2]
    for uid, g in df[df.user_id < 10].groupby("user_id", sort=True):
        x = g["value"].to_numpy(np.float64)
        gidx = np.arange(x.size, dtype=np.float64)
        v = x / 100.0 + 3.0 * np.sin(2 * np.pi * 0.1 * gidx)
        nwin = v.size // 64
        for wi in range(nwin):
            w = v[wi * 64 : (wi + 1) * 64][:, None]
            scores = fbcca_scores_np(w, 1.0, freqs, harmonics=2, softmax_beta=0.0)
            for f, s in zip(freqs, scores):
                rows.append((int(uid), events_n, wi, float(f), float(s)))
    return rows


def env_stamp() -> dict:
    """numpy + LAPACK identifiers of the generating environment."""
    lapack = "unknown"
    try:
        cfg = np.show_config(mode="dicts")
        dep = cfg.get("Build Dependencies", {}).get("lapack", {})
        lapack = f"{dep.get('name', '?')} {dep.get('version', '?')}"
    except Exception:
        pass
    return {"numpy": np.__version__, "lapack": lapack}


def main():
    fixtures = {
        "iir_filters_suite": {
            "cols": ["variant", "user_id", "events_n", "n", "mean_y", "last_y",
                     "wmean_y", "vhash"],
            "rows": [],
        },
        "fir_adaptive_suite": {
            "cols": ["variant", "user_id", "events_n", "k", "v", "vhash"],
            "rows": [],
        },
        "spectral_suite": {
            "cols": ["variant", "user_id", "events_n", "i", "j", "v"],
            "rows": [],
        },
        "cwt_suite": {
            "cols": ["variant", "user_id", "events_n", "k", "v", "vhash"],
            "rows": [],
        },
        "fbcca_frequency_scores": {
            "cols": ["user_id", "events_n", "win_id", "target_freq", "score"],
            "rows": [],
        },
    }
    for sf_dir in SF_DIRS:
        df = load_events(sf_dir)
        events_n = len(df)
        print(f"{sf_dir}: {events_n} events")
        fixtures["iir_filters_suite"]["rows"] += iir_rows(df, events_n)
        fixtures["fir_adaptive_suite"]["rows"] += fir_rows(df, events_n)
        fixtures["spectral_suite"]["rows"] += spectral_rows(df, events_n)
        fixtures["cwt_suite"]["rows"] += cwt_rows(df, events_n)
        fixtures["fbcca_frequency_scores"]["rows"] += fbcca_rows(df, events_n)

    with open(OUT, "w") as f:
        f.write('"""GENERATED by tools/make_fixtures.py — do not edit by hand.\n\n')
        f.write("Expected values (pure numpy, computed outside Spark) for the\n")
        f.write("non-SQL-expressible oracle suites; see tools/make_fixtures.py\n")
        f.write('for method and independence notes."""\n\n')
        f.write("# Environment the fixture values were generated under. Linear-algebra\n")
        f.write("# kernels (QR/SVD) can differ across LAPACK builds on ill-conditioned\n")
        f.write("# input; tools/verify_entry.py warns when the current env differs so a\n")
        f.write("# future environment change surfaces as a warning, not a red driver row\n")
        f.write("# (VERDICT r5 item 8 — the fbcca fixture broke exactly this way).\n")
        f.write(f"ENV = {env_stamp()!r}\n\n")
        f.write("FIXTURES = {\n")
        for name, fx in fixtures.items():
            f.write(f"    {name!r}: {{\n")
            f.write(f"        \"cols\": {fx['cols']!r},\n")
            f.write("        \"rows\": [\n")
            for r in fx["rows"]:
                f.write(f"            {tuple(r)!r},\n")
            f.write("        ],\n    },\n")
        f.write("}\n")
    total = sum(len(fx["rows"]) for fx in fixtures.values())
    print(f"wrote {OUT}: {total} rows")


if __name__ == "__main__":
    main()
