"""Combined (suite) registry queries.

The driver's correctness sweep covers at most 50 registered queries, so the
per-operator queries that share an input and a check style are exposed through
combined suites: each suite unions its member operators' results under a
``variant`` tag, and its oracle unions the members' SQL (or an inline numpy
fixture — see tools/make_fixtures.py) the same way. Every member operator
stays individually callable through ``entry_queries.RAW_QUERIES`` for bench
and tests; COVERAGE.md maps reference operators → suite variants.

Check styles here:
 - SQL-union suites (quantize/text/select/math): exact DuckDB twins, merged.
 - Fixture suites (IIR/FIR-adaptive/spectral/CWT/FBCCA): expected values
   precomputed outside Spark by tools/make_fixtures.py and inlined as a SQL
   VALUES table, keyed by the events-table row count so one oracle string
   serves every scale factor.
 - Bound suites (ANN recall, Gorilla): the SQL-checkable invariant (row
   counts, recall ≥ bound, roundtrip flags) — the honest residue of kernels
   whose full outputs have no engine-independent twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from . import entry_queries as EQ
from .entry_queries import RAW_ORACLES, RAW_QUERIES, _events, _r6, q
from .fixtures_inline import FIXTURES

# ------------------------------------------------------------ SQL helpers ----


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def fixture_oracle(name: str, out_cols, round6=(), round4=(), bigint=(), double=()) -> str:
    """Inline-VALUES oracle over the numpy fixture; sf-selected by events count."""
    fx = FIXTURES[name]
    vals = ",\n".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in fx["rows"])
    sel = []
    for c in out_cols:
        expr = c
        if c in bigint:
            expr = f"CAST({c} AS BIGINT)"
        elif c in double:
            expr = f"CAST({c} AS DOUBLE)"
        if c in round6:
            expr = f"round(CAST({expr} AS DOUBLE), 6)"
        elif c in round4:
            expr = f"round(CAST({expr} AS DOUBLE), 4)"
        sel.append(f"{expr} AS {c}")
    return (
        f"SELECT {', '.join(sel)}\n"
        f"FROM (VALUES {vals}) AS fx({', '.join(fx['cols'])})\n"
        f"WHERE events_n = (SELECT count(*) FROM events)"
    )


# ============================================================= IIR suite ====

_IIR_SCHEMA = ("variant string, user_id bigint, n bigint, mean_y double, "
               "last_y double, wmean_y double, vhash bigint")


def _series_aggs(y: np.ndarray):
    n = int(y.size)
    w = np.arange(1, n + 1, dtype=np.float64)
    return n, float(y.mean()), float(y[-1]), float((y * w).sum() / w.sum())


@q(
    "iir_filters_suite",
    fixture_oracle(
        "iir_filters_suite",
        ["variant", "user_id", "n", "mean_y", "last_y", "wmean_y", "vhash"],
        round6=("mean_y", "last_y", "wmean_y"),
        bigint=("user_id", "n", "vhash"),
    ),
)
def iir_filters_suite(spark, sf_dir):
    """All IIR kernel variants, value-checked against the independent
    per-sample-loop numpy fixture: Butterworth LP4
    (butterworthfilter.py:115-159), Chebyshev-I LP4 (cheby.py:18-127), comb
    notch (combfilter.py:19-60), zero-phase Butterworth
    (butterworthzerophase.py:1-40), and Decimate's cheby8 anti-alias chain
    (decimate.py:14-70). Per (variant, user): n, mean, last, index-weighted
    mean PLUS ``vhash`` — the positional checksum of the FULL rounded output
    vector (functions/hashing.py), so the driver row has per-sample strength.

    Execution shape (VERDICT r2 item 5): one ``map_key_batches`` lift pivots
    each Arrow batch into a (time × users) matrix; the four causal variants
    run as single ``sosfilt_mat`` calls over ALL the batch's users at once
    (the matrix-batched path that took butterworth_lowpass 5.2 s → 1.0 s);
    only the non-causal zero-phase variant walks columns (tail padding would
    contaminate its backward pass). The pivot is bounded by the same
    ``_PIVOT_CAP_CELLS`` length-sorted bucketing as
    ``serieslift.apply_matrix_kernel`` — key-length skew cannot blow up the
    (max_len × n_keys) allocation."""
    from .functions.hashing import matrix_vhash
    from .operators.filters import butter_sos, sosfilt_mat, sosfilt_zi
    from .operators.filters2 import cheby_sos, comb_sos, sosfiltfilt_np
    from .operators.serieslift import (
        _PIVOT_CAP_CELLS,
        key_change_mask,
        map_key_batches,
    )

    sos_butter = butter_sos(4, 0.05, "lowpass", fs=1.0)
    sos_cheby = cheby_sos(4, 1.0, 0.05, "lowpass", fs=1.0, cheby_type="cheby1")
    sos_comb = comb_sos(1.0, fundamental_freq=0.1, num_harmonics=3, q_factor=10.0)
    sos_dec = cheby_sos(8, 0.05, 0.4 * 0.25, "lowpass", fs=1.0, cheby_type="cheby1")
    causal = {"butter_lp4": sos_butter, "cheby1_lp4": sos_cheby,
              "comb_notch": sos_comb, "decimate_q4": sos_dec}

    def run_matrix(X: np.ndarray, lengths: np.ndarray, uids: np.ndarray) -> list:
        K = X.shape[1]
        kidx = np.arange(K)

        def summarize(name: str, Y: np.ndarray, L: np.ndarray) -> pd.DataFrame:
            rowpos = np.arange(Y.shape[0])[:, None]
            Ym = np.where(rowpos < L[None, :], Y, 0.0)
            mean = Ym.sum(axis=0) / L
            last = Y[L - 1, kidx]
            wmean = (Ym * (rowpos + 1)).sum(axis=0) / (L * (L + 1) / 2.0)
            # decimals=2: the fixture's per-sample LOOP and this prefix-scan
            # implementation agree to ~2e-12 absolute (measured on sf0.01);
            # a 1e-2 rounding grid leaves ~9 orders of tie margin while still
            # flipping the hash for any real error ≥ 0.005 at ANY sample
            return pd.DataFrame({
                "variant": name, "user_id": uids, "n": L, "mean_y": mean,
                "last_y": last, "wmean_y": wmean,
                "vhash": matrix_vhash(Y, L, decimals=2),
            })

        frames = []
        for name, sos in causal.items():
            zi = sosfilt_zi(sos)[:, :, None] * X[0][None, None, :]
            Y = sosfilt_mat(sos, X, zi)
            if name == "decimate_q4":
                frames.append(summarize(name, Y[::4], (lengths + 3) // 4))
            else:
                frames.append(summarize(name, Y, lengths))
        Yz = np.zeros_like(X)
        for k in range(K):
            Yz[: lengths[k], k] = sosfiltfilt_np(sos_butter, X[: lengths[k], k])
        frames.append(summarize("butter_zerophase", Yz, lengths))
        return frames

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        change = key_change_mask(pdf[["user_id"]])
        starts = np.flatnonzero(change)
        codes = np.cumsum(change) - 1
        lengths = np.diff(np.append(starts, len(pdf)))
        pos = np.arange(len(pdf)) - np.repeat(starts, lengths)
        vals = pdf["value"].to_numpy(np.float64)
        all_uids = pdf["user_id"].to_numpy()[starts]
        n_keys = len(starts)
        frames = []
        # BOUNDED pivot (same cap + length-sorted bucketing as
        # serieslift.apply_matrix_kernel): a skewed batch — one carried long
        # key among thousands of short ones — would otherwise allocate an
        # unbounded (max_len × n_keys) matrix
        if int(lengths.max()) * n_keys <= _PIVOT_CAP_CELLS:
            buckets = [np.arange(n_keys)]
        else:
            order = np.argsort(-lengths, kind="stable")
            buckets = []
            i = 0
            while i < n_keys:
                width = max(int(_PIVOT_CAP_CELLS // max(int(lengths[order[i]]), 1)), 1)
                buckets.append(np.sort(order[i : i + width]))
                i += width
        for kids in buckets:
            lb = lengths[kids]
            Xb = np.zeros((int(lb.max()), kids.size))
            local = np.full(n_keys, -1, dtype=np.int64)
            local[kids] = np.arange(kids.size)
            rmask = local[codes] >= 0
            Xb[pos[rmask], local[codes[rmask]]] = vals[rmask]
            frames += run_matrix(Xb, lb, all_uids[kids])
        return pd.concat(frames, ignore_index=True)

    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = map_key_batches(ev, run, ["user_id"], "ts", _IIR_SCHEMA)
    return out.select("variant", "user_id", "n", _r6(F.col("mean_y")).alias("mean_y"),
                      _r6(F.col("last_y")).alias("last_y"),
                      _r6(F.col("wmean_y")).alias("wmean_y"), "vhash")


# ==================================================== FIR/adaptive suite ====

@q(
    "fir_adaptive_suite",
    fixture_oracle(
        "fir_adaptive_suite",
        ["variant", "user_id", "k", "v", "vhash"],
        round6=("v",),
        bigint=("user_id", "vhash"),
    ),
)
def fir_adaptive_suite(spark, sf_dir):
    """FIR Hilbert envelope (fir_hilbert.py:22-335), labeled filterbank
    (filterbank.py:26-302), Kaiser-designed lowpass (kaiser.py:18-108 —
    kaiserord window estimation → windowed-sinc taps), LMS mains canceller
    (adaptive_lnc.py) and the frequency-tracking lattice notch
    (adaptive_lattice_notch.py:12-55) in one shuffle; values pinned by the
    numpy fixture, with ``vhash`` carrying the positional checksum of each
    variant's FULL output series (functions/hashing.py)."""
    from .functions.hashing import series_vhash
    from .operators.filters import fir_filter_np
    from .operators.filters2 import (
        adaptive_lattice_notch,
        fir_hilbert,
        firwin,
        kaiser_firwin,
        lms_mains_canceller,
    )
    from .operators.serieslift import group_apply_sorted

    hil = fir_hilbert(31)
    fb = {
        "low": firwin(17, 0.05, fs=1.0),
        "mid": firwin(17, (0.05, 0.15), fs=1.0),
        "high": firwin(17, 0.15, fs=1.0, pass_zero=False),
    }
    kai = kaiser_firwin(0.05, ripple_db=60.0, width_hz=0.02, fs=1.0)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["value"].to_numpy(np.float64)
        uid = pdf["user_id"].iloc[0]
        n = x.size
        rows = []
        env = np.sqrt(x * x + fir_filter_np(x, hil, "same") ** 2)
        _, mean, last, wmean = _series_aggs(env)
        eh = series_vhash(env)
        rows += [("hilbert_envelope", uid, "mean", mean, eh),
                 ("hilbert_envelope", uid, "last", last, eh),
                 ("hilbert_envelope", uid, "wmean", wmean, eh)]
        for band, taps in fb.items():
            y = fir_filter_np(x, taps, "same")
            rows.append(("filterbank", uid, band, float(np.mean(np.abs(y))),
                         series_vhash(y)))
        yk = fir_filter_np(x, kai, "same")
        rows.append(("kaiser_lp", uid, "mean_abs", float(np.mean(np.abs(yk))),
                     series_vhash(yk)))
        t = np.arange(n)
        tone = 25.0 * np.sin(2 * np.pi * 0.1 * t)
        y = lms_mains_canceller(x + tone, f0=0.1, fs=1.0, lr=0.05)
        rows.append(("lms_canceller", uid, "residual_tone_power",
                     float(np.mean((y - x)[n // 2:] ** 2)), series_vhash(y)))
        tone2 = np.sin(2 * np.pi * 0.15 * t)
        _, freqs = adaptive_lattice_notch(tone2, f0_init=0.1, fs=1.0, mu=2e-3)
        rows.append(("lattice_notch", uid, "tracked_freq", float(freqs[-1]),
                     series_vhash(freqs)))
        return pd.DataFrame(rows, columns=["variant", "user_id", "k", "v", "vhash"])

    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = group_apply_sorted(
        ev, kern, ["user_id"], "ts",
        "variant string, user_id bigint, k string, v double, vhash bigint")
    return out.select("variant", "user_id", "k", _r6(F.col("v")).alias("v"), "vhash")


# ========================================================= spectral suite ====

@q(
    "spectral_suite",
    fixture_oracle(
        "spectral_suite",
        ["variant", "user_id", "i", "j", "v"],
        round6=("v",),
        bigint=("user_id", "i", "j"),
    ),
)
def spectral_suite(spark, sf_dir):
    """Spectrum (64-pt hamming power: mean over windows at j=0 PLUS the
    positional checksum of the full per-window power series at j=1, so a
    single corrupted window cannot hide behind the mean), Spectrogram (32-pt,
    per-window rows — already full-output) and BandPower (ranged aggregate
    over the spectrogram) — the reference's spectrum.py/spectrogram.py/
    bandpower.py chain — unified as (variant, user_id, i, j, v) and pinned by
    the numpy FFT fixture. The 16-point DFT additionally has the fully
    SQL-expressed trig-sum oracle in spectrum_dft16. The checksum uses
    decimals=0 and is folded mod 2^31 on BOTH sides (fixture + Spark) so the
    double-typed v column carries it exactly at ANY scale factor — the raw
    bigint sum would silently cross 2^53 on a larger events table."""
    from .functions.hashing import vhash_agg
    from .operators.spectrum import spectrum

    ev = EQ._events(spark, sf_dir).filter(F.col("user_id") < 20).select(
        "user_id", "ts", "value")
    spec = spectrum(ev, win_len=64, fs=1.0, key_cols=["user_id"], ts_col="ts",
                    value_col="value", output="power")
    a = spec.groupBy("user_id", "freq_idx").agg(
        _r6(F.avg("spec")).alias("v")).select(
        F.lit("spectrum_power_64").alias("variant"), "user_id",
        F.col("freq_idx").cast("bigint").alias("i"), F.lit(0).cast("bigint").alias("j"),
        "v")
    ah = spec.groupBy("user_id", "freq_idx").agg(
        vhash_agg("spec", "win_id", decimals=0, mod=2**31).cast("double").alias("v")).select(
        F.lit("spectrum_power_64").alias("variant"), "user_id",
        F.col("freq_idx").cast("bigint").alias("i"), F.lit(1).cast("bigint").alias("j"),
        "v")
    a = a.unionByName(ah)
    b = RAW_QUERIES["spectrogram"](spark, sf_dir).select(
        F.lit("spectrogram32").alias("variant"), "user_id",
        F.col("time_idx").cast("bigint").alias("i"), F.col("freq_idx").cast("bigint").alias("j"),
        F.col("power").alias("v"))
    c = RAW_QUERIES["band_power"](spark, sf_dir).select(
        F.lit("band_power").alias("variant"), "user_id",
        F.col("win_id").cast("bigint").alias("i"), F.col("band_id").cast("bigint").alias("j"),
        F.col("mean_power").alias("v"))
    return a.unionByName(b).unionByName(c)


# ============================================================== CWT suite ====

@q(
    "cwt_suite",
    fixture_oracle(
        "cwt_suite",
        ["variant", "user_id", "k", "v", "vhash"],
        round6=("v",),
        bigint=("user_id", "vhash"),
    ),
)
def cwt_suite(spark, sf_dir):
    """Ricker and Morlet CWT filterbanks (reference wavelets.py:22-60),
    per (user, scale/freq) mean |coefficient| PLUS ``vhash`` — the positional
    checksum of the full |coefficient| series, so a mid-series error cannot
    hide behind the mean. The Morlet half drives the actual
    ``operators.spectrum.cwt_morlet`` operator and checksums its per-sample
    rows IN SPARK SQL (``functions.hashing.vhash_agg`` over the row
    position); the Ricker half checksums inside the kernel."""
    from pyspark.sql import Window

    from .functions.hashing import series_vhash, vhash_agg
    from .operators.filters import fir_filter_np
    from .operators.serieslift import group_apply_sorted
    from .operators.spectrum import cwt_morlet

    def ricker(points: int, a: float) -> np.ndarray:
        vec = np.arange(0, points) - (points - 1.0) / 2
        amp = 2 / (np.sqrt(3 * a) * np.pi**0.25)
        return amp * (1 - (vec / a) ** 2) * np.exp(-0.5 * (vec / a) ** 2)

    kernels = {f"a{a:g}": ricker(int(10 * a), a) for a in (2.0, 4.0, 8.0)}

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["value"].to_numpy(np.float64)
        uid = pdf["user_id"].iloc[0]
        rows = []
        for k, taps in kernels.items():
            y = np.abs(fir_filter_np(x, taps, "same"))
            rows.append(("cwt_ricker", uid, k, float(y.mean()), series_vhash(y)))
        return pd.DataFrame(rows, columns=["variant", "user_id", "k", "v", "vhash"])

    ev20 = _events(spark, sf_dir).filter(F.col("user_id") < 20).select(
        "user_id", "ts", "value")
    a = group_apply_sorted(
        ev20, kern, ["user_id"], "ts",
        "variant string, user_id bigint, k string, v double, vhash bigint")

    ev10 = _events(spark, sf_dir).filter(F.col("user_id") < 10).select(
        "user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts")
    ev10 = ev10.withColumn("ts", (F.row_number().over(w) - 1).cast("double"))
    coefs = cwt_morlet(ev10, fs=1.0, freqs=[0.05, 0.1, 0.2], key_cols=["user_id"],
                       ts_col="ts", value_col="value")
    b = coefs.groupBy("user_id", "freq_hz").agg(
        F.avg("abs_coef").alias("v"),
        vhash_agg("abs_coef", "ts").alias("vhash"),
    ).select(
        F.lit("cwt_morlet").alias("variant"), "user_id",
        F.concat(F.lit("f"), F.col("freq_hz").cast("string")).alias("k"),
        "v", "vhash")
    out = a.unionByName(b)
    return out.select("variant", "user_id", "k", _r6(F.col("v")).alias("v"), "vhash")


# ======================================================== ANN recall suite ====

_ANN_RECALL_BOUND = 0.3


@q(
    "embedding_ann_recall",
    f"""
    SELECT method,
           (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) FROM embeddings WHERE vec_id < 10) AS n_probes,
           true AS recall_ge_bound
    FROM (VALUES ('ivf'), ('lsh')) AS m(method)
    """,
)
def embedding_ann_recall(spark, sf_dir):
    """Recall@5 of both ANN paths vs the exact broadcast top-k
    (similarity.py): IVF-Flat (seeded k-means coarse quantizer, 16 cells / 3
    probed) and multi-table random-hyperplane LSH (4 tables × 4 planes). The driver-checkable bound
    is recall ≥ {bound} — deterministic (seeded quantizer, md5 planes), and
    pytest pins the exact recall values per scale."""
    from .operators.similarity import cosine_topk, cosine_topk_ivf, cosine_topk_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, probes, k=5).select("probe_id", "neighbor_id")
    anns = {
        "ivf": cosine_topk_ivf(emb, probes, k=5, n_cells=16, n_probe_cells=3),
        "lsh": cosine_topk_lsh(emb, probes, k=5, n_planes=4, n_tables=4),
    }
    n_probes = probes.agg(F.countDistinct("vec_id").cast("bigint").alias("n_probes"))
    parts = []
    for method, ann in anns.items():
        hits = ann.select("probe_id", "neighbor_id").join(
            exact, on=["probe_id", "neighbor_id"]).agg(F.count("*").alias("hits"))
        tot = exact.agg(F.count("*").alias("tot"))
        parts.append(
            hits.crossJoin(tot).crossJoin(n_probes).select(
                F.lit(method).alias("method"), "n_probes",
                (F.col("hits") / F.col("tot") >= F.lit(_ANN_RECALL_BOUND)).alias("recall_ge_bound"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


embedding_ann_recall.__doc__ = embedding_ann_recall.__doc__.replace("{bound}", str(_ANN_RECALL_BOUND))


# ================================================== quantize/digitize suite ====

@q(
    "quantize_digitize_suite",
    f"""
    WITH q8 AS ({RAW_ORACLES["quantize_8bit"]}),
         d16 AS ({RAW_ORACLES["digitize_16bit"]}),
         rt AS ({RAW_ORACLES["digitize_roundtrip"]})
    SELECT 'quantize_8bit' AS variant, CAST(code AS VARCHAR) AS k, CAST(n AS BIGINT) AS n,
           0.0 AS v1, 0.0 AS v2 FROM q8
    UNION ALL
    SELECT 'digitize_16bit', CAST(code AS VARCHAR), CAST(n AS BIGINT), conversion, "offset" FROM d16
    UNION ALL
    SELECT 'digitize_roundtrip', event_type, CAST(0 AS BIGINT), mean_abs_err, max_abs_err FROM rt
    """,
)
def quantize_digitize_suite(spark, sf_dir):
    """Quantize (quantize.py:33-68), Digitize with inverse-map attrs
    (digitize.py:57-112) and the digitize reconstruction-error roundtrip,
    merged; each member keeps its exact SQL twin."""
    a = RAW_QUERIES["quantize_8bit"](spark, sf_dir).select(
        F.lit("quantize_8bit").alias("variant"), F.col("code").cast("string").alias("k"),
        F.col("n").cast("bigint").alias("n"), F.lit(0.0).alias("v1"), F.lit(0.0).alias("v2"))
    b = RAW_QUERIES["digitize_16bit"](spark, sf_dir).select(
        F.lit("digitize_16bit").alias("variant"), F.col("code").cast("string").alias("k"),
        F.col("n").cast("bigint").alias("n"), F.col("conversion").alias("v1"),
        F.col("offset").alias("v2"))
    c = RAW_QUERIES["digitize_roundtrip"](spark, sf_dir).select(
        F.lit("digitize_roundtrip").alias("variant"), F.col("event_type").alias("k"),
        F.lit(0).cast("bigint").alias("n"), F.col("mean_abs_err").alias("v1"),
        F.col("max_abs_err").alias("v2"))
    return a.unionByName(b).unionByName(c)


# ======================================================= text analysis suite ====

@q(
    "text_analysis_suite",
    f"""
    WITH tq AS ({RAW_ORACLES["text_quality_tokens"]}),
         lg AS ({RAW_ORACLES["lang_id"]}),
         fp AS ({RAW_ORACLES["doc_fingerprint"]})
    SELECT 'text_quality' AS variant, source AS k1, 'n_docs' AS k2, CAST(n_docs AS DOUBLE) AS v FROM tq
    UNION ALL SELECT 'text_quality', source, 'ws_tokens', CAST(ws_tokens AS DOUBLE) FROM tq
    UNION ALL SELECT 'text_quality', source, 'bpe_tokens', CAST(bpe_tokens AS DOUBLE) FROM tq
    UNION ALL SELECT 'text_quality', source, 'punct_ratio', punct_ratio FROM tq
    UNION ALL SELECT 'lang_id', lang, pred_lang, CAST(n AS DOUBLE) FROM lg
    UNION ALL SELECT 'doc_fingerprint', lang, 'n_fp', CAST(n_fp AS DOUBLE) FROM fp
    UNION ALL SELECT 'doc_fingerprint', lang, 'n_docs', CAST(n_docs AS DOUBLE) FROM fp
    """,
)
def text_analysis_suite(spark, sf_dir):
    """Token counting / quality scoring, marker-word language ID, and
    whitespace-normalized document fingerprinting over documents, merged
    (melted to (variant, k1, k2, v)); exact SQL twins per member."""
    tq = RAW_QUERIES["text_quality_tokens"](spark, sf_dir)
    a = tq.select(
        F.lit("text_quality").alias("variant"), F.col("source").alias("k1"),
        F.expr("stack(4, 'n_docs', CAST(n_docs AS DOUBLE), 'ws_tokens', CAST(ws_tokens AS DOUBLE), "
               "'bpe_tokens', CAST(bpe_tokens AS DOUBLE), 'punct_ratio', punct_ratio) AS (k2, v)"))
    b = RAW_QUERIES["lang_id"](spark, sf_dir).select(
        F.lit("lang_id").alias("variant"), F.col("lang").alias("k1"),
        F.col("pred_lang").alias("k2"), F.col("n").cast("double").alias("v"))
    c = RAW_QUERIES["doc_fingerprint"](spark, sf_dir).select(
        F.lit("doc_fingerprint").alias("variant"), F.col("lang").alias("k1"),
        F.expr("stack(2, 'n_fp', CAST(n_fp AS DOUBLE), 'n_docs', CAST(n_docs AS DOUBLE)) AS (k2, v)"))
    return a.unionByName(b).unionByName(c)


# ====================================================== select/reshape suite ====

@q(
    "select_reshape_suite",
    f"""
    WITH sl AS ({RAW_ORACLES["slicer_regex"]}),
         fl AS ({RAW_ORACLES["flatten_keys"]})
    SELECT 'slicer_regex' AS variant, event_type AS k, CAST(n AS BIGINT) AS n, mean FROM sl
    UNION ALL
    SELECT 'flatten_keys', flat_key, CAST(n AS BIGINT), 0.0 FROM fl
    UNION ALL
    SELECT 'transpose', event_type, CAST(count(*) AS BIGINT), round(avg(value), 6)
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'extract_axis', event_type, CAST(count(*) AS BIGINT),
           round(avg(floor(epoch(ts)) % 86400), 6)
    FROM events GROUP BY event_type
    """,
)
def select_reshape_suite(spark, sf_dir):
    """Slicer (regex over labels, slicer.py:58-316) + Flatten (label join,
    flatten.py:1-45) + Transpose (dim permute → column reorder,
    transpose.py:41-130) + ExtractAxisData (axis coordinates as data,
    extract_axis.py:14-38), merged with exact SQL twins. The transpose
    variant aggregates THROUGH the reordered frame (proving the permute is
    content-preserving); extract_axis aggregates the extracted ts-as-value
    column."""
    from .operators.select import extract_axis, transpose

    a = RAW_QUERIES["slicer_regex"](spark, sf_dir).select(
        F.lit("slicer_regex").alias("variant"), F.col("event_type").alias("k"),
        F.col("n").cast("bigint").alias("n"), F.col("mean"))
    b = RAW_QUERIES["flatten_keys"](spark, sf_dir).select(
        F.lit("flatten_keys").alias("variant"), F.col("flat_key").alias("k"),
        F.col("n").cast("bigint").alias("n"), F.lit(0.0).alias("mean"))
    ev = _events(spark, sf_dir)
    tr = transpose(ev, ["value", "ts", "user_id", "event_type"])
    c = tr.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"), _r6(F.avg("value")).alias("mean")
    ).select(F.lit("transpose").alias("variant"), F.col("event_type").alias("k"),
             "n", "mean")
    # mean time-of-day of the extracted coordinates (bounded values — an
    # average of raw epochs would exceed 6-dp float associativity)
    ex = extract_axis(ev, ["event_type"], ts_col="ts")
    d = ex.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        _r6(F.avg(F.floor(F.col("value")) % 86400)).alias("mean")
    ).select(F.lit("extract_axis").alias("variant"), F.col("event_type").alias("k"),
             "n", "mean")
    return a.unionByName(b).unionByName(c).unionByName(d)


# ===================================================== math/coordinate suite ====

@q(
    "math_coordinate_suite",
    f"""
    WITH me AS ({RAW_ORACLES["math_elementwise"]}),
         cs AS ({RAW_ORACLES["coordinate_spaces"]})
    SELECT 'math_elementwise' AS variant, event_type AS k, 'mean_abs' AS metric, mean_abs AS v FROM me
    UNION ALL SELECT 'math_elementwise', event_type, 'mean_clip', mean_clip FROM me
    UNION ALL SELECT 'math_elementwise', event_type, 'mean_log', mean_log FROM me
    UNION ALL SELECT 'math_elementwise', event_type, 'mean_pow2', mean_pow2 FROM me
    UNION ALL SELECT 'math_elementwise', event_type, 'mean_affine', mean_affine FROM me
    UNION ALL SELECT 'math_elementwise', event_type, 'mean_sigmoid', mean_sigmoid FROM me
    UNION ALL SELECT 'coordinate_spaces', event_type, 'mean_rho', mean_rho FROM cs
    UNION ALL SELECT 'coordinate_spaces', event_type, 'mean_phi', mean_phi FROM cs
    """,
)
def math_coordinate_suite(spark, sf_dir):
    """Element-wise math operator set (SURVEY.md §2.5) + CoordinateSpaces
    cartesian→polar, merged (melted); exact SQL twins per member."""
    me = RAW_QUERIES["math_elementwise"](spark, sf_dir)
    a = me.select(
        F.lit("math_elementwise").alias("variant"), F.col("event_type").alias("k"),
        F.expr("stack(6, 'mean_abs', mean_abs, 'mean_clip', mean_clip, 'mean_log', mean_log, "
               "'mean_pow2', mean_pow2, 'mean_affine', mean_affine, 'mean_sigmoid', mean_sigmoid)"
               " AS (metric, v)"))
    cs = RAW_QUERIES["coordinate_spaces"](spark, sf_dir)
    b = cs.select(
        F.lit("coordinate_spaces").alias("variant"), F.col("event_type").alias("k"),
        F.expr("stack(2, 'mean_rho', mean_rho, 'mean_phi', mean_phi) AS (metric, v)"))
    return a.unionByName(b)


# --------- post-hoc oracle upgrades for queries registered in entry_queries ---

# FBCCA: numpy fixture (the scores are deterministic; see tools/make_fixtures.py)
EQ.ORACLES["fbcca_frequency_scores"] = fixture_oracle(
    "fbcca_frequency_scores",
    ["user_id", "win_id", "target_freq", "score"],
    round4=("score",),
    bigint=("user_id", "win_id"),
    double=("target_freq",),
)


# ================================================ embedding cosine near-dup ====

_ND_PLANES, _ND_TABLES, _ND_DIM, _ND_TAU = 4, 4, 64, 0.3


def _cosine_neardup_oracle() -> str:
    """Exact SQL twin: the multi-table LSH bucketing is mirrored by inlining
    the md5-parity hyperplane weights (identical by construction to Spark's
    lsh_bucket_col — see similarity.lsh_plane_weights) as ±1 arrays and using
    DuckDB's list_dot_product; candidates then verify with exact cosine."""
    from .operators.similarity import lsh_plane_weights

    sig_exprs = []
    for t in range(_ND_TABLES):
        ws = lsh_plane_weights(_ND_PLANES, _ND_DIM, plane_seed=t * _ND_PLANES)
        bits = " || ".join(
            f"(CASE WHEN list_dot_product(v, {w!r}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
            for w in ws
        )
        sig_exprs.append(f"({bits}) AS s{t}")
    match = " OR ".join(f"a.s{t} = b.s{t}" for t in range(_ND_TABLES))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sig AS (SELECT vec_id, v, {', '.join(sig_exprs)} FROM e),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_cosine_similarity(a.v, b.v) AS cs
      FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND ({match})
    )
    SELECT id_a, id_b, round(cs, 6) AS cos_sim FROM cand WHERE cs >= {_ND_TAU!r}
    """


@q("dedup_embedding_cosine", _cosine_neardup_oracle())
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (the dedup family's embedding
    member): multi-table LSH self-join proposes candidates, exact cosine
    verifies ≥ τ. The oracle reproduces the identical bucketing by inlining
    the md5-parity hyperplane weights into SQL — candidates, not just
    survivors, match across engines."""
    from .operators.similarity import cosine_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    out = cosine_near_dup_pairs(emb, threshold=_ND_TAU, n_planes=_ND_PLANES,
                                n_tables=_ND_TABLES)
    return out.select("id_a", "id_b", _r6(F.col("cos_sim")).alias("cos_sim"))
