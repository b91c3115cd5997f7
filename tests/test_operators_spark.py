"""Spark operator tests against whole-signal numpy oracles — the reference's
unit-test pattern (tests/unit/test_downsample.py:69-71 etc.): build a known
signal, run the Spark operator, compare to the numpy computation on the whole
array. Includes the reference's empty-input robustness checks
(tests/helpers/empty_time.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ezmsg_sigproc_spark.operators.aggregate import (
    binned_aggregate,
    full_aggregate,
    ranged_aggregate,
    time_binned_aggregate,
    trapezoid_aggregate,
)
from ezmsg_sigproc_spark.operators.downsample import downsample, factor_from_target_rate
from ezmsg_sigproc_spark.operators.ewma import adaptive_standard_scaler, ewma, ewma_corrected_np
from ezmsg_sigproc_spark.operators.filters import butter_filter_np, butterworth
from ezmsg_sigproc_spark.operators.resample import resample_linear
from ezmsg_sigproc_spark.operators.rollingscaler import rolling_zscore
from ezmsg_sigproc_spark.operators.spectrum import spectrum
from ezmsg_sigproc_spark.operators.window import sliding_windows, tumbling_windows
from ezmsg_sigproc_spark.functions.binning import bin_index_np, samples_per_bin


def _signal_df(spark, n=300, n_keys=3, fs=10.0, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_keys):
        vals = rng.standard_normal(n)
        for i in range(n):
            rows.append((f"k{k}", i / fs, float(vals[i])))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    return spark.createDataFrame(pdf), pdf


def test_downsample_matches_slice_oracle(spark):
    """reference test_downsample.py:69-71: concat of outputs == sig[::factor]"""
    df, pdf = _signal_df(spark)
    for q in [2, 3, 7]:
        out = downsample(df, q).toPandas().sort_values(["key", "ts"])
        for k, grp in pdf.groupby("key"):
            exp = grp.sort_values("ts")["value"].to_numpy()[::q]
            got = out[out.key == k]["value"].to_numpy()
            np.testing.assert_array_equal(got, exp)


def test_downsample_factor_resolution():
    # reference downsample.py:57-73
    assert factor_from_target_rate(1 / 1000.0, 250.0) == 4
    assert factor_from_target_rate(1 / 1000.0, 3000.0) == 1


def test_binned_aggregate_matches_global_oracle(spark):
    """reference test_binned_aggregate.py:44-84 _ref_binned with int(m*spb)."""
    df, pdf = _signal_df(spark, n=500, fs=30012.0 / 1000)  # off-nominal
    bin_dur, fs = 0.25 * 1000, 30012.0 / 1000
    spb = samples_per_bin(bin_dur, fs)
    out = binned_aggregate(df, bin_dur, fs, ["min", "max", "mean", "count"]).toPandas()
    for k, grp in pdf.groupby("key"):
        vals = grp.sort_values("ts")["value"].to_numpy()
        m = bin_index_np(np.arange(len(vals)), spb)
        sub = out[out.key == k].sort_values("bin_m")
        for _, row in sub.iterrows():
            seg = vals[m == row.bin_m]
            assert row["count"] == len(seg)
            assert row["min"] == pytest.approx(seg.min())
            assert row["max"] == pytest.approx(seg.max())
            assert row["mean"] == pytest.approx(seg.mean())
        # bin_ts label: stream_t0 + m*bin_duration (binning.py:165-174)
        t0 = grp.ts.min()
        np.testing.assert_allclose(sub.bin_ts, t0 + sub.bin_m * bin_dur)


def test_tumbling_and_sliding_windows(spark):
    df, pdf = _signal_df(spark, n=100, n_keys=2)
    t = tumbling_windows(df, 10).groupBy("key", "win_id").count().toPandas()
    assert set(t["count"]) == {10}
    assert len(t) == 2 * 10
    s = sliding_windows(df, 10, 5, drop_partial=True).groupBy("key", "win_id").count().toPandas()
    assert set(s["count"]) == {10}
    assert len(s) == 2 * ((100 - 10) // 5 + 1)


def test_full_aggregate_ops(spark):
    df, pdf = _signal_df(spark)
    out = full_aggregate(df, ["max", "min", "mean", "median", "std", "sum"],
                         coord_col=None).toPandas().set_index("key")
    for k, grp in pdf.groupby("key"):
        v = grp["value"].to_numpy()
        assert out.loc[k, "max"] == pytest.approx(v.max())
        assert out.loc[k, "median"] == pytest.approx(np.median(v))
        assert out.loc[k, "std"] == pytest.approx(v.std())  # ddof=0
        assert out.loc[k, "sum"] == pytest.approx(v.sum())


def test_nan_aggregates_match_numpy(spark):
    # build from tuples: the pandas ingestion path would coerce NaN→NULL
    # (pandas uses NaN as its null sentinel), masking the semantics under test
    rows = [("a", 0.0, 1.0), ("a", 1.0, float("nan")), ("a", 2.0, 3.0),
            ("a", 3.0, float("nan")), ("a", 4.0, 5.0)]
    df = spark.createDataFrame(rows, "key string, ts double, value double")
    out = full_aggregate(df, ["nanmean", "nansum", "nanmax", "mean"]).toPandas()
    assert out.loc[0, "nanmean"] == pytest.approx(3.0)
    assert out.loc[0, "nansum"] == pytest.approx(9.0)
    assert out.loc[0, "nanmax"] == pytest.approx(5.0)
    assert np.isnan(out.loc[0, "mean"])  # plain mean propagates NaN like numpy


def test_ranged_aggregate_bands(spark):
    df, pdf = _signal_df(spark)
    out = ranged_aggregate(df, [(-10, 0), (0, 10)], ["count"], band_on="value").toPandas()
    # band 0 is [-10, 0] inclusive; first-match-wins gives 0.0 to band 0
    for k, grp in pdf.groupby("key"):
        v = grp["value"].to_numpy()
        got0 = out[(out.key == k) & (out.band_id == 0)]["count"].iloc[0]
        assert got0 == (v <= 0).sum()


def test_trapezoid_matches_numpy(spark):
    df, pdf = _signal_df(spark)
    out = trapezoid_aggregate(df).toPandas().set_index("key")
    for k, grp in pdf.groupby("key"):
        g = grp.sort_values("ts")
        exp = np.trapz(g["value"].to_numpy(), g["ts"].to_numpy())
        assert out.loc[k, "trapz"] == pytest.approx(exp)


def test_ewma_spark_matches_numpy(spark):
    df, pdf = _signal_df(spark, n=200)
    out = ewma(df, alpha=0.25).toPandas().sort_values(["key", "ts"])
    for k, grp in pdf.groupby("key"):
        exp = ewma_corrected_np(grp.sort_values("ts")["value"].to_numpy(), 0.25)
        got = out[out.key == k]["ewma"].to_numpy()
        np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_rolling_zscore_semantics(spark):
    """Stats exclude the current sample; warmup passes raw through."""
    pdf = pd.DataFrame({"key": ["a"] * 30, "ts": np.arange(30.0),
                        "value": np.arange(30.0)})
    df = spark.createDataFrame(pdf)
    out = rolling_zscore(df, 5, min_samples=3).toPandas().sort_values("ts")
    np.testing.assert_array_equal(out["z"].to_numpy()[:3], pdf["value"].to_numpy()[:3])
    i = 10
    win = pdf["value"].to_numpy()[i - 5 : i]
    exp = (pdf["value"][i] - win.mean()) / max(win.std(), 1e-8)
    assert out["z"].to_numpy()[i] == pytest.approx(exp)


def test_resample_linear_matches_np_interp(spark):
    rng = np.random.default_rng(3)
    ts = np.sort(rng.choice(np.arange(0, 1000, 2.0), size=300, replace=False))
    vals = rng.standard_normal(300)
    pdf = pd.DataFrame({"key": "a", "ts": ts, "value": vals})
    df = spark.createDataFrame(pdf)
    out = resample_linear(df, 7.0).toPandas().sort_values("ts")
    grid = ts[0] + np.arange(int((ts[-1] - ts[0]) / 7.0) + 1) * 7.0
    exp = np.interp(grid, ts, vals)
    np.testing.assert_allclose(out["ts"].to_numpy(), grid)
    np.testing.assert_allclose(out["value"].to_numpy(), exp, rtol=1e-9)


def test_resample_reproduces_exact_sample_points(spark):
    pdf = pd.DataFrame({"key": "a", "ts": [0.0, 10.0, 20.0], "value": [1.0, 5.0, -3.0]})
    df = spark.createDataFrame(pdf)
    out = resample_linear(df, 10.0).toPandas().sort_values("ts")
    np.testing.assert_array_equal(out["value"].to_numpy(), [1.0, 5.0, -3.0])


def test_butterworth_spark_matches_numpy(spark):
    df, pdf = _signal_df(spark, n=128, n_keys=2)
    out = butterworth(df, order=4, cutoff=0.1, fs=1.0).toPandas().sort_values(["key", "ts"])
    for k, grp in pdf.groupby("key"):
        exp = butter_filter_np(grp.sort_values("ts")["value"].to_numpy(), 4, 0.1, "lowpass", 1.0)
        np.testing.assert_allclose(out[out.key == k]["filtered"].to_numpy(), exp, rtol=1e-10)


def test_spectrum_parseval(spark):
    """Power spectrum integrates to window energy (rect window, Parseval)."""
    n = 64
    pdf = pd.DataFrame({"key": "a", "ts": np.arange(n, dtype=float),
                        "value": np.sin(2 * np.pi * 8 * np.arange(n) / n)})
    df = spark.createDataFrame(pdf)
    out = spectrum(df, win_len=n, fs=1.0, window_fn="rect", output="power").toPandas()
    assert len(out) == n // 2 + 1
    # pure tone at bin 8: all power concentrated there
    assert out.sort_values("spec").iloc[-1]["freq_idx"] == 8


def test_empty_input_yields_empty_output(spark):
    """reference tests/helpers/empty_time.py: zero-length chunks flow through
    without corrupting anything — batch analog: empty frames give empty
    results, not errors."""
    empty = spark.createDataFrame([], "key string, ts double, value double")
    assert downsample(empty, 3).count() == 0
    assert time_binned_aggregate(empty, 60, ["mean"]).count() == 0
    assert ewma(empty, alpha=0.5).count() == 0
    assert resample_linear(empty, 10.0).count() == 0
    assert adaptive_standard_scaler(empty, alpha=0.5).count() == 0


def test_input_immutability(spark):
    """reference asserts inputs are never mutated (tests/helpers/util.py:95-109);
    DataFrames are immutable by construction — pin that the source is re-usable
    after an operator consumed it."""
    df, pdf = _signal_df(spark, n=50)
    _ = downsample(df, 2).count()
    assert df.count() == len(pdf)


def test_sliding_windows_zero_pad_shift(spark):
    """zero_pad='shift' (reference zero_pad_until='shift'): window w ends at
    (w+1)·shift; leading windows are partial; emitted once shift·(w+1) samples
    exist."""
    pdf = pd.DataFrame({"key": ["a"] * 20, "ts": np.arange(20.0),
                        "value": np.arange(20.0)})
    df = spark.createDataFrame(pdf)
    out = (sliding_windows(df, win_len=10, shift=5, zero_pad="shift")
           .groupBy("win_id").count().toPandas().set_index("win_id").sort_index())
    # window 0 covers indices [-5, 5) → 5 real samples; window 1: [0,10) → 10;
    # window 2: [5,15) → 10; window 3: [10,20) → 10
    assert out.loc[0, "count"] == 5
    assert out.loc[1, "count"] == 10
    assert out.loc[3, "count"] == 10
    assert out.index.max() == 3


def test_sampler_complete_drops_boundary_triggers(spark):
    from ezmsg_sigproc_spark.operators.combinators import sampler_complete

    sig = spark.createDataFrame(
        pd.DataFrame({"ts": np.arange(0.0, 100.0), "value": np.arange(100.0)}))
    trig = spark.createDataFrame(pd.DataFrame(
        {"trigger_id": [0, 1, 2], "trig_ts": [0.5, 50.0, 99.5]}))
    out = sampler_complete(sig, trig, pre_s=-2.0, post_s=3.0).toPandas()
    # trigger 0 needs ts=-1.5 (before stream) and trigger 2 needs ts=102.5
    # (after stream) — both dropped per sampler.py:152-176
    assert set(out["trigger_id"]) == {1}
    assert len(out) == 5  # ts ∈ [48, 53)


def test_spectrum_full_and_ortho(spark):
    n = 32
    pdf = pd.DataFrame({"key": "a", "ts": np.arange(n, dtype=float),
                        "value": np.sin(2 * np.pi * 4 * np.arange(n) / n)})
    df = spark.createDataFrame(pdf)
    full = spectrum(df, win_len=n, fs=1.0, window_fn="rect", output="power",
                    out_axis="full", norm="ortho").toPandas()
    assert len(full) == n  # two-sided
    # Parseval under ortho norm: Σ|X|² == Σ|x|²
    assert full["spec"].sum() == pytest.approx((pdf["value"] ** 2).sum())


def test_fbcca_detects_injected_tone(spark):
    from ezmsg_sigproc_spark.operators.fbcca import fbcca

    n = 256
    rng = np.random.default_rng(2)
    pdf = pd.DataFrame({
        "key": "a", "ts": np.arange(n, dtype=float),
        "value": 2.0 * np.sin(2 * np.pi * 0.1 * np.arange(n)) + 0.5 * rng.standard_normal(n),
    })
    df = spark.createDataFrame(pdf)
    out = fbcca(df, fs=1.0, freqs=[0.05, 0.1, 0.2], win_len=128, harmonics=2,
                softmax_beta=0.0).toPandas()
    best = out.loc[out.groupby("win_id")["score"].idxmax()]
    assert (best["target_freq"] == 0.1).all()


def test_fbcca_aliased_harmonic_design_is_full_rank_and_deterministic():
    """Regression for the round-5 CORRECTNESS failure: at freq=0.2/fs=1 with
    harmonics=2 the h=3 harmonic (0.6 cyc/sample) aliases exactly onto
    −(h=2) (−0.4), making the naive design matrix rank 4 of 6 — and plain
    QR's null-space columns made the CCA score LAPACK-build-dependent.
    The kernel must (a) drop ≥-Nyquist harmonic pairs and (b) use a
    rank-truncated orthonormal basis so the score is well-defined."""
    from ezmsg_sigproc_spark.operators.fbcca import (
        cca_max_corr,
        design_matrix,
        fbcca_scores_np,
    )

    d = design_matrix(64, 1.0, 0.2, 2)
    assert d.shape == (64, 4)  # h=3 pair dropped (0.6 >= Nyquist 0.5)
    assert np.linalg.matrix_rank(d - d.mean(axis=0)) == 4

    # Exactly at Nyquist: h=2 pair dropped too (sin at fs/2 is all-zeros).
    assert design_matrix(64, 1.0, 0.25, 2).shape == (64, 2)

    # Even a deliberately rank-deficient y must give a well-defined score:
    # duplicate-negated columns span the same subspace as the clean design.
    rng = np.random.default_rng(7)
    w = (rng.standard_normal(64) + 3 * np.sin(2 * np.pi * 0.1 * np.arange(64)))[:, None]
    clean = design_matrix(64, 1.0, 0.2, 1)  # h in {1,2}, 4 cols, full rank
    degenerate = np.concatenate([clean, -clean[:, [0, 1]]], axis=1)  # rank 4 of 6
    assert cca_max_corr(w, degenerate) == pytest.approx(cca_max_corr(w, clean), abs=1e-12)

    # And the full scoring path is bit-deterministic across calls.
    s1 = fbcca_scores_np(w, 1.0, [0.05, 0.1, 0.2], harmonics=2, softmax_beta=0.0)
    s2 = fbcca_scores_np(w, 1.0, [0.05, 0.1, 0.2], harmonics=2, softmax_beta=0.0)
    assert np.array_equal(s1, s2)


def test_cwt_morlet_localizes(spark):
    from ezmsg_sigproc_spark.operators.spectrum import cwt_morlet

    n = 2000
    t = np.arange(n) / 250.0
    x = np.where(t < 4, np.sin(2 * np.pi * 12 * t), np.sin(2 * np.pi * 30 * t))
    df = spark.createDataFrame(pd.DataFrame({"key": "a", "ts": t, "value": x}))
    out = cwt_morlet(df, fs=250.0, freqs=[12.0, 30.0]).toPandas()
    early = out[(out.ts > 1) & (out.ts < 3)]
    late = out[(out.ts > 5) & (out.ts < 7)]
    assert early[early.freq_hz == 12.0]["abs_coef"].mean() > 10 * early[early.freq_hz == 30.0]["abs_coef"].mean()
    assert late[late.freq_hz == 30.0]["abs_coef"].mean() > 10 * late[late.freq_hz == 12.0]["abs_coef"].mean()


def test_group_apply_sorted_equals_applyinpandas(spark):
    """serieslift.group_apply_sorted (partition-level lift, carry across Arrow
    batches) must agree exactly with groupBy().applyInPandas for a per-key
    ordered kernel — including keys whose rows straddle batch boundaries."""
    import numpy as np
    import pandas as pd

    from ezmsg_sigproc_spark.operators.serieslift import group_apply_sorted

    rng = np.random.default_rng(11)
    frames = []
    for k in range(40):  # ragged series lengths force boundary straddles
        n = int(rng.integers(1, 400))
        frames.append(pd.DataFrame({
            "key": f"k{k:02d}", "ts": np.arange(n, dtype=float),
            "value": rng.standard_normal(n)}))
    full = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=0)
    df = spark.createDataFrame(full, "key string, ts double, value double")

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
        pdf["out"] = pdf["value"].cumsum()  # order-sensitive
        return pdf

    schema = "key string, ts double, value double, out double"
    a = group_apply_sorted(df, kern, ["key"], "ts", schema).toPandas()
    b = df.groupBy("key").applyInPandas(kern, schema).toPandas()
    a = a.sort_values(["key", "ts"]).reset_index(drop=True)
    b = b.sort_values(["key", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # small-batch path: force many Arrow batches so carries actually happen
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        c = group_apply_sorted(df, kern, ["key"], "ts", schema).toPandas()
        c = c.sort_values(["key", "ts"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(c, b)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")


def test_group_apply_sorted_null_keys_kept(spark):
    """Null-key rows must form ONE group (Spark's applyInPandas keeps a
    null-key group; pandas groupby would drop it by default, and NaN != NaN
    boundary detection would shatter the run into per-row groups)."""
    import numpy as np
    import pandas as pd

    from ezmsg_sigproc_spark.operators.serieslift import group_apply_sorted

    pdf = pd.DataFrame({
        "key": ["a", "a", None, None, None, "b"],
        "ts": [0.0, 1.0, 0.0, 1.0, 2.0, 0.0],
        "value": [1.0, 2.0, 10.0, 20.0, 30.0, 5.0],
    })
    df = spark.createDataFrame(pdf, "key string, ts double, value double")

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts").reset_index(drop=True)
        g["out"] = g["value"].cumsum()
        return g

    schema = "key string, ts double, value double, out double"
    got = group_apply_sorted(df, kern, ["key"], "ts", schema).toPandas()
    null_rows = got[got["key"].isna()].sort_values("ts")
    assert list(null_rows["out"]) == [10.0, 30.0, 60.0]  # one cumsum chain
    assert len(got) == 6


def test_apply_matrix_kernel_pivot_cap_splits_skewed_batch(spark):
    """With the pivot cell cap forced tiny, a skewed batch (one long key +
    many short) must split into per-bucket pivots and still match the
    uncapped result exactly."""
    import numpy as np
    import pandas as pd

    from ezmsg_sigproc_spark.operators import serieslift

    rng = np.random.default_rng(5)
    frames = [pd.DataFrame({"key": "long", "ts": np.arange(3000, dtype=float),
                            "value": rng.standard_normal(3000)})]
    for k in range(200):
        frames.append(pd.DataFrame({"key": f"s{k:03d}", "ts": [0.0, 1.0],
                                    "value": rng.standard_normal(2)}))
    full = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(full, "key string, ts double, value double")

    def kernel(mat):
        return np.cumsum(mat, axis=0)  # causal, column-independent

    big = serieslift.apply_matrix_kernel(
        df, kernel, ["key"], "ts", "value", "out").toPandas()
    small = serieslift.apply_matrix_kernel(
        df, kernel, ["key"], "ts", "value", "out", pivot_cap=4096).toPandas()
    a = big.sort_values(["key", "ts"]).reset_index(drop=True)
    b = small.sort_values(["key", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    exp = full.sort_values(["key", "ts"]).groupby("key")["value"].cumsum()
    np.testing.assert_allclose(
        b["out"].to_numpy(),
        full.sort_values(["key", "ts"]).assign(e=exp).sort_values(["key", "ts"])["e"].to_numpy(),
        rtol=1e-12)


def test_cosine_near_dup_finds_planted_duplicates(spark):
    """Identical/near-identical vectors collide in every LSH table, so the
    near-dup operator must always surface them; orthogonal vectors must not
    pass the cosine threshold."""
    import numpy as np

    from ezmsg_sigproc_spark.operators.similarity import cosine_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    near = base + 0.01 * rng.standard_normal(16)
    rows = [(0, [float(x) for x in base]), (1, [float(x) for x in near])]
    # orthogonal-ish noise vectors
    for i in range(2, 30):
        rows.append((i, [float(x) for x in rng.standard_normal(16)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = cosine_near_dup_pairs(df, threshold=0.9, n_planes=4, n_tables=4).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert (0, 1) in pairs
    assert all(r.cos_sim >= 0.9 for r in got)
