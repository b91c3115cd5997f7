"""Wide (array-column) multichannel kernels: roundtrip conversions and
equality with the long-format operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ezmsg_sigproc_spark.operators.ewma import ewma, ewma_corrected_np
from ezmsg_sigproc_spark.operators.multichannel import (
    apply_matrix_kernel,
    ewma_wide,
    long_to_wide,
    wide_to_long,
)


@pytest.fixture(scope="module")
def long_df(spark):
    rng = np.random.default_rng(11)
    rows = []
    for ch in ["c0", "c1", "c2"]:
        for i in range(100):
            rows.append(("k", float(i), ch, float(rng.standard_normal())))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "ch", "value"])
    return spark.createDataFrame(pdf), pdf


def test_long_wide_roundtrip(spark, long_df):
    df, pdf = long_df
    wide = long_to_wide(df)
    assert wide.count() == 100
    back = wide_to_long(wide).toPandas().sort_values(["ts", "ch"]).reset_index(drop=True)
    exp = pdf.sort_values(["ts", "ch"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["key", "ts", "ch", "value"]], exp)


def test_ewma_wide_matches_long(spark, long_df):
    df, pdf = long_df
    wide = long_to_wide(df)
    out = ewma_wide(wide, alpha=0.4).toPandas().sort_values("ts")
    for ci, ch in enumerate(["c0", "c1", "c2"]):
        series = pdf[pdf.ch == ch].sort_values("ts")["value"].to_numpy()
        exp = ewma_corrected_np(series, 0.4)
        got = np.stack(out["out"].to_numpy())[:, ci]
        np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_matrix_kernel_shape_contract(spark, long_df):
    df, _ = long_df
    wide = long_to_wide(df)
    out = apply_matrix_kernel(wide, lambda m: m * 2.0).toPandas()
    row = out.iloc[0]
    np.testing.assert_allclose(np.asarray(row["out"]), np.asarray(row["values"]) * 2.0)


def test_sosfilt_wide_matches_per_channel(spark, long_df):
    from ezmsg_sigproc_spark.operators.filters import butter_filter_np, butter_sos
    from ezmsg_sigproc_spark.operators.multichannel import sosfilt_wide

    df, pdf = long_df
    sos = butter_sos(4, 0.1, "lowpass", fs=1.0)
    wide = long_to_wide(df)
    out = sosfilt_wide(wide, sos).toPandas().sort_values("ts")
    mat = np.stack(out["out"].to_numpy())
    for ci, ch in enumerate(["c0", "c1", "c2"]):
        series = pdf[pdf.ch == ch].sort_values("ts")["value"].to_numpy()
        exp = butter_filter_np(series, 4, 0.1, "lowpass", 1.0)
        np.testing.assert_allclose(mat[:, ci], exp, rtol=1e-10)
