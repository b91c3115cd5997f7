"""Property-based tests (hypothesis) for the pure kernels — beyond the
reference's example-based strategy, these pin the law over the whole input
space: the bin grid, the Gorilla codec, and the EWMA closed form."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ezmsg_sigproc_spark.functions.binning import (
    bin_boundaries_np,
    bin_index_np,
    bin_index_sql,
)
from ezmsg_sigproc_spark.operators.compression import gorilla_roundtrip_stats
from ezmsg_sigproc_spark.operators.ewma import ewma_corrected_np


@settings(max_examples=60, deadline=None)
@given(
    spb=st.floats(min_value=1.0, max_value=10_000.0, allow_nan=False),
    n=st.integers(min_value=1, max_value=5_000),
)
def test_bin_index_law_property(spb, n):
    idx = np.arange(n)
    m = bin_index_np(idx, spb)
    bounds = bin_boundaries_np(int(n / spb) + 3, spb)
    m_ref = np.searchsorted(bounds, idx, side="right") - 1
    np.testing.assert_array_equal(m, m_ref)
    # bins are monotone and start at 0
    assert m[0] == 0
    assert (np.diff(m) >= 0).all()


@settings(max_examples=20, deadline=None)
@given(spb=st.floats(min_value=1.0, max_value=500.0, allow_nan=False))
def test_bin_index_sql_matches_numpy(spb):
    con = duckdb.connect()
    got = con.execute(
        f"select {bin_index_sql('i', spb)} as m from range(0, 3000) t(i)"
    ).fetchnumpy()["m"]
    np.testing.assert_array_equal(got, bin_index_np(np.arange(3000), spb))


@settings(max_examples=40, deadline=None)
@given(
    deltas=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
    raw=st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=300),
    t0=st.integers(min_value=-(2**50), max_value=2**50),
)
def test_gorilla_roundtrip_property(deltas, raw, t0):
    n = min(len(deltas), len(raw))
    ts = t0 + np.cumsum(np.asarray(deltas[:n], dtype=np.int64))
    vals = np.asarray(raw[:n], dtype=np.uint64).view(np.float64)
    st_ = gorilla_roundtrip_stats(ts, vals)
    assert st_["roundtrip_ok"]


@settings(max_examples=40, deadline=None)
@given(
    alpha=st.floats(min_value=1e-6, max_value=1.0 - 1e-9),
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=500
    ),
)
def test_ewma_closed_form_property(alpha, vals):
    x = np.asarray(vals)
    got = ewma_corrected_np(x, alpha)
    zi = 0.0
    exp = np.empty(len(x))
    for i, xi in enumerate(x):
        zi = alpha * xi + (1 - alpha) * zi
        exp[i] = zi / (1 - (1 - alpha) ** (i + 1))
    np.testing.assert_allclose(got, exp, rtol=1e-8, atol=1e-9)
