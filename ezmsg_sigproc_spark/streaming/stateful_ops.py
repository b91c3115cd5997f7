"""Stateful streaming operators via ``applyInPandasWithState``.

The reference's stateful processors carry ``(zi, n_seen)``-style state across
chunks (SURVEY §2.11); in Structured Streaming the same carry lives in Spark's
state store, checkpointed per key. The EWMA here is the canonical example:
its per-key state is exactly the reference's ``EWMAState``
(``src/ezmsg/sigproc/ewma.py:184-189``: smoother state ``zi`` + cumulative
``n_seen`` for the bias correction), so a stream processed in arbitrary
micro-batches produces bit-for-bit the batch result — the chunk-invariance
contract (SURVEY §1.2) carried over to Spark's streaming engine, including
across restarts (state store checkpoint ≡ the reference's carried state).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_ewma(
    stream: DataFrame,
    alpha: float,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key streaming EWMA with bias correction; state = (zi, n_seen).

    Requires per-key in-order micro-batches (the reference has the same
    requirement: chunks arrive in stream order).
    """

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        zi, n_seen = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            x = pdf[value_col].to_numpy(np.float64)
            out = np.empty(x.size)
            for i, xi in enumerate(x):
                zi = alpha * xi + (1 - alpha) * zi
                out[i] = zi / (1.0 - (1.0 - alpha) ** (n_seen + i + 1))
            n_seen += x.size
            pdf[out_col] = out
            yield pdf
        state.update((float(zi), int(n_seen)))

    schema = f"{key_col} string, {ts_col} double, {value_col} double, {out_col} double"
    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="zi double, n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_downsample(
    stream: DataFrame,
    q: int,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key streaming downsample; state = the rotating phase counter
    ``s_idx`` — exactly the reference's ``DownsampleState``
    (``src/ezmsg/sigproc/downsample.py:38-43``)."""

    def fn(key, pdfs, state: GroupState):
        (s_idx,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            n = len(pdf)
            phases = (s_idx + np.arange(n)) % q
            if n:
                s_idx = int(phases[-1]) + 1
            yield pdf[phases == 0]
        state.update((int(s_idx),))

    schema = f"{key_col} string, {ts_col} double, {value_col} double"
    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="s_idx long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
