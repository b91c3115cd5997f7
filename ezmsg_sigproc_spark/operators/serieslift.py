"""Partition-level lift for per-key ordered kernels.

``groupBy(key).applyInPandas`` pays a JVM↔Python Arrow round trip PER GROUP —
at web scale the signal has millions of short per-key series, so per-group
overhead (1–3 ms each) dominates the vectorized kernels themselves (round-1
bench: the EWMA phase was ~3× kernel cost at 12k keys).

``group_apply_sorted`` instead runs ONE ``mapInPandas`` over data that is
hash-repartitioned on the key and sorted within partitions by (key, ts):
Python is entered once per Arrow batch (64k rows), each batch is grouped
in-memory with pandas, and a key whose rows straddle a batch boundary is
carried into the next batch — so every kernel invocation still sees the key's
COMPLETE series in ts order, exactly like applyInPandas, at a fraction of the
crossing cost. Same shuffle count (one hash exchange either way). (Batching
the engine↔UDF boundary is the central lever in "Accelerating Python UDFs in
Vectorized Query Execution", CIDR'22 — this is that idea applied to Spark's
grouped-map path.)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def group_apply_sorted(
    df: DataFrame,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    key_cols: Sequence[str],
    ts_col: str,
    schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Apply ``kernel`` (full-series pandas frame of ONE key, already sorted
    by ``ts_col``) to every key, entering Python once per Arrow batch.

    Contract identical to ``groupBy(key).applyInPandas(kernel)`` for kernels
    that only require their own key's rows; output row order is unspecified
    (as with any shuffle-consuming operator).
    """
    key_cols = list(key_cols)
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism * 2, 8)
    arranged = df.repartition(num_partitions, *key_cols).sortWithinPartitions(
        *key_cols, ts_col
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None

        def run_groups(pdf: pd.DataFrame) -> pd.DataFrame:
            outs = [kernel(g) for _, g in pdf.groupby(key_cols, sort=False)]
            return pd.concat(outs, ignore_index=True)

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            # rows of the batch's LAST key may continue in the next batch —
            # hold them back (the final flush handles the tail)
            keys = pdf[key_cols]
            change = (keys != keys.shift()).any(axis=1).to_numpy()
            last_start = int(change.nonzero()[0][-1])
            if last_start == 0:
                carry = pdf
                continue
            carry = pdf.iloc[last_start:].reset_index(drop=True)
            yield run_groups(pdf.iloc[:last_start])
        if carry is not None and len(carry):
            yield run_groups(carry)

    return arranged.mapInPandas(fn, schema=schema)


def apply_matrix_kernel(
    df: DataFrame,
    matrix_kernel,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Batch ALL keys of an Arrow batch into one (time × keys) matrix and run
    a single vectorized kernel call — for CAUSAL kernels only.

    ``matrix_kernel(mat)``: (n_max, n_keys) float64 → same shape; column j is
    key j's series in ts order, zero-padded at the TAIL to the batch's longest
    series. Causality makes the padding harmless: outputs at valid positions
    never depend on later (padded) rows, and only valid positions are
    gathered back. One kernel invocation per Arrow batch ≈ thousands of keys
    per call — the per-group Python overhead of even the in-memory pandas
    groupby disappears (this is what the scaling probe's many-short-series
    regime is bound by).
    """
    import numpy as np

    key_cols = list(key_cols)
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism * 2, 8)
    arranged = df.repartition(num_partitions, *key_cols).sortWithinPartitions(
        *key_cols, ts_col
    )
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf[key_cols]
        change = (keys != keys.shift()).any(axis=1).to_numpy()
        starts = np.flatnonzero(change)
        codes = np.cumsum(change) - 1
        lengths = np.diff(np.append(starts, len(pdf)))
        pos = np.arange(len(pdf)) - np.repeat(starts, lengths)
        mat = np.zeros((int(lengths.max()), len(starts)))
        vals = pdf[value_col].to_numpy(np.float64)
        mat[pos, codes] = vals
        out = matrix_kernel(mat)
        res = pdf.copy()
        res[out_col] = out[pos, codes]
        return res

    def fn(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            keys = pdf[key_cols]
            change = (keys != keys.shift()).any(axis=1).to_numpy()
            last_start = int(change.nonzero()[0][-1])
            if last_start == 0:
                carry = pdf
                continue
            carry = pdf.iloc[last_start:].reset_index(drop=True)
            yield run(pdf.iloc[:last_start].reset_index(drop=True))
        if carry is not None and len(carry):
            yield run(carry)

    return arranged.mapInPandas(fn, schema=schema)
