"""Affine / linear channel transforms: y = A·x (+ b), common-average
reference, per-channel linear maps.

Reference: ``AffineTransformTransformer`` (``src/ezmsg/sigproc/
affinetransform.py:1-46``): matrix multiply across the channel axis, with
common-rereference matrices (CAR) as the canonical use; ``CommonRereference``
subtracts the cross-channel mean. ``LinearTransformTransformer``
(``linear.py:43-116``): per-element scale+offset along an axis.

Long-format Spark realization: the channel axis is a key column, so A·x is a
**broadcast join against the coefficient table + groupBy(ts) sum** — pure
Catalyst, no UDF, and the small matrix broadcasts to every executor exactly
like a dimension table. CAR is a single window aggregate over the channel
dimension (no join at all).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def affine_transform(
    spark: SparkSession,
    df: DataFrame,
    weights: np.ndarray,
    in_channels: Sequence[str],
    out_channels: Sequence[str],
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    ch_col: str = "ch",
    value_col: str = "value",
    offsets: np.ndarray | None = None,
) -> DataFrame:
    """y[out] = Σ_in A[out, in]·x[in] (+ b[out]) at every (key, ts).

    ``weights`` is (n_out, n_in). The coefficient table is broadcast; the sum
    is a map-side-combinable groupBy.
    """
    rows = [
        (in_channels[i], out_channels[o], float(weights[o, i]))
        for o in range(weights.shape[0])
        for i in range(weights.shape[1])
        if weights[o, i] != 0.0
    ]
    coef = spark.createDataFrame(rows, f"{ch_col} string, out_ch string, w double")
    joined = df.join(F.broadcast(coef), on=ch_col)
    out = (
        joined.groupBy(*key_cols, ts_col, "out_ch")
        .agg(F.sum(F.col(value_col) * F.col("w")).alias(value_col))
        .withColumnRenamed("out_ch", ch_col)
    )
    if offsets is not None:
        off = spark.createDataFrame(
            [(out_channels[o], float(offsets[o])) for o in range(len(out_channels))],
            f"{ch_col} string, b double",
        )
        out = out.join(F.broadcast(off), on=ch_col).withColumn(
            value_col, F.col(value_col) + F.col("b")
        ).drop("b")
    return out


def common_average_reference(
    df: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    ch_col: str = "ch",
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """CAR: x_ch − mean over channels at the same (key, ts) — the reference's
    canonical rereference matrix (I − 1/n), expressed as one window aggregate."""
    w = Window.partitionBy(*key_cols, ts_col)
    return df.withColumn(out_col or value_col, F.col(value_col) - F.avg(value_col).over(w))
