"""Aggregations: full-axis, ranged (coordinate bands), and binned (tumbling).

Mirrors the reference's three aggregate operators (SURVEY.md §2.1):

- ``AggregateTransformer`` (``src/ezmsg/sigproc/aggregate.py:347-395``):
  reduce the whole axis → :func:`full_aggregate` = ``groupBy(key).agg(...)``.
- ``RangedAggregateTransformer`` (``aggregate.py:216-334``): aggregate within
  coordinate bands → :func:`ranged_aggregate` = bucketize + groupBy.
- ``BinnedAggregateTransformer`` (``binned_aggregate.py:134-301``): tumbling
  fixed-duration bins on the BinSchedule grid → :func:`binned_aggregate`;
  a tuple of operations yields one column per op (the reference's stacked
  "metric" axis, e.g. the (MIN, MAX) envelope of ``binned_aggregate.py:70-83``).

Aggregation functions (reference ``aggregate.py:34-74``): max min mean median
std sum, nan-variants, argmin argmax (→ coordinate via min_by/max_by),
trapezoid (needs x-coordinates — see :func:`trapezoid_aggregate`).

Semantics notes:
- STD is numpy default ddof=0 → ``stddev_pop``.
- MEDIAN is exact (``F.median``), not approximate.
- Spark aggregates skip NULL but *propagate* NaN, the opposite of numpy's
  nan-variants — nan-ops therefore map NaN→NULL first. Plain ops on data
  containing NaN return NaN, matching numpy's non-nan variants.

All of this is native Catalyst — partial (map-side) aggregation, whole-stage
codegen, AQE-coalesced shuffle — exactly the "decomposable partials" the
tiered rollup plan (plans/rollup_tiers.py) relies on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.binning import bin_index_col, samples_per_bin


def _nan_to_null(c: Column) -> Column:
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def agg_expr(op: str, value_col: str, coord_col: str | None = None) -> Column:
    """One aggregate Column for ``op`` over ``value_col``.

    ``coord_col`` supplies the x-coordinates required by argmin/argmax
    (reference converts index → coordinate, ``aggregate.py:203-211``).
    """
    v = F.col(value_col)
    nn = _nan_to_null(v)
    ops: dict[str, Column] = {
        "max": F.max(v),
        "min": F.min(v),
        "mean": F.avg(v),
        "median": F.median(v),
        "std": F.stddev_pop(v),
        "sum": F.sum(v),
        "count": F.count(v),
        "nanmax": F.max(nn),
        "nanmin": F.min(nn),
        "nanmean": F.avg(nn),
        "nanmedian": F.median(nn),
        "nanstd": F.stddev_pop(nn),
        "nansum": F.sum(F.coalesce(nn, F.lit(0.0))),
    }
    if op in ops:
        return ops[op]
    if op in ("argmin", "argmax"):
        if coord_col is None:
            raise ValueError(f"{op} needs coord_col (reference aggregate.py:186-196)")
        fn = F.min_by if op == "argmin" else F.max_by
        return fn(F.col(coord_col), v)
    raise ValueError(f"unknown aggregation op {op!r}")


def full_aggregate(
    df: DataFrame,
    ops: Sequence[str],
    key_cols: Sequence[str] = ("key",),
    value_col: str = "value",
    coord_col: str | None = None,
) -> DataFrame:
    """Reduce the whole (time) axis per key — one output row per key."""
    aggs = [agg_expr(op, value_col, coord_col).alias(op) for op in ops]
    return df.groupBy(*key_cols).agg(*aggs)


def ranged_aggregate(
    df: DataFrame,
    bands: Sequence[tuple[float, float]],
    ops: Sequence[str],
    key_cols: Sequence[str] = ("key",),
    value_col: str = "value",
    band_col: str = "band_id",
    band_on: str | None = None,
) -> DataFrame:
    """Aggregate within coordinate bands ``[(lo, hi)], …`` (inclusive bounds,
    matching the reference's slice resolution over sorted coordinates,
    ``aggregate.py:261-290``). ``band_on`` is the column the bands select on
    (default: the value column itself, e.g. a frequency coordinate).

    Implemented as a bucketize (chained ``when``) + groupBy — for many bands
    this is equivalent to a broadcast range-join against a bands table.
    """
    sel = F.col(band_on or value_col)
    bucket = F.lit(None).cast("int")
    for i, (lo, hi) in reversed(list(enumerate(bands))):
        bucket = F.when((sel >= lo) & (sel <= hi), F.lit(i)).otherwise(bucket)
    aggs = [agg_expr(op, value_col).alias(op) for op in ops]
    return (
        df.withColumn(band_col, bucket)
        .filter(F.col(band_col).isNotNull())
        .groupBy(*key_cols, band_col)
        .agg(*aggs)
    )


def binned_aggregate(
    df: DataFrame,
    bin_duration: float,
    fs: float,
    ops: Sequence[str],
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    fractional: bool = True,
    bin_col: str = "bin_m",
    bin_ts_col: str = "bin_ts",
) -> DataFrame:
    """Tumbling fixed-duration bins on the BinSchedule grid (index-based law).

    Output: one row per (key, bin_m) with one column per op plus ``bin_ts`` =
    the bin's nominal start time ``stream_t0 + m * output_gain``
    (reference ``binning.py:165-174``).
    """
    spb = samples_per_bin(bin_duration, fs, fractional)
    gain_out = bin_duration if fractional else spb / fs
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    gidx = F.row_number().over(w) - F.lit(1)
    t0 = F.min(ts_col).over(Window.partitionBy(*key_cols))
    binned = df.withColumn(bin_col, bin_index_col(gidx, spb)).withColumn("_t0", t0)
    aggs = [agg_expr(op, value_col).alias(op) for op in ops]
    return (
        binned.groupBy(*key_cols, bin_col)
        .agg(F.first("_t0").alias("_t0"), *aggs)
        .withColumn(bin_ts_col, F.col("_t0") + F.col(bin_col) * F.lit(gain_out))
        .drop("_t0")
    )


def time_binned_aggregate(
    df: DataFrame,
    bin_seconds: float,
    ops: Sequence[str],
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    bin_col: str = "bin_m",
) -> DataFrame:
    """Tumbling bins on absolute wall-clock time (epoch-anchored).

    For irregular event streams (no fixed fs) this is the natural rollup grid
    and is what the tiered 1m/1h/1d continuous aggregates use — it composes
    exactly across tiers because 60 | 3600 | 86400. ``ts_col`` may be a
    timestamp (cast to epoch-seconds double) or a double.
    """
    epoch = F.col(ts_col).cast("double")
    b = F.floor(epoch / F.lit(float(bin_seconds))).cast("bigint")
    aggs = [agg_expr(op, value_col).alias(op) for op in ops]
    return df.withColumn(bin_col, b).groupBy(*key_cols, bin_col).agg(*aggs)


def trapezoid_aggregate(
    df: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "trapz",
) -> DataFrame:
    """np.trapezoid over the (ts, value) samples per key:
    ``sum((v_i + v_{i+1})/2 * (t_{i+1} - t_i))`` — an ordered window + sum
    (reference ``aggregate.py:186-196``)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    t = F.col(ts_col).cast("double")
    v = F.col(value_col)
    seg = (v + F.lead(v).over(w)) / 2.0 * (F.lead(t).over(w) - t)
    return (
        df.withColumn("_seg", seg)
        .groupBy(*key_cols)
        .agg(F.sum("_seg").alias(out_col))
    )
