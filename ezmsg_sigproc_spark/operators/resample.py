"""Resample / linear gap-fill onto a regular grid.

Reference: ``ResampleProcessor`` (``src/ezmsg/sigproc/resample.py:145-404``,
interpolation at 337-353): linear interpolation of the source samples onto a
reference grid via ``scipy.interpolate.interp1d(kind='linear')`` with
``fill_value='extrapolate'`` (linear from the end segments) or ``'last'``
(clamp to first/last sample value, ``resample.py:337-341``).

Batch formulation (the north star's "linear gap-fill for missing intervals"):

1. generate the per-key target grid with ``sequence`` + ``explode`` —
   grid point g_i = t0 + i·step, i ∈ [0, floor((t1-t0)/step)];
2. union grid points (null value) with the samples, one ordered window pass:
   bracketing sample before/after each grid point via
   ``last(value, ignorenulls)`` over the preceding frame and
   ``first(value, ignorenulls)`` over the following frame;
3. interpolate ``v = v_prev + (v_next - v_prev)·(t - t_prev)/(t_next - t_prev)``.

At an exact sample timestamp the weight is 0 ⇒ the sample value is reproduced
bit-for-bit. Everything is native Catalyst (sequence/explode/window frames) —
no UDF, chunking-free by construction.

Scale: the union + window sorts per key; grid density is bounded by
(span/step) so the row expansion is explicit and predictable. On a cluster
this is one shuffle on the key — same cost class as any ordered operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_linear(
    df: DataFrame,
    step: float,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    fill: str = "last",
    t0_col: str | None = None,
    t1_col: str | None = None,
) -> DataFrame:
    """Linear-interpolate each key's series onto the grid t0 + i*step.

    ``ts_col`` is treated as epoch-seconds double (cast). ``fill``:
      - ``'last'``  : clamp to first/last sample value outside the data span
        (matches reference fill_value='last'; inside the span this never
        triggers because the grid is bounded by [t0, t1]);
      - ``'null'``  : leave out-of-span grid points NULL;
      - ``'extrapolate'`` : linear extrapolation from the end segments.
    Output: (key…, ts, value) — one row per grid point.
    """
    t = F.col(ts_col).cast("double")

    samples = df.select(*key_cols, t.alias("_t"), F.col(value_col).cast("double").alias("_v"))

    # grid anchors: explicit per-key t0/t1 columns when given (external grid,
    # may exceed the data span — that is where 'extrapolate'/'last' fills
    # become observable), else the key's own data span
    g0 = F.min(F.col(t0_col).cast("double")) if t0_col else F.min(t)
    g1 = F.max(F.col(t1_col).cast("double")) if t1_col else F.max(t)
    grid = (
        df.groupBy(*key_cols)
        .agg(g0.alias("_g0"), g1.alias("_g1"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.floor((F.col("_g1") - F.col("_g0")) / F.lit(float(step))).cast("bigint"),
                )
            ).alias("_i"),
            F.col("_g0"),
        )
        .select(*key_cols, (F.col("_g0") + F.col("_i") * F.lit(float(step))).alias("_t"))
        .withColumn("_v", F.lit(None).cast("double"))
        .withColumn("_is_grid", F.lit(1))
    )

    # second-neighbor columns (previous/next sample seen from each sample) —
    # carried through the union so end-segment slopes for 'extrapolate' are a
    # running-window lookup, not an extra self-join
    w_samp = Window.partitionBy(*key_cols).orderBy("_t")
    samples = (
        samples.withColumn("_pv2", F.lag("_v").over(w_samp))
        .withColumn("_pt2", F.lag("_t").over(w_samp))
        .withColumn("_nv2", F.lead("_v").over(w_samp))
        .withColumn("_nt2", F.lead("_t").over(w_samp))
    )
    for c in ("_pv2", "_pt2", "_nv2", "_nt2"):
        grid = grid.withColumn(c, F.lit(None).cast("double"))

    both = samples.withColumn("_is_grid", F.lit(0)).unionByName(grid)

    # samples sort before grid points at identical _t — in BOTH scan
    # directions (ascending _is_grid even in the reversed scan) — so a grid
    # point coinciding with a sample sees it as prev AND next bracket; with a
    # descending tie-break the boundary grid row misses the equal-ts sample
    # and fill='null' wrongly returns NULL at the last sample.
    # NB: the "next" bracket is a running last() over the REVERSED order, not
    # first() over an unbounded-following frame — Spark recomputes following
    # frames from scratch per row (O(n²) per key), while running frames are
    # O(n).
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t"), F.col("_is_grid"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t").desc(), F.col("_is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    prev_v = F.last("_v", ignorenulls=True).over(w_prev)
    prev_t = F.last(F.when(F.col("_is_grid") == 0, F.col("_t")), ignorenulls=True).over(w_prev)
    next_v = F.last("_v", ignorenulls=True).over(w_next)
    next_t = F.last(F.when(F.col("_is_grid") == 0, F.col("_t")), ignorenulls=True).over(w_next)

    frac = (F.col("_t") - prev_t) / (next_t - prev_t)
    interp = F.when(
        prev_v.isNotNull() & next_v.isNotNull(),
        F.when(next_t == prev_t, prev_v).otherwise(prev_v + (next_v - prev_v) * frac),
    )
    if fill == "last":
        interp = interp.when(prev_v.isNotNull(), prev_v).when(next_v.isNotNull(), next_v)
    elif fill == "extrapolate":
        # end-segment linear extrapolation (observable when an external
        # t0/t1 grid exceeds the data span); single-sample keys clamp
        prev_pv = F.last("_pv2", ignorenulls=True).over(w_prev)
        prev_pt = F.last("_pt2", ignorenulls=True).over(w_prev)
        next_nv = F.last("_nv2", ignorenulls=True).over(w_next)
        next_nt = F.last("_nt2", ignorenulls=True).over(w_next)
        hi = F.when(
            prev_pv.isNotNull() & (prev_t != prev_pt),
            prev_v + (F.col("_t") - prev_t) * (prev_v - prev_pv) / (prev_t - prev_pt),
        ).otherwise(prev_v)
        lo = F.when(
            next_nv.isNotNull() & (next_nt != next_t),
            next_v + (F.col("_t") - next_t) * (next_nv - next_v) / (next_nt - next_t),
        ).otherwise(next_v)
        interp = interp.when(prev_v.isNotNull(), hi).when(next_v.isNotNull(), lo)

    out = (
        both.withColumn("_out", interp)
        .filter(F.col("_is_grid") == 1)
        .select(*key_cols, F.col("_t").alias(ts_col), F.col("_out").alias(value_col))
    )
    return out


def resample_onto(
    src: DataFrame,
    reference: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    fill: str = "last",
) -> DataFrame:
    """Interpolate ``src`` onto *another stream's* clock — the reference's
    primary mode (``resample.py:145-404`` with ``output_reference``: the grid
    is the reference stream's timestamps, not a synthesized rate).

    Same union + window-bracket plan as :func:`resample_linear`; the grid rows
    are the reference's (key, ts) pairs. ``fill='last'`` clamps outside the
    source span (interp1d fill_value='last'); ``'null'`` leaves them NULL.
    """
    t = F.col(ts_col).cast("double")
    samples = src.select(*key_cols, t.alias("_t"), F.col(value_col).cast("double").alias("_v")) \
        .withColumn("_is_grid", F.lit(0))
    grid = reference.select(*key_cols, t.alias("_t")) \
        .withColumn("_v", F.lit(None).cast("double")).withColumn("_is_grid", F.lit(1))
    both = samples.unionByName(grid)

    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t"), F.col("_is_grid"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # reversed running frame — see resample_linear for the O(n²) rationale
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t").desc(), F.col("_is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_v = F.last("_v", ignorenulls=True).over(w_prev)
    prev_t = F.last(F.when(F.col("_is_grid") == 0, F.col("_t")), ignorenulls=True).over(w_prev)
    next_v = F.last("_v", ignorenulls=True).over(w_next)
    next_t = F.last(F.when(F.col("_is_grid") == 0, F.col("_t")), ignorenulls=True).over(w_next)
    frac = (F.col("_t") - prev_t) / (next_t - prev_t)
    interp = F.when(
        prev_v.isNotNull() & next_v.isNotNull(),
        F.when(next_t == prev_t, prev_v).otherwise(prev_v + (next_v - prev_v) * frac),
    )
    if fill == "last":
        interp = interp.when(prev_v.isNotNull(), prev_v).when(next_v.isNotNull(), next_v)
    return (
        both.withColumn("_out", interp)
        .filter(F.col("_is_grid") == 1)
        .select(*key_cols, F.col("_t").alias(ts_col), F.col("_out").alias(value_col))
    )
