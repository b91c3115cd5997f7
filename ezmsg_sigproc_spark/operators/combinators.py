"""Multi-stream combinators: align, concat, merge, add/difference, sampler.

Reference (SURVEY.md §2.7):

- ``AlignAlongAxisProcessor`` (``src/ezmsg/sigproc/align.py:48-237``): buffer
  two streams, seek to the overlapping time span, emit equal-length pairs →
  batch equivalent is an **inner equi-join on (key, ts)** (the join subsumes
  the buffering; non-overlapping prefixes/suffixes drop exactly as the
  reference drops them).
- ``ConcatProcessor`` (``concat.py:421-574``): concat along a new axis →
  wide: join + select both value columns; long: ``unionByName`` with a
  side-label column.
- ``Merge`` (``merge.py:49-147``): Align → Concat composition.
- ``AddProcessor`` / ``DifferenceProcessor`` (``math/add.py:47-96``,
  ``math/difference.py:63-140``): FIFO-paired elementwise ± → join + arith.
- ``SamplerTransformer`` (``sampler.py:79-190``): for each trigger
  ``(timestamp, period=(pre, post))`` emit signal slice
  ``ts ∈ [trig+pre, trig+post)`` → a **range join**, with the small trigger
  side broadcast (the classic broadcast-range-join physical plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_streams(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    a_name: str = "a",
    b_name: str = "b",
) -> DataFrame:
    """Inner join on (key, ts): rows where both streams have a sample."""
    on = [*key_cols, ts_col]
    return (
        a.select(*on, F.col(value_col).alias(a_name))
        .join(b.select(*on, F.col(value_col).alias(b_name)), on=on, how="inner")
    )


def add_streams(a: DataFrame, b: DataFrame, **kw) -> DataFrame:
    j = align_streams(a, b, **kw)
    return j.withColumn("sum_ab", F.col(kw.get("a_name", "a")) + F.col(kw.get("b_name", "b")))


def difference_streams(a: DataFrame, b: DataFrame, **kw) -> DataFrame:
    j = align_streams(a, b, **kw)
    return j.withColumn("diff_ab", F.col(kw.get("a_name", "a")) - F.col(kw.get("b_name", "b")))


def concat_streams_long(
    a: DataFrame,
    b: DataFrame,
    label_col: str = "stream",
    a_label: str = "a",
    b_label: str = "b",
) -> DataFrame:
    """Concat along a new axis in long format (side-label column)."""
    return a.withColumn(label_col, F.lit(a_label)).unionByName(
        b.withColumn(label_col, F.lit(b_label))
    )


def sampler(
    signal: DataFrame,
    triggers: DataFrame,
    pre_s: float,
    post_s: float,
    key_cols: Sequence[str] = (),
    ts_col: str = "ts",
    trig_ts_col: str = "trig_ts",
    trigger_id_col: str = "trigger_id",
    broadcast_triggers: bool = True,
) -> DataFrame:
    """Trigger-windowed sampling: signal rows with
    ``trig_ts + pre_s <= ts < trig_ts + post_s`` per trigger (reference
    ``sampler.py:144-151``: ``searchsorted(..., t0, 'left')`` /
    ``(t1, 'left')`` ⇒ inclusive start, exclusive end).

    Triggers are broadcast (small side) so the range join needs no shuffle of
    the big signal table — at 100 TB this is the only viable physical plan
    short of bucketed interval indexing.
    """
    t = F.col(ts_col).cast("double")
    trig = F.broadcast(triggers) if broadcast_triggers else triggers
    cond = (t >= F.col(trig_ts_col).cast("double") + pre_s) & (
        t < F.col(trig_ts_col).cast("double") + post_s
    )
    for k in key_cols:
        cond = cond & (signal[k] == trig[k])
    return signal.join(trig, on=cond, how="inner")


def sampler_complete(
    signal: DataFrame,
    triggers: DataFrame,
    pre_s: float,
    post_s: float,
    key_cols: Sequence[str] = (),
    ts_col: str = "ts",
    trig_ts_col: str = "trig_ts",
    trigger_id_col: str = "trigger_id",
) -> DataFrame:
    """Sampler with the reference's late/early-trigger drop rules
    (``sampler.py:152-176``): a trigger only emits if its whole window lies
    within the buffered span — triggers whose window starts before the
    stream's first sample or ends after its last are dropped (in streaming,
    such windows never fill; at stream end they never emit)."""
    span_keys = list(key_cols) if key_cols else []
    if span_keys:
        span = signal.groupBy(*span_keys).agg(
            F.min(F.col(ts_col).cast("double")).alias("_t_min"),
            F.max(F.col(ts_col).cast("double")).alias("_t_max"),
        )
        trig = triggers.join(F.broadcast(span), on=span_keys)
    else:
        row = signal.agg(
            F.min(F.col(ts_col).cast("double")).alias("_t_min"),
            F.max(F.col(ts_col).cast("double")).alias("_t_max"),
        )
        trig = triggers.crossJoin(F.broadcast(row))
    tt = F.col(trig_ts_col).cast("double")
    trig = trig.filter(
        (tt + pre_s >= F.col("_t_min")) & (tt + post_s <= F.col("_t_max"))
    ).drop("_t_min", "_t_max")
    return sampler(signal, trig, pre_s, post_s, key_cols, ts_col, trig_ts_col,
                   trigger_id_col)
