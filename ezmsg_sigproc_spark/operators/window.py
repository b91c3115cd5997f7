"""Window segmentation: tumbling / sliding windows along the time axis.

Reference: ``WindowTransformer`` (``src/ezmsg/sigproc/window.py:61-273``) —
buffer + concat segmentation emitting ``(…, win, time, …)`` windows with
``window_dur`` / ``window_shift``; the sample-locked window length is
``int(window_dur * fs)`` and shift ``int(window_shift * fs)`` on the global
per-key sample index (same grid family as BinSchedule's sample-locked mode).

Batch formulation (chunk-invariant by definition):

- tumbling (shift == window): ``win_id = global_idx // win_len`` — pure
  column math, no duplication.
- sliding with hop: each sample lands in every window whose span covers it —
  expressed by generating the covering window ids with ``sequence`` +
  ``explode`` (row duplication factor = window/shift, exactly the data
  expansion any engine pays for overlapping windows).
- rolling frames (1-sample shift): ``Window.rowsBetween`` — no duplication.

For wall-clock windows on irregular streams use ``F.window(ts, dur, slide)``
(native Catalyst tumbling/sliding time windows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    idx_col: str = "gidx",
) -> DataFrame:
    """0-based per-key sample index in stream order (one shuffle on key)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    return df.withColumn(idx_col, F.row_number().over(w) - F.lit(1))


def tumbling_windows(
    df: DataFrame,
    win_len: int,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    win_col: str = "win_id",
    idx_col: str | None = None,
    drop_partial: bool = False,
) -> DataFrame:
    """Assign each sample its tumbling window id (``gidx // win_len``).

    ``drop_partial`` mirrors the reference's behavior of only emitting full
    windows (the trailing partial window stays in the buffer/carry).
    """
    if idx_col is None:
        df = with_global_index(df, key_cols, ts_col, "_w_gidx")
        idx_col = "_w_gidx"
    out = df.withColumn(win_col, (F.col(idx_col) / win_len).cast("bigint"))
    if drop_partial:
        n = F.count("*").over(Window.partitionBy(*key_cols))
        out = out.withColumn("_n", n).filter(
            (F.col(win_col) + 1) * win_len <= F.col("_n")
        ).drop("_n")
    return out.drop("_w_gidx") if "_w_gidx" in out.columns else out


def sliding_windows(
    df: DataFrame,
    win_len: int,
    shift: int,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    win_col: str = "win_id",
    drop_partial: bool = True,
    zero_pad: str = "none",
) -> DataFrame:
    """Duplicate each sample into every sliding window covering it.

    ``zero_pad`` mirrors the reference's deterministic ``zero_pad_until``
    modes (window.py:88-98):

    - ``'none'``: window w spans global indices ``[w·shift, w·shift+win_len)``
      and is emitted once the stream has the full window.
    - ``'shift'``: the buffer is pre-padded with ``win_len − shift`` zeros, so
      window w *ends* at index ``(w+1)·shift`` and is emitted once
      ``(w+1)·shift`` samples exist; leading windows are partial (their
      zero-pad is virtual — absent rows, the FFT/aggregate kernel's concern).

    (The reference's ``'input'`` mode depends on the first chunk's size — it
    is non-deterministic under chunking by the reference's own warning
    (window.py:117-121), so a batch engine deliberately does not offer it.)

    Implemented with ``sequence`` + ``explode`` (JVM-side generate, no UDF).
    """
    df = with_global_index(df, key_cols, ts_col, "_sw_gidx")
    # per-key *sample* count must be taken before the explode duplicates rows
    df = df.withColumn("_n", F.count("*").over(Window.partitionBy(*key_cols)))
    i = F.col("_sw_gidx")
    if zero_pad == "shift":
        # reference zero_pad_until='shift': the buffer is pre-padded with
        # n_keep = max(win_len − shift, 0) zeros and windows slide from padded
        # index 0 with stride `shift`, so window w covers STREAM indices
        # [w·shift − n_keep, w·shift − n_keep + win_len). For win ≥ shift this
        # is the ends-at-(w+1)·shift rule; for shift > win the pad is empty
        # and windows START at multiples of shift (the w=0 window is [0, win)).
        n_keep = max(win_len - shift, 0)
        w_lo = F.greatest(
            F.ceil((i + 1 - F.lit(win_len) + F.lit(n_keep)) / F.lit(shift)).cast("bigint"),
            F.lit(0),
        )
        w_hi = F.floor((i + F.lit(n_keep)) / F.lit(shift)).cast("bigint")
        lo_ok = i >= F.col(win_col) * shift - n_keep
        hi_ok = i < F.col(win_col) * shift - n_keep + win_len
        emit = F.col(win_col) * shift - n_keep + win_len <= F.col("_n")
    else:
        w_lo = F.greatest(F.ceil((i - F.lit(win_len) + 1) / F.lit(shift)).cast("bigint"), F.lit(0))
        w_hi = F.floor(i / F.lit(shift)).cast("bigint")
        lo_ok = i >= F.col(win_col) * shift
        hi_ok = i < F.col(win_col) * shift + win_len
        emit = F.col(win_col) * shift + win_len <= F.col("_n")
    out = (
        df.withColumn(win_col, F.explode(F.sequence(w_lo, w_hi)))
        .filter(lo_ok & hi_ok)
    )
    if drop_partial:
        out = out.filter(emit)
    return out.drop("_sw_gidx", "_n")


def rolling_agg(
    df: DataFrame,
    k: int,
    aggs: dict[str, str],
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    include_current: bool = True,
) -> DataFrame:
    """Trailing window of the last ``k`` samples: ``rowsBetween(-(k-1), 0)``
    (or ``(-k, -1)`` when ``include_current=False`` — the RollingScaler's
    stats-exclude-current semantics). ``aggs`` maps output column → op name
    in {mean, min, max, sum, std, count}."""
    hi = 0 if include_current else -1
    lo = -(k - 1) if include_current else -k
    w = Window.partitionBy(*key_cols).orderBy(ts_col).rowsBetween(lo, hi)
    fns = {
        "mean": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
        "std": F.stddev_pop, "count": F.count,
    }
    out = df
    for name, op in aggs.items():
        out = out.withColumn(name, fns[op](F.col(value_col)).over(w))
    return out
