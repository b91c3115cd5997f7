"""First difference / derivative along the time axis.

Reference: ``DiffTransformer`` (``src/ezmsg/sigproc/diff.py:22-90``) — carries
the last sample across chunks so the batch equivalent is a per-key ordered
``lag``. ``scale_by_fs`` divides by dt → discrete derivative. The reference
emits the first output as 0 (diff against the carried sample; at stream start
the carry is empty → first diff drops/zero); we expose both behaviors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def diff(
    df: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "dvalue",
    scale_by_dt: bool = False,
    keep_first: bool = True,
) -> DataFrame:
    """``value - lag(value)`` per key in time order; optionally ``/ dt``.

    ``keep_first`` keeps the stream-start row with NULL diff; else drops it.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    v = F.col(value_col)
    d = v - F.lag(v).over(w)
    if scale_by_dt:
        t = F.col(ts_col).cast("double")
        d = d / (t - F.lag(t).over(w))
    out = df.withColumn(out_col, d)
    if not keep_first:
        out = out.filter(F.col(out_col).isNotNull())
    return out
