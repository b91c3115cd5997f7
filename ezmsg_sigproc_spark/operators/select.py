"""Selection / reshaping: slicer, transpose, flatten, extract-axis.

Reference (SURVEY.md §2.4):

- ``SlicerTransformer`` (``src/ezmsg/sigproc/slicer.py:58-316``): select along
  an axis by ints/slices/exact labels/**regex over labels** → filters on the
  label column (``isin`` / ``rlike``).
- ``TransposeTransformer`` (``transpose.py:41-130``): permute dims → column
  reorder (a no-op in long format — Tungsten owns memory layout).
- ``FlattenTransformer`` (``flatten.py:1-45``): collapse non-time dims into
  one coordinate axis with cartesian labels → ``concat_ws`` over key columns.
- ``ExtractAxisData`` (``extract_axis.py:14-38``): axis coordinates → data
  → ``select(ts)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def slice_by_labels(df: DataFrame, label_col: str, labels: Sequence[str]) -> DataFrame:
    """Exact-label selection with dedup + order normalization
    (reference slicer.py:241-299)."""
    uniq = list(dict.fromkeys(labels))
    return df.filter(F.col(label_col).isin(uniq))


def slice_by_regex(df: DataFrame, label_col: str, pattern: str) -> DataFrame:
    """Regex-over-labels selection (reference slicer.py:30-55)."""
    return df.filter(F.col(label_col).rlike(pattern))


def flatten_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    out_col: str = "flat_key",
    sep: str = ".",
) -> DataFrame:
    """Cartesian label join of several key columns into one (reference
    flatten.py:1-45 joins labels with a separator)."""
    return df.withColumn(out_col, F.concat_ws(sep, *[F.col(c).cast("string") for c in key_cols]))


def transpose(df: DataFrame, column_order: Sequence[str]) -> DataFrame:
    """Column reorder — the long-format analog of a dim permute."""
    return df.select(*column_order)


def extract_axis(df: DataFrame, key_cols: Sequence[str], ts_col: str = "ts") -> DataFrame:
    """Axis coordinates as data (reference extract_axis.py:14-38)."""
    return df.select(*key_cols, F.col(ts_col).alias("value"))


def as_array(df: DataFrame, col: str = "value", dtype: str = "double") -> DataFrame:
    """``AsArrayTransformer`` analog (reference ``asarray.py:83-116``): the
    reference converts message payloads to a concrete array backend
    (numpy/mlx/…); in Spark a DataFrame column already IS the columnar
    array, so the meaningful residue is the dtype conversion — a
    ``cast()`` that Tungsten executes in whole-stage codegen."""
    return df.withColumn(col, F.col(col).cast(dtype))


def materialize(df: DataFrame) -> DataFrame:
    """``MaterializeTransformer`` analog (reference ``materialize.py``): the
    reference drains the lazy generator chain to a concrete message; the
    Spark analog is an evaluation barrier — ``cache()`` + a forcing action,
    after which downstream consumers read the materialized partitions."""
    out = df.cache()
    out.count()
    return out
