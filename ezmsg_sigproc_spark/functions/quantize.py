"""Quantize / digitize value encodings — precursors to compression.

Reference semantics:

- ``QuantizeTransformer`` (``src/ezmsg/sigproc/quantize.py:33-68``): clip to
  ``[min_val, max_val]``, scale to ``[0, 2^bits - 1]``, round, cast to the
  next-pow2 *unsigned* int type (bool/uint8/…/uint64; 64-bit edge guard
  ``clip_max *= 1 - 2e-16``).
- ``DigitizeTransformer`` (``src/ezmsg/sigproc/digitize.py:57-112``): map
  ``[min_val, max_val]`` onto the full *signed* int range of ``bits`` ∈
  {16, 32, 64}; stamps the inverse map into attrs: ``x ≈ data*conversion +
  offset`` with ``conversion = (max-min)/(2^bits - 1)`` and
  ``offset = (max+min)/2`` — here returned as literal columns so downstream
  tables carry the inverse map (the attrs → columns mapping of SURVEY.md §1.4).

Spark note: Spark has no unsigned types, so quantized codes are carried in the
next-wider signed integer column (values are the same non-negative codes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spark_int_type(bits_needed: int) -> str:
    for t, b in (("tinyint", 7), ("smallint", 15), ("int", 31), ("bigint", 63)):
        if bits_needed <= b:
            return t
    return "bigint"


def quantize(c: Column, min_val: float, max_val: float, bits: int) -> Column:
    """Unsigned quantization code in [0, 2**bits - 1] (reference quantize.py:33-68)."""
    n_levels = float(2**bits - 1)
    if bits >= 64:
        n_levels *= 1 - 2e-16  # reference's 64-bit float-cast edge guard
    clipped = F.greatest(F.least(c, F.lit(float(max_val))), F.lit(float(min_val)))
    code = F.round((clipped - min_val) / (max_val - min_val) * n_levels, 0)
    return code.cast(_spark_int_type(bits + 1))


def digitize(c: Column, min_val: float, max_val: float, bits: int = 16) -> tuple[Column, float, float]:
    """Signed digitization (reference digitize.py:57-112).

    Returns (code column, conversion, offset) with x ≈ code*conversion + offset.
    """
    span = max_val - min_val
    n_levels = float(2**bits - 1)
    if bits >= 64:
        n_levels *= 1 - 2e-16
    conversion = span / n_levels
    offset = (max_val + min_val) / 2.0
    clipped = F.greatest(F.least(c, F.lit(float(max_val))), F.lit(float(min_val)))
    code = F.round((clipped - offset) / conversion, 0)
    return code.cast(_spark_int_type(bits)), conversion, offset
