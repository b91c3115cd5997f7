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


def _round_half_away(c: Column) -> Column:
    """floor(x + 0.5) for non-negative x / sign-symmetric for negative —
    explicit rounding so the result is identical across engines (Spark
    F.round is HALF_UP, numpy/DuckDB round are HALF_EVEN; at exact .5
    midpoints they disagree)."""
    return F.when(c >= 0, F.floor(c + F.lit(0.5))).otherwise(-F.floor(-c + F.lit(0.5)))


def quantize(c: Column, min_val: float, max_val: float, bits: int) -> Column:
    """Unsigned quantization code in [0, 2**bits - 1] (reference quantize.py:33-68).

    ``bits`` is capped at 62: Spark has no unsigned/128-bit integer column, so
    codes near 2^63-1 would overflow the widest signed type (bigint). The
    reference's uint64 mode has no lossless Spark carrier — callers needing
    more headroom should store the unrounded double.

    Rounding is explicit half-away-from-zero (``floor(x+0.5)`` on the
    non-negative code scale): deterministic and engine-independent, unlike
    HALF_UP-vs-HALF_EVEN library rounds. This deliberately diverges from
    numpy's banker's rounding at exact .5 midpoints (documented divergence;
    midpoints are measure-zero for real signals).
    """
    if bits > 62:
        raise ValueError(
            f"bits={bits} cannot be carried losslessly in a Spark signed "
            "integer column (max 62); store doubles or split the code"
        )
    n_levels = float(2**bits - 1)
    clipped = F.greatest(F.least(c, F.lit(float(max_val))), F.lit(float(min_val)))
    code = _round_half_away((clipped - min_val) / (max_val - min_val) * n_levels)
    return code.cast(_spark_int_type(bits + 1))


def digitize(c: Column, min_val: float, max_val: float, bits: int = 16) -> tuple[Column, float, float]:
    """Signed digitization (reference digitize.py:57-112).

    Returns (code column, conversion, offset) with x ≈ code*conversion + offset.
    ``bits`` ∈ {16, 32, 64} in the reference; capped at 63 here (signed bigint
    carries the full signed-64 range except −2^63 itself, which the clip to
    [min_val, max_val] already excludes). Same explicit half-away rounding as
    :func:`quantize`.
    """
    if bits > 63:
        raise ValueError(f"bits={bits} exceeds Spark's signed-64 code carrier")
    span = max_val - min_val
    n_levels = float(2**bits - 1)
    if bits >= 63:
        n_levels *= 1 - 2e-16  # reference's 64-bit float-cast edge guard
    conversion = span / n_levels
    offset = (max_val + min_val) / 2.0
    clipped = F.greatest(F.least(c, F.lit(float(max_val))), F.lit(float(min_val)))
    code = _round_half_away((clipped - offset) / conversion)
    return code.cast(_spark_int_type(bits)), conversion, offset
