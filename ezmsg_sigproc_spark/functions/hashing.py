"""Positional series checksums — full-output-strength driver oracles.

The driver's value check hashes whole result frames, so a suite row that
carries only summary statistics (n, mean, last, weighted mean) could miss a
mid-series error that happens to preserve those four functionals (VERDICT r2
item 2). ``series_vhash`` condenses a FULL output vector into one BIGINT the
fixture generator (independent numpy implementation) and the Spark kernel
both compute: any single-sample difference at the rounding precision changes
the hash.

Design constraints:
 - must be computable in numpy (fixture generator + pandas kernels) AND in
   Spark SQL over per-sample rows (``vhash_agg``) — so no wrapping uint64
   mixes: Spark 4 runs ANSI mode where BIGINT overflow raises. Rounding is
   HALF_EVEN on both sides (numpy ``np.round`` / Spark ``F.bround``) so an
   exact .5 tie of the scaled value cannot make the two implementations of
   the "same" checksum diverge;
 - overflow-safe within a DOCUMENTED range: q_i = round(y_i·10^decimals),
   weight w_i = (i·2654435761 mod 65536) + 1 ≤ 2^16, so |Σ q_i·w_i| ≤
   max|q|·2^16·n. BIGINT (2^63 ≈ 9.2e18) therefore holds n = 10^7 samples
   only while max|q| = max|y|·10^decimals ≲ 1.4e7 (e.g. |y| < 10^3 at the
   default decimals=4) — NOT for arbitrary |y| < 10^9. ``series_vhash``
   asserts this envelope so a fixture whose values outgrow it fails loudly
   at generation time instead of raising inside a Spark ANSI aggregate;
 - position-sensitive: w_i is a pseudo-random 16-bit weight, so swaps and
   shifts change the sum; a lone altered sample always does (w_i ≥ 1);
 - the optional ``mod`` folds the sum into [0, mod) on BOTH sides (Python
   ``%`` and ``F.pmod`` agree on sign) for consumers that must carry the
   checksum in a double column: mod ≤ 2^31 keeps it exact in a float64 with
   ~6 orders of margin while staying position-sensitive.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

VHASH_DECIMALS = 4
VHASH_MULT = 2654435761  # Knuth multiplicative constant
VHASH_MOD = 65536


def _weights(n: int) -> np.ndarray:
    return (np.arange(n, dtype=np.int64) * VHASH_MULT) % VHASH_MOD + 1


def series_vhash(y: np.ndarray, decimals: int = VHASH_DECIMALS,
                 mod: int | None = None) -> int:
    """Positional checksum of one series (ts order)."""
    y = np.asarray(y, dtype=np.float64)
    q = np.round(y * 10.0**decimals).astype(np.int64)
    if q.size:
        # the overflow envelope from the module docstring: the weighted sum
        # must stay inside BIGINT on the Spark side too
        assert np.abs(q).max() * VHASH_MOD * q.size < 2**63, (
            "series_vhash overflow envelope exceeded: scale the series or "
            "lower decimals")
    h = int((q * _weights(q.size)).sum())
    return h % mod if mod is not None else h


def matrix_vhash(Y: np.ndarray, lengths: np.ndarray,
                 decimals: int = VHASH_DECIMALS) -> np.ndarray:
    """Per-column :func:`series_vhash` of a tail-padded (max_len × n_keys)
    matrix; column k hashes its first ``lengths[k]`` rows. Padding (which may
    hold garbage from non-causal kernels) is zeroed before rounding."""
    lengths = np.asarray(lengths, dtype=np.int64)
    mask = np.arange(Y.shape[0])[:, None] < lengths[None, :]
    q = np.round(np.where(mask, Y, 0.0) * 10.0**decimals).astype(np.int64)
    return (q * _weights(Y.shape[0])[:, None]).sum(axis=0)


def vhash_agg(value_col: str, pos_col: str,
              decimals: int = VHASH_DECIMALS,
              mod: int | None = None) -> Column:
    """Spark aggregate expression computing :func:`series_vhash` over
    per-sample rows: ``pos_col`` must be the 0-based position within the
    series (e.g. ``row_number() over (partition by key order by ts) - 1``).
    ``F.bround`` = HALF_EVEN, matching numpy's rounding on .5 ties (plain
    ``F.round`` is HALF_UP and would diverge from the fixture side there).
    ANSI-safe within the module-docstring envelope; pass ``mod`` when the
    result must ride in a double column (see module docstring)."""
    q = F.bround(F.col(value_col) * F.lit(float(10**decimals))).cast("bigint")
    w = F.pmod(F.col(pos_col).cast("bigint") * F.lit(VHASH_MULT), F.lit(VHASH_MOD)) + F.lit(1)
    s = F.sum(q * w)
    return F.pmod(s, F.lit(mod)) if mod is not None else s
