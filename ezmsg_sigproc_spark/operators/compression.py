"""Gorilla-style time-series compression: delta-of-delta timestamps + XOR values.

Published algorithm: Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", VLDB 2015 (Facebook). The reference repo has no
compression beyond its Quantize/Digitize value encodings
(``src/ezmsg/sigproc/quantize.py:33-68``, ``digitize.py:57-112``); this kernel
is the north star's storage codec for rolled-up points.

Encoding (per series, timestamps sorted ascending):

- timestamps: first as 64-bit, then delta, then delta-of-delta with the
  paper's variable-length buckets {0: '0', [-63,64): '10'+8b,
  [-255,256): '110'+10b, [-2047,2048): '1110'+13b, else: '1111'+64b}.
- values: float64 bit patterns; XOR with predecessor; '0' if identical, else
  '11' + 5b leading-zero count + 6b (length−1) + meaningful bits. (The
  paper's extra '10' previous-window-reuse mode is deliberately not emitted:
  its control decision is inherently sequential, and dropping it lets the
  whole encoder run as vectorized numpy — a fraction of a bit per changed
  value traded for an order-of-magnitude faster, linearly-scaling kernel.
  The decoder still accepts both modes.)

The encoders are fully vectorized: every point contributes one or two
variable-width bit fields, materialized as (uint64 value, nbits) arrays and
scattered into the output bit array with fancy indexing — zero per-point
Python. The kernel runs once per (key, bucket) group under ``applyInPandas``.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class _BitReader:
    """O(1)-per-field bit reader over 64-bit words.

    A field (≤64 bits) spans at most two adjacent big-endian words; reading is
    two small-int shifts and a mask. (The previous single-big-int design shifted
    the ENTIRE remaining stream on every read — O(block) per field, O(block²)
    per decode — which made decode the scaling bottleneck of round 1's bench.)
    """

    __slots__ = ("_w", "pos")

    def __init__(self, data: bytes):
        pad = (-len(data)) % 8
        if pad:
            data = data + b"\x00" * pad
        # plain Python ints (via tolist) — indexing a list of ints is ~3×
        # faster than per-element numpy scalar extraction in a tight loop
        self._w = np.frombuffer(data, dtype=">u8").tolist() + [0]
        self.pos = 0

    def read_bits(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        wi = p >> 6
        off = p & 63
        end = off + n
        w = self._w
        if end <= 64:
            return (w[wi] >> (64 - end)) & ((1 << n) - 1)
        lo_bits = end - 64
        return (((w[wi] << lo_bits) | (w[wi + 1] >> (64 - lo_bits))) & ((1 << n) - 1))


def _pack_varbits(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Concatenate variable-width big-endian bit fields — fully vectorized.

    ``values[i]``'s low ``nbits[i]`` bits are appended in order. Fields with
    nbits == 0 contribute nothing. Implementation: expand every value to its
    64-bit big-endian bit row, then scatter the wanted low slices into one
    flat bit array via an arange/offset index computation.
    """
    values = np.ascontiguousarray(values, dtype=np.uint64)
    nbits = np.asarray(nbits, dtype=np.int32)
    keep = nbits > 0
    values, nbits = values[keep], nbits[keep]
    if values.size == 0:
        return b""
    chunks = []
    CH = 1 << 16  # fields per chunk — keeps the per-chunk bit matrix and
    # index arrays cache-resident (large matrices saturate memory bandwidth
    # and destroy multi-core scaling)
    for lo in range(0, values.size, CH):
        v = values[lo : lo + CH]
        nb = nbits[lo : lo + CH]
        # only unpack as many low bytes as the chunk's widest field needs
        wbytes = max(1, (int(nb.max()) + 7) // 8)
        wcols = wbytes * 8
        be = v.view(np.uint8).reshape(-1, 8)[:, ::-1][:, 8 - wbytes :]
        bits = np.unpackbits(np.ascontiguousarray(be), axis=1)
        total = int(nb.sum())
        starts = np.cumsum(nb, dtype=np.int32) - nb
        flat = np.arange(total, dtype=np.int32)
        rows = np.repeat(np.arange(v.size, dtype=np.int32), nb)
        # flat source index into the raveled bit matrix: row*wcols + column
        # of the field's low-nbits slice
        src = rows * wcols + (flat - np.repeat(starts, nb) + (wcols - np.repeat(nb, nb)))
        chunks.append(bits.ravel()[src])
    return np.packbits(np.concatenate(chunks) if len(chunks) > 1 else chunks[0]).tobytes()


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (already sorted) — vectorized."""
    ts = np.asarray(ts, dtype=np.int64)
    n = ts.size
    vals = np.zeros(2 + 2 * max(n - 2, 0), dtype=np.uint64)
    bits = np.zeros_like(vals, dtype=np.int64)
    vals[0], bits[0] = np.uint64(ts[0]), 64
    if n == 1:
        return _pack_varbits(vals[:1], bits[:1])
    deltas = np.diff(ts)
    vals[1], bits[1] = np.uint64(deltas[0]), 64
    if n > 2:
        dod = np.diff(deltas)
        # bucket prefixes: 0:'0', 1:'10'+8b, 2:'110'+10b, 3:'1110'+13b, 4:'1111'+64b
        bucket = np.select(
            [dod == 0,
             (dod >= -64) & (dod < 64),
             (dod >= -256) & (dod < 256),
             (dod >= -2048) & (dod < 2048)],
            [0, 1, 2, 3],
            default=4,  # 64-bit catch-all (widened from the paper's 32 so
        )               # arbitrary µs-scale retention gaps roundtrip)
        prefix_val = np.array([0b0, 0b10, 0b110, 0b1110, 0b1111], dtype=np.uint64)[bucket]
        prefix_len = np.array([1, 2, 3, 4, 4], dtype=np.int64)[bucket]
        pay_len = np.array([0, 8, 10, 13, 64], dtype=np.int64)[bucket]
        half = np.array([0, 64, 256, 2048, 0], dtype=np.int64)[bucket]
        payload = np.where(bucket == 4, dod.view(np.uint64),
                           (dod + half).astype(np.int64).view(np.uint64))
        vals[2::2], bits[2::2] = prefix_val, prefix_len
        vals[3::2], bits[3::2] = payload, pay_len
    return _pack_varbits(vals, bits)


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    r = _BitReader(data)
    rb = r.read_bits
    t0 = rb(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    out = [t0]
    if n == 1:
        return np.array(out, dtype=np.int64)
    delta = rb(64)
    if delta >= 1 << 63:
        delta -= 1 << 64
    t = t0 + delta
    out.append(t)
    for _ in range(n - 2):
        if rb(1) == 0:
            pass
        elif rb(1) == 0:
            delta += rb(8) - 64
        elif rb(1) == 0:
            delta += rb(10) - 256
        elif rb(1) == 0:
            delta += rb(13) - 2048
        else:
            v = rb(64)
            delta += v - (1 << 64) if v >= (1 << 63) else v
        t += delta
        out.append(t)
    return np.array(out, dtype=np.int64)


def encode_values(vals: np.ndarray) -> bytes:
    """Gorilla XOR float64 encoding — vectorized ('0' / '11' modes)."""
    u = np.asarray(vals, dtype=np.float64).view(np.uint64)
    n = u.size
    vfields = np.zeros(1 + 2 * max(n - 1, 0), dtype=np.uint64)
    bfields = np.zeros_like(vfields, dtype=np.int64)
    vfields[0], bfields[0] = u[0], 64
    if n > 1:
        x = u[1:] ^ u[:-1]
        nz = x != 0
        # trailing zeros: the isolated low bit is a power of two, so float64
        # log2 of it is exact
        lowbit = x & (~x + np.uint64(1))
        tail = np.where(nz, np.log2(np.maximum(lowbit, np.uint64(1)).astype(np.float64)), 0).astype(np.int64)
        # leading zeros: float64 may round a 53+-bit x up across a power of
        # two, making the estimated bit-length one too large — that only
        # shrinks `lead`, which is safe (an extra leading bit is emitted,
        # never a dropped one)
        bl = np.floor(np.log2(np.maximum(x, np.uint64(1)).astype(np.float64))).astype(np.int64) + 1
        lead = np.clip(64 - bl, 0, 31)  # 5-bit leading-zero field cap (per paper)
        nb = 64 - lead - tail
        header = (np.uint64(0b11) << np.uint64(11)) | (
            lead.astype(np.uint64) << np.uint64(6)
        ) | (nb - 1).astype(np.uint64)
        vfields[1::2] = np.where(nz, header, np.uint64(0))
        bfields[1::2] = np.where(nz, 13, 1)
        vfields[2::2] = x >> tail.astype(np.uint64)
        bfields[2::2] = np.where(nz, nb, 0)
    return _pack_varbits(vfields, bfields)


def decode_values(data: bytes, n: int) -> np.ndarray:
    r = _BitReader(data)
    rb = r.read_bits
    cur = rb(64)
    out = [cur]
    lead, tail = 65, 0
    for _ in range(n - 1):
        if rb(1) == 0:
            out.append(cur)
            continue
        if rb(1) == 0:
            nb = 64 - lead - tail
        else:
            lead = rb(5)
            nb = rb(6) + 1
            tail = 64 - lead - nb
        cur ^= rb(nb) << tail
        out.append(cur)
    return np.array(out, dtype=np.uint64).view(np.float64)


def gorilla_roundtrip_stats(ts: np.ndarray, vals: np.ndarray, verify_points: int | None = None) -> dict:
    """Encode and verify. ``verify_points=None`` decodes the whole block;
    an int decodes only that prefix (the stream is sequential, so a prefix
    decode exercises every field type without paying for the full block);
    0 skips verification (``roundtrip_ok`` reports True vacuously,
    ``verified_points`` says 0)."""
    tb = encode_timestamps(ts)
    vb = encode_values(vals)
    n = len(ts)
    k = n if verify_points is None else min(int(verify_points), n)
    ok = True
    if k > 0:
        ok = bool(
            np.array_equal(decode_timestamps(tb, k), np.asarray(ts[:k], dtype=np.int64))
            and np.array_equal(
                decode_values(vb, k).view(np.uint64),
                np.asarray(vals[:k], np.float64).view(np.uint64),
            )
        )
    return {
        "n_points": n,
        "ts_bytes": len(tb),
        "val_bytes": len(vb),
        "bytes_per_point": (len(tb) + len(vb)) / max(n, 1),
        "roundtrip_ok": ok,
        "verified_points": k,
    }


def gorilla_compress(
    df: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    ts_scale: float = 1_000_000.0,
    verify: str = "full",
    sample_mod: int = 16,
) -> DataFrame:
    """Per-key Gorilla blocks: one output row per key with the encoded blobs
    and size stats. ``ts_scale`` converts the (double, seconds) ts column to
    integer units (default µs) for delta-of-delta coding.

    ``verify``: decode-back policy. ``'full'`` decodes every block (tests /
    small data); ``'sample'`` fully decodes a deterministic 1-in-``sample_mod``
    subset of keys (zlib.crc32 of the key tuple) and prefix-decodes 64 points
    of the rest — every block still checks all field types, but decode cost no
    longer scales with total points; ``'none'`` skips decoding. The decoder is
    pure sequential Python (variable-length bit fields have a data-dependent
    parse position), so always-on full verification would put an O(points)
    interpreter loop in the write path — the round-1 scaling bottleneck.
    Output column ``verified_points`` records per-block coverage honestly.

    Scale note: at 100 TB this runs per (key, time-bucket) so blocks stay
    bounded; see plans/rollup_tiers for the bucketed variant.
    """
    import zlib

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts = np.round(pdf[ts_col].to_numpy(np.float64) * ts_scale).astype(np.int64)
        vals = pdf[value_col].to_numpy(np.float64)
        if verify == "full":
            vp = None
        elif verify == "none":
            vp = 0
        else:
            keyrep = "|".join(str(pdf[c].iloc[0]) for c in key_cols)
            vp = None if zlib.crc32(keyrep.encode()) % sample_mod == 0 else 64
        st = gorilla_roundtrip_stats(ts, vals, verify_points=vp)
        row = {c: [pdf[c].iloc[0]] for c in key_cols}
        row.update(
            n_points=[st["n_points"]],
            ts_bytes=[st["ts_bytes"]],
            val_bytes=[st["val_bytes"]],
            bytes_per_point=[st["bytes_per_point"]],
            roundtrip_ok=[st["roundtrip_ok"]],
            verified_points=[st["verified_points"]],
        )
        return pd.DataFrame(row)

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in key_cols
    )
    schema = (
        key_schema
        + ", n_points bigint, ts_bytes bigint, val_bytes bigint, bytes_per_point double,"
        + " roundtrip_ok boolean, verified_points bigint"
    )
    # partition-level lift: blocks are numerous and small at scale (one per
    # (key, time-bucket)), so the per-group Arrow crossing of plain
    # applyInPandas dominates; group_apply_sorted enters Python once per
    # Arrow batch instead (see serieslift module docstring)
    from .serieslift import group_apply_sorted

    return group_apply_sorted(df, kernel, key_cols, ts_col, schema)
