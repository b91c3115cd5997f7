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
    emit_blobs: bool = False,
) -> DataFrame:
    """Per-key Gorilla blocks: one output row per key with size stats and —
    when ``emit_blobs`` — the encoded ``ts_blob``/``val_blob`` binary columns
    (the storage representation; :func:`gorilla_decode` reads them back).
    ``ts_scale`` converts the (double, seconds) ts column to integer units
    (default µs) for delta-of-delta coding.

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

    key_cols = list(key_cols)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in key_cols
    )
    schema = (
        key_schema
        + ", n_points bigint, ts_bytes bigint, val_bytes bigint, bytes_per_point double,"
        + " roundtrip_ok boolean, verified_points bigint"
    )
    if emit_blobs:
        schema += ", ts_blob binary, val_blob binary"

    def encode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        """pdf: (key, ts)-sorted rows for ≥1 complete blocks. The ENCODE of
        every block in the batch is one vectorized pass (encode_*_blocks);
        only the decode-back verification walks sampled blocks in Python."""
        keys = pdf[key_cols]
        change = (keys != keys.shift()).any(axis=1).to_numpy()
        starts = np.concatenate([np.flatnonzero(change), [len(pdf)]])
        ts = np.round(pdf[ts_col].to_numpy(np.float64) * ts_scale).astype(np.int64)
        vals = pdf[value_col].to_numpy(np.float64)
        tb = encode_timestamp_blocks(ts, starts)
        vb = encode_value_blocks(vals, starts)
        n_blocks = len(tb)
        lengths = np.diff(starts)
        rows = {c: pdf[c].to_numpy()[starts[:-1]] for c in key_cols}
        ok = np.ones(n_blocks, dtype=bool)
        vps = np.zeros(n_blocks, dtype=np.int64)
        for b in range(n_blocks):
            s, e = int(starts[b]), int(starts[b + 1])
            if verify == "full":
                vp = e - s
            elif verify == "none":
                vp = 0
            else:
                # 1-in-sample_mod keys fully decoded; of the rest, only
                # blocks LONGER than the 64-point prefix get a prefix check —
                # for short blocks a "prefix" would be a full decode of
                # every block, which is exactly the cost sampling exists to
                # avoid, and the full-decode sample already covers the
                # short-block population statistically
                keyrep = "|".join(str(rows[c][b]) for c in key_cols)
                if zlib.crc32(keyrep.encode()) % sample_mod == 0:
                    vp = e - s
                else:
                    vp = 64 if (e - s) > 64 else 0
            if vp > 0:
                ok[b] = bool(
                    np.array_equal(decode_timestamps(tb[b], vp), ts[s : s + vp])
                    and np.array_equal(
                        decode_values(vb[b], vp).view(np.uint64),
                        vals[s : s + vp].view(np.uint64),
                    )
                )
            vps[b] = vp
        tlen = np.array([len(x) for x in tb], dtype=np.int64)
        vlen = np.array([len(x) for x in vb], dtype=np.int64)
        out = pd.DataFrame(rows)
        out["n_points"] = lengths
        out["ts_bytes"] = tlen
        out["val_bytes"] = vlen
        out["bytes_per_point"] = (tlen + vlen) / np.maximum(lengths, 1)
        out["roundtrip_ok"] = ok
        out["verified_points"] = vps
        if emit_blobs:
            out["ts_blob"] = tb
            out["val_blob"] = vb
        return out

    # partition-level batch encode: blocks are numerous and small at scale
    # (one per (key, time-bucket)); both the per-group Arrow crossing AND the
    # per-block numpy dispatch are amortized over the whole Arrow batch
    num_partitions = max(df.sparkSession.sparkContext.defaultParallelism * 2, 8)
    arranged = df.repartition(num_partitions, *key_cols).sortWithinPartitions(
        *key_cols, ts_col
    )

    def fn(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            keys = pdf[key_cols]
            change = (keys != keys.shift()).any(axis=1).to_numpy()
            last_start = int(change.nonzero()[0][-1])
            if last_start == 0:
                carry = pdf
                continue
            carry = pdf.iloc[last_start:].reset_index(drop=True)
            yield encode_batch(pdf.iloc[:last_start].reset_index(drop=True))
        if carry is not None and len(carry):
            yield encode_batch(carry)

    return arranged.mapInPandas(fn, schema=schema)


# ------------------------------------------------- cross-block vectorized ----

def _segment_pack(values: np.ndarray, nbits: np.ndarray, field_block: np.ndarray,
                  n_blocks: int) -> list[bytes]:
    """Pack variable-width fields belonging to ``n_blocks`` consecutive blocks
    into per-block byte blobs with ONE vectorized bit-scatter.

    ``field_block[i]`` = block id of field i (non-decreasing). Each block's
    bitstream is padded to a byte boundary (trailing zero bits — the decoder
    reads exactly n points and never sees them), so the concatenated packbits
    output can be sliced at per-block byte offsets. Byte-identical to packing
    each block separately.
    """
    bits_per_block = np.bincount(field_block, weights=nbits, minlength=n_blocks).astype(np.int64)
    pad = (-bits_per_block) % 8
    # one zero-valued pad field appended per block (nbits may be 0)
    all_vals = np.concatenate([values, np.zeros(n_blocks, dtype=np.uint64)])
    all_bits = np.concatenate([nbits.astype(np.int64), pad])
    all_blk = np.concatenate([field_block, np.arange(n_blocks)])
    # order fields by (block, original position): stable sort on block id
    order = np.argsort(all_blk, kind="stable")
    # pad fields must come AFTER the block's real fields: stable sort keeps
    # original relative order, and the pads were appended last — but they
    # compare equal on block id with earlier fields of the same block, and
    # stable sort preserves append order, so pads land at each block's end
    packed = _pack_varbits(all_vals[order], all_bits[order])
    byte_lens = ((bits_per_block + pad) // 8).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(byte_lens)])
    return [packed[offs[b]: offs[b + 1]] for b in range(n_blocks)]


def encode_timestamp_blocks(ts: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Vectorized delta-of-delta encoding of MANY blocks at once: ``ts`` is
    the concatenation of all blocks' (sorted) int64 timestamps and ``starts``
    the block start offsets (len B+1, starts[-1] == len(ts)). Byte-identical
    to calling :func:`encode_timestamps` per block."""
    ts = np.asarray(ts, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    n = ts.size
    n_blocks = starts.size - 1
    lengths = np.diff(starts)
    blk_of = np.repeat(np.arange(n_blocks), lengths)
    off = np.arange(n) - np.repeat(starts[:-1], lengths)  # within-block index
    delta = np.zeros(n, dtype=np.int64)
    delta[1:] = np.diff(ts)
    dod = np.zeros(n, dtype=np.int64)
    dod[1:] = delta[1:] - delta[:-1]
    # per-point field counts: o==0 →1 (t0), o==1 →1 (delta), o≥2 →2
    cnt = np.where(off >= 2, 2, 1)
    pos = np.cumsum(cnt) - cnt
    total = int(cnt.sum())
    vals = np.zeros(total, dtype=np.uint64)
    bits = np.zeros(total, dtype=np.int64)
    fblk = np.repeat(blk_of, cnt)
    m0 = off == 0
    vals[pos[m0]] = ts[m0].view(np.uint64)
    bits[pos[m0]] = 64
    m1 = off == 1
    vals[pos[m1]] = delta[m1].view(np.uint64)
    bits[pos[m1]] = 64
    m2 = off >= 2
    if m2.any():
        d = dod[m2]
        bucket = np.select(
            [d == 0,
             (d >= -64) & (d < 64),
             (d >= -256) & (d < 256),
             (d >= -2048) & (d < 2048)],
            [0, 1, 2, 3],
            default=4,
        )
        prefix_val = np.array([0b0, 0b10, 0b110, 0b1110, 0b1111], dtype=np.uint64)[bucket]
        prefix_len = np.array([1, 2, 3, 4, 4], dtype=np.int64)[bucket]
        pay_len = np.array([0, 8, 10, 13, 64], dtype=np.int64)[bucket]
        half = np.array([0, 64, 256, 2048, 0], dtype=np.int64)[bucket]
        payload = np.where(bucket == 4, d.view(np.uint64),
                           (d + half).astype(np.int64).view(np.uint64))
        vals[pos[m2]] = prefix_val
        bits[pos[m2]] = prefix_len
        vals[pos[m2] + 1] = payload
        bits[pos[m2] + 1] = pay_len
    return _segment_pack(vals, bits, fblk, n_blocks)


def encode_value_blocks(v: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Vectorized Gorilla XOR encoding of MANY blocks at once (same contract
    as :func:`encode_timestamp_blocks`); byte-identical to per-block
    :func:`encode_values`."""
    u = np.asarray(v, dtype=np.float64).view(np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    n = u.size
    n_blocks = starts.size - 1
    lengths = np.diff(starts)
    blk_of = np.repeat(np.arange(n_blocks), lengths)
    off = np.arange(n) - np.repeat(starts[:-1], lengths)
    x = np.zeros(n, dtype=np.uint64)
    x[1:] = u[1:] ^ u[:-1]
    cnt = np.where(off >= 1, 2, 1)
    pos = np.cumsum(cnt) - cnt
    total = int(cnt.sum())
    vals = np.zeros(total, dtype=np.uint64)
    bits = np.zeros(total, dtype=np.int64)
    fblk = np.repeat(blk_of, cnt)
    m0 = off == 0
    vals[pos[m0]] = u[m0]
    bits[pos[m0]] = 64
    m1 = off >= 1
    if m1.any():
        xs = x[m1]
        nz = xs != 0
        lowbit = xs & (~xs + np.uint64(1))
        tail = np.where(nz, np.log2(np.maximum(lowbit, np.uint64(1)).astype(np.float64)), 0).astype(np.int64)
        bl = np.floor(np.log2(np.maximum(xs, np.uint64(1)).astype(np.float64))).astype(np.int64) + 1
        lead = np.clip(64 - bl, 0, 31)
        nb = 64 - lead - tail
        header = (np.uint64(0b11) << np.uint64(11)) | (
            lead.astype(np.uint64) << np.uint64(6)
        ) | (nb - 1).astype(np.uint64)
        vals[pos[m1]] = np.where(nz, header, np.uint64(0))
        bits[pos[m1]] = np.where(nz, 13, 1)
        vals[pos[m1] + 1] = xs >> tail.astype(np.uint64)
        bits[pos[m1] + 1] = np.where(nz, nb, 0)
    return _segment_pack(vals, bits, fblk, n_blocks)


def gorilla_decode(
    blobs: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    ts_scale: float = 1_000_000.0,
) -> DataFrame:
    """Read Gorilla blocks back to points: (key…, ts, value) rows from the
    ``ts_blob``/``val_blob``/``n_points`` columns of
    ``gorilla_compress(..., emit_blobs=True)`` output.

    The bit-parse is sequential per block by nature (data-dependent field
    positions); blocks decode independently, so parallelism = block count —
    at scale that is one task per bundle of (key, bucket) blocks.
    """
    keep = list(key_cols)
    schema_keys = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in blobs.schema.fields if f.name in keep
    )
    schema = schema_keys + f", {ts_col} double, {value_col} double"

    def fn(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                n = int(row["n_points"])
                ts = decode_timestamps(bytes(row["ts_blob"]), n).astype(np.float64) / ts_scale
                vals = decode_values(bytes(row["val_blob"]), n)
                block = pd.DataFrame({ts_col: ts, value_col: vals})
                for c in reversed(keep):
                    block.insert(0, c, row[c])
                frames.append(block)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return blobs.mapInPandas(fn, schema=schema)
