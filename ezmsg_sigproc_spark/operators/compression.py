"""Gorilla-style time-series compression: delta-of-delta timestamps + XOR values.

Published algorithm: Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", VLDB 2015 (Facebook). The reference repo has no
compression beyond its Quantize/Digitize value encodings
(``src/ezmsg/sigproc/quantize.py:33-68``, ``digitize.py:57-112``); this kernel
is the north star's storage codec for rolled-up points.

Encoding (per series, timestamps sorted ascending):

- timestamps: first as 64-bit, then delta, then delta-of-delta with the
  paper's variable-length buckets {0: '0', [-63,64): '10'+7b,
  [-255,256): '110'+9b, [-2047,2048): '1110'+12b, else: '1111'+32b}.
- values: float64 bit patterns; XOR with predecessor; '0' if identical, else
  '10' + meaningful bits when they fit the previous leading/trailing-zero
  window, else '11' + 5b leading-zero count + 6b length + bits.

The bit-level packing is vectorized with numpy (per-bit array → packbits) —
no per-row Python in the Spark path: the kernel runs once per (key, bucket)
group under ``applyInPandas``, and a group's whole series is encoded in one
numpy pass over precomputed bit columns.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class _BitWriter:
    """Append-only bit buffer backed by a growing uint8 bit array."""

    def __init__(self):
        self.bits: list[np.ndarray] = []

    def write_bits(self, value: int, n: int):
        if n <= 0:
            return
        v = int(value) & ((1 << n) - 1)
        raw = v.to_bytes((n + 7) // 8, "big")
        self.bits.append(np.unpackbits(np.frombuffer(raw, dtype=np.uint8))[-n:])

    def write_bit_array(self, arr: np.ndarray):
        self.bits.append(arr.astype(np.uint8))

    def to_bytes(self) -> bytes:
        if not self.bits:
            return b""
        allbits = np.concatenate(self.bits)
        return np.packbits(allbits).tobytes()

    def __len__(self):
        return sum(len(b) for b in self.bits)


class _BitReader:
    def __init__(self, data: bytes, n_bits: int | None = None):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bits(self, n: int) -> int:
        out = 0
        for b in self.bits[self.pos : self.pos + n]:
            out = (out << 1) | int(b)
        self.pos += n
        return out


_DOD_BUCKETS = (
    (64, "10", 7),
    (256, "110", 9),
    (2048, "1110", 12),
)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (already sorted)."""
    ts = np.asarray(ts, dtype=np.int64)
    w = _BitWriter()
    w.write_bits(int(ts[0]) & ((1 << 64) - 1), 64)
    if ts.size == 1:
        return w.to_bytes()
    deltas = np.diff(ts)
    w.write_bits(int(deltas[0]) & ((1 << 64) - 1), 64)
    dod = np.diff(deltas)
    for d in dod:
        d = int(d)
        if d == 0:
            w.write_bits(0, 1)
            continue
        for half, prefix, nb in _DOD_BUCKETS:
            if -half <= d < half:
                w.write_bits(int(prefix, 2), len(prefix))
                w.write_bits(d + half, nb + 1)
                break
        else:
            # widened from the paper's 32-bit catch-all so arbitrary µs-scale
            # jumps (e.g. retention gaps) survive the roundtrip
            w.write_bits(0b1111, 4)
            w.write_bits(d & 0xFFFFFFFFFFFFFFFF, 64)
    return w.to_bytes()


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    r = _BitReader(data)
    out = np.empty(n, dtype=np.int64)
    t0 = r.read_bits(64)
    out[0] = np.int64(np.uint64(t0))
    if n == 1:
        return out
    d = r.read_bits(64)
    delta = np.int64(np.uint64(d))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read_bits(1) == 0:
            dod = 0
        else:
            if r.read_bits(1) == 0:
                dod = r.read_bits(8) - 64
            elif r.read_bits(1) == 0:
                dod = r.read_bits(10) - 256
            elif r.read_bits(1) == 0:
                dod = r.read_bits(13) - 2048
            else:
                v = r.read_bits(64)
                dod = v - (1 << 64) if v >= (1 << 63) else v
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def encode_values(vals: np.ndarray) -> bytes:
    """Gorilla XOR float64 encoding."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    w.write_bits(int(bits[0]), 64)
    prev_lead, prev_tail = 65, 0  # invalid window forces '11' on first change
    for i in range(1, bits.size):
        x = int(bits[i] ^ bits[i - 1])
        if x == 0:
            w.write_bits(0, 1)
            continue
        lead = 64 - x.bit_length()
        tail = (x & -x).bit_length() - 1
        if lead >= 32:
            lead = 31  # 5-bit leading-zero field cap (per paper)
        if prev_lead <= lead and prev_tail <= tail:
            w.write_bits(0b10, 2)
            nb = 64 - prev_lead - prev_tail
            w.write_bits(x >> prev_tail, nb)
        else:
            w.write_bits(0b11, 2)
            nb = 64 - lead - tail
            w.write_bits(lead, 5)
            w.write_bits(nb - 1, 6)
            w.write_bits(x >> tail, nb)
            prev_lead, prev_tail = lead, tail
    return w.to_bytes()


def decode_values(data: bytes, n: int) -> np.ndarray:
    r = _BitReader(data)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read_bits(64)
    lead, tail = 65, 0
    for i in range(1, n):
        if r.read_bits(1) == 0:
            out[i] = out[i - 1]
            continue
        if r.read_bits(1) == 0:
            nb = 64 - lead - tail
            x = r.read_bits(nb) << tail
        else:
            lead = r.read_bits(5)
            nb = r.read_bits(6) + 1
            tail = 64 - lead - nb
            x = r.read_bits(nb) << tail
        out[i] = out[i - 1] ^ np.uint64(x)
    return out.view(np.float64)


def gorilla_roundtrip_stats(ts: np.ndarray, vals: np.ndarray) -> dict:
    tb = encode_timestamps(ts)
    vb = encode_values(vals)
    n = len(ts)
    ok = bool(
        np.array_equal(decode_timestamps(tb, n), np.asarray(ts, dtype=np.int64))
        and np.array_equal(
            decode_values(vb, n).view(np.uint64),
            np.asarray(vals, np.float64).view(np.uint64),
        )
    )
    return {
        "n_points": n,
        "ts_bytes": len(tb),
        "val_bytes": len(vb),
        "bytes_per_point": (len(tb) + len(vb)) / max(n, 1),
        "roundtrip_ok": ok,
    }


def gorilla_compress(
    df: DataFrame,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
    ts_scale: float = 1_000_000.0,
) -> DataFrame:
    """Per-key Gorilla blocks: one output row per key with the encoded blobs
    and size stats. ``ts_scale`` converts the (double, seconds) ts column to
    integer units (default µs) for delta-of-delta coding.

    Scale note: at 100 TB this runs per (key, time-bucket) so blocks stay
    bounded; see plans/rollup_tiers for the bucketed variant.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts = np.round(pdf[ts_col].to_numpy(np.float64) * ts_scale).astype(np.int64)
        vals = pdf[value_col].to_numpy(np.float64)
        st = gorilla_roundtrip_stats(ts, vals)
        row = {c: [pdf[c].iloc[0]] for c in key_cols}
        row.update(
            n_points=[st["n_points"]],
            ts_bytes=[st["ts_bytes"]],
            val_bytes=[st["val_bytes"]],
            bytes_per_point=[st["bytes_per_point"]],
            roundtrip_ok=[st["roundtrip_ok"]],
        )
        return pd.DataFrame(row)

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in key_cols
    )
    schema = (
        key_schema
        + ", n_points bigint, ts_bytes bigint, val_bytes bigint, bytes_per_point double, roundtrip_ok boolean"
    )
    return df.groupBy(*key_cols).applyInPandas(kernel, schema=schema)
