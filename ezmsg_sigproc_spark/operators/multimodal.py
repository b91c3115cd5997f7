"""Multimodal columns: opaque binary payloads with typed metadata.

Training-data-pipeline plumbing (task brief): image/audio/video travel as
``binary`` columns; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``.

Two decode levels:

- :func:`parse_media_header` — a REAL container-header parser implemented
  from the published format specifications (no codec library needed): PNG
  IHDR width/height (RFC 2083 §4.1.1), JPEG SOFn frame dimensions
  (ITU-T T.81 §B.2.2), GIF logical-screen descriptor (GIF89a spec), RIFF/WAV
  fmt chunk (channels, sample rate, duration), BMP info header. This covers
  the metadata-extraction stage of a crawl pipeline (dimension filters,
  format routing) end-to-end on real bytes.
- ``_fake_decode_meta`` — the deterministic md5-derived fallback used by the
  registry query so its DuckDB oracle stays SQL-expressible on synthetic
  (non-media) payloads; clearly marked.

Full pixel decode / resize / frame-sample still needs codec libraries absent
from this container and stays behind ``resize_stub``'s NotImplementedError.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = "width int, height int, format string, n_bytes bigint"
HEADER_SCHEMA = (
    "format string, width int, height int, channels int, sample_rate int, "
    "duration_ms int, n_bytes bigint"
)


def parse_media_header(payload: bytes) -> dict:
    """Parse real container headers (PNG/JPEG/GIF/BMP/WAV) from format specs.

    Returns dict(format, width, height, channels, sample_rate, duration_ms);
    fields that don't apply are None; unrecognized payloads get
    format='unknown'. Pure byte arithmetic — no codec library.
    """
    out = {"format": "unknown", "width": None, "height": None,
           "channels": None, "sample_rate": None, "duration_ms": None}
    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        out["format"] = "png"
        out["width"], out["height"] = struct.unpack(">II", payload[16:24])
    elif n >= 4 and payload[:2] == b"\xff\xd8":
        out["format"] = "jpeg"
        # walk marker segments to the first SOFn (frame header). The walk is
        # STRUCTURED (marker → length → skip): it stops at SOS (0xDA, start
        # of entropy-coded scan) and EOI (0xD9) and treats 0xFF00 as byte
        # stuffing — never interpreting scan bytes as markers, so a payload
        # with no SOF before the scan leaves width/height null instead of
        # reporting bogus dimensions
        i = 2
        while i + 9 < n:
            if payload[i] != 0xFF:
                break  # malformed stream — not at a marker boundary
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte before marker
                i += 1
                continue
            if marker in (0x00, 0xDA, 0xD9):  # stuffed byte / SOS / EOI
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers, no length field
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                out["height"], out["width"] = struct.unpack(
                    ">HH", payload[i + 5 : i + 9])
                out["channels"] = payload[i + 9]
                break
            i += 2 + seg_len
    elif n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        out["format"] = "gif"
        out["width"], out["height"] = struct.unpack("<HH", payload[6:10])
    elif n >= 26 and payload[:2] == b"BM":
        out["format"] = "bmp"
        w, h = struct.unpack("<ii", payload[18:26])
        out["width"], out["height"] = w, abs(h)
    elif n >= 44 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        out["format"] = "wav"
        # find the fmt and data chunks
        i = 12
        byte_rate = None
        data_size = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            csz = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                out["channels"], out["sample_rate"] = struct.unpack(
                    "<HI", payload[i + 10 : i + 16])
                byte_rate = struct.unpack("<I", payload[i + 16 : i + 20])[0]
            elif cid == b"data":
                data_size = csz
            i += 8 + csz + (csz & 1)
        if byte_rate and data_size is not None:
            out["duration_ms"] = int(data_size * 1000 / byte_rate)
    return out


def decode_media_headers(
    df: DataFrame,
    binary_col: str = "payload",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Real header-level decode over ``mapInPandas`` (see
    :func:`parse_media_header`); same batching shape as the fake-decode path."""
    keep_schema_fields = [f for f in df.schema.fields if f.name in keep_cols]
    keep_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep_schema_fields)
    schema = (keep_schema + ", " if keep_schema else "") + HEADER_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf[binary_col]]
            metas = [parse_media_header(b) for b in payloads]
            out = pd.DataFrame(metas)
            out["n_bytes"] = [len(b) for b in payloads]
            for c in reversed(keep_cols):
                out.insert(0, c, pdf[c].to_numpy())
            yield out

    return df.mapInPandas(kernel, schema=schema)


def _fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic (width, height, format) from md5(payload).

    Matches the SQL oracle: width = 1 + (first md5 nibble-pair % 64),
    height = 1 + (second nibble-pair % 64), format from the third byte.
    """
    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[0:2], 16) % 64
    height = 1 + int(h[2:4], 16) % 64
    fmt = ["png", "jpeg", "webp", "gif"][int(h[4:6], 16) % 4]
    return width, height, fmt


def decode_media_meta(
    df: DataFrame,
    binary_col: str = "payload",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Extract typed metadata from a binary media column via mapInPandas.

    Arrow streams each partition as pandas batches; the kernel loops only over
    the batch's binary cells (unavoidable for opaque payloads — a real decoder
    is also per-payload), never over Spark rows in Python.
    """
    keep_schema_fields = [f for f in df.schema.fields if f.name in keep_cols]
    keep_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep_schema_fields)
    schema = (keep_schema + ", " if keep_schema else "") + DECODE_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode_meta(bytes(b)) for b in pdf[binary_col]]
            out = pd.DataFrame(metas, columns=["width", "height", "format"])
            out["n_bytes"] = [len(bytes(b)) for b in pdf[binary_col]]
            for c in reversed(keep_cols):
                out.insert(0, c, pdf[c].to_numpy())
            yield out

    return df.mapInPandas(kernel, schema=schema)


def resize_stub(df: DataFrame, binary_col: str = "payload", **kw) -> DataFrame:
    """Resize/transcode stub — plumbing is identical to decode; the pixel
    operation itself needs codec libs absent from this container."""
    raise NotImplementedError(
        "image resize requires a codec library not present in this container; "
        "decode_media_meta demonstrates the mapInPandas plumbing"
    )
