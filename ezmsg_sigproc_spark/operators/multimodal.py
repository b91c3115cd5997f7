"""Multimodal columns: opaque binary payloads with typed metadata.

Training-data-pipeline plumbing (task brief): image/audio/video travel as
``binary`` columns; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``. The image/audio codec libraries
are not in this container, so the *decode step* is a deterministic fake
derived from the payload's md5 (clearly marked); the Spark-side plumbing —
schema, batching, partition shape — is real and tested. A production build
swaps ``_fake_decode_meta`` for PIL/ffmpeg calls with the same signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = "width int, height int, format string, n_bytes bigint"


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
