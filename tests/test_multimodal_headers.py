"""Real container-header decode (operators/multimodal.parse_media_header):
hand-crafted byte payloads built straight from the published format specs —
PNG IHDR, JPEG SOF0, GIF89a screen descriptor, BMP info header, RIFF/WAV —
parsed both directly and through the mapInPandas lift."""

import struct

import pandas as pd

from ezmsg_sigproc_spark.operators.multimodal import (
    decode_media_headers,
    parse_media_header,
)


def png_bytes(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0) + b"\x00" * 4)


def jpeg_bytes(w, h, channels=3):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 8 + 3 * channels) + bytes([8]) \
        + struct.pack(">HH", h, w) + bytes([channels]) + b"\x00" * (3 * channels)
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def gif_bytes(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def bmp_bytes(w, h):
    return (b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, -h, 1, 24) + b"\x00" * 30)


def wav_bytes(channels, rate, seconds):
    bits = 16
    byte_rate = rate * channels * bits // 8
    data = b"\x00" * (byte_rate * seconds)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, channels, rate, byte_rate, channels * bits // 8, bits)
    chunks = fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_media_header_formats():
    m = parse_media_header(png_bytes(640, 480))
    assert (m["format"], m["width"], m["height"]) == ("png", 640, 480)
    m = parse_media_header(jpeg_bytes(1024, 768))
    assert (m["format"], m["width"], m["height"], m["channels"]) == ("jpeg", 1024, 768, 3)
    m = parse_media_header(gif_bytes(32, 17))
    assert (m["format"], m["width"], m["height"]) == ("gif", 32, 17)
    m = parse_media_header(bmp_bytes(300, 200))
    assert (m["format"], m["width"], m["height"]) == ("bmp", 300, 200)
    m = parse_media_header(wav_bytes(2, 44100, 3))
    assert (m["format"], m["channels"], m["sample_rate"], m["duration_ms"]) == (
        "wav", 2, 44100, 3000)
    assert parse_media_header(b"not a media file")["format"] == "unknown"
    assert parse_media_header(b"")["format"] == "unknown"


def test_decode_media_headers_spark(spark):
    rows = [
        (0, png_bytes(640, 480)),
        (1, jpeg_bytes(100, 50)),
        (2, gif_bytes(5, 7)),
        (3, wav_bytes(1, 16000, 2)),
        (4, b"plain text"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "payload"]),
                               "doc_id bigint, payload binary")
    out = {r.doc_id: r for r in decode_media_headers(df).collect()}
    assert out[0].format == "png" and (out[0].width, out[0].height) == (640, 480)
    assert out[1].format == "jpeg" and (out[1].width, out[1].height) == (100, 50)
    assert out[2].format == "gif" and (out[2].width, out[2].height) == (5, 7)
    assert out[3].format == "wav" and out[3].sample_rate == 16000 and out[3].duration_ms == 2000
    assert out[4].format == "unknown" and out[4].width is None
    assert all(out[i].n_bytes == len(rows[i][1]) for i in range(5))


def test_jpeg_walker_stops_at_sos_and_skips_stuffing():
    """A JPEG whose scan data precedes any SOF must yield null dimensions —
    the walker stops at SOS (0xDA) / EOI (0xD9) and never interprets
    entropy-coded bytes (incl. a stuffed 0xFF00 and a fake 0xFFC0 pattern
    inside the scan) as frame headers."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x00\x00\x00\x3f\x00"
    # entropy data containing a stuffed 0xFF00 and bytes that LOOK like an
    # SOF0 marker with a plausible length + huge dimensions
    scan = b"\x12\xff\x00\x34" + b"\xff\xc0" + struct.pack(">H", 17) \
        + bytes([8]) + struct.pack(">HH", 60000, 60000) + bytes([3]) + b"\x00" * 9
    m = parse_media_header(b"\xff\xd8" + app0 + sos + scan + b"\xff\xd9")
    assert m["format"] == "jpeg"
    assert m["width"] is None and m["height"] is None

    # EOI directly after metadata, no SOF: also null
    m2 = parse_media_header(b"\xff\xd8" + app0 + b"\xff\xd9" + b"\xff\xc0" * 8)
    assert m2["format"] == "jpeg" and m2["width"] is None

    # fill bytes (0xFF padding) before a real SOF still parse
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + bytes([8]) \
        + struct.pack(">HH", 33, 44) + bytes([3]) + b"\x00" * 9
    m3 = parse_media_header(b"\xff\xd8" + app0 + b"\xff" + sof0 + b"\xff\xd9")
    assert (m3["width"], m3["height"]) == (44, 33)
