"""Real pixel/sample decode tests: the PNG/BMP/WAV decoders are checked
against independently hand-built encoders (written here from the same
published specs, sharing no code with the decoders), covering all five PNG
filter types, BMP row padding and top-down orientation, and 8/16-bit PCM."""

import struct
import zlib

import numpy as np
import pytest

from ezmsg_sigproc_spark.operators.multimodal import (
    decode_audio_features,
    decode_bmp_pixels,
    decode_image_features,
    decode_png_pixels,
    decode_wav_samples,
    frame_sample,
    resize_area,
)


# -- independent encoders (spec-side, test-only) --------------------------

def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal RFC 2083 encoder: 8-bit RGB/gray, one filter for all rows."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        raw.append(filter_type)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), row[:-ch]])
            filt = (row - left) & 255
        elif filter_type == 2:
            filt = (row - prev) & 255
        elif filter_type == 3:
            filt = np.empty_like(row)
            for x in range(w * ch):
                left = row[x - ch] if x >= ch else 0
                filt[x] = (row[x] - ((left + prev[x]) >> 1)) & 255
        elif filter_type == 4:
            filt = np.empty_like(row)
            for x in range(w * ch):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                filt[x] = (row[x] - _paeth(a, b, c)) & 255
        raw.extend(int(v) & 255 for v in filt)
        prev = row

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def bmp_encode(img: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pix = bytearray()
    rows = img if top_down else img[::-1]
    for row in rows:
        for px in row:
            pix.extend((int(px[2]), int(px[1]), int(px[0])))  # BGR
        pix.extend(b"\x00" * (row_bytes - w * 3))
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24,
                       0, len(pix), 2835, 2835, 0, 0)
    return header + info + bytes(pix)


def wav_encode(x: np.ndarray, rate: int, bits: int = 16) -> bytes:
    if bits == 16:
        data = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        data = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    ch = x.shape[1]
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# -- decoder tests ---------------------------------------------------------

@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    rng = np.random.default_rng(41 + filter_type)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    out = decode_png_pixels(png_encode(img, filter_type))
    np.testing.assert_array_equal(out, img)


def test_png_grayscale_and_rgba():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (6, 11), dtype=np.uint8)
    out = decode_png_pixels(png_encode(gray, 2))
    np.testing.assert_array_equal(out[:, :, 0], gray)
    rgba = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png_pixels(png_encode(rgba, 1)), rgba)


def test_bmp_roundtrip_padding_and_orientation():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # 7*3=21 -> pad 3
    np.testing.assert_array_equal(decode_bmp_pixels(bmp_encode(img)), img)
    np.testing.assert_array_equal(
        decode_bmp_pixels(bmp_encode(img, top_down=True)), img)


def test_wav_roundtrip_16_and_8_bit():
    rng = np.random.default_rng(5)
    x = rng.uniform(-0.9, 0.9, (480, 2))
    y16, rate = decode_wav_samples(wav_encode(x, 8000, 16))
    assert rate == 8000 and y16.shape == (480, 2)
    # encoder scales by 32767, decoder by 32768 (both standard): error
    # bound is |x|/32768 + rounding
    assert np.abs(y16 - x).max() < 1 / 16000
    y8, _ = decode_wav_samples(wav_encode(x, 8000, 8))
    # 8-bit: truncation (1/127) + 127-vs-128 scale mismatch (|x|/128)
    assert np.abs(y8 - x).max() < 0.017


def test_resize_area_exact_box_means():
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    out = resize_area(img, 4, 4)
    assert out.shape == (4, 4, 3)
    # exact check: mean over each 4x4 box
    exp = np.round(img.reshape(4, 4, 4, 4, 3).transpose(0, 2, 1, 3, 4)
                   .reshape(4, 4, 16, 3).astype(np.float64).mean(axis=2)).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)
    # uneven ratio keeps exactness vs a brute-force oracle
    rng = np.random.default_rng(11)
    img2 = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    out2 = resize_area(img2, 3, 2)
    ye = [(i * 10) // 3 for i in range(4)]
    xe = [(j * 7) // 2 for j in range(3)]
    for i in range(3):
        for j in range(2):
            box = img2[ye[i]:ye[i + 1], xe[j]:xe[j + 1]].reshape(-1, 3)
            np.testing.assert_array_equal(
                out2[i, j], np.round(box.astype(np.float64).mean(axis=0)).astype(np.uint8))


def test_frame_sample_uniform():
    x = np.arange(100)
    f = frame_sample(x, 10)
    assert f.shape == (10,)
    assert list(f) == [5, 15, 25, 35, 45, 55, 65, 75, 85, 95]
    assert frame_sample(np.arange(3), 5).shape == (5,)  # n_frames > n


def test_image_and_audio_features_spark(spark):
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (12, 8, 3), dtype=np.uint8)
    wav = rng.uniform(-0.5, 0.5, (320, 1))
    rows = [
        (1, bytearray(png_encode(img, 4))),
        (2, bytearray(bmp_encode(img))),
        (3, bytearray(b"\xff\xd8notapng")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r.doc_id: r for r in decode_image_features(df).collect()}
    assert out[1].format == "png" and (out[1].width, out[1].height) == (8, 12)
    assert out[2].format == "bmp"
    # identical pixels -> identical means and thumbnails through BOTH formats
    assert (out[1].mean_r, out[1].mean_g, out[1].mean_b) == \
        (out[2].mean_r, out[2].mean_g, out[2].mean_b)
    assert bytes(out[1].thumb) == bytes(out[2].thumb) and len(out[1].thumb) == 8 * 8 * 3
    # SOI prefix routes to the JPEG decoder since round 4; truncated garbage
    # after it is classified corrupt (it IS a broken JPEG, not an unknown)
    assert out[3].format == "corrupt" and out[3].width is None

    adf = spark.createDataFrame(
        [(1, bytearray(wav_encode(wav, 16000))), (2, bytearray(b"RIFFxxxx"))],
        "doc_id bigint, payload binary")
    a = {r.doc_id: r for r in decode_audio_features(adf).collect()}
    assert a[1].format == "wav" and a[1].sample_rate == 16000 and a[1].n_samples == 320
    assert abs(a[1].rms - float(np.sqrt(np.mean(wav.mean(axis=1) ** 2)))) < 1e-4
    assert len(a[1].frames) == 16 * 4
    assert a[2].format == "unknown"


def test_repo_synth_encoders_roundtrip_and_match_independent():
    """The repo-side synth builders (multimodal.synth_png/synth_bmp/synth_wav
    — the bench's media generators) must roundtrip through the repo decoders
    AND agree pixel-for-pixel with the independent test-side encoders."""
    from ezmsg_sigproc_spark.operators.multimodal import (
        synth_bmp,
        synth_png,
        synth_wav,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    # PNG: synth_png cycles filters None/Sub/Up; decode must recover exactly,
    # and match the decode of the independent encoder's stream
    np.testing.assert_array_equal(decode_png_pixels(synth_png(img)), img)
    np.testing.assert_array_equal(
        decode_png_pixels(synth_png(img)), decode_png_pixels(png_encode(img, 4)))
    np.testing.assert_array_equal(decode_bmp_pixels(synth_bmp(img)), img)
    x = np.clip(rng.standard_normal(5000) * 0.4, -1, 1)
    y, rate = decode_wav_samples(synth_wav(x, 8000))
    assert rate == 8000 and y.shape == (5000, 1)
    # 16-bit quantization + the 32767-encode/32768-decode scale convention
    assert np.abs(y[:, 0] - x).max() < 1e-4
