"""GIF87a/89a codec tests (operators/gif.py).

Independence: beyond encoder↔decoder roundtrips, the LZW decoder is pinned
against a HAND-PACKED code stream written here directly from the spec's
bit-packing rules (LSB-first, variable width, clear/EOI, the cScSc
code==next-entry case) — no shared code with the encoder.
"""

import numpy as np
import pytest

from ezmsg_sigproc_spark.operators.gif import (
    decode_gif_frames,
    decode_gif_pixels,
    lzw_decode,
    lzw_encode,
    synth_gif,
)


def test_lzw_decode_hand_packed_spec_stream():
    # mcs=2 → clear=4, eoi=5, width=3. Codes [4, 1, 6, 5]:
    #   clear; literal 1 → "1"; code 6 == next table entry (cScSc) → "11";
    #   eoi. Output = 01 01 01. LSB-first packing of 3-bit codes
    #   [100, 001, 110, 101] → bytes 0x8C, 0x0B.
    assert lzw_decode(b"\x8c\x0b", 2) == b"\x01\x01\x01"


def test_lzw_roundtrips_cover_dictionary_paths():
    rng = np.random.default_rng(5)
    cases = [
        b"abcabcabcabc" * 50,          # dictionary hits
        bytes([7] * 1000 + [3] * 1000),  # long runs (cScSc repeatedly)
        bytes(rng.integers(0, 256, 60000, dtype=np.uint8)),  # table churn + clear at 4096
        b"x",
        b"aaaaaa",
    ]
    for data in cases:
        for mcs in (2, 4, 8):
            if max(data) >= (1 << mcs):
                continue
            assert lzw_decode(lzw_encode(data, mcs), mcs) == data


def test_gif_still_roundtrip_arbitrary_palette():
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    out = decode_gif_pixels(synth_gif(idx, pal))
    np.testing.assert_array_equal(out, pal[idx])


def test_gif_animation_and_transparency_compositing():
    rng = np.random.default_rng(7)
    pal = rng.integers(1, 255, (256, 3), dtype=np.uint8)
    f1 = rng.integers(1, 256, (9, 11), dtype=np.uint8)  # no index 0
    f2 = f1.copy()
    f2[2:5, 3:8] = 0  # index 0 = transparent hole
    g = synth_gif([f1, f2], pal, transparent_idx=0)
    frames = decode_gif_frames(g)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], pal[f1])
    # the transparent hole must show frame 1's pixels through frame 2
    np.testing.assert_array_equal(frames[1], pal[f1])
    # frame sampling over the decoded animation stack
    from ezmsg_sigproc_spark.operators.multimodal import frame_sample

    stack = np.stack(frames)
    assert frame_sample(stack, 2).shape == (2, 9, 11, 3)


def _gif_bytes(w, h, gct, bg, frames):
    """Hand-assembled GIF89a (no synth_gif involvement beyond lzw_encode,
    which is pinned independently above): ``frames`` is a list of
    (idx_2d, left, top, disposal, transparent_or_None)."""
    import struct

    ct_bits = 8  # 256-entry table
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), bg, 0)
    out += np.ascontiguousarray(gct, dtype=np.uint8).tobytes()
    for idx, left, top, disposal, transparent in frames:
        packed = (disposal << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9" + struct.pack(
            "<BBHBB", 4, packed, 2, transparent or 0, 0)
        ih, iw = idx.shape
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, 0)
        out.append(8)  # LZW min code size
        lz = lzw_encode(np.ascontiguousarray(idx, np.uint8).tobytes(), 8)
        for j in range(0, len(lz), 255):
            blk = lz[j : j + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def test_gif_disposal_methods_spec_timing():
    """ADVICE r4: optimized animated GIFs patch partial frames with mixed
    disposal values. §23 semantics pinned against hand-computed canvases:
    frame k's disposal acts AFTER frame k is displayed, before frame k+1,
    and only on frame k's (left, top, iw, ih) region — 2 restores that
    region to the background color, 3 to the pre-frame-k canvas."""
    gct = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    bg = 5
    f1 = np.full((8, 8), 10, np.uint8)               # full frame, disposal 0
    f2 = np.full((2, 3), 20, np.uint8)               # patch @ (2,1), disposal 2
    f3 = np.full((3, 2), 30, np.uint8)               # patch @ (5,4), disposal 3
    f3[1, 0] = 7                                     # transparent hole (idx 7)
    f4 = np.full((4, 4), 40, np.uint8)               # patch @ (0,0), disposal 0
    g = _gif_bytes(8, 8, gct, bg, [
        (f1, 0, 0, 0, None),
        (f2, 2, 1, 2, None),
        (f3, 5, 4, 3, 7),
        (f4, 0, 0, 0, None),
    ])
    got = decode_gif_frames(g)
    assert len(got) == 4

    # independent spec-side compositor, straight-line per frame
    c1 = np.full((8, 8, 3), 10, np.uint8)
    np.testing.assert_array_equal(got[0], c1)
    c2 = c1.copy()
    c2[1:3, 2:5] = 20                                # draw frame-2 patch
    np.testing.assert_array_equal(got[1], c2)
    c3 = c2.copy()
    c3[1:3, 2:5] = bg                                # frame 2's disposal 2:
    pre3 = c3.copy()                                 #   ONLY its region → bg
    c3[4:7, 5:7] = 30                                # draw frame-3 patch...
    c3[5, 5] = pre3[5, 5]                            # ...transparent hole
    np.testing.assert_array_equal(got[2], c3)
    c4 = c3.copy()
    c4[4:7, 5:7] = pre3[4:7, 5:7]                    # frame 3's disposal 3:
    c4[0:4, 0:4] = 40                                #   region → pre-frame-3
    np.testing.assert_array_equal(got[3], c4)
    # pixels OUTSIDE the newest patch keep accumulated content (the exact
    # failure mode of whole-canvas disposal): frame 1's 10s still visible
    assert (got[3][6, 0:4] == [[10] * 3] * 4).all()


def test_gif_rejects_garbage_and_interlace():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif_pixels(b"NOTAGIF")
    g = bytearray(synth_gif(np.zeros((4, 4), np.uint8)))
    i = 6 + 7 + 3 * 256  # header + LSD + 256-entry GCT → image descriptor
    assert g[i] == 0x2C
    g[i + 9] |= 0x40  # set interlace flag
    with pytest.raises(ValueError, match="interlace"):
        decode_gif_pixels(bytes(g))


def test_image_features_decodes_gif_spark(spark):
    from ezmsg_sigproc_spark.operators.multimodal import decode_image_features

    rng = np.random.default_rng(8)
    idx = rng.integers(0, 256, (10, 6), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(synth_gif(idx, pal)))],
                               "doc_id bigint, payload binary")
    r = decode_image_features(df).collect()[0]
    assert r.format == "gif" and (r.width, r.height) == (6, 10)
    exp = pal[idx].reshape(-1, 3).mean(axis=0)
    assert abs(r.mean_r - exp[0]) < 1e-9 and abs(r.mean_b - exp[2]) < 1e-9


def test_native_lzw_parity_with_python_loop(monkeypatch):
    """The compiled LZW kernel (operators/gif_native.py, late r7) must
    produce byte-identical output AND raise the Python loop's exact
    exception types/messages on corrupt streams. Skips (loudly) only when
    no C compiler exists — absence of the kernel only changes speed."""
    from ezmsg_sigproc_spark.operators import gif_native
    from ezmsg_sigproc_spark.operators.gif import lzw_decode, lzw_encode

    if gif_native.lib() is None:
        pytest.skip("no C compiler available for the native kernel")

    def py_path(fn, *a):
        monkeypatch.setattr(gif_native, "lzw_decode_native",
                            lambda *args: None)
        try:
            return fn(*a)
        finally:
            monkeypatch.undo()

    rng = np.random.default_rng(11)
    for mcs in (2, 4, 8):
        for n in (1, 37, 5000):
            idx = rng.integers(0, 1 << mcs, n).astype(np.uint8).tobytes()
            enc = lzw_encode(idx, mcs)
            assert lzw_decode(enc, mcs) == py_path(lzw_decode, enc, mcs) == idx

    # corrupt random byte streams: (outcome, payload/exception) must match
    mismatches = 0
    raising = 0
    for trial in range(120):
        data = rng.integers(0, 256, int(rng.integers(1, 40))
                            ).astype(np.uint8).tobytes()
        mcs = 2 if trial % 2 else 8

        def outcome(run_py):
            try:
                v = py_path(lzw_decode, data, mcs) if run_py else \
                    lzw_decode(data, mcs)
                return ("ok", v)
            except Exception as e:
                return (type(e).__name__, str(e))

        a, b = outcome(False), outcome(True)
        raising += a[0] != "ok"
        mismatches += a != b
    assert mismatches == 0
    assert raising > 0  # the sweep actually exercised the error paths
