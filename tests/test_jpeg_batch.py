"""Lockstep batch JPEG decoder parity (jpeg_batch vs the scalar decoder).

The batch decoder must be BYTE-IDENTICAL to jpeg.decode_jpeg_coefficients /
decode_jpeg_pixels on every payload it accepts, and must surface the SAME
exception (message included) for every payload the scalar decoder rejects.
No Spark needed — these pin the numpy kernel itself.
"""

import numpy as np
import pytest

from ezmsg_sigproc_spark.operators.jpeg import (
    decode_jpeg_coefficients,
    decode_jpeg_pixels,
    synth_jpeg,
    synth_jpeg_gray,
)
import ezmsg_sigproc_spark.operators.jpeg_batch as _jb
from ezmsg_sigproc_spark.operators.jpeg_batch import (
    decode_jpeg_coefficients_batch,
    decode_jpeg_pixels_batch,
)

# Density routing sends typical (sparse) test payloads to the scalar path,
# which would make most parity tests vacuous; force the LOCKSTEP route for
# this module's tests so the loop itself stays covered (restored after each
# test). test_density_routing below pins routing at the real threshold.
@pytest.fixture(autouse=True)
def _force_lockstep_route(monkeypatch):
    monkeypatch.setattr(_jb, "_LOCKSTEP_MIN_DENSITY", 0.0)
    # the compiled scalar kernel (late r7) otherwise routes everything
    # scalar before the lockstep loop is reached
    monkeypatch.setattr(_jb, "_PREFER_NATIVE_SCALAR", False)


def _imgs(seed: int, n: int, hi: int = 120):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        h = 24 + int(rng.integers(0, hi))
        w = 24 + int(rng.integers(0, hi))
        grad = np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256
        img = ((grad[:, :, None] + rng.integers(0, 48, (h, w, 3))) % 256
               ).astype(np.uint8)
        out.append(img)
    return out


def _assert_coef_parity(payloads):
    got = decode_jpeg_coefficients_batch(payloads)
    for pay, r in zip(payloads, got):
        frame_s, coefs_s = decode_jpeg_coefficients(pay)
        assert not isinstance(r, Exception), r
        frame_b, coefs_b = r
        assert frame_b["width"] == frame_s["width"]
        assert frame_b["height"] == frame_s["height"]
        assert set(coefs_b) == set(coefs_s)
        for idx in coefs_s:
            np.testing.assert_array_equal(coefs_b[idx], coefs_s[idx])


def _assert_pixel_parity(payloads):
    got = decode_jpeg_pixels_batch(payloads)
    for pay, r in zip(payloads, got):
        assert not isinstance(r, Exception), r
        np.testing.assert_array_equal(r, decode_jpeg_pixels(pay))


@pytest.mark.parametrize("subsample", ["444", "422", "420"])
def test_batch_coef_parity_color(subsample):
    payloads = [synth_jpeg(img, subsample=subsample)
                for img in _imgs(seed=int(subsample), n=6)]
    _assert_coef_parity(payloads)
    _assert_pixel_parity(payloads)


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_batch_parity_restart_intervals_gray(ri):
    payloads = [synth_jpeg_gray(img.mean(axis=2).astype(np.uint8),
                                restart_interval=ri)
                for img in _imgs(seed=ri, n=5)]
    _assert_coef_parity(payloads)
    _assert_pixel_parity(payloads)


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_batch_parity_restart_intervals_color(ri):
    payloads = [synth_jpeg(img, subsample="420", restart_interval=ri)
                for img in _imgs(seed=100 + ri, n=5)]
    _assert_coef_parity(payloads)
    _assert_pixel_parity(payloads)


def test_batch_parity_slow_path_large_coefficients():
    """quant=1 + high-variance noise → AC magnitudes ≥ 256 → size ≥ 9 →
    code+size > 16 bits with the encoder's 8-bit AC codes — every block
    exercises the MINCODE slow path in both decoders."""
    rng = np.random.default_rng(42)
    q1 = np.ones((8, 8), dtype=np.int64)
    payloads = []
    for _ in range(4):
        img = rng.integers(0, 256, (48, 56, 3)).astype(np.uint8)
        payloads.append(synth_jpeg(img, quant_luma=q1, quant_chroma=q1,
                                   subsample="444"))
        g = rng.integers(0, 256, (40, 40)).astype(np.uint8)
        payloads.append(synth_jpeg_gray(g, quant=q1, restart_interval=2))
    _assert_coef_parity(payloads)
    _assert_pixel_parity(payloads)


def test_batch_mixed_shapes_and_modes_one_call():
    imgs = _imgs(seed=7, n=8, hi=90)
    payloads = [
        synth_jpeg(imgs[0], subsample="420"),
        synth_jpeg_gray(imgs[1].mean(axis=2).astype(np.uint8)),
        synth_jpeg(imgs[2], subsample="422", restart_interval=3),
        synth_jpeg(imgs[3], subsample="444"),
        synth_jpeg_gray(imgs[4].mean(axis=2).astype(np.uint8),
                        restart_interval=1),
        synth_jpeg(imgs[5], subsample="420", restart_interval=2),
        synth_jpeg(imgs[6], subsample="444", restart_interval=5),
        synth_jpeg_gray(imgs[7].mean(axis=2).astype(np.uint8),
                        restart_interval=4),
    ]
    _assert_coef_parity(payloads)
    _assert_pixel_parity(payloads)


def test_batch_error_parity_mixed_corrupt():
    """Corrupt / unsupported payloads inside a batch yield the SAME
    exception type+message the scalar decoder raises, without disturbing
    the good payloads around them."""
    imgs = _imgs(seed=9, n=3)
    ok = synth_jpeg(imgs[0], subsample="420", restart_interval=2)
    truncated = ok[: len(ok) // 2]
    not_jpeg = b"\x00\x01not a jpeg"
    # progressive marker (SOF2) rejection
    sof2 = bytearray(synth_jpeg_gray(imgs[1].mean(axis=2).astype(np.uint8)))
    sof2[sof2.index(b"\xff\xc0") + 1] = 0xC2
    batch = [ok, truncated, not_jpeg, bytes(sof2),
             synth_jpeg(imgs[2], subsample="444")]
    got = decode_jpeg_pixels_batch(batch)
    for pay, r in zip(batch, got):
        try:
            expect = decode_jpeg_pixels(pay)
        except Exception as exc:  # noqa: BLE001
            assert isinstance(r, Exception), (pay[:8], r)
            assert type(r) is type(exc)
            assert str(r) == str(exc)
            continue
        assert not isinstance(r, Exception), r
        np.testing.assert_array_equal(r, expect)


def test_batch_solid_frames_exact():
    """q00=8 solid frames decode EXACTLY (the closed-form oracle used by
    the multimodal queries) — through the batch path too."""
    vals = [0, 17, 128, 255]
    payloads = [synth_jpeg_gray(np.full((32, 32), v, dtype=np.uint8),
                                restart_interval=2)
                for v in vals]
    got = decode_jpeg_pixels_batch(payloads)
    for v, r in zip(vals, got):
        np.testing.assert_array_equal(r, np.full((32, 32), v, dtype=np.uint8))


def test_batch_empty_and_singleton():
    assert decode_jpeg_pixels_batch([]) == []
    img = _imgs(seed=3, n=1)[0]
    pay = synth_jpeg(img, subsample="420")
    (r,) = decode_jpeg_pixels_batch([pay])
    np.testing.assert_array_equal(r, decode_jpeg_pixels(pay))


def test_batch_declines_gt4_components(monkeypatch):
    """A ≥5-component SOF0 (legal per T.81, Nf ≤ 255) must route to the
    scalar fallback, NOT index past the 4-slot lockstep DC-predictor state
    or corrupt a neighboring stream's predictor (ADVICE r5 #1). Patch the
    batch path's header parse to claim 5 components for payload 0; the
    scalar fallback (unpatched) stays authoritative and neighbors keep
    exact parity."""
    import ezmsg_sigproc_spark.operators.jpeg_batch as jb

    payloads = [synth_jpeg(img) for img in _imgs(seed=11, n=3)]
    real_parse = jb._parse_headers

    def lying_parse(payload):
        frame, huff_dc, huff_ac, ri, scan, i0 = real_parse(payload)
        if payload is payloads[0]:
            frame = dict(frame)
            comps = [dict(c) for c in frame["components"]]
            for extra_id in (104, 105):
                comps.append(dict(comps[0], id=extra_id))
            frame["components"] = comps
            scan = list(scan) + [dict(scan[0], cs=104), dict(scan[0], cs=105)]
        return frame, huff_dc, huff_ac, ri, scan, i0

    monkeypatch.setattr(jb, "_parse_headers", lying_parse)
    got = jb.decode_jpeg_coefficients_batch(payloads)
    for pay, r in zip(payloads, got):
        assert not isinstance(r, Exception), r
        frame_s, coefs_s = decode_jpeg_coefficients(pay)
        for idx in coefs_s:
            np.testing.assert_array_equal(r[1][idx], coefs_s[idx])


def test_batch_pixels_chunk_budget_parity(monkeypatch):
    """Sub-batch chunking by decoded-bytes budget (ADVICE r5 #2) must be
    invisible: budget=1 (every payload its own chunk) decodes identically
    to one whole-batch call, including an invalid payload's exception."""
    import ezmsg_sigproc_spark.operators.jpeg_batch as jb

    payloads = [synth_jpeg(img, subsample=s)
                for img, s in zip(_imgs(seed=13, n=4), ["444", "420", "422", "444"])]
    payloads.insert(2, b"\xff\xd8not a jpeg")
    whole = jb.decode_jpeg_pixels_batch(payloads)
    monkeypatch.setattr(jb, "_BATCH_BLOCK_BUDGET_BYTES", 1)
    chunked = jb.decode_jpeg_pixels_batch(payloads)
    assert len(whole) == len(chunked) == len(payloads)
    for w, c in zip(whole, chunked):
        if isinstance(w, Exception):
            assert type(c) is type(w) and str(c) == str(w)
        else:
            np.testing.assert_array_equal(w, c)


def test_est_decoded_bytes_uses_sof_dims():
    img = _imgs(seed=17, n=1)[0]
    pay = synth_jpeg(img)
    h, w = img.shape[:2]
    from ezmsg_sigproc_spark.operators.jpeg_batch import _est_decoded_bytes
    assert _est_decoded_bytes(pay) == 8 * h * w * 3 + 4096
    # unparseable header -> compressed-size fallback
    junk = b"\x00" * 100
    assert _est_decoded_bytes(junk) == 16 * len(junk)


def test_density_routing(monkeypatch):
    """At the real threshold, sparse (typical web) payloads take the scalar
    route and dense (low-quant) payloads take the lockstep route — both with
    exact scalar parity. Routing exists because the lockstep gathers are
    memory-bandwidth-bound at full task parallelism (measured 0.5× scalar on
    the sparse mix at local[32]) while winning 2.2× on dense payloads."""
    monkeypatch.setattr(_jb, "_LOCKSTEP_MIN_DENSITY", 64.0)
    rng = np.random.default_rng(5)
    q1 = np.ones((8, 8), dtype=np.int64)
    sparse = [synth_jpeg(img, subsample="420", restart_interval=4)
              for img in _imgs(seed=21, n=3)]
    dense = [synth_jpeg_gray(rng.integers(0, 256, (64, 64)).astype(np.uint8),
                             quant=q1, restart_interval=4) for _ in range(3)]

    # observable for the route taken: payloads that reach the scalar
    # fallback were declined by the lockstep path
    import ezmsg_sigproc_spark.operators.jpeg as _j
    scalar_hits = []
    real_scalar = _j.decode_jpeg_coefficients

    def counting_scalar(payload):
        scalar_hits.append(payload[:4])
        return real_scalar(payload)

    monkeypatch.setattr(_jb, "decode_jpeg_coefficients", counting_scalar)
    got = _jb.decode_jpeg_pixels_batch(sparse + dense)
    # all 3 sparse payloads fell back to scalar; the 3 dense ones did not
    assert len(scalar_hits) == len(sparse)
    for pay, r in zip(sparse + dense, got):
        np.testing.assert_array_equal(r, decode_jpeg_pixels(pay))
