"""GIF decoder + encoder implemented from the GIF89a specification (CompuServe
1990) — stdlib+numpy only, closing the GIF half of the entropy-coded gap
(VERDICT r3 "What's missing" #1; round 4 stretch after JPEG).

Decoder (:func:`decode_gif_frames`):

- header + logical screen descriptor (global color table size from the
  packed flags), image descriptors with local color tables, interlace
  rejected explicitly (rare in crawl data; fail loudly rather than return
  scrambled rows);
- full variable-width LZW decode (§22 + Appendix F): code width grows from
  min_code_size+1 up to 12 bits, CLEAR resets the table, the deferred
  clear case (table full at 4096, no clear emitted) keeps decoding with
  frozen table, and the cScSc "code == next entry" case is handled;
- GIF89a graphic-control extensions: per-frame transparency index honored
  when compositing frames onto the canvas. Disposal (§23) is applied with
  spec timing: frame k's disposal method takes effect AFTER frame k is
  displayed, before frame k+1 is drawn, and acts only on frame k's
  (left, top, iw, ih) region — 0/1 leave the region, 2 restores it to the
  background color, 3 restores it to the canvas as it was before frame k
  (ADVICE r4: the earlier draft applied a frame's own disposal before
  drawing it and reset the whole canvas, compositing optimized animations
  wrongly);
- animation: every frame is decoded and composited, returning the list of
  (H, W, 3) uint8 canvases — the frame-sampling primitive's real input.

Encoder (:func:`synth_gif`) — spec-side generator for tests/bench: REAL
dictionary LZW compression (not the uncompressed-clear-spam trick, so
decoder dictionary hits, width bumps and the 4096 table cap are actually
exercised), 256-entry global color table, optional multi-frame animation
with per-frame graphic-control extensions.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------- LZW ----


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW (Appendix F): LSB-first packing, CLEAR/EOI codes,
    code width min+1..12, deferred-clear tolerated.

    This loop is 98% of scalar GIF decode time (profiled, BASELINE.md);
    when the compiled mirror (operators/gif_native.py, late r7) is
    available it runs instead — byte-identical output and exception
    types, parity pytest-pinned; absence only changes speed."""
    from .gif_native import lzw_decode_native

    native = lzw_decode_native(data, min_code_size)
    if native is not None:
        return native
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little").astype(np.uint32)
    pos = 0
    nbits = bits.size
    # peek12[p] = the next 12 bits at position p as one LSB-first value
    # (12 = max LZW code width) — one shift per code instead of a per-bit loop
    padded = np.concatenate([bits, np.zeros(12, dtype=np.uint32)])
    peek12 = np.zeros(nbits + 1, dtype=np.uint32)
    for k in range(12):
        peek12 |= padded[k : nbits + 1 + k] << k

    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while pos + width <= nbits:
        code = int(peek12[pos]) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                new = prev + entry[:1]
            elif code == len(table):  # cScSc: entry being defined right now
                entry = prev + prev[:1]
                new = entry
            else:
                raise ValueError("LZW code out of range")
            if len(table) < 4096:  # table frozen at cap (deferred clear)
                table.append(new)
                if len(table) == (1 << width) and width < 12:
                    width += 1
        out += entry
        prev = entry
    return bytes(out)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encode with a REAL string table (dict of byte
    prefixes); emits CLEAR when the table reaches 4096 (the decoder-side
    cap). Width-bump rule mirrors the decoder: after the encoder assigns
    code N, the decoder's table also has N+? — both sides grow the width
    when the next code to be assigned no longer fits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits = bytearray()
    acc = 0
    accn = 0

    def emit(code: int, width: int):
        nonlocal acc, accn
        acc |= code << accn
        accn += width
        while accn >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            accn -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for byte in indices:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        # the decoder adds its entry AFTER decoding this code, with the same
        # number — widths stay in lockstep
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([byte])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if accn:
        out_bits.append(acc & 0xFF)
    return bytes(out_bits)


# --------------------------------------------------------------- decoder ----


def decode_gif_frames(payload: bytes) -> list["np.ndarray"]:
    """Decode every frame of a GIF87a/89a to a list of composited (H, W, 3)
    uint8 canvases."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ = struct.unpack("<HHBBB", payload[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    bg_color = np.zeros(3, dtype=np.uint8)
    if gct is not None and bg < len(gct):
        bg_color = gct[bg]
    canvas[:] = bg_color
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    # previous frame's pending disposal: (method, left, top, iw, ih,
    # saved-region-for-method-3) — applied when the NEXT frame arrives
    pending: tuple | None = None
    n_total = len(payload)
    while i < n_total:
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[i + 1]
            i += 2
            if label == 0xF9:  # graphic control
                sz = payload[i]
                packed = payload[i + 1]
                disposal = (packed >> 2) & 7
                transparent = payload[i + 4] if packed & 1 else None
                i += 1 + sz
            while payload[i]:  # skip (remaining) sub-blocks
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            left, top, iw, ih, iflags = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
            i += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIFs not supported")
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
                i += 3 * n
            if ct is None:
                raise ValueError("GIF frame without a color table")
            mcs = payload[i]
            i += 1
            data = bytearray()
            while payload[i]:
                sz = payload[i]
                data += payload[i + 1 : i + 1 + sz]
                i += 1 + sz
            i += 1
            idx = np.frombuffer(lzw_decode(bytes(data), mcs), dtype=np.uint8)
            if idx.size < iw * ih:
                raise ValueError("LZW stream shorter than frame")
            idx = idx[: iw * ih].reshape(ih, iw)
            # §23 timing: the PREVIOUS frame's disposal takes effect now —
            # after that frame was displayed, before this one is drawn —
            # and touches only that frame's region (ADVICE r4)
            if pending is not None:
                pdisp, pl, pt, pw, ph, saved = pending
                if pdisp == 2:  # restore region to background color
                    canvas[pt : pt + ph, pl : pl + pw] = bg_color
                elif pdisp == 3:  # restore region to pre-frame canvas
                    canvas[pt : pt + ph, pl : pl + pw] = saved
            saved = (canvas[top : top + ih, left : left + iw].copy()
                     if disposal == 3 else None)
            region = canvas[top : top + ih, left : left + iw]
            px = ct[np.minimum(idx, len(ct) - 1)]
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, px, region)
            else:
                region[:] = px
            frames.append(canvas.copy())
            pending = (disposal, left, top, iw, ih, saved)
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    return frames


def decode_gif_pixels(payload: bytes) -> "np.ndarray":
    """First composited frame as (H, W, 3) uint8 — the still-image view."""
    frames = decode_gif_frames(payload)
    if not frames:
        raise ValueError("GIF contains no image")
    return frames[0]


# --------------------------------------------------------------- encoder ----


def synth_gif(frames: "list[np.ndarray] | np.ndarray",
              palette: "np.ndarray | None" = None,
              delay_cs: int = 4,
              transparent_idx: int | None = None) -> bytes:
    """Encode index frames as a GIF89a. ``frames``: one (H, W) uint8 index
    array or a list of them (animation); ``palette``: (n≤256, 3) uint8
    (default: grayscale identity); ``transparent_idx``: palette index
    declared transparent in every frame's graphic-control extension (frames
    after the first then composite over the previous canvas). Real LZW
    compression."""
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    if palette is None:
        palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    n_colors = len(palette)
    ct_bits = max(1, int(np.ceil(np.log2(max(n_colors, 2)))))
    ct_size = 1 << ct_bits
    gct = np.zeros((ct_size, 3), dtype=np.uint8)
    gct[:n_colors] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) & 7), 0, 0)
    out += gct.tobytes()
    if len(frames) > 1:
        # NETSCAPE2.0 loop extension (de-facto standard for animation)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, ct_bits)
    for f in frames:
        assert f.shape == (h, w)
        if len(frames) > 1 or transparent_idx is not None:
            packed = 1 if transparent_idx is not None else 0
            out += b"\x21\xf9" + struct.pack(
                "<BBHBB", 4, packed, delay_cs,
                transparent_idx if transparent_idx is not None else 0, 0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        lz = lzw_encode(f.tobytes(), mcs)
        for j in range(0, len(lz), 255):
            blk = lz[j : j + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
