"""Optional C kernel for the GIF LZW decode hot loop.

`lzw_decode` (gif.py) is 98% of scalar GIF decode time (profiled,
BASELINE.md) — one interpreted iteration per LZW code with byte-string
table entries. This is its compiled mirror, from the same public GIF89a
Appendix-F spec: the classic prefix/suffix chain-table formulation of the
IDENTICAL variant the Python loop implements (LSB-first packing, CLEAR
resets to clear+2 entries, EOI stops, cScSc self-reference, table frozen
at 4096 with deferred clear tolerated, width bump when the table reaches
1<<width below 12). Output bytes are identical by construction — LZW
decode is deterministic — and the Python loop's error behavior is
replicated code-for-code: an out-of-range first code after CLEAR raises
IndexError (the Python `table[code]` lookup), a later out-of-range code
ValueError("LZW code out of range"); parity over valid AND corrupt
streams is pytest-pinned (tests/test_gif.py).

Same robustness contract as jpeg_native (shared native_build machinery):
any build/load failure → `lib()` is None → the Python loop runs
unchanged; `EZSP_GIF_NATIVE=0` forces that.
"""

from __future__ import annotations

import ctypes

_SRC = r"""
#include <stdint.h>

/* data must be padded with >=2 zero bytes past nbytes (19-bit windows).
   Returns the output length, or -1 ("LZW code out of range" ValueError),
   -2 (IndexError: first code after clear/init out of range),
   -3 (out buffer too small: caller grows and retries). */
int64_t lzw_decode(const uint8_t *data, int64_t nbytes, int min_code_size,
                   uint8_t *out, int64_t out_cap)
{
    static const int CAP = 4096;
    int16_t prefix[4096];
    uint8_t suffix[4096], first[4096];
    int32_t length[4096];
    int clear = 1 << min_code_size;
    int eoi = clear + 1;
    int table_size = clear + 2;
    for (int i = 0; i < clear; i++) {
        prefix[i] = -1; suffix[i] = (uint8_t)i; first[i] = (uint8_t)i;
        length[i] = 1;
    }
    /* entries clear and clear+1 exist but are never emitted (handled as
       CLEAR/EOI before lookup), mirroring the Python b"" placeholders */
    prefix[clear] = prefix[clear + 1] = -1;
    length[clear] = length[clear + 1] = 0;
    int width = min_code_size + 1;
    int prev = -1;              /* code index of the previous entry */
    int64_t nbits = nbytes * 8;
    int64_t pos = 0, opos = 0;
    while (pos + width <= nbits) {
        int64_t j = pos >> 3;
        uint32_t w = (uint32_t)data[j] | ((uint32_t)data[j + 1] << 8)
                   | ((uint32_t)data[j + 2] << 16);
        int code = (int)((w >> (pos & 7)) & ((1u << width) - 1));
        pos += width;
        if (code == clear) {
            table_size = clear + 2;
            width = min_code_size + 1;
            prev = -1;
            continue;
        }
        if (code == eoi) break;
        int entry;
        if (prev < 0) {
            if (code >= table_size) return -2;
            entry = code;
        } else {
            if (code < table_size) {
                entry = code;
                if (table_size < CAP) {
                    prefix[table_size] = (int16_t)prev;
                    suffix[table_size] = first[code];
                    first[table_size] = first[prev];
                    length[table_size] = length[prev] + 1;
                    table_size++;
                    if (table_size == (1 << width) && width < 12) width++;
                }
            } else if (code == table_size) {   /* cScSc */
                if (table_size < CAP) {
                    prefix[table_size] = (int16_t)prev;
                    suffix[table_size] = first[prev];
                    first[table_size] = first[prev];
                    length[table_size] = length[prev] + 1;
                    entry = table_size;
                    table_size++;
                    if (table_size == (1 << width) && width < 12) width++;
                } else {
                    /* unreachable when frozen (code <= 4095 < table_size),
                       kept for safety parity with the Python branch order */
                    return -1;
                }
            } else {
                return -1;
            }
        }
        int64_t ln = length[entry];
        if (opos + ln > out_cap) return -3;
        /* emit the chain backwards from the end */
        int64_t w2 = opos + ln;
        for (int c = entry; c >= 0; c = prefix[c]) out[--w2] = suffix[c];
        opos += ln;
        prev = entry;
    }
    return opos;
}
"""

_lib = None
_lib_tried = False


def lib():
    """The loaded kernel, or None when unavailable/disabled. Never raises."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    from .native_build import load

    L = load("gif_native", _SRC, "EZSP_GIF_NATIVE")
    if L is not None:
        L.lzw_decode.restype = ctypes.c_int64
        L.lzw_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
    _lib = L
    return _lib


def lzw_decode_native(data: bytes, min_code_size: int) -> bytes | None:
    """Decode via the kernel; None when it is unavailable (caller falls
    back to the Python loop). Raises the Python loop's exact exception
    types for corrupt streams."""
    L = lib()
    if L is None:
        return None
    buf = data + b"\x00\x00"
    src = ctypes.cast(ctypes.c_char_p(buf),
                      ctypes.POINTER(ctypes.c_uint8))
    # worst-case growth is bounded by codes*4096; start at a practical
    # size and grow on -3 (rare: only adversarial expansion ratios)
    cap = max(len(data) * 16, 1 << 16)
    while True:
        out = ctypes.create_string_buffer(cap)
        rc = L.lzw_decode(src, len(data), min_code_size,
                          ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)),
                          cap)
        if rc >= 0:
            return out.raw[:rc]
        if rc == -3:
            cap *= 4
            continue
        if rc == -2:
            raise IndexError("list index out of range")
        raise ValueError("LZW code out of range")
