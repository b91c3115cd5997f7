"""Shared build/load machinery for the optional compiled media kernels
(jpeg_native, gif_native).

Each kernel module owns its C source (a translation of its module's
Python hot loop — the algorithms stay defined, documented and tested in
Python; the C is the speed mirror) and calls :func:`load` once. Contract:

- the .so is cached under the system temp dir keyed by (uid, source
  hash), built via ``$CC``/``cc -O2 -shared -fPIC`` with an atomic
  rename, so concurrent executor workers on one host build once and a
  stale cache from an older source misses the hash and rebuilds;
- ANY failure (no compiler, noexec tmp, hardened env) returns None and
  the caller's pure-Python path runs unchanged — kernels only ever
  change speed, never results (parity pytest-pinned per kernel);
- ``env_flag`` names a kill-switch env var ("0" disables), used by the
  parity tests to force the Python route.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile


def load(name: str, src: str, env_flag: str):
    """Compile-or-reuse and dlopen the kernel; None when unavailable or
    disabled. Never raises."""
    if os.environ.get(env_flag, "1") == "0":
        return None
    try:
        h = hashlib.sha1(src.encode()).hexdigest()[:16]
        uid = os.getuid() if hasattr(os, "getuid") else 0
        so = os.path.join(tempfile.gettempdir(), f"ezsp_{name}_{uid}_{h}.so")
        if not os.path.exists(so):
            with tempfile.TemporaryDirectory() as td:
                c = os.path.join(td, f"{name}.c")
                with open(c, "w") as f:
                    f.write(src)
                tmp = os.path.join(td, f"{name}.so")
                cc = os.environ.get("CC", "cc")
                subprocess.run([cc, "-O2", "-shared", "-fPIC", "-o", tmp, c],
                               check=True, capture_output=True, timeout=120)
                os.replace(tmp, so)  # atomic; concurrent builds are identical
        return ctypes.CDLL(so)
    except Exception as e:
        sys.stderr.write(f"{name} kernel unavailable ({e!r}); "
                         "using the Python loop\n")
        return None
