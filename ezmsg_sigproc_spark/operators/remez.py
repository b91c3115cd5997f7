"""Parks-McClellan optimal equiripple FIR design (Remez exchange).

Reference operator: ``ParksMcClellanFIR`` (``src/ezmsg/sigproc/fir_pmc.py:
18-211``, which delegates to ``scipy.signal.remez``). scipy is absent here,
so this is a from-scratch implementation of the published algorithm
(Parks & McClellan 1972; McClellan-Parks-Rabiner program): type-I linear-phase
design by Chebyshev approximation on the cosine basis, barycentric-Lagrange
interpolation, and alternation-based extremal exchange.

Supports piecewise-constant multiband specs (lowpass/highpass/bandpass/
bandstop all reduce to band lists).
"""

from __future__ import annotations

import numpy as np


def _bary_weights(x: np.ndarray) -> np.ndarray:
    # scaled product to avoid under/overflow for ~30+ nodes
    d = x[:, None] - x[None, :]
    np.fill_diagonal(d, 1.0)
    logs = np.sum(np.log(np.abs(d)), axis=1)
    signs = np.prod(np.sign(d), axis=1)
    logs -= logs.mean()
    return signs / np.exp(logs)


def remez(
    numtaps: int,
    bands: list[tuple[float, float]],
    desired: list[float],
    weights: list[float] | None = None,
    fs: float = 2.0,
    grid_density: int = 16,
    max_iter: int = 40,
) -> np.ndarray:
    """Equiripple type-I FIR (numtaps odd recommended). ``bands`` are
    (lo, hi) edges in the units of ``fs``; ``desired`` one value per band."""
    if numtaps % 2 == 0:
        raise ValueError("type-I design needs odd numtaps")
    weights = weights or [1.0] * len(bands)
    M = (numtaps - 1) // 2
    r = M + 2  # extremal count

    # dense grid over the union of bands (rad)
    grid, dg, wg = [], [], []
    for (lo, hi), d, wt in zip(bands, desired, weights):
        n = max(int(grid_density * M * (hi - lo) / (fs / 2)), 8)
        g = np.linspace(lo * np.pi / (fs / 2), hi * np.pi / (fs / 2), n)
        grid.append(g)
        dg.append(np.full(n, d))
        wg.append(np.full(n, wt))
    grid = np.concatenate(grid)
    dg = np.concatenate(dg)
    wg = np.concatenate(wg)
    order = np.argsort(grid)
    grid, dg, wg = grid[order], dg[order], wg[order]

    # initial extremals: evenly spaced over the grid
    ext = np.linspace(0, grid.size - 1, r).astype(int)

    last_delta = None
    for _ in range(max_iter):
        xw = grid[ext]
        x = np.cos(xw)
        d = dg[ext]
        w = wg[ext]
        b = _bary_weights(x)
        signs = (-1.0) ** np.arange(r)
        delta = (b @ d) / (b @ (signs / w))
        c = d - signs * delta / w

        # interpolate A over the first r-1 nodes (barycentric)
        xn, cn = x[:-1], c[:-1]
        bn = _bary_weights(xn)

        def A(xs):
            num = np.zeros_like(xs)
            den = np.zeros_like(xs)
            exact = np.full(xs.shape, -1, dtype=int)
            for i in range(xn.size):
                diff = xs - xn[i]
                hit = np.abs(diff) < 1e-14
                exact[hit] = i
                diff[hit] = 1.0
                t = bn[i] / diff
                num += t * cn[i]
                den += t
            out = num / den
            mask = exact >= 0
            out[mask] = cn[exact[mask]]
            return out

        err = wg * (dg - A(np.cos(grid)))

        # find local extrema of the weighted error
        sgn = np.sign(err)
        cand = [0]
        for i in range(1, grid.size - 1):
            if (err[i] - err[i - 1]) * (err[i + 1] - err[i]) <= 0:
                cand.append(i)
        cand.append(grid.size - 1)
        cand = np.array(sorted(set(cand)))
        # enforce alternation: among consecutive same-sign candidates keep the
        # largest |err|
        kept = []
        for i in cand:
            if kept and sgn[i] == sgn[kept[-1]]:
                if abs(err[i]) > abs(err[kept[-1]]):
                    kept[-1] = i
            else:
                kept.append(i)
        kept = np.array(kept)
        # trim to r keeping the largest-magnitude alternating run
        while kept.size > r:
            if abs(err[kept[0]]) < abs(err[kept[-1]]):
                kept = kept[1:]
            else:
                kept = kept[:-1]
        if kept.size < r:
            break  # degenerate; keep previous extremals
        new_ext = kept
        if last_delta is not None and abs(abs(delta) - last_delta) < 1e-12 * max(abs(delta), 1e-12):
            ext = new_ext
            break
        last_delta = abs(delta)
        ext = new_ext

    # final coefficients: evaluate A on a length-numtaps frequency grid and
    # inverse-DFT (type-I symmetry)
    k = np.arange(numtaps)
    wk = 2 * np.pi * k / numtaps
    Ak = A(np.cos(np.minimum(wk, 2 * np.pi - wk)))
    h = np.real(np.fft.ifft(Ak))
    h = np.concatenate([h[-M:], h[: M + 1]])
    return h
