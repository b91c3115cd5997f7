"""FBCCA — filterbank canonical correlation analysis for periodic-signal
(SSVEP-style) frequency detection.

Reference: ``FBCCATransformer`` (``src/ezmsg/sigproc/fbcca.py:29-309``): for
each candidate frequency, build a design matrix of sin/cos at the fundamental
and ``harmonics`` higher harmonics, compute the canonical correlation between
the (time × ch) window and the design matrix, and emit a score per candidate
frequency (optionally shifted-softmax → probabilities).

CCA via the QR method (textbook): with Qx, Qy the orthonormal bases of the
centered data/design matrices, the canonical correlations are the singular
values of ``Qx^T Qy``; the score is the largest one.

Spark lift: per (key, window) group kernel — windows come from
operators/window.tumbling_windows, the kernel runs one numpy QR/SVD per
(window, frequency) pair.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _orth(a: np.ndarray) -> np.ndarray:
    """Rank-revealing orthonormal basis of the centered column space.

    Plain ``np.linalg.qr`` on a rank-deficient matrix returns ARBITRARY
    basis vectors for the null directions (LAPACK-build-dependent), which
    made rank-deficient CCA scores non-deterministic across environments.
    SVD truncated at the standard rank tolerance keeps only the true column
    space; canonical correlations depend only on that subspace, so the
    resulting score is well-defined regardless of LAPACK build."""
    a = a - a.mean(axis=0, keepdims=True)
    u, s, _ = np.linalg.svd(a, full_matrices=False)
    if s.size == 0 or s[0] == 0.0:
        return u[:, :0]
    tol = s[0] * max(a.shape) * np.finfo(np.float64).eps
    return u[:, : int((s > tol).sum())]


def cca_max_corr(x: np.ndarray, y: np.ndarray) -> float:
    """Largest canonical correlation between column spaces of x and y."""
    qx = _orth(x)
    qy = _orth(y)
    if qx.shape[1] == 0 or qy.shape[1] == 0:
        return 0.0
    s = np.linalg.svd(qx.T @ qy, compute_uv=False)
    return float(np.clip(s[0], 0.0, 1.0))


def design_matrix(n: int, fs: float, freq: float, harmonics: int) -> np.ndarray:
    """Sin/cos reference set at the fundamental + ``harmonics`` harmonics
    (reference fbcca.py 'design' matrix, harmonics=5 default).

    Harmonic pairs at or above Nyquist (h·freq ≥ fs/2) are DROPPED: a
    sampled sinusoid above Nyquist aliases exactly onto a lower frequency
    (e.g. 0.6 cyc/sample ≡ −0.4), duplicating (negated) lower-harmonic
    columns and making the design matrix rank-deficient — the canonical
    correlation against such a matrix is ill-defined. The fundamental pair
    is always kept so the design is never empty; ``_orth``'s rank
    truncation handles any residual degeneracy (e.g. sin at exactly
    Nyquist is the zero column)."""
    t = np.arange(n) / fs
    cols = []
    for h in range(1, harmonics + 2):
        if h > 1 and h * freq >= fs / 2.0:
            break
        cols.append(np.sin(2 * np.pi * freq * h * t))
        cols.append(np.cos(2 * np.pi * freq * h * t))
    return np.stack(cols, axis=1)


def fbcca_scores_np(
    window: np.ndarray, fs: float, freqs: Sequence[float],
    harmonics: int = 5, softmax_beta: float = 1.0,
) -> np.ndarray:
    """Scores per candidate frequency for one (time × ch) window.

    softmax_beta > 0 → shifted softmax over the correlations (reference's
    0-1 'probabilities'); 0 → the raw max canonical correlations."""
    n = window.shape[0]
    rho = np.array([
        cca_max_corr(window, design_matrix(n, fs, f, harmonics)) for f in freqs
    ])
    if softmax_beta == 0.0:
        return rho
    e = np.exp(softmax_beta * (rho - rho.max()))
    return e / e.sum()


def fbcca(
    df: DataFrame,
    fs: float,
    freqs: Sequence[float],
    win_len: int,
    harmonics: int = 5,
    softmax_beta: float = 1.0,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (key, window) frequency scores: rows (key…, win_id, target_freq,
    score)."""
    from pyspark.sql import functions as F

    from .window import tumbling_windows

    seg = tumbling_windows(df, win_len, key_cols, ts_col, win_col="win_id",
                           drop_partial=True)
    freqs = list(freqs)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["win_id", ts_col], kind="mergesort")
        out = []
        for win_id, grp in pdf.groupby("win_id", sort=True):
            w = grp[value_col].to_numpy(np.float64)[:, None]
            scores = fbcca_scores_np(w, fs, freqs, harmonics, softmax_beta)
            for f, s in zip(freqs, scores):
                out.append((*[grp[c].iloc[0] for c in key_cols], int(win_id), float(f), float(s)))
        cols = [*key_cols, "win_id", "target_freq", "score"]
        return pd.DataFrame(out, columns=cols)

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in key_cols
    )
    schema = key_schema + ", win_id bigint, target_freq double, score double"
    return seg.groupBy(*key_cols).applyInPandas(kernel, schema=schema)
