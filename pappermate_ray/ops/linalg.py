"""Distributed dense linear-algebra partials over an embedding column —
the covariance / Gram statistics embedding whitening, PCA, and feature
diagnostics start from.

Shape: the classic one-pass moment reduce. Every block computes its
LOCAL Gram matrix ``XᵀX`` (d×d), column sum (d) and row count (1) — a
single float64 matmul per batch — and the flattened ``d²+d+1`` partial
vectors reduce through ``ops/vecreduce.dense_vector_sum`` (the repo's
bounded-partials contract: chunked register rows grouped-summed in the
exchange, driver transit O(d²) regardless of block count). Embeddings
never ride an exchange; for d=1024 the partial is 8 MB per block and
the reduced state is one 8 MB vector total.

Float note: the grouped reduce's merge order is scheduler-dependent, so
float64 sums can differ in the last ulp between runs — callers that
oracle the output round (the q:embedding_covariance oracle rounds to 6,
matching the repo-wide aggregate discipline).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data as rd

from .vecreduce import dense_vector_sum


def _emb_f64(t: pa.Table, col: str) -> np.ndarray:
    """Batch embedding column as a float64 matrix (promote BEFORE any
    product — float32 products then summed would diverge from the
    SQL oracle's CAST-to-DOUBLE-first semantics)."""
    return np.array(t[col].to_pylist(), dtype=np.float64)


def covariance_stats(
    ds: "rd.Dataset",
    d: int,
    emb_col: str = "embedding",
) -> tuple:
    """One distributed pass → ``(gram, col_sum, n)`` with ``gram`` the
    d×d ``ΣxᵢxᵢᵀT`` matrix, ``col_sum`` the length-d ``Σxᵢ`` and ``n``
    the row count. The building block for covariance / whitening / PCA
    (eigh on the driver is O(d³) on a d×d matrix — the data-sized work
    all happened in the blocks)."""

    def make_vec(t: pa.Table) -> np.ndarray:
        x = _emb_f64(t, emb_col)
        out = np.empty(d * d + d + 1, np.float64)
        out[: d * d] = (x.T @ x).ravel()
        out[d * d : d * d + d] = x.sum(axis=0)
        out[-1] = float(len(x))
        return out

    vec = dense_vector_sum(ds, make_vec, d * d + d + 1, np.float64)
    return vec[: d * d].reshape(d, d), vec[d * d : d * d + d], vec[-1]


def embedding_covariance(
    ds: "rd.Dataset",
    d: int,
    emb_col: str = "embedding",
    round_to: Optional[int] = None,
) -> "rd.Dataset":
    """Upper-triangle population covariance as ``(i, j, cov)`` rows
    (0-based dimension indices, i ≤ j): ``cov = Σxy/n − mean_i·mean_j``.
    d² stays driver-sized by construction (dimensions, not rows)."""
    gram, col_sum, n = covariance_stats(ds, d, emb_col)
    mean = col_sum / n
    cov = gram / n - np.outer(mean, mean)
    iu, ju = np.triu_indices(d)
    vals = cov[iu, ju]
    if round_to is not None:
        vals = np.round(vals, round_to)
    return rd.from_arrow(pa.table({
        "i": pa.array(iu.astype(np.int64)),
        "j": pa.array(ju.astype(np.int64)),
        "cov": pa.array(vals, pa.float64()),
    }))


def whitening_diagonal(
    ds: "rd.Dataset",
    d: int,
    emb_col: str = "embedding",
    eps: float = 1e-9,
    round_to: Optional[int] = None,
) -> "rd.Dataset":
    """Per-dimension whitening scale ``1/√(var+eps)`` plus the mean —
    the broadcastable state a whitening map stage needs (diagonal
    approximation; full ZCA comes from eigh over covariance_stats)."""
    gram, col_sum, n = covariance_stats(ds, d, emb_col)
    mean = col_sum / n
    var = np.diag(gram) / n - mean * mean
    scale = 1.0 / np.sqrt(var + eps)
    if round_to is not None:
        mean = np.round(mean, round_to)
        scale = np.round(scale, round_to)
    return rd.from_arrow(pa.table({
        "dim": pa.array(np.arange(d, dtype=np.int64)),
        "mean": pa.array(mean, pa.float64()),
        "whiten_scale": pa.array(scale, pa.float64()),
    }))
