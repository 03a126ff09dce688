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


def _emb_f64(t: pa.Table, col: str, d: int = None) -> np.ndarray:
    """Batch embedding column as a float64 matrix (promote BEFORE any
    product — float32 products then summed would diverge from the
    SQL oracle's CAST-to-DOUBLE-first semantics).

    Fast path: flatten the Arrow list buffer directly (zero-copy until
    the float64 promote) instead of ``to_pylist`` — measured 2.4× on
    the 2M×64 moment pass (tools/bench_linalg.py), and it keeps block
    size out of the cost model (per-row Python boxing was dominating
    small blocks). Ragged rows (malformed upstream) fall back.

    Empty batches (filtered lineages produce them) return shape
    ``(0, d)`` — pass ``d`` when known so downstream matmuls against a
    (d, q) broadcast matrix don't raise on a ``(0, 0)``; a variable
    -length list column carries no width of its own."""
    a = t[col]
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if len(a) == 0:
        if d is None and pa.types.is_fixed_size_list(a.type):
            d = a.type.list_size
        return np.empty((0, d or 0), np.float64)
    if pa.types.is_fixed_size_list(a.type) and a.null_count == 0:
        d = a.type.list_size
        flat = a.values.to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(len(a), d)
    if (pa.types.is_list(a.type) or pa.types.is_large_list(a.type)) \
            and a.null_count == 0:
        offs = a.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all():
            flat = a.flatten().to_numpy(zero_copy_only=False)
            return (flat.astype(np.float64, copy=False)
                        .reshape(len(a), int(widths[0])))
    return np.array(a.to_pylist(), dtype=np.float64)


def covariance_stats(
    ds: "rd.Dataset",
    d: int,
    emb_col: str = "embedding",
) -> tuple:
    """One distributed pass → ``(gram, col_sum, n)`` with ``gram`` the
    d×d ``Σxᵢxᵢᵀ`` matrix, ``col_sum`` the length-d ``Σxᵢ`` and ``n``
    the row count. The building block for covariance / whitening / PCA
    (eigh on the driver is O(d³) on a d×d matrix — the data-sized work
    all happened in the blocks)."""

    def make_vec(t: pa.Table) -> np.ndarray:
        x = _emb_f64(t, emb_col, d)
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


# --------------------------------------------------------------------------
# Persisted mergeable moment store — the linear-algebra member of the
# grow-without-rescan family (MinHash/BM25/HLL/stats stores). Gram,
# column-sum and count merge additively, so covariance over the union
# corpus never re-reads old embeddings. Exact up to float64 addition
# order (last-ulp — the dense_vector_sum caveat); callers that oracle
# round (q:covariance_store_check rounds to 6, like everything else).
# Each increment is ONE parquet row of d²+d+1 float64s — the store
# stays driver-sized (increments × d²).
# --------------------------------------------------------------------------


def save_moment_increment(
    ds: "rd.Dataset",
    store_dir: str,
    d: int,
    emb_col: str = "embedding",
) -> str:
    """Reduce ONE corpus increment to its moment row and append it."""
    from ..stages.search import write_increment

    gram, col_sum, n = covariance_stats(ds, d, emb_col)
    row = pa.table({
        "gram": pa.array([gram.ravel().tolist()], pa.list_(pa.float64())),
        "col_sum": pa.array([col_sum.tolist()], pa.list_(pa.float64())),
        "n": pa.array([float(n)], pa.float64()),
    })
    write_increment(rd.from_arrow(row), store_dir, "moments")
    return store_dir


def stored_covariance(
    store_dir: str,
    d: int,
    round_to: Optional[int] = None,
) -> "rd.Dataset":
    """Merge every increment's moment row additively (equal to one
    full-corpus pass up to float addition order; asserted to 1e-9 in
    tests) and emit upper-triangle ``(i, j, cov)`` rows."""
    import glob as _glob

    import pyarrow.parquet as _pq

    files = sorted(f for f in
                   _glob.glob(f"{store_dir}/moments/add_*/*.parquet")
                   if ".tmp/" not in f)
    if not files:
        raise ValueError(f"no moment increments under {store_dir}")
    gram = np.zeros((d, d), np.float64)
    col_sum = np.zeros(d, np.float64)
    n = 0.0
    for f in files:
        t = _pq.read_table(f)
        for g, s, nn in zip(t["gram"].to_pylist(), t["col_sum"].to_pylist(),
                            t["n"].to_pylist()):
            gram += np.asarray(g, np.float64).reshape(d, d)
            col_sum += np.asarray(s, np.float64)
            n += nn
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


def whiten_embeddings(
    ds: "rd.Dataset",
    mean: np.ndarray,
    scale: np.ndarray,
    emb_col: str = "embedding",
) -> "rd.Dataset":
    """Apply diagonal whitening ``(x − mean)·scale`` to the embedding
    column — the consuming map for ``whitening_diagonal``'s state. The
    (mean, scale) pair is ray.put ONCE and read per batch (broadcast,
    never re-shipped per row); one vectorized numpy pass per batch."""
    import ray

    ref = ray.put((np.asarray(mean, np.float64),
                   np.asarray(scale, np.float64)))

    def white(t: pa.Table) -> pa.Table:
        m, s = ray.get(ref)
        x = _emb_f64(t, emb_col, len(m))
        w = (x - m) * s
        i = t.schema.get_field_index(emb_col)
        return t.set_column(i, emb_col,
                            pa.array(w.tolist(), pa.list_(pa.float64())))

    return ds.map_batches(white, batch_format="pyarrow")


def pca_model(
    ds: "rd.Dataset",
    d: int,
    k: int,
    emb_col: str = "embedding",
) -> tuple:
    """PCA from the one-pass moments: ``(mean, components, variances)``
    with ``components`` the top-k eigenvectors of the population
    covariance as rows (descending eigenvalue; ties broken by the
    symmetric-eigh order). The d×d eigh runs on the DRIVER — O(d³) on
    dimensions, never rows. Sign is pinned per component (the entry of
    largest magnitude is made positive, first index winning magnitude
    ties) so the model is deterministic across runs/BLAS builds.
    Broadcastable state for ``pca_project``."""
    gram, col_sum, n = covariance_stats(ds, d, emb_col)
    mean = col_sum / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(-vals, kind="stable")[:k]
    comps = vecs[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return mean, comps, vals[order]


def pca_project(
    ds: "rd.Dataset",
    mean: np.ndarray,
    components: np.ndarray,
    emb_col: str = "embedding",
    out_col: str = "pca",
) -> "rd.Dataset":
    """Project the embedding column onto the PCA components — state
    ray.put ONCE, one matmul per batch (the whiten_embeddings shape)."""
    import ray

    ref = ray.put((np.asarray(mean, np.float64),
                   np.asarray(components, np.float64)))

    def proj(t: pa.Table) -> pa.Table:
        m, C = ray.get(ref)
        z = (_emb_f64(t, emb_col, len(m)) - m) @ C.T
        return t.append_column(out_col,
                               pa.array(z.tolist(), pa.list_(pa.float64())))

    return ds.map_batches(proj, batch_format="pyarrow")
