"""Product-quantization ANN (stages/similarity.py PQ family):
lossless-degenerate exactness, compressed-setting recall, persisted
index reuse, code-size compression claim."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pappermate_ray.stages.similarity import (
    build_pq_index,
    knn_scatter_gather,
    pq_adc_search,
    pq_encode,
    pq_knn,
    pq_search_index,
    train_pq_codebooks,
)


def _corpus(n=120, d=16, seed=7, integer=False):
    rng = np.random.RandomState(seed)
    if integer:
        X = rng.randint(-4, 5, size=(n, d)).astype(np.float64)
        X[np.linalg.norm(X, axis=1) == 0] = 1.0
    else:
        X = rng.randn(n, d)
    rows = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(n)]
    return rd.from_items(rows, override_num_blocks=4), X


def test_lossless_config_equals_bruteforce(ray_session):
    """m=1 + one centroid per corpus vector trained on the full corpus:
    encoding is exact, ADC == brute-force cosine, and the top-k matches
    knn_scatter_gather including tie-breaks (integer-valued embeddings
    keep every dot product exactly representable, so chunked sums can't
    introduce ulp noise)."""
    ds, X = _corpus(n=60, d=8, integer=True)
    Q = X[:3]
    qids = np.arange(3)
    exact = sorted(
        (r["query_id"], r["neighbor_id"])
        for r in knn_scatter_gather(ds, Q, qids, k=5).take_all())
    got = sorted(
        (r["query_id"], r["neighbor_id"])
        for r in pq_knn(ds, Q, qids, k=5, m=1, n_centroids=60,
                        sample_size=60).take_all())
    assert got == exact


def test_compressed_recall_planted_neighbors(ray_session):
    """Real compressed setting (m=4 sub-bytes per 16-dim vector): every
    query's planted near-duplicate (cosine ≈ 0.99 vs background ≈ 0)
    lands in the ADC top-5 — the dedup/retrieval criterion PQ exists
    for. (Ranking WITHIN a tight cluster is below quantization
    resolution by design; that regime is what the exact re-rank or the
    lossless config is for.)"""
    rng = np.random.RandomState(3)
    X = rng.randn(150, 16)
    P = np.vstack([X[i] + 0.05 * rng.randn(16) for i in range(5)])
    full = np.vstack([X, P])
    rows = [{"vec_id": i, "embedding": full[i].tolist()}
            for i in range(len(full))]
    ds = rd.from_items(rows, override_num_blocks=4)
    Q, qids = X[:5], np.arange(5)
    got = {}
    for r in pq_knn(ds, Q, qids, k=5, m=4, n_centroids=32,
                    sample_size=len(full)).take_all():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for i in range(5):
        assert 150 + i in got.get(i, set())


def test_codes_are_m_bytes(ray_session):
    """The compression claim: at ≤256 centroids each vector's stored
    code is exactly m bytes."""
    ds, _ = _corpus(n=40, d=16)
    cb = train_pq_codebooks(ds, m=4, n_centroids=16, sample_size=40)
    assert cb.shape == (4, 16, 4)
    codes = pq_encode(ds, cb).take_all()
    assert all(len(r["code"]) == 4 for r in codes)
    # wide codebooks widen the dtype instead of overflowing
    from pappermate_ray.stages.similarity import _code_dtype
    assert _code_dtype(256) == np.uint8
    assert _code_dtype(257) == np.uint16
    assert _code_dtype(70000) == np.uint32


def test_dim_not_divisible_raises(ray_session):
    ds, _ = _corpus(n=10, d=10)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(ds, m=3, n_centroids=4, sample_size=10)


def test_persisted_index_reusable_and_readonly(ray_session, tmp_path):
    """build_pq_index → pq_search_index: search hits only the stored
    codes (raw embeddings never re-read), repeated searches are
    deterministic, and searching never writes into the index."""
    ds, X = _corpus(n=50, d=8, integer=True)
    idx = str(tmp_path / "pq")
    build_pq_index(ds, idx, m=1, n_centroids=50, sample_size=50)
    files_before = sorted(
        os.path.join(d, f) for d, _, fs in os.walk(idx) for f in fs)
    Q, qids = X[:2], np.arange(2)
    a = sorted((r["query_id"], r["neighbor_id"])
               for r in pq_search_index(idx, Q, qids, k=5).take_all())
    b = sorted((r["query_id"], r["neighbor_id"])
               for r in pq_search_index(idx, Q, qids, k=5).take_all())
    exact = sorted((r["query_id"], r["neighbor_id"])
                   for r in knn_scatter_gather(ds, Q, qids, k=5).take_all())
    assert a == b == exact
    files_after = sorted(
        os.path.join(d, f) for d, _, fs in os.walk(idx) for f in fs)
    assert files_before == files_after


def test_adc_scores_match_reconstruction(ray_session):
    """ADC sims equal the dot of the query with each vector's
    RECONSTRUCTION (concatenated sub-centroids) — the defining PQ
    identity, checked on a compressed (lossy) configuration."""
    ds, X = _corpus(n=30, d=8)
    cb = train_pq_codebooks(ds, m=2, n_centroids=8, sample_size=30)
    codes = {r["vec_id"]: np.frombuffer(r["code"], dtype=np.uint8)
             for r in pq_encode(ds, cb).take_all()}
    Q = X[:1]
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    out = pq_adc_search(
        rd.from_items([{"vec_id": i,
                        "code": codes[i].tobytes()} for i in sorted(codes)]),
        cb, Q, np.array([0]), k=30, exclude_self=False).take_all()
    for r in out:
        c = codes[r["neighbor_id"]]
        recon = np.concatenate([cb[j, c[j]] for j in range(2)])
        assert abs(r["sim"] - float(qn[0] @ recon)) < 1e-12
