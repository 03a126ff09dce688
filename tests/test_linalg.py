"""ops/linalg — distributed covariance / whitening moment reduce."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(X, blocks=4):
    import ray.data as rd

    parts = np.array_split(np.arange(len(X)), blocks)
    tabs = [pa.table({"embedding": pa.array(X[p].tolist(),
                                            pa.list_(pa.float32()))})
            for p in parts if len(p)]
    ds = rd.from_arrow(tabs[0])
    for t in tabs[1:]:
        ds = ds.union(rd.from_arrow(t))
    return ds


def test_covariance_matches_numpy(ray_session):
    from pappermate_ray.ops.linalg import embedding_covariance

    rng = np.random.RandomState(5)
    X = rng.normal(size=(200, 6)).astype(np.float32)
    out = embedding_covariance(_ds(X), d=6).take_all()
    want = np.cov(X.astype(np.float64), rowvar=False, bias=True)
    assert len(out) == 6 * 7 // 2
    for r in out:
        assert r["i"] <= r["j"]
        assert abs(r["cov"] - want[r["i"], r["j"]]) < 1e-9


def test_covariance_block_count_invariant(ray_session):
    from pappermate_ray.ops.linalg import covariance_stats

    rng = np.random.RandomState(9)
    X = rng.normal(size=(120, 4)).astype(np.float32)
    g1, s1, n1 = covariance_stats(_ds(X, blocks=1), d=4)
    g8, s8, n8 = covariance_stats(_ds(X, blocks=8), d=4)
    assert n1 == n8 == 120
    np.testing.assert_allclose(g1, g8, rtol=0, atol=1e-9)
    np.testing.assert_allclose(s1, s8, rtol=0, atol=1e-9)


def test_whitening_yields_unit_variance(ray_session):
    from pappermate_ray.ops.linalg import whitening_diagonal

    rng = np.random.RandomState(3)
    # anisotropic on purpose: dim k has std (k+1)
    X = (rng.normal(size=(500, 3)) * np.array([1.0, 2.0, 3.0])).astype(
        np.float32)
    rows = {r["dim"]: r for r in whitening_diagonal(_ds(X), d=3).take_all()}
    Xd = X.astype(np.float64)
    for k in range(3):
        white = (Xd[:, k] - rows[k]["mean"]) * rows[k]["whiten_scale"]
        assert abs(white.var() - 1.0) < 1e-6


def test_moment_store_merge_equals_full_pass(ray_session, tmp_path):
    from pappermate_ray.ops.linalg import (covariance_stats,
                                           save_moment_increment,
                                           stored_covariance)

    rng = np.random.RandomState(21)
    X = rng.normal(size=(150, 5)).astype(np.float32)
    store = str(tmp_path / "momstore")
    save_moment_increment(_ds(X[:60], blocks=2), store, d=5)
    save_moment_increment(_ds(X[60:], blocks=3), store, d=5)
    merged = {(r["i"], r["j"]): r["cov"]
              for r in stored_covariance(store, d=5).take_all()}
    g, s, n = covariance_stats(_ds(X), d=5)
    want = g / n - np.outer(s / n, s / n)
    assert n == 150
    for (i, j), v in merged.items():
        assert abs(v - want[i, j]) < 1e-9


def test_moment_store_empty_raises(ray_session, tmp_path):
    import pytest

    from pappermate_ray.ops.linalg import stored_covariance

    with pytest.raises(ValueError):
        stored_covariance(str(tmp_path / "nothing"), d=3)


def test_whiten_embeddings_roundtrip(ray_session):
    from pappermate_ray.ops.linalg import covariance_stats, whiten_embeddings

    rng = np.random.RandomState(8)
    X = (rng.normal(size=(80, 3)) * np.array([0.5, 4.0, 9.0]) +
         np.array([1.0, -2.0, 7.0])).astype(np.float32)
    g, s, n = covariance_stats(_ds(X), d=3)
    mean = s / n
    var = np.diag(g) / n - mean * mean
    scale = 1.0 / np.sqrt(var + 1e-9)
    out = whiten_embeddings(_ds(X), mean, scale).take_all()
    W = np.array([r["embedding"] for r in out])
    # whitened columns: zero mean, unit variance
    assert np.abs(W.mean(axis=0)).max() < 1e-9
    assert np.abs(W.var(axis=0) - 1.0).max() < 1e-6


def test_pca_finds_planted_direction(ray_session):
    from pappermate_ray.ops.linalg import pca_model

    rng = np.random.RandomState(17)
    # variance 25 along (1,1,0)/√2, unit noise elsewhere
    u = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    X = (rng.normal(size=(400, 1)) * 5.0) @ u[None, :] \
        + rng.normal(size=(400, 3)) * 0.1
    mean, comps, vals = pca_model(_ds(X.astype(np.float32)), d=3, k=2)
    assert abs(abs(comps[0] @ u) - 1.0) < 0.01     # top PC ≈ planted axis
    assert vals[0] > 20 and vals[1] < 1.0
    # sign pin: the largest-|entry| component is positive
    j = int(np.argmax(np.abs(comps[0])))
    assert comps[0][j] > 0


def test_pca_lossless_roundtrip(ray_session):
    from pappermate_ray.ops.linalg import pca_model, pca_project

    rng = np.random.RandomState(2)
    X = rng.normal(size=(60, 4)).astype(np.float32)
    mean, comps, _ = pca_model(_ds(X), d=4, k=4)
    out = pca_project(_ds(X), mean, comps).take_all()
    for r in out:
        z = np.asarray(r["pca"])
        x_hat = z @ comps + mean
        x = np.asarray(r["embedding"], np.float64)
        assert np.abs(x_hat - x).max() < 1e-9


class TestEmptyBlockArmor:
    """Advisor finding: a filter-everything lineage produces EMPTY
    blocks; _emb_f64 must keep the (0, d) width so broadcast matmuls
    in whiten/pca/knn/kmeans don't raise on shape."""

    def _empty_lineage(self):
        import ray.data as rd

        rows = [{"vec_id": i, "embedding": [float(i), 1.0, 0.5, 2.0]}
                for i in range(8)]
        return rd.from_items(rows, override_num_blocks=2).filter(
            lambda r: r["vec_id"] > 100)

    def test_emb_f64_empty_shape(self):
        import numpy as np
        import pyarrow as pa

        from pappermate_ray.ops.linalg import _emb_f64

        t = pa.table({"embedding": pa.array([], pa.list_(pa.float32()))})
        assert _emb_f64(t, "embedding", 4).shape == (0, 4)
        assert _emb_f64(t, "embedding").shape == (0, 0)
        tf = pa.table({"embedding": pa.array(
            [], pa.list_(pa.float32(), 4))})
        assert _emb_f64(tf, "embedding").shape == (0, 4)

    def test_whiten_and_pca_on_empty_blocks(self, ray_session):
        import numpy as np

        from pappermate_ray.ops.linalg import (pca_project,
                                               whiten_embeddings)

        ds = self._empty_lineage()
        out = whiten_embeddings(ds, np.zeros(4), np.ones(4)).take_all()
        assert out == []
        out = pca_project(ds, np.zeros(4), np.eye(2, 4)).take_all()
        assert out == []

    def test_knn_and_kmeans_on_partially_empty_blocks(self, ray_session):
        import numpy as np
        import ray.data as rd

        from pappermate_ray.ops.kmeans import kmeans_assign
        from pappermate_ray.stages.similarity import knn_scatter_gather

        rows = [{"vec_id": i, "embedding": [float(i), 1.0, 0.5, 2.0]}
                for i in range(8)]
        # filter leaves SOME blocks empty (ids 0-3 live in block 0)
        ds = rd.from_items(rows, override_num_blocks=4).filter(
            lambda r: r["vec_id"] < 2)
        q = np.array([[1.0, 1.0, 0.5, 2.0]])
        out = knn_scatter_gather(ds, q, np.array([99]), k=2).take_all()
        assert len(out) == 2
        out = kmeans_assign(ds, k=2, iters=2).take_all()
        assert len(out) == 2
