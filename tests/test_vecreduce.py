"""Bounded dense-vector reduction (ops/vecreduce.py): driver fast path
vs grouped-exchange path equality, chunk-boundary handling, zero-chunk
skipping."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pappermate_ray.ops.vecreduce import dense_vector_sum


def _edges(n_rows: int, n_nodes: int, blocks: int) -> "rd.Dataset":
    rng = np.random.default_rng(7)
    t = pa.table({
        "src": pa.array(rng.integers(0, n_nodes, n_rows), pa.int64()),
    })
    return rd.from_arrow(t).repartition(blocks)


def test_driver_and_grouped_paths_equal_int(ray_session):
    n = 1000
    ds = _edges(5000, n, blocks=6)

    def vec(t: pa.Table) -> np.ndarray:
        return np.bincount(np.asarray(t["src"], np.int64), minlength=n)

    # force both routes over identical input: driver_rows high vs 0
    a = dense_vector_sum(ds, vec, n, np.int64, driver_rows=10_000)
    b = dense_vector_sum(ds, vec, n, np.int64, driver_rows=0)
    want = np.bincount(
        np.asarray(ds.to_pandas()["src"], np.int64), minlength=n)
    assert (a == want).all()
    assert (b == want).all()


def test_chunk_boundary_and_multi_chunk(ray_session):
    # n NOT divisible by the chunk size; chunk small enough that every
    # block spans several chunks (exercises per-chunk offsets)
    n = 10_007
    ds = _edges(4000, n, blocks=5)

    def vec(t: pa.Table) -> np.ndarray:
        return np.bincount(np.asarray(t["src"], np.int64), minlength=n)

    got = dense_vector_sum(ds, vec, n, np.int64,
                           chunk_bytes=1 << 10, driver_rows=0)
    want = np.bincount(
        np.asarray(ds.to_pandas()["src"], np.int64), minlength=n)
    assert (got == want).all()


def test_zero_chunks_skipped_and_float(ray_session):
    # blocks touching only node 0: every chunk but the first is all-zero
    # and must ship nothing; float path sums exactly here (powers of 2)
    n = 4096
    t = pa.table({"src": pa.array([0] * 64, pa.int64())})
    ds = rd.from_arrow(t).repartition(4)

    def vec(tab: pa.Table) -> np.ndarray:
        v = np.zeros(n)
        v[0] = float(tab.num_rows) * 0.25
        return v

    for dr in (0, 10_000):
        got = dense_vector_sum(ds, vec, n, np.float64,
                               chunk_bytes=1 << 9, driver_rows=dr)
        assert got[0] == 16.0
        assert not got[1:].any()


def test_all_zero_input(ray_session):
    t = pa.table({"src": pa.array([1, 2, 3], pa.int64())})
    ds = rd.from_arrow(t)
    got = dense_vector_sum(ds, lambda _: np.zeros(16), 16, np.float64)
    assert not got.any()


def test_sparse_and_auto_tiers_equal(ray_session):
    from pappermate_ray.ops.vecreduce import sparse_vector_sum, vector_sum

    n = 50_000  # sparse regime: 5k rows over 6 blocks -> rows < blocks*n/2
    ds = _edges(5000, n, blocks=6).materialize()

    def vec(t: pa.Table) -> np.ndarray:
        return np.bincount(np.asarray(t["src"], np.int64), minlength=n)

    want = np.bincount(
        np.asarray(ds.to_pandas()["src"], np.int64), minlength=n)
    # sparse grouped path (driver_rows=0 forces the exchange), sparse
    # driver path, and the auto tier (which must pick sparse here)
    a = sparse_vector_sum(ds, vec, n, np.int64, driver_rows=0)
    b = sparse_vector_sum(ds, vec, n, np.int64, driver_rows=10**9)
    c = vector_sum(ds, vec, n, np.int64)
    d = dense_vector_sum(ds, vec, n, np.int64, driver_rows=0)
    for got in (a, b, c, d):
        assert (got == want).all()


def test_sparse_float_path(ray_session):
    from pappermate_ray.ops.vecreduce import sparse_vector_sum

    n = 10_000
    t = pa.table({"src": pa.array(list(range(0, 64)) * 4, pa.int64())})
    ds = rd.from_arrow(t).repartition(4)

    def vec(tab: pa.Table) -> np.ndarray:
        v = np.zeros(n)
        np.add.at(v, np.asarray(tab["src"], np.int64), 0.25)
        return v

    got = sparse_vector_sum(ds, vec, n, np.float64, driver_rows=0)
    assert got[:64].sum() == 64.0 and not got[64:].any()
