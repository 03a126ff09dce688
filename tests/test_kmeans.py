"""ops/kmeans.py unit semantics (the SQL-equivalence is covered by the
oracle gate's `kmeans_clusters` row)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pappermate_ray.ops.kmeans import kmeans_assign


def _ds(ids, mat):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }))


def test_separated_blobs_recovered(ray_session):
    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    pts = np.vstack([c + rng.normal(0, 0.3, (40, 2)) for c in centers])
    # seeds = 3 smallest ids; put one id in each blob up front
    order = np.r_[0, 40, 80, np.setdiff1d(np.arange(120), [0, 40, 80])]
    ids = np.arange(120)
    out = kmeans_assign(_ds(ids, pts[order]), k=3, iters=4).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    blob = np.array([order[i] // 40 for i in range(120)])
    # cluster labels must be a bijection onto blob membership
    for c in range(3):
        assert len(set(blob[out.cluster == c])) == 1
    assert out.dist.max() < 4.0


def test_deterministic_across_runs(ray_session):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(200, 8))
    a = kmeans_assign(_ds(range(200), mat), k=5, iters=3).to_pandas()
    b = kmeans_assign(_ds(range(200), mat), k=5, iters=3).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_empty_cluster_keeps_centroid(ray_session):
    # ids 0 and 1 share a vector → seed centroids coincide; every point
    # tie-breaks to cluster 0, cluster 1 goes empty and must keep its
    # centroid (COALESCE semantics) without NaNs
    mat = np.array([[1.0, 1.0], [1.0, 1.0], [1.1, 0.9], [0.9, 1.1]])
    out = kmeans_assign(_ds(range(4), mat), k=2, iters=3).to_pandas()
    assert set(out.cluster) == {0}
    assert np.isfinite(out.dist).all()


def test_k_exceeds_corpus_raises(ray_session):
    with pytest.raises(ValueError, match="exceeds corpus"):
        kmeans_assign(_ds(range(3), np.eye(3)), k=5, iters=2)


def test_semantic_dedup_drops_planted_pairs(ray_session):
    """SemDeDup over the planted near-identical corpus: every perturbed
    copy (id+1M) must be dropped (its source has the smaller id and
    ~0.99999 cosine, and the tiny perturbation keeps the pair in one
    cluster), and every original kept."""
    from pappermate_ray.queries import _emb_with_near_dups_f64
    from pappermate_ray.stages.similarity import semantic_dedup

    out = semantic_dedup(_emb_with_near_dups_f64("/root/testdata/sf0.001"),
                         k=8, iters=3, threshold=0.9).to_pandas()
    planted = out[out.vec_id >= 1_000_000]
    assert len(planted) == 50 and not planted.keep.any()
    assert out[out.vec_id < 1_000_000].keep.all()


def test_semantic_dedup_mega_cluster_cap_matches_uncapped(ray_session):
    """Round-2 verdict item #2: plant one k-means cluster holding ~50%
    of rows; with max_group small enough that the cluster must split
    into sub-shard pair groups, the capped output must be IDENTICAL to
    the uncapped run (triangle partitioning loses no pairs)."""
    import numpy as np
    import ray.data as rd

    from pappermate_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    rows = []
    # mega-cluster: 300 vectors around one center, 30 planted dup pairs
    center = rng.normal(size=8)
    for i in range(300):
        v = center + 0.05 * rng.normal(size=8)
        rows.append({"vec_id": i, "embedding": list(v)})
        if i < 30:
            rows.append({"vec_id": 1_000_000 + i,
                         "embedding": list(v + 1e-6 * rng.normal(size=8))})
    # the rest: 5 well-separated blobs of 60
    for b in range(5):
        c2 = center + (b + 3) * 10.0 * np.eye(8)[b]
        for i in range(60):
            rows.append({"vec_id": 10_000 + b * 100 + i,
                         "embedding": list(c2 + 0.05 * rng.normal(size=8))})
    ds = rd.from_items(rows, override_num_blocks=4)

    def run(max_group):
        out = semantic_dedup(ds, k=6, iters=3, threshold=0.9,
                             max_group=max_group).to_pandas()
        return sorted(map(tuple, out[["vec_id", "cluster", "keep"]].values))

    uncapped = run(max_group=10_000)   # single-group path
    capped = run(max_group=64)         # mega-cluster splits into shards
    assert capped == uncapped
    dropped = [vid for vid, _, keep in capped if not keep]
    assert len(dropped) >= 30  # the planted copies died
