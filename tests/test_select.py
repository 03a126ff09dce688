"""stages/select.py — greedy MMR + k-center selection semantics (the
SQL equivalence is covered by the oracle gate's `mmr_select` /
`kcenter_select` rows; these pin the mechanism against a scalar
brute-force greedy and the planted-geometry behavior)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pappermate_ray.stages.select import kcenter_select, mmr_select


def _ds(ids, mat, parts=5):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })).repartition(parts)


def _normed(tbl_mat):
    x = np.array(tbl_mat, dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def _f32(mat):
    # the dataset carries float32 embeddings — brute-force reference must
    # see the SAME rounded values the distributed path sees
    return _normed(np.asarray(mat, dtype=np.float32))


def _brute_mmr(X, q, k, lam, exclude=()):
    ids = list(range(len(X)))
    rel = X @ q
    sel, ms = [], np.full(len(X), -1.0)
    live = [i for i in ids if i not in set(exclude)]
    for r in range(k):
        if not sel:
            score = {i: lam * rel[i] for i in live}
        else:
            score = {i: lam * rel[i] - (1 - lam) * ms[i] for i in live}
        best = min(live, key=lambda i: (-score[i], i))
        sel.append(best)
        live.remove(best)
        ms = np.maximum(ms, X @ X[best])
    return sel


def _brute_kcenter(X, k, seed=0):
    sel, md = [seed], np.full(len(X), np.inf)
    for _ in range(k - 1):
        md = np.minimum(md, 1.0 - X @ X[sel[-1]])
        live = [i for i in range(len(X)) if i not in sel]
        sel.append(min(live, key=lambda i: (-md[i], i)))
    return sel


def test_mmr_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    raw = rng.normal(size=(250, 12))
    X = _f32(raw)
    out = mmr_select(_ds(range(250), raw), raw[0], k=7, lam=0.6,
                     exclude_ids=[0]).to_pydict()
    assert out["vec_id"] == _brute_mmr(X, X[0], 7, 0.6, exclude=[0])
    assert out["rank"] == list(range(1, 8))


def test_mmr_negative_sim_raises_score(ray_session):
    # q at +x; candidate A slightly less relevant than B but ANTI-aligned
    # with the first pick — the true-max fold must prefer A (a clamp-at-
    # zero fold would pick B). Geometry in 2-D.
    q = np.array([1.0, 0.0])
    rows = np.array([
        [1.0, 0.05],    # 0: top relevance → pick 1
        [0.62, -1.0],   # 1: A — rel lower, sim to pick1 strongly negative
        [0.70, 1.0],    # 2: B — rel higher, sim to pick1 strongly positive
    ])
    out = mmr_select(_ds(range(3), rows, parts=2), q, k=2,
                     lam=0.5).to_pydict()
    assert out["vec_id"] == [0, 1]


def test_mmr_lam1_is_sequential_topk(ray_session):
    rng = np.random.default_rng(5)
    raw = rng.normal(size=(120, 8))
    X = _f32(raw)
    rel = X @ _f32([raw[3]])[0]
    order = sorted(range(120), key=lambda i: (-rel[i], i))
    out = mmr_select(_ds(range(120), raw, parts=3), raw[3], k=5, lam=1.0,
                     exclude_ids=[3]).to_pydict()
    assert out["vec_id"] == [i for i in order if i != 3][:5]


def test_kcenter_matches_bruteforce(ray_session):
    rng = np.random.default_rng(23)
    raw = rng.normal(size=(250, 12))
    out = kcenter_select(_ds(range(250), raw), k=7).to_pydict()
    assert out["vec_id"] == _brute_kcenter(_f32(raw), 7, seed=0)
    assert out["dist"][0] == 0.0
    # farthest-point distances are non-increasing after the seed
    d = out["dist"][1:]
    assert all(a >= b for a, b in zip(d, d[1:]))


def test_kcenter_covers_planted_clusters(ray_session):
    rng = np.random.default_rng(9)
    centers = _normed(rng.normal(size=(4, 16)))
    pts = np.vstack([c + rng.normal(0, 0.05, (30, 16)) for c in centers])
    out = kcenter_select(_ds(range(120), pts, parts=4), k=4).to_pydict()
    assert sorted({i // 30 for i in out["vec_id"]}) == [0, 1, 2, 3]


def test_kcenter_explicit_seed(ray_session):
    rng = np.random.default_rng(2)
    raw = rng.normal(size=(60, 6))
    out = kcenter_select(_ds(range(60), raw, parts=3), k=3,
                         seed_id=42).to_pydict()
    assert out["vec_id"][0] == 42
    assert out["vec_id"] == _brute_kcenter(_f32(raw), 3, seed=42)
