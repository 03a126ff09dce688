"""Winnowing fingerprints (stages/winnow.py) — MOSS guarantee (shared
run of >= w+k-1 tokens shares a fingerprint), short-doc rule, density,
partitioning invariance."""

import pytest


def _fps(rows, k=3, w=4, blocks=2):
    import ray.data as rd

    from pappermate_ray.stages.winnow import winnow_fingerprints

    ds = rd.from_items(rows, override_num_blocks=blocks)
    out = {}
    for r in winnow_fingerprints(ds, k=k, w=w).take_all():
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def test_shared_run_guarantee(ray_session):
    # docs share a run of w+k-1 = 6 tokens inside different contexts
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        {"doc_id": 1, "text": f"intro words here {shared} tail one"},
        {"doc_id": 2, "text": f"completely different head {shared} other ending"},
        {"doc_id": 3, "text": "no overlap at all with anything else here"},
    ]
    fps = _fps(rows)
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3] and fps[2] & fps[3])


def test_short_doc_single_window(ray_session):
    # 4 tokens, k=3 -> 2 grams < w=4: whole-doc window emits exactly 1 fp
    fps = _fps([{"doc_id": 1, "text": "a b c d"}])
    assert len(fps[1]) == 1
    # < k tokens: nothing
    assert 2 not in _fps([{"doc_id": 2, "text": "a b"}])


def test_density_is_sparse(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.winnow import winnow_fingerprints

    text = " ".join(f"tok{i * 7 % 101}" for i in range(200))
    ds = rd.from_items([{"doc_id": 1, "text": text}])
    n = winnow_fingerprints(ds, k=3, w=4).count()
    # expected density ~2/(w+1) of 198 grams; allow a wide band
    assert 20 <= n <= 120


def test_partitioning_invariance(ray_session):
    rows = [{"doc_id": i, "text": " ".join(f"w{(i * j) % 13}" for j in range(30))}
            for i in range(20)]
    a = _fps(rows, blocks=1)
    b = _fps(rows, blocks=8)
    assert a == b


def test_clone_pairs_find_planted_clones(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.winnow import winnow_clone_pairs

    base = " ".join(f"tok{i * 7 % 101}" for i in range(60))
    rows = [
        {"doc_id": 1, "text": "prefix one " + base + " suffix one"},
        {"doc_id": 2, "text": "other start " + base + " other end"},
        {"doc_id": 3, "text": " ".join(f"unrelated{j}" for j in range(60))},
        {"doc_id": 4, "text": " ".join(f"alien{j * 3}" for j in range(60))},
    ]
    ds = rd.from_items(rows, override_num_blocks=2)
    out = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in winnow_clone_pairs(ds, min_shared=2).take_all()}
    assert (1, 2) in out and out[(1, 2)] >= 2
    assert all(p == (1, 2) for p in out)


def test_common_fp_prune_caps_pairs(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.winnow import winnow_clone_pairs

    shared = " ".join(f"boiler{j}" for j in range(30))
    rows = [{"doc_id": i, "text": shared} for i in range(12)]
    ds = rd.from_items(rows, override_num_blocks=2)
    # 12 identical docs share every fingerprint; cap 10 prunes them all
    assert winnow_clone_pairs(ds, max_fp_docs=10).take_all() == []
    # raising the cap brings back the full C(12,2) pair set
    out = winnow_clone_pairs(ds, max_fp_docs=20).take_all()
    assert len(out) == 66
