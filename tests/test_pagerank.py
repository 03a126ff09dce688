"""PageRank (ops/pagerank.py) — hand-computed one-round values incl. a
node with no in-links (teleport-only via the zero-union path), and rank
conservation over multiple rounds."""

import pytest


@pytest.fixture()
def graph(ray_session):
    import ray.data as rd

    nodes = rd.from_items([{"node": i} for i in (1, 2, 3, 4)], override_num_blocks=2)
    edges = rd.from_items(
        [
            {"src": 1, "dst": 2},
            {"src": 1, "dst": 3},
            {"src": 2, "dst": 3},
            {"src": 3, "dst": 1},
            {"src": 4, "dst": 1},
        ],
        override_num_blocks=2,
    )
    return nodes, edges


def test_one_round_hand_computed(graph):
    from pappermate_ray.ops.pagerank import pagerank

    nodes, edges = graph
    out = {r["node"]: r["pagerank"]
           for r in pagerank(nodes, edges, iters=1, round_to=8).take_all()}
    # n=4, r0=0.25, base=0.0375; outdeg: 1->2, 2->1, 3->1, 4->1
    assert out[1] == pytest.approx(0.0375 + 0.85 * (0.25 + 0.25), abs=1e-9)
    assert out[2] == pytest.approx(0.0375 + 0.85 * 0.125, abs=1e-9)
    assert out[3] == pytest.approx(0.0375 + 0.85 * (0.125 + 0.25), abs=1e-9)
    assert out[4] == pytest.approx(0.0375, abs=1e-9)  # no in-links


def test_dense_path_equals_join_path(ray_session):
    import ray.data as rd

    from pappermate_ray.ops.pagerank import pagerank

    nodes = rd.from_items([{"node": i} for i in range(6)], override_num_blocks=2)
    edges = rd.from_items(
        [{"src": i, "dst": (i * 5 + 1) % 6} for i in range(6)]
        + [{"src": i, "dst": (i * 3 + 2) % 6} for i in range(6)],
        override_num_blocks=3,
    )
    join_out = {r["node"]: r["pagerank"]
                for r in pagerank(nodes, edges, iters=4).take_all()}
    dense_out = {r["node"]: r["pagerank"]
                 for r in pagerank(nodes, edges, iters=4, dense_ids=True).take_all()}
    assert set(join_out) == set(dense_out)
    for k in join_out:
        assert dense_out[k] == pytest.approx(join_out[k], abs=1e-12)


def test_rank_mass_conserved(graph):
    # with no dangling nodes (every node has out-links), total rank
    # stays 1 every round
    from pappermate_ray.ops.pagerank import pagerank

    nodes, edges = graph
    out = pagerank(nodes, edges, iters=3).take_all()
    assert sum(r["pagerank"] for r in out) == pytest.approx(1.0, abs=1e-9)


def test_auto_string_ids_matches_join_path(ray_session):
    """pagerank_auto on STRING node ids (the harvested-url shape):
    the dictionary-encoded dense route must rank identically to the
    BSP join path run on the raw strings."""
    import ray.data as rd

    from pappermate_ray.ops.pagerank import pagerank, pagerank_auto

    urls = [f"https://h{i}.example/p" for i in range(8)]
    nodes = rd.from_items([{"node": u} for u in urls],
                          override_num_blocks=2)
    edges = rd.from_items(
        [{"src": urls[i], "dst": urls[(i * 3 + 1) % 8]} for i in range(8)]
        + [{"src": urls[i], "dst": urls[(i + 5) % 8]} for i in range(8)],
        override_num_blocks=3)
    want = {r["node"]: r["pagerank"]
            for r in pagerank(nodes, edges, iters=4).take_all()}
    got = {r["node"]: r["pagerank"]
           for r in pagerank_auto(nodes, edges, iters=4).take_all()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # beyond-bound graphs fall back to the join path on raw ids
    fb = {r["node"]: r["pagerank"]
          for r in pagerank_auto(nodes, edges, iters=4,
                                 dense_bound=0).take_all()}
    assert fb == want


# ------------------------------------------------------------------ trustrank

def _tr_brute(n, edges, seed_ids, damping, iters):
    import collections
    out = collections.defaultdict(list)
    for a, b in edges:
        out[a].append(b)
    t = {v: (1.0 / len(seed_ids) if v in seed_ids else 0.0)
         for v in range(n)}
    r = dict(t)
    for _ in range(iters):
        inflow = {v: 0.0 for v in range(n)}
        for u, dsts in out.items():
            share = r[u] / len(dsts)
            for v in dsts:
                inflow[v] += share
        r = {v: (1 - damping) * t[v] + damping * inflow[v]
             for v in range(n)}
    return r


def test_trustrank_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.ops.pagerank import trustrank

    rng = np.random.RandomState(29)
    n = 60
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(150)]
    seed_ids = {0, 13, 27}
    nodes = rd.from_arrow(pa.table({"node": pa.array(range(n))}))
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    })).repartition(4)
    seeds = rd.from_arrow(pa.table({"node": pa.array(sorted(seed_ids))}))
    got = {r["node"]: r["trustrank"]
           for r in trustrank(nodes, e, seeds, iters=3,
                              round_to=10).take_all()}
    want = _tr_brute(n, edges, seed_ids, 0.85, 3)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_trustrank_decays_from_seeds(ray_session):
    # chain 0→1→2→3 with seed {0}: trust strictly decays with depth and
    # the unreachable far node 9 gets exactly 0
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.ops.pagerank import trustrank

    nodes = rd.from_arrow(pa.table({"node": pa.array([0, 1, 2, 3, 9])}))
    e = rd.from_arrow(pa.table({"src": pa.array([0, 1, 2]),
                                "dst": pa.array([1, 2, 3])}))
    seeds = rd.from_arrow(pa.table({"node": pa.array([0])}))
    # 5 rounds ≥ chain depth + 1 so every prefix has stabilized (at
    # fewer rounds the transient front inverts the ordering)
    got = {r["node"]: r["trustrank"]
           for r in trustrank(nodes, e, seeds, iters=5).take_all()}
    assert got[0] > got[1] > got[2] > got[3] > 0.0
    assert got[9] == 0.0


def test_trustrank_duplicate_seeds_collapse(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.ops.pagerank import trustrank

    nodes = rd.from_arrow(pa.table({"node": pa.array([0, 1, 2])}))
    e = rd.from_arrow(pa.table({"src": pa.array([0, 1]),
                                "dst": pa.array([1, 2])}))
    clean = rd.from_arrow(pa.table({"node": pa.array([0, 1])}))
    dup = rd.from_arrow(pa.table({"node": pa.array([0, 0, 1, 1, 1])}))
    a = {r["node"]: r["trustrank"]
         for r in trustrank(nodes, e, clean, iters=2).take_all()}
    b = {r["node"]: r["trustrank"]
         for r in trustrank(nodes, e, dup, iters=2).take_all()}
    assert a == b


def test_trustrank_dense_matches_join_tier(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.ops.pagerank import trustrank

    rng = np.random.RandomState(23)
    n = 60
    edges_l = [(int(rng.randint(n)), int(rng.randint(n)))
               for _ in range(180)]
    nodes = rd.from_arrow(pa.table({"node": pa.array(range(n))}))
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges_l]),
        "dst": pa.array([b for _, b in edges_l]),
    })).repartition(4)
    seeds = rd.from_arrow(pa.table({"node": pa.array([0, 5, 5, 17])}))
    dense = {r["node"]: r["trustrank"] for r in trustrank(
        nodes, e, seeds, iters=3, round_to=9).take_all()}
    join = {r["node"]: r["trustrank"] for r in trustrank(
        nodes, e, seeds, iters=3, round_to=9, dense_bound=0).take_all()}
    assert dense == join
    # seeds hold teleport mass; an unreachable non-seed scores 0
    assert dense[0] > 0 and dense[5] > 0


def test_trustrank_dense_string_ids(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.ops.pagerank import trustrank

    nodes = rd.from_arrow(pa.table({"node": pa.array(["a", "b", "c", "d"])}))
    e = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b", "a"]),
        "dst": pa.array(["b", "c", "c"]),
    }))
    seeds = rd.from_arrow(pa.table({"node": pa.array(["a"])}))
    dense = {r["node"]: r["trustrank"] for r in trustrank(
        nodes, e, seeds, iters=2, round_to=9).take_all()}
    join = {r["node"]: r["trustrank"] for r in trustrank(
        nodes, e, seeds, iters=2, round_to=9, dense_bound=0).take_all()}
    assert dense == join
    assert dense["d"] == 0.0  # unreachable, not a seed
