"""ops/bfs.py — multi-source BFS depth semantics (SQL equivalence is
the oracle gate's `crawl_depth` row; here: brute-force equality on
random graphs, min-hop tie behavior, early exit, string ids,
undirected expansion, seed dedup)."""

import collections

import numpy as np
import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.bfs import bfs_depth


def _run(seed_ids, edges, max_depth, undirected=False):
    seeds = rd.from_arrow(pa.table({"node": pa.array(seed_ids)}))
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    })).repartition(4)
    out = bfs_depth(seeds, e, max_depth=max_depth,
                    undirected=undirected).take_all()
    got = {r["node"]: r["depth"] for r in out}
    assert len(got) == len(out), "a node must appear exactly once"
    return got


def _brute(seed_ids, edges, max_depth, undirected=False):
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        if undirected:
            adj[b].append(a)
    depth = {s: 0 for s in seed_ids}
    frontier = set(seed_ids)
    for d in range(1, max_depth + 1):
        nxt = {v for u in frontier for v in adj[u] if v not in depth}
        for v in nxt:
            depth[v] = d
        frontier = nxt
    return depth


def test_matches_bruteforce_random_digraph(ray_session):
    rng = np.random.RandomState(7)
    n = 120
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(260)]
    seeds = [0, 17, 63]
    for md in (0, 1, 3):
        assert _run(seeds, edges, md) == _brute(seeds, edges, md)


def test_matches_bruteforce_undirected(ray_session):
    rng = np.random.RandomState(13)
    n = 60
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(90)]
    got = _run([5], edges, 4, undirected=True)
    assert got == _brute([5], edges, 4, undirected=True)


def test_min_hop_and_unreached_absent(ray_session):
    # two paths to node 3 (length 1 via 0→3 and length 2 via 0→1→3):
    # depth must be the MIN; node 9 is unreachable and must be absent
    edges = [(0, 1), (1, 3), (0, 3), (3, 4), (8, 9)]
    got = _run([0], edges, 4)
    assert got == {0: 0, 1: 1, 3: 1, 4: 2}


def test_early_exit_matches_full_unroll(ray_session):
    # chain exhausts at depth 2; max_depth=10 must not change the output
    edges = [(0, 1), (1, 2)]
    assert _run([0], edges, 10) == _run([0], edges, 2)


def test_seed_duplicates_collapse(ray_session):
    got = _run([0, 0, 0, 2], [(0, 1)], 2)
    assert got == {0: 0, 2: 0, 1: 1}


def test_string_ids(ray_session):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    got = _run(["a"], edges, 2)
    assert got == {"a": 0, "b": 1, "c": 2}


def test_broadcast_and_join_tiers_identical(ray_session):
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.RandomState(31)
    n = 100
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(220)]
    seeds = rd.from_arrow(pa.table({"node": pa.array([0, 41])}))
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    })).repartition(4)
    bcast = {r["node"]: r["depth"]
             for r in bfs_depth(seeds, e, max_depth=3).take_all()}
    joined = {r["node"]: r["depth"]
              for r in bfs_depth(seeds, e, max_depth=3,
                                 broadcast_limit=0).take_all()}
    assert bcast == joined == _brute([0, 41], edges, 3)


def test_empty_seed_set(ray_session):
    import pyarrow as pa
    import ray.data as rd
    seeds = rd.from_arrow(pa.table({"node": pa.array([], pa.int64())}))
    e = rd.from_arrow(pa.table({"src": pa.array([1], pa.int64()),
                                "dst": pa.array([2], pa.int64())}))
    assert bfs_depth(seeds, e, max_depth=3).take_all() == []


def test_dense_tier_matches_exchange_tiers(ray_session):
    """Round-5 dense tier (frontier-bitmask broadcast + vector_sum hop)
    vs both exchange tiers, directed and undirected, incl. seeds absent
    from the edge table and string ids."""
    rng = np.random.RandomState(17)
    edges = [(int(rng.randint(60)), int(rng.randint(60)))
             for _ in range(150)]
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    })).repartition(4)
    seeds = rd.from_arrow(pa.table({"node": pa.array([0, 7, 99])}))
    for und in (False, True):
        dense = {r["node"]: r["depth"] for r in bfs_depth(
            seeds, e, max_depth=3, undirected=und).take_all()}
        bcast = {r["node"]: r["depth"] for r in bfs_depth(
            seeds, e, max_depth=3, undirected=und, dense_bound=0).take_all()}
        joined = {r["node"]: r["depth"] for r in bfs_depth(
            seeds, e, max_depth=3, undirected=und, dense_bound=0,
            broadcast_limit=0).take_all()}
        assert dense == bcast == joined
        assert dense[99] == 0  # seed outside the edge set still emits


def test_dense_tier_string_ids(ray_session):
    e = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b", "c"]),
        "dst": pa.array(["b", "c", "d"]),
    }))
    seeds = rd.from_arrow(pa.table({"node": pa.array(["a"])}))
    dense = {r["node"]: r["depth"]
             for r in bfs_depth(seeds, e, max_depth=2).take_all()}
    assert dense == {"a": 0, "b": 1, "c": 2}
    assert dense == {r["node"]: r["depth"] for r in bfs_depth(
        seeds, e, max_depth=2, dense_bound=0).take_all()}
