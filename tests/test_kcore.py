"""ops/kcore.py — bounded-round k-core peeling (SQL equivalence is the
oracle gate's `kcore_hosts` row; here: brute-force equality on random
graphs, gradual tail peeling, early-exit/fixpoint identity, parallel
edges and self-loops, string ids)."""

import collections

import numpy as np
import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.kcore import k_core


def _run(edges, k, rounds=8):
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    })).repartition(4)
    out = k_core(e, k, rounds=rounds).take_all()
    got = {r["node"]: r["degree"] for r in out}
    assert len(got) == len(out)
    return got


def _brute(edges, k, rounds=8):
    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    for _ in range(rounds):
        dead = {v for v, ns in adj.items() if len(ns) < k}
        if not dead:
            break
        for v in dead:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
    return {v: len(ns) for v, ns in adj.items() if ns}


def test_matches_bruteforce_random_graph(ray_session):
    rng = np.random.RandomState(23)
    n = 70
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(240)]
    for k in (2, 3, 4):
        assert _run(edges, k) == _brute(edges, k)


def test_gradual_tail_peel_converges(ray_session):
    # 5-clique with a 4-node tail: at k=2 the tail peels one node per
    # round (end first), the clique survives with degree 4
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12), (12, 13)]
    got = _run(clique + tail, k=2, rounds=8)
    assert got == {i: 4 for i in range(5)}
    # insufficient rounds leave the partially-peeled approximation
    part = _run(clique + tail, k=2, rounds=1)
    assert set(part) == {0, 1, 2, 3, 4, 10, 11, 12}


def test_early_exit_matches_longer_unroll(ray_session):
    rng = np.random.RandomState(5)
    edges = [(int(rng.randint(40)), int(rng.randint(40)))
             for _ in range(100)]
    assert _run(edges, 3, rounds=6) == _run(edges, 3, rounds=12)


def test_parallel_edges_and_self_loops_collapse(ray_session):
    # triangle duplicated 3x plus self-loops: degrees must stay 2 each
    tri = [(0, 1), (1, 2), (2, 0)] * 3 + [(0, 0), (1, 1)]
    assert _run(tri, k=2) == {0: 2, 1: 2, 2: 2}


def test_string_ids(ray_session):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    assert _run(edges, k=2) == {"a": 2, "b": 2, "c": 2}


def test_broadcast_and_join_tiers_identical(ray_session):
    rng = np.random.RandomState(41)
    edges = [(int(rng.randint(50)), int(rng.randint(50)))
             for _ in range(160)]
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    })).repartition(4)
    bcast = {r["node"]: r["degree"] for r in k_core(e, 3).take_all()}
    joined = {r["node"]: r["degree"]
              for r in k_core(e, 3, broadcast_limit=0).take_all()}
    assert bcast == joined == _brute(edges, 3)


def test_dense_tier_matches_exchange_tiers(ray_session):
    """Round-5 dense tier (alive-bitmask broadcast + vector_sum
    bincount rounds) vs both exchange tiers and brute force — including
    directed mode, bounded rounds, and string ids."""
    rng = np.random.RandomState(43)
    edges = [(int(rng.randint(60)), int(rng.randint(60)))
             for _ in range(220)]
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    })).repartition(4)
    dense = {r["node"]: r["degree"] for r in k_core(e, 3).take_all()}
    bcast = {r["node"]: r["degree"]
             for r in k_core(e, 3, dense_bound=0).take_all()}
    joined = {r["node"]: r["degree"]
              for r in k_core(e, 3, dense_bound=0,
                              broadcast_limit=0).take_all()}
    assert dense == bcast == joined == _brute(edges, 3)
    # bounded-round approximation identical across tiers
    for rounds in (1, 2):
        a = {r["node"]: r["degree"]
             for r in k_core(e, 3, rounds=rounds).take_all()}
        b = {r["node"]: r["degree"]
             for r in k_core(e, 3, rounds=rounds, dense_bound=0).take_all()}
        assert a == b


def test_dense_tier_string_ids(ray_session):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    }))
    dense = {r["node"]: r["degree"] for r in k_core(e, 2).take_all()}
    assert dense == {"a": 2, "b": 2, "c": 2}
    assert dense == {r["node"]: r["degree"]
                     for r in k_core(e, 2, dense_bound=0).take_all()}
