"""ops/lpa.py — synchronous label-propagation semantics (SQL equivalence
is the oracle gate's `lpa_communities` row; here: brute-force equality,
planted-clique recovery, isolated nodes, string ids)."""

import collections

import numpy as np
import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.lpa import label_propagation


def _run(n_nodes, edges, iters, ids=None, **kw):
    ids = ids if ids is not None else list(range(n_nodes))
    nodes = rd.from_arrow(pa.table({"node": pa.array(ids)}))
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    })).repartition(4)
    out = label_propagation(nodes, e, iters=iters, **kw).take_all()
    return {r["node"]: r["label"] for r in out}


def _brute(ids, edges, iters, undirected=True):
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        if undirected:
            adj[b].append(a)
    lab = {v: v for v in ids}
    for _ in range(iters):
        nxt = {}
        for v in ids:
            if not adj[v]:
                nxt[v] = lab[v]
                continue
            cnt = collections.Counter(lab[u] for u in adj[v])
            m = max(cnt.values())
            nxt[v] = min(l for l, c in cnt.items() if c == m)
        lab = nxt
    return lab


def test_matches_bruteforce_random_graph(ray_session):
    rng = np.random.RandomState(11)
    n = 80
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(200)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(n, edges, iters=3)
    assert got == _brute(list(range(n)), edges, 3)


def test_planted_cliques_converge_to_min_id(ray_session):
    # two 8-cliques joined by one bridge: LPA keeps them separate
    # communities (connectivity-based components would merge them)
    edges = []
    for base in (0, 8):
        edges += [(base + i, base + j) for i in range(8)
                  for j in range(i + 1, 8)]
    edges.append((3, 11))  # bridge
    got = _run(16, edges, iters=4)
    assert set(got[i] for i in range(8)) == {0}
    assert set(got[i] for i in range(8, 16)) == {8}


def test_isolated_nodes_keep_label(ray_session):
    got = _run(5, [(0, 1), (1, 2)], iters=3)
    assert got[3] == 3 and got[4] == 4


def test_directed_votes_one_way(ray_session):
    # directed: 0->1 gives node 1 a vote carrying 0's label; node 0
    # receives nothing and keeps its own
    assert _run(2, [(0, 1)], iters=1, undirected=False) == {0: 0, 1: 0}
    # undirected, synchronous: the pair SWAPS labels each round (both
    # hear only the other's previous label) — pin the oscillation
    assert _run(2, [(0, 1)], iters=1) == {0: 1, 1: 0}
    assert _run(2, [(0, 1)], iters=2) == {0: 0, 1: 1}


def test_string_node_ids(ray_session):
    ids = ["a.com", "b.com", "c.com", "d.com"]
    edges = [("a.com", "b.com"), ("b.com", "c.com"), ("a.com", "c.com")]
    got = _run(None, edges, iters=3, ids=ids)
    assert got["d.com"] == "d.com"
    assert got["a.com"] == got["b.com"] == got["c.com"] == "a.com"


# ---------------------------------------------------------------------------
# label_propagation_auto — dense/broadcast tier (round-4 verdict #3)
# ---------------------------------------------------------------------------

def _run_auto(n_nodes, edges, iters, ids=None, **kw):
    from pappermate_ray.ops.lpa import label_propagation_auto

    ids = ids if ids is not None else list(range(n_nodes))
    nodes = rd.from_arrow(pa.table({"node": pa.array(ids)}))
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges]),
        "dst": pa.array([b for _, b in edges]),
    })).repartition(4)
    out = label_propagation_auto(nodes, e, iters=iters, **kw).take_all()
    return {r["node"]: r["label"] for r in out}


def test_auto_dense_matches_join_path(ray_session):
    rng = np.random.RandomState(7)
    n = 80
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(250)]
    edges = [(a, b) for a, b in edges if a != b]
    for und in (True, False):
        dense = _run_auto(n, edges, iters=3, undirected=und)
        join = _run_auto(n, edges, iters=3, undirected=und, dense_bound=0)
        assert dense == join
        # brute with in-neighbor voting (engine contract: a vote rides
        # src->dst carrying src's label, so v's voters are its
        # IN-neighbors; _brute's adj uses out-neighbors when directed)
        brute = _brute(list(range(n)),
                       edges if und else [(b, a) for a, b in edges],
                       3, undirected=und)
        assert dense == brute


def test_auto_dense_isolated_and_oscillation(ray_session):
    got = _run_auto(5, [(0, 1), (1, 2)], iters=3)
    assert got[3] == 3 and got[4] == 4
    assert _run_auto(2, [(0, 1)], iters=1) == {0: 1, 1: 0}
    assert _run_auto(2, [(0, 1)], iters=2) == {0: 0, 1: 1}


def test_auto_dense_string_ids(ray_session):
    ids = ["a.com", "b.com", "c.com", "d.com"]
    edges = [("a.com", "b.com"), ("b.com", "c.com"), ("a.com", "c.com")]
    got = _run_auto(None, edges, iters=3, ids=ids)
    assert got["d.com"] == "d.com"
    assert got["a.com"] == got["b.com"] == got["c.com"] == "a.com"
    # dense-vs-join equality holds for string ids too
    assert got == _run_auto(None, edges, iters=3, ids=ids, dense_bound=0)


def test_auto_dense_parallel_edges_count_multiply(ray_session):
    # node 2 hears label 0 twice (parallel edge) vs label 1 once
    edges = [(0, 2), (0, 2), (1, 2)]
    got = _run_auto(3, edges, iters=1, undirected=False)
    assert got[2] == 0
    assert got == _run_auto(3, edges, iters=1, undirected=False,
                            dense_bound=0)

