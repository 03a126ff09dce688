"""HITS (ops/hits.py) — hand-computed alternating rounds on a tiny
bipartite-ish graph (the shape Kleinberg's algorithm is built to
separate), dense-path/join-path equality, and isolated-node zeros."""

import pytest


@pytest.fixture()
def graph(ray_session):
    import ray.data as rd

    # hubs 0,1 point at authorities 2,3; node 4 is isolated
    nodes = rd.from_items([{"node": i} for i in range(5)], override_num_blocks=2)
    edges = rd.from_items(
        [
            {"src": 0, "dst": 2},
            {"src": 0, "dst": 3},
            {"src": 1, "dst": 2},
            {"src": 3, "dst": 2},
        ],
        override_num_blocks=2,
    )
    return nodes, edges


def test_one_round_hand_computed(graph):
    from pappermate_ray.ops.hits import hits

    nodes, edges = graph
    out = {r["node"]: (r["auth"], r["hub"]) for r in
           hits(nodes, edges, iters=1).take_all()}
    # h0 = 1 everywhere
    # a1: indegree -> a1(2)=3, a1(3)=1, rest 0
    # h1(u) = sum a1 over out-links: h1(0)=3+1=4, h1(1)=3, h1(3)=3
    assert out == {
        0: (0, 4),
        1: (0, 3),
        2: (3, 0),
        3: (1, 3),
        4: (0, 0),  # isolated: zero-union keeps it present
    }


def test_two_rounds_hand_computed(graph):
    from pappermate_ray.ops.hits import hits

    nodes, edges = graph
    out = {r["node"]: (r["auth"], r["hub"]) for r in
           hits(nodes, edges, iters=2).take_all()}
    # a2(v) = sum h1 over in-links: a2(2)=h1(0)+h1(1)+h1(3)=4+3+3=10,
    # a2(3)=h1(0)=4
    # h2(0)=a2(2)+a2(3)=14, h2(1)=10, h2(3)=10
    assert out == {
        0: (0, 14),
        1: (0, 10),
        2: (10, 0),
        3: (4, 10),
        4: (0, 0),
    }


def test_dense_path_equals_join_path(ray_session):
    import ray.data as rd

    from pappermate_ray.ops.hits import hits

    nodes = rd.from_items([{"node": i} for i in range(8)], override_num_blocks=3)
    edges = rd.from_items(
        [{"src": i, "dst": (i * 5 + 1) % 8} for i in range(8)]
        + [{"src": i, "dst": (i * 3 + 2) % 8} for i in range(8)],
        override_num_blocks=3,
    )
    join_out = sorted(hits(nodes, edges, iters=3).take_all(),
                      key=lambda r: r["node"])
    dense_out = sorted(hits(nodes, edges, iters=3, dense_ids=True).take_all(),
                       key=lambda r: r["node"])
    assert join_out == dense_out  # int64 end-to-end: exact equality


def test_overflow_guard_raises_dense(ray_session):
    """2^16-fold parallel edges both ways grow scores 2^16x per
    half-round -> round 2's hub step would pass 2^63; the guard must
    raise instead of silently wrapping int64."""
    import ray.data as rd

    from pappermate_ray.ops.hits import hits

    m = 1 << 16
    nodes = rd.from_items([{"node": 0}, {"node": 1}])
    edges = rd.from_items(
        [{"src": 0, "dst": 1} for _ in range(m)]
        + [{"src": 1, "dst": 0} for _ in range(m)],
        override_num_blocks=4,
    )
    with pytest.raises(OverflowError, match="hits"):
        hits(nodes, edges, iters=2, dense_ids=True).take_all()
    # one round stays inside int64 and must still work
    out = {r["node"]: (r["auth"], r["hub"]) for r in
           hits(nodes, edges, iters=1, dense_ids=True).take_all()}
    assert out[1] == (m, m * m)


def test_overflow_guard_raises_join_path(ray_session):
    import ray.data as rd

    from pappermate_ray.ops.hits import hits

    m = 1 << 16
    nodes = rd.from_items([{"node": 0}, {"node": 1}])
    edges = rd.from_items(
        [{"src": 0, "dst": 1} for _ in range(m)]
        + [{"src": 1, "dst": 0} for _ in range(m)],
        override_num_blocks=4,
    )
    with pytest.raises(OverflowError, match="hits"):
        hits(nodes, edges, iters=2).take_all()


def test_parallel_edges_count_multiply(ray_session):
    import ray.data as rd

    from pappermate_ray.ops.hits import hits

    nodes = rd.from_items([{"node": i} for i in range(2)])
    edges = rd.from_items([{"src": 0, "dst": 1}, {"src": 0, "dst": 1}])
    out = {r["node"]: (r["auth"], r["hub"]) for r in
           hits(nodes, edges, iters=1).take_all()}
    assert out[1] == (2, 0)
    assert out[0] == (0, 4)  # h1(0) = 2 edges x a1(1)=2


def test_empty_graph_both_paths(ray_session):
    """Zero nodes/edges (a corpus that harvests no links) returns an
    empty ranking instead of crashing on the None Max aggregate."""
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.ops.hits import hits

    nodes = rd.from_arrow(pa.table({"node": pa.array([], pa.int64())}))
    edges = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert hits(nodes, edges, iters=2).take_all() == []
    assert hits(nodes, edges, iters=2, dense_ids=True).take_all() == []
