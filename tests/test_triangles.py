"""Triangle counting (ops/triangles.py) — hand-computed graphs,
input-noise robustness (direction/dups/self-loops), hub safety and
partitioning invariance."""

import pytest


def _counts(nodes, edges):
    from pappermate_ray.ops.triangles import triangle_counts

    return {r["node"]: r["n_triangles"]
            for r in triangle_counts(nodes, edges).take_all()}


def test_k4_plus_isolated(ray_session):
    import ray.data as rd

    nodes = rd.from_items([{"node": i} for i in range(5)], override_num_blocks=2)
    edges = rd.from_items(
        [{"src": a, "dst": b} for a in range(4) for b in range(4) if a < b],
        override_num_blocks=2,
    )
    assert _counts(nodes, edges) == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0}


def test_direction_dups_selfloops_ignored(ray_session):
    import ray.data as rd

    nodes = rd.from_items([{"node": i} for i in range(3)])
    # one triangle, expressed messily: reversed dups + self-loop
    edges = rd.from_items([
        {"src": 0, "dst": 1}, {"src": 1, "dst": 0},
        {"src": 2, "dst": 1}, {"src": 0, "dst": 2},
        {"src": 2, "dst": 2},
    ])
    assert _counts(nodes, edges) == {0: 1, 1: 1, 2: 1}


def test_hub_with_unconnected_leaves(ray_session):
    import ray.data as rd

    # star K1,5: hub 0, no leaf-leaf edges -> zero triangles; the hub's
    # high degree must not fabricate wedges (degree ordering points
    # leaves AT the hub)
    nodes = rd.from_items([{"node": i} for i in range(6)])
    edges = rd.from_items([{"src": 0, "dst": i} for i in range(1, 6)])
    assert all(v == 0 for v in _counts(nodes, edges).values())
    # close one leaf pair -> exactly one triangle on {0,1,2}
    edges2 = rd.from_items(
        [{"src": 0, "dst": i} for i in range(1, 6)] + [{"src": 1, "dst": 2}])
    assert _counts(nodes, edges2) == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0}


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    n = 40
    raw = []
    for i in range(n):
        raw += [{"src": i, "dst": (i + 1) % n},
                {"src": i, "dst": (i + 2) % n},
                {"src": i, "dst": (i * 2) % n}]
    nodes1 = rd.from_items([{"node": i} for i in range(n)], override_num_blocks=1)
    nodes8 = rd.from_items([{"node": i} for i in range(n)], override_num_blocks=8)
    c1 = _counts(nodes1, rd.from_items(raw, override_num_blocks=1))
    c8 = _counts(nodes8, rd.from_items(raw, override_num_blocks=8))
    assert c1 == c8
    assert sum(c1.values()) > 0 and sum(c1.values()) % 3 == 0


def test_dense_path_equals_join_path(ray_session):
    import ray.data as rd

    from pappermate_ray.ops.triangles import triangle_counts

    n = 30
    raw = []
    for i in range(n):
        raw += [{"src": i, "dst": (i + 1) % n},
                {"src": i, "dst": (i + 2) % n},
                {"src": i, "dst": (i * 2) % n}]
    nodes = rd.from_items([{"node": i} for i in range(n)], override_num_blocks=3)
    edges = rd.from_items(raw, override_num_blocks=3)
    join_out = sorted(triangle_counts(nodes, edges).take_all(),
                      key=lambda r: r["node"])
    dense_out = sorted(triangle_counts(nodes, edges, dense_ids=True).take_all(),
                       key=lambda r: r["node"])
    assert join_out == dense_out
    assert sum(r["n_triangles"] for r in join_out) > 0


def test_degree_broadcast_tier_equals_join_path(ray_session):
    import ray.data as rd

    from pappermate_ray.ops.triangles import triangle_counts

    n = 30
    raw = []
    for i in range(n):
        raw += [{"src": i, "dst": (i + 1) % n},
                {"src": i, "dst": (i + 2) % n},
                {"src": i, "dst": (i * 2) % n}]
    nodes = rd.from_items([{"node": i} for i in range(n)], override_num_blocks=3)
    edges = rd.from_items(raw, override_num_blocks=3)
    join_out = sorted(triangle_counts(nodes, edges).take_all(),
                      key=lambda r: r["node"])
    # dense_bound=0 skips tier 1, node_broadcast_bound forces tier 2
    mid_out = sorted(
        triangle_counts(nodes, edges, dense_ids=True, dense_bound=0,
                        node_broadcast_bound=n).take_all(),
        key=lambda r: r["node"])
    assert join_out == mid_out
