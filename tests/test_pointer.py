"""Pointer jumping / redirect-chain resolution (ops/pointer.py)."""

import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.pointer import resolve_pointers


def _edges(pairs, parts=3):
    t = pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    })
    return rd.from_arrow(t).repartition(parts)


def test_long_chain_resolves_in_log_rounds():
    # chain 1→2→…→12→100: length 12, needs ceil(log2(12)) = 4 rounds
    pairs = [(i, i + 1) for i in range(1, 12)] + [(12, 100)]
    out = resolve_pointers(_edges(pairs), rounds=4, num_partitions=2).to_pandas()
    assert len(out) == 12
    assert set(out["dst"]) == {100}


def test_insufficient_rounds_leave_chain_partial():
    pairs = [(i, i + 1) for i in range(1, 12)] + [(12, 100)]
    out = resolve_pointers(_edges(pairs), rounds=2, num_partitions=2).to_pandas()
    # reach 2**2 = 4 hops: node 1 cannot reach 100 (12 hops away)
    tgt = out.set_index("src")["dst"]
    assert tgt[1] != 100
    assert tgt[10] == 100  # 3 hops away — resolved


def test_branching_trees_resolve_to_roots():
    # two stars feeding chains: 10,11,12 → 2 → 1 → 0 ; 20 → 21 (terminal)
    pairs = [(10, 2), (11, 2), (12, 2), (2, 1), (1, 0), (20, 21)]
    out = resolve_pointers(_edges(pairs), rounds=3, num_partitions=2).to_pandas()
    tgt = out.set_index("src")["dst"]
    assert all(tgt[s] == 0 for s in (10, 11, 12, 2, 1))
    assert tgt[20] == 21


def test_cycle_rows_keep_pointing_into_cycle():
    # 1→2→3→1 cycle plus a tail 9→1
    pairs = [(1, 2), (2, 3), (3, 1), (9, 1)]
    out = resolve_pointers(_edges(pairs, parts=2), rounds=3, num_partitions=2).to_pandas()
    srcs = set(p[0] for p in pairs)
    # nobody resolves to a terminal; every dst is still a redirect source
    assert set(out["dst"]).issubset(srcs)
    assert len(out) == 4


def test_auto_matches_join_path_including_cycles(ray_session):
    """resolve_pointers_auto's driver dict sweeps are the literal
    semantics of the distributed round — identical output on chains,
    terminals, branching aliases AND cycles (where both paths advance
    exactly 2^rounds hops)."""
    import ray.data as rd

    from pappermate_ray.ops.pointer import (resolve_pointers,
                                            resolve_pointers_auto)

    rows = (
        # 6-hop chain 10→…→16 (terminal)
        [{"src": 10 + i, "dst": 11 + i} for i in range(6)]
        # branching aliases into the chain
        + [{"src": 100, "dst": 12}, {"src": 101, "dst": 12}]
        # 3-cycle
        + [{"src": 20, "dst": 21}, {"src": 21, "dst": 22},
           {"src": 22, "dst": 20}]
    )
    edges = rd.from_items(rows, override_num_blocks=3)
    for rounds in (1, 2, 4):
        want = sorted((r["src"], r["dst"]) for r in
                      resolve_pointers(edges, rounds=rounds).take_all())
        got = sorted((r["src"], r["dst"]) for r in
                     resolve_pointers_auto(edges, rounds=rounds).take_all())
        fb = sorted((r["src"], r["dst"]) for r in
                    resolve_pointers_auto(edges, rounds=rounds,
                                          broadcast_bound=0).take_all())
        assert got == want == fb, rounds
    # fully resolved at rounds=4: every chain row reaches 16
    full = dict(resolve_pointers_auto(edges, rounds=4).take_all()
                and [(r["src"], r["dst"]) for r in
                     resolve_pointers_auto(edges, rounds=4).take_all()])
    assert all(full[10 + i] == 16 for i in range(6))
    assert full[100] == 16 and full[101] == 16
