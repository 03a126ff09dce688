"""ops/rendezvous.py — HRW ownership (SQL equivalence is the oracle
gate's `shard_rebalance` row; here: the minimal-movement guarantees,
balance, determinism under repartitioning)."""

import collections

import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.rendezvous import (rendezvous_assign,
                                           rendezvous_rebalance)


def _keys(n, blocks=1):
    ds = rd.from_arrow(pa.table({
        "url": pa.array([f"https://h{i % 97}.com/page{i}" for i in range(n)],
                        pa.string())}))
    return ds.repartition(blocks) if blocks > 1 else ds


def test_grow_moves_only_to_new_node(ray_session):
    old = [f"n{i}" for i in range(4)]
    rows = rendezvous_rebalance(_keys(2000), old, old + ["n4"]).take_all()
    moved = [r for r in rows if r["moved"]]
    assert all(r["new_owner"] == "n4" for r in moved)
    assert all(r["old_owner"] == r["new_owner"] for r in rows
               if not r["moved"])
    # expected fraction 1/5; generous band
    assert 0.10 < len(moved) / len(rows) < 0.30


def test_shrink_moves_only_removed_nodes_keys(ray_session):
    new = [f"n{i}" for i in range(4)]
    rows = rendezvous_rebalance(_keys(2000), new + ["n4"], new).take_all()
    assert all(r["old_owner"] == "n4" for r in rows if r["moved"])


def test_balance_and_repartition_invariance(ray_session):
    nodes = [f"w{i}" for i in range(8)]
    one = rendezvous_assign(_keys(4000), nodes).take_all()
    many = rendezvous_assign(_keys(4000, blocks=13), nodes).take_all()
    o = {r["url"]: r["owner"] for r in one}
    m = {r["url"]: r["owner"] for r in many}
    assert o == m
    load = collections.Counter(o.values())
    assert len(load) == 8
    # multinomial noise: each node near 500 of 4000
    assert min(load.values()) > 350 and max(load.values()) < 650


def test_node_order_irrelevant_and_guards(ray_session):
    import pytest

    a = rendezvous_assign(_keys(300), ["b", "a", "c"]).take_all()
    b = rendezvous_assign(_keys(300), ["c", "b", "a"]).take_all()
    assert {r["url"]: r["owner"] for r in a} == \
           {r["url"]: r["owner"] for r in b}
    with pytest.raises(ValueError):
        rendezvous_assign(_keys(1), [])
