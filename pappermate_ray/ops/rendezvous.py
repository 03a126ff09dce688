"""Rendezvous (highest-random-weight) shard ownership — the
cluster-resize primitive ``ops/shard.py``'s ``mod num_shards`` recipe
cannot provide: when the fetcher/writer fleet grows from N to N+1
nodes, a mod-N assignment moves ~N/(N+1) of all keys; HRW moves
EXACTLY the keys the new node wins (~1/(N+1) in expectation) and
nothing else — the property that keeps a crawl frontier's per-host
state, a shard directory, or an LSH-index ownership map stable across
fleet changes (Thaler & Ravishankar 1998; the scheme behind Ceph/
Ring-style placement).

    owner(key) = argmax over nodes of md5(key '|' node)[:8 bytes]
    (ties — 2^-64-improbable but pinned — break node-ascending)

Scale shape: a pure streaming ``map_batches`` pass, ZERO exchange —
the node list is cluster-sized (≤ thousands), shipped in the task
closure; cost is rows × nodes md5 calls. For fleets beyond ~100 nodes
prefer two-level HRW (rack then node) — same operator applied twice.

Exactly reproducible in SQL (md5 hex → UBIGINT + an argmax window),
so ownership AND the minimal-movement rebalance report are both
oracle-checkable.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pyarrow as pa

import ray.data as rd


def _weights(keys: list, node: str) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(f"{k}|{node}".encode()).digest()[:8],
                        "big")
         for k in keys),
        dtype=np.uint64, count=len(keys))


def _owners(keys: list, nodes: list) -> np.ndarray:
    # np.argmax takes the FIRST max; nodes pre-sorted ascending makes
    # that the pinned node-ascending tie-break
    w = np.stack([_weights(keys, n) for n in nodes])
    return np.array(nodes, dtype=object)[w.argmax(axis=0)]


def rendezvous_assign(
    ds: "rd.Dataset",
    nodes: Sequence[str],
    key_col: str = "url",
    out_col: str = "owner",
) -> "rd.Dataset":
    """Append ``out_col``: the HRW owner of each row's key among
    ``nodes``. Streaming, shuffle-free, deterministic."""
    if not nodes:
        raise ValueError("rendezvous_assign: nodes must be non-empty")
    ns = sorted(set(map(str, nodes)))

    def tag(t: pa.Table) -> pa.Table:
        keys = [str(k) for k in t[key_col].to_pylist()]
        return t.append_column(out_col, pa.array(_owners(keys, ns),
                                                 pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def rendezvous_rebalance(
    ds: "rd.Dataset",
    nodes_old: Sequence[str],
    nodes_new: Sequence[str],
    key_col: str = "url",
) -> "rd.Dataset":
    """Rebalance report for a fleet change: one streaming pass emitting
    ``(key, old_owner, new_owner, moved)`` per row. HRW's guarantee —
    asserted in tests, visible in the report — is that on a pure
    grow every moved key lands on an ADDED node, and on a pure shrink
    only keys of REMOVED nodes move."""
    old_s = sorted(set(map(str, nodes_old)))
    new_s = sorted(set(map(str, nodes_new)))
    if not old_s or not new_s:
        raise ValueError("rendezvous_rebalance: node lists must be non-empty")

    def tag(t: pa.Table) -> pa.Table:
        keys = [str(k) for k in t[key_col].to_pylist()]
        o = _owners(keys, old_s)
        n = _owners(keys, new_s)
        return pa.table({
            key_col: t[key_col],
            "old_owner": pa.array(o, pa.string()),
            "new_owner": pa.array(n, pa.string()),
            "moved": pa.array(o != n, pa.bool_()),
        })

    return ds.map_batches(tag, batch_format="pyarrow")
