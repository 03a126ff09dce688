"""Micro-bench: the iterative graph family (ops/bfs.py, ops/kcore.py)
at web scale — evidences (a) bfs_depth's bounded-frontier rounds never
exchange the edge table (the frontier broadcasts; one narrow distinct +
one anti-join per round are the only exchanges), (b) k_core's rounds
cost ONE narrow degree groupby each in the loser-broadcast tier (the
peel fringe ships via ray.put; the surviving edge set filters in a
streaming map), with early exit at the fixpoint. Measured at 1M nodes /
1.75M directed edges / 32 CPUs: the loser-broadcast tier took k_core
from 133 s (two semi-joins per round) to 63 s.

    python tools/bench_graph_iter.py [n_nodes] [num_cpus]

Round 5 adds the LPA tier pair (ops/lpa.py): the dense/broadcast tier
(labels broadcast, one streaming vote pass + two narrow groupbys per
round) vs the BSP join path (one hash join + vote groupby +
partition-grouped argmax + anti-join per round), asserted identical.

The graphs are formulaic (dst = (a·i+b) mod N), so the driver verifies
both outputs EXACTLY with vectorized numpy (full dict equality, not a
sample). Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

# directed out-edges: every node gets the chain edge; every 4th node
# additionally gets the three jump formulas (dst = (a*i + b) % N) — the
# degree skew makes the k-core peel chain stretches gradually instead
# of fixpointing in one round
_CHAIN = ((1, 1),)
_JUMPS = ((7, 1), (13, 5), (2, 3))
_SEED_MOD = 10_000          # seeds = multiples of this
_MAX_DEPTH = 4
_KCORE_K = 3
_KCORE_ROUNDS = 8
_LPA_ITERS = 3


def _raw_edges(i: np.ndarray, n: int):
    j = i[i % 4 == 0]
    src = np.concatenate([i] + [j] * len(_JUMPS))
    dst = np.concatenate([(a * i + b) % n for a, b in _CHAIN] +
                         [(a * j + b) % n for a, b in _JUMPS])
    return src, dst


def _edges_ds(n: int) -> "rd.Dataset":
    def make(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src, dst = _raw_edges(i, n)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return rd.range(n).map_batches(make, batch_format="pyarrow")


def _driver_bfs(n: int, max_depth: int) -> dict:
    depth = np.full(n, -1, np.int64)
    frontier = np.arange(0, n, _SEED_MOD, dtype=np.int64)
    depth[frontier] = 0
    for d in range(1, max_depth + 1):
        j = frontier[frontier % 4 == 0]
        nxt = np.unique(np.concatenate(
            [(a * frontier + b) % n for a, b in _CHAIN] +
            [(a * j + b) % n for a, b in _JUMPS]))
        nxt = nxt[depth[nxt] == -1]
        if not len(nxt):
            break
        depth[nxt] = d
        frontier = nxt
    reached = np.flatnonzero(depth >= 0)
    return dict(zip(reached.tolist(), depth[reached].tolist()))


def _driver_kcore(n: int, k: int, rounds: int) -> dict:
    i = np.arange(n, dtype=np.int64)
    src, dst = _raw_edges(i, n)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    keep = s != d
    s, d = s[keep], d[keep]
    key = np.unique(s * n + d)
    s, d = key // n, key % n
    for _ in range(rounds):
        deg = np.bincount(s, minlength=n)
        alive = deg >= k
        keep = alive[s] & alive[d]
        if keep.all():
            break
        s, d = s[keep], d[keep]
    deg = np.bincount(s, minlength=n)
    nodes = np.flatnonzero(deg)
    return dict(zip(nodes.tolist(), deg[nodes].tolist()))


def _driver_lpa(n: int, iters: int) -> dict:
    i = np.arange(n, dtype=np.int64)
    src, dst = _raw_edges(i, n)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    lab = np.arange(n, dtype=np.int64)
    shift = n + 1
    for _ in range(iters):
        key = d * shift + lab[s]
        uk, c = np.unique(key, return_counts=True)
        prio = c.astype(np.int64) * shift + (n - uk % shift)
        new = lab.copy()
        order = np.argsort(uk // shift, kind="stable")
        uks, prios = (uk // shift)[order], prio[order]
        starts = np.flatnonzero(np.r_[True, uks[1:] != uks[:-1]])
        best = np.maximum.reduceat(prios, starts)
        new[uks[starts]] = n - (best % shift)
        lab = new
    return dict(zip(range(n), lab.tolist()))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.ops.bfs import bfs_depth
    from pappermate_ray.ops.kcore import k_core

    e = _edges_ds(n)
    seeds = rd.range(n).filter(lambda r: r["id"] % _SEED_MOD == 0) \
        .map_batches(lambda t: pa.table({"node": t["id"]}),
                     batch_format="pyarrow")

    want_bfs = _driver_bfs(n, _MAX_DEPTH)
    t0 = time.time()
    got_bfs = {r["node"]: r["depth"]
               for r in bfs_depth(seeds, e, max_depth=_MAX_DEPTH).take_all()}
    wall_bfs = time.time() - t0
    ok_bfs = got_bfs == want_bfs

    t0b = time.time()
    got_bfs_x = {r["node"]: r["depth"]
                 for r in bfs_depth(seeds, e, max_depth=_MAX_DEPTH,
                                    dense_bound=0).take_all()}
    wall_bfs_x = time.time() - t0b
    ok_bfs_x = got_bfs_x == want_bfs

    want_kc = _driver_kcore(n, _KCORE_K, _KCORE_ROUNDS)
    t1 = time.time()
    got_kc = {r["node"]: r["degree"]
              for r in k_core(_edges_ds(n), _KCORE_K,
                              rounds=_KCORE_ROUNDS).take_all()}
    wall_kc = time.time() - t1
    ok_kc = got_kc == want_kc

    t1b = time.time()
    got_kc_x = {r["node"]: r["degree"]
                for r in k_core(_edges_ds(n), _KCORE_K,
                                rounds=_KCORE_ROUNDS,
                                dense_bound=0).take_all()}
    wall_kc_x = time.time() - t1b
    ok_kc_x = got_kc_x == want_kc

    from pappermate_ray.ops.lpa import label_propagation_auto

    nodes = rd.range(n).map_batches(
        lambda t: pa.table({"node": t["id"]}), batch_format="pyarrow")
    want_lpa = _driver_lpa(n, _LPA_ITERS)

    t2 = time.time()
    got_lpa = {r["node"]: r["label"]
               for r in label_propagation_auto(
                   nodes, _edges_ds(n), iters=_LPA_ITERS).take_all()}
    wall_lpa = time.time() - t2
    ok_lpa = got_lpa == want_lpa

    t3 = time.time()
    got_lpa_j = {r["node"]: r["label"]
                 for r in label_propagation_auto(
                     nodes, _edges_ds(n), iters=_LPA_ITERS,
                     dense_bound=0).take_all()}
    wall_lpa_j = time.time() - t3
    ok_lpa_j = got_lpa_j == want_lpa

    n_edges = n + (n // 4 + (1 if n % 4 else 0)) * len(_JUMPS)
    print({"n_nodes": n, "n_edges": n_edges, "num_cpus": ncpu,
           "bfs_dense_wall_s": round(wall_bfs, 2),
           "bfs_exchange_wall_s": round(wall_bfs_x, 2),
           "bfs_reached": len(got_bfs),
           "ok_bfs": ok_bfs and ok_bfs_x,
           "kcore_dense_wall_s": round(wall_kc, 2),
           "kcore_exchange_wall_s": round(wall_kc_x, 2),
           "kcore_survivors": len(got_kc),
           "ok_kcore": ok_kc and ok_kc_x,
           "lpa_dense_wall_s": round(wall_lpa, 2),
           "lpa_join_wall_s": round(wall_lpa_j, 2),
           "ok_lpa_dense": ok_lpa,
           "ok_lpa_join": ok_lpa_j})
    ray.shutdown()
    if not (ok_bfs and ok_bfs_x and ok_kc and ok_kc_x
            and ok_lpa and ok_lpa_j):
        sys.exit(1)


if __name__ == "__main__":
    main()
