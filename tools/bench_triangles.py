"""Triangle-counting scale micro-bench: join path vs broadcast fast
path on a synthetic power-law-ish graph.

Usage: python tools/bench_triangles.py [n_nodes] [edges_per_node] [cpus]
Defaults: 500_000 nodes x 4 edges/node = 2M directed edges, 32 CPUs.

Prints one JSON line with both wall times and the (identical) total
triangle count — evidence the degree-ordered join path holds past the
broadcast bound and that both paths agree at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    epn = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.ops.triangles import triangle_counts

    nodes = rd.range(n).map_batches(
        lambda t: pa.table({"node": t["id"]}), batch_format="pyarrow",
    ).materialize()

    def mk_edges(t: pa.Table) -> pa.Table:
        i = np.asarray(t["node"], np.int64)
        srcs, dsts = [], []
        for k in range(epn):
            srcs.append(i)
            # chain + skip + two multiplicative mixes -> triangles exist
            dsts.append((i * (2 * k + 1) + k + 1) % n)
        return pa.table({
            "src": pa.array(np.concatenate(srcs), pa.int64()),
            "dst": pa.array(np.concatenate(dsts), pa.int64()),
        })

    edges = nodes.map_batches(mk_edges, batch_format="pyarrow").materialize()

    def total(ds) -> int:
        s = 0
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            s += int(np.asarray(b["n_triangles"], np.int64).sum())
        return s

    t0 = time.perf_counter()
    join_total = total(triangle_counts(nodes, edges, node_col="node",
                                       dense_ids=False))
    t_join = time.perf_counter() - t0

    # middle tier: degree vector broadcasts, rank joins disappear
    t0 = time.perf_counter()
    mid_total = total(triangle_counts(nodes, edges, node_col="node",
                                      dense_ids=True, dense_bound=0,
                                      node_broadcast_bound=n))
    t_mid = time.perf_counter() - t0

    t0 = time.perf_counter()
    dense_total = total(triangle_counts(nodes, edges, node_col="node",
                                        dense_ids=True,
                                        dense_bound=n * epn + 1))
    t_dense = time.perf_counter() - t0

    assert join_total == mid_total == dense_total, (
        join_total, mid_total, dense_total)
    print(json.dumps({
        "n_nodes": n, "n_edges": n * epn, "cpus": cpus,
        "join_path_sec": round(t_join, 2),
        "deg_broadcast_sec": round(t_mid, 2),
        "dense_path_sec": round(t_dense, 2),
        "triangles_x3": join_total,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
