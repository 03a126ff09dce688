"""Micro-bench for the bounded dense-vector reduction (ops/vecreduce.py).

Evidence for the dense PageRank/HITS partials contract: at B edge
blocks over N nodes, the old driver-sequential sum shipped B × N×8
bytes through the driver per round; the grouped path ships N×8 once
(the reduced vector the driver needs anyway for the next broadcast).

Usage:
    python tools/bench_dense_reduce.py [n_nodes] [n_edges] [blocks] [cpus]
    # defaults: 2_000_000 nodes, 8_000_000 edges, 1024 blocks, 32 cpus

Prints one JSON line: wall time of one inflow-style reduction on each
path plus the analytic driver-transit bytes for both.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.ops.vecreduce import (dense_vector_sum,
                                              sparse_vector_sum)

    rng = np.random.default_rng(11)
    t = pa.table({
        "src": pa.array(rng.integers(0, n, n_edges), pa.int64()),
        "dst": pa.array(rng.integers(0, n, n_edges), pa.int64()),
    })
    edges = rd.from_arrow(t).repartition(blocks).materialize()
    ranks = np.full(n, 1.0 / n)
    rref = ray.put(ranks)

    def contrib(tab: pa.Table) -> np.ndarray:
        r = ray.get(rref)
        vec = np.zeros(n)
        np.add.at(vec, np.asarray(tab["dst"], np.int64),
                  r[np.asarray(tab["src"], np.int64)])
        return vec

    paths = (
        # (label, callable) — sparse is what the auto rule picks for
        # E < blocks·N/2 (this bench's regime); chunked-grouped and the
        # old driver-sequential sum are the dense-block alternatives
        ("sparse", lambda: sparse_vector_sum(edges, contrib, n, np.float64,
                                             driver_rows=0)),
        ("chunked_grouped", lambda: dense_vector_sum(edges, contrib, n,
                                                     np.float64,
                                                     driver_rows=0)),
        ("driver_seq", lambda: dense_vector_sum(edges, contrib, n,
                                                np.float64,
                                                driver_rows=1 << 30)),
    )
    results = {}
    want = None
    for label, fn in paths:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if want is None:
            want = out
        else:
            assert np.allclose(out, want, atol=1e-15), "paths disagree"
        results[label] = round(best, 3)

    ray.shutdown()
    print(json.dumps({
        "metric": "dense_vector_sum_sec",
        "n_nodes": n, "n_edges": n_edges, "blocks": blocks,
        "num_cpus": cpus,
        **{f"{k}_sec": v for k, v in results.items()},
        "driver_transit_bytes_exchange_paths": n * 8,
        "driver_transit_bytes_driver_seq": blocks * n * 8,
    }))


if __name__ == "__main__":
    main()
