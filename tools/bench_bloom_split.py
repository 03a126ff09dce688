"""Micro-bench: double-scan bloom_split vs single-pass bloom_split_tagged
on payload-bearing rows (round-3 verdict #8).

Usage:
    python tools/bench_bloom_split.py [n_rows] [payload_bytes] [cpus]
    # defaults: 1_000_000 rows, 400-byte payloads, 32 cpus

Prints one JSON line: best-of-2 wall time to consume BOTH slices on
each path.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    pay = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.ops.bloom import (bloom_split, bloom_split_tagged,
                                          build_bloom)

    blob = "x" * pay
    t = pa.table({
        "key": pa.array([f"k{i}" for i in range(n_rows)], pa.string()),
        "payload": pa.array([blob] * n_rows, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(max(8, cpus)).materialize()
    seen = rd.from_arrow(pa.table(
        {"key": pa.array([f"k{i}" for i in range(0, n_rows, 2)],
                         pa.string())}))
    bm, m, k = build_bloom(seen, "key", n_rows // 2)

    out = {}
    counts = {}
    for label, fn in (("double_scan", bloom_split),
                      ("tagged_single_pass", bloom_split_tagged)):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            new, maybe = fn(ds, "key", bm, m, k)
            c = (new.count(), maybe.count())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        counts[label] = c
        out[label] = round(best, 3)
    assert counts["double_scan"] == counts["tagged_single_pass"]

    ray.shutdown()
    print(json.dumps({
        "metric": "bloom_split_both_slices_sec",
        "n_rows": n_rows, "payload_bytes": pay, "num_cpus": cpus,
        **out,
        "new_rows": counts["double_scan"][0],
        "maybe_rows": counts["double_scan"][1],
    }))


if __name__ == "__main__":
    main()
