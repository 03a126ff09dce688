"""Micro-bench for the sorted-layout family (ops/rangesort.py).

Three questions, measured:

1. What does a full range-sorted export cost vs Ray's own
   ``Dataset.sort().write_parquet`` (the naive global-sort baseline)?
2. Does the LSM merge's cost track the INCREMENT (and the ranges it
   touches), not the base corpus? The scale claim is that a 1%%
   increment costs a small fraction of a full re-export.
3. What does compaction cost (pure concatenation, no re-sort)?

Usage:
    python tools/bench_rangesort.py [rows] [partitions] [cpus]
    # default: 4_000_000 64 32

Prints one JSON line. Input is a materialized parquet corpus (int64
key with duplicates + ~90-byte payload string) under /tmp, rebuilt per
run; outputs land under /tmp/bench_rangesort_out.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    partitions = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.ops.rangesort import (
        compact_layout,
        merge_sorted_layout,
        range_edges,
        range_sorted_export,
    )

    root = "/tmp/bench_rangesort_out"
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    os.makedirs(src_dir)

    # materialized source corpus: 32 files so the scan parallelizes
    # (the round-3 block-granularity lesson)
    rng = np.random.default_rng(11)
    per = rows // 32
    for f in range(32):
        keys = rng.integers(0, rows // 4, size=per)
        t = pa.table({
            "k": pa.array(keys, pa.int64()),
            "payload": pa.array(
                [f"payload-{i:08d}-" + "x" * 70 for i in keys[:per]],
                pa.string()),
        })
        pq.write_table(t, os.path.join(src_dir, f"src-{f:03d}.parquet"))

    def src():
        return rd.read_parquet(src_dir)

    out = {"rows": rows, "partitions": partitions, "num_cpus": cpus}

    def keys_only():
        return rd.read_parquet(src_dir, columns=["k"])

    t0 = time.perf_counter()
    edges_exact = range_edges(keys_only(), "k", partitions)
    out["edges_exact_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    edges = range_edges(keys_only(), "k", partitions, sample_mod=64)
    out["edges_sampled_sec"] = round(time.perf_counter() - t0, 3)
    # sampled edges must land near the exact ones (multinomial noise)
    drift = np.abs(np.searchsorted(np.array(edges_exact), np.array(edges))
                   - np.arange(1, partitions))
    out["edges_sampled_max_rank_drift"] = int(drift.max())

    t0 = time.perf_counter()
    manifest = range_sorted_export(
        src(), "k", os.path.join(root, "layout"), edges=edges).take_all()
    out["export_sec"] = round(time.perf_counter() - t0, 3)
    out["export_rows_per_sec"] = int(
        rows / (out["export_sec"] + out["edges_sampled_sec"]))

    # naive baseline: Ray global sort + plain parquet write
    t0 = time.perf_counter()
    src().sort("k").write_parquet(os.path.join(root, "raysort"))
    out["ray_sort_write_sec"] = round(time.perf_counter() - t0, 3)

    # 1% increment, clustered keys (touches a few ranges)
    n_inc = rows // 100
    lo = rows // 16
    inc = pa.table({
        "k": pa.array(rng.integers(lo, lo + rows // 200, size=n_inc),
                      pa.int64()),
        "payload": pa.array(["inc-" + "y" * 80] * n_inc, pa.string()),
    })
    t0 = time.perf_counter()
    merged = merge_sorted_layout(
        manifest, edges, rd.from_arrow(inc), "k",
        os.path.join(root, "merged")).take_all()
    out["merge_1pct_sec"] = round(time.perf_counter() - t0, 3)
    out["merge_touched_ranges"] = sum(
        1 for r in merged if "/merged/" in r["path"])
    out["merge_vs_export"] = round(
        out["merge_1pct_sec"] / out["export_sec"], 3)

    t0 = time.perf_counter()
    compact_layout(manifest, os.path.join(root, "compact"),
                   max(1, rows // 8)).take_all()
    out["compact_sec"] = round(time.perf_counter() - t0, 3)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
