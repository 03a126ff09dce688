"""Micro-bench: latest_by_url fast (aggregate+semi-join) vs per-group path
at high url cardinality (round-2 verdict item #6 evidence).

    python tools/bench_latest_by_url.py [n_urls] [num_cpus]

Builds a synthetic recrawl corpus (every 3rd url has 2 captures, every
7th has 3), times both strategies over identical input, verifies equal
output counts. Results recorded in BASELINE.md.
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


def build_corpus(n_urls: int, path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ids = rd.range(n_urls)

    def make(t: pa.Table) -> pa.Table:
        idx = t["id"].to_numpy(zero_copy_only=False)
        urls, ts, payload = [], [], []
        for i in idx:
            u = f"https://h{i % 9973}.example/p/{i}"
            base = 1_700_000_000_000_000 + int(i) * 1_000_000
            caps = 1 + (i % 3 == 0) + (i % 7 == 0)
            for c in range(caps):
                urls.append(u)
                ts.append(base + c * 3_600_000_000)
                payload.append(f"payload-{i}-{c}".encode() * 8)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(payload, pa.binary()),
        })

    ids.map_batches(make, batch_format="pyarrow").write_parquet(path)


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from pappermate_ray.stages.dedup import latest_by_url, latest_by_url_parquet

    path = f"/tmp/latest_bench_{n_urls}"
    if not os.path.exists(os.path.join(path, "_done")):
        build_corpus(n_urls, path)
        open(os.path.join(path, "_done"), "w").close()

    results = {}
    t0 = time.perf_counter()
    n = latest_by_url_parquet(path, file_extensions=["parquet"]).count()
    results["two-pass"] = time.perf_counter() - t0
    print(f"two-pass: {results['two-pass']:.1f}s rows={n} "
          f"({n_urls} distinct urls, {ncpu} cpus)")
    assert n == n_urls
    for strategy in ("aggregate", "groups"):
        t0 = time.perf_counter()
        n = latest_by_url(
            rd.read_parquet(path, file_extensions=["parquet"]), strategy=strategy
        ).count()
        dt = time.perf_counter() - t0
        results[strategy] = dt
        print(f"{strategy}: {dt:.1f}s rows={n} ({n_urls} distinct urls, {ncpu} cpus)")
        assert n == n_urls
    print(f"groups/aggregate: {results['groups'] / results['aggregate']:.1f}x, "
          f"aggregate/two-pass: {results['aggregate'] / results['two-pass']:.1f}x")
    ray.shutdown()


if __name__ == "__main__":
    main()
