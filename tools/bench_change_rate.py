"""Micro-bench: content_change_rate (ops/snapshot.py) at crawl scale —
evidences that the text payload never rides an exchange: per-capture
word counts and distinct word rows are computed in-batch, so the only
shuffled rows are the narrow (url, snap, word) triples and the
aggregate-sized pair skeleton.

    python tools/bench_change_rate.py [n_urls] [n_snaps] [num_cpus]

The capture history is formulaic, so the driver verifies exact
invariants per run: even-id urls republish identical captures (change
must be exactly 0.0 on every pair) and odd-id urls alternate between
two disjoint vocabularies (change must be exactly 1.0). Results
recorded in BASELINE.md.
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

_WORDS_PER_CAP = 25


def _obs_ds(n_urls: int, n_snaps: int) -> "rd.Dataset":
    def make(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        urls, snaps, texts = [], [], []
        for i in ids:
            stable = " ".join(f"w{i}_{j}" for j in range(_WORDS_PER_CAP))
            alt = [" ".join(f"a{i}_{j}" for j in range(_WORDS_PER_CAP)),
                   " ".join(f"b{i}_{j}" for j in range(_WORDS_PER_CAP))]
            for s in range(n_snaps):
                urls.append(f"u{i}")
                snaps.append(s)
                texts.append(stable if i % 2 == 0 else alt[s % 2])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "snap": pa.array(snaps, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    return rd.range(n_urls).map_batches(make, batch_format="pyarrow")


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_snaps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from ray.data.aggregate import Count, Max, Min, Sum

    from pappermate_ray.ops.snapshot import content_change_rate

    obs = _obs_ds(n_urls, n_snaps).materialize()
    n_caps = n_urls * n_snaps

    t0 = time.time()
    out = content_change_rate(obs)

    def tag(t: pa.Table) -> pa.Table:
        even = np.array([int(u[1:]) % 2 == 0 for u in
                         t["url"].to_pylist()])
        ch = t["change"].to_numpy(zero_copy_only=False)
        return pa.table({
            "even_min": pa.array(np.where(even, ch, 2.0), pa.float64()),
            "even_max": pa.array(np.where(even, ch, -2.0), pa.float64()),
            "odd_min": pa.array(np.where(~even, ch, 2.0), pa.float64()),
            "odd_max": pa.array(np.where(~even, ch, -2.0), pa.float64()),
            "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        })

    st = out.map_batches(tag, batch_format="pyarrow").aggregate(
        Min("even_min"), Max("even_max"), Min("odd_min"), Max("odd_max"),
        Sum("one"), Count())
    wall = time.time() - t0

    n_pairs = n_urls * (n_snaps - 1)
    ok = (st["sum(one)"] == n_pairs
          and st["min(even_min)"] == 0.0 and st["max(even_max)"] == 0.0
          and st["min(odd_min)"] == 1.0 and st["max(odd_max)"] == 1.0)
    print({"n_urls": n_urls, "n_snaps": n_snaps, "n_captures": n_caps,
           "num_cpus": ncpu, "wall_s": round(wall, 2),
           "captures_per_sec": round(n_caps / wall),
           "n_pairs": n_pairs, "ok": ok})
    ray.shutdown()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
