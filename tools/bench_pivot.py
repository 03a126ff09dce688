"""Micro-bench for the partition-grouped pivot (ops/pivot.py).

Evidence for round-3 verdict #3: the old per-key ``map_groups`` widen
paid ~1 ms of dispatch per DISTINCT row key (a url-keyed pivot with 1M
keys ≈ 17 min); the partition-grouped widen handles every key of a
partition in one vectorized pandas pivot, so cost tracks ROW COUNT,
not key count.

Usage:
    python tools/bench_pivot.py [keys...] [--cpus N]
    # default: 100_000 1_000_000 keys, 32 cpus

Prints one JSON line with sec per key count (expect ~linear in keys,
i.e. per-key cost flat in the microseconds).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

CATS = ["en", "de", "es", "fr", "zh"]


def main() -> None:
    argv = sys.argv[1:]
    cpus = 32
    if "--cpus" in argv:
        i = argv.index("--cpus")
        cpus = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    keys_list = [int(a) for a in argv] or [100_000, 1_000_000]

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.ops.pivot import pivot_counts

    out = {}
    for n_keys in keys_list:
        rng = np.random.default_rng(5)
        rows = n_keys * 3  # ~3 (key, category) observations per key
        t = pa.table({
            "url": pa.array([f"https://h{i % n_keys}.example/p"
                             for i in rng.integers(0, n_keys, rows)],
                            pa.string()),
            "lang": pa.array([CATS[i] for i in
                              rng.integers(0, len(CATS), rows)],
                             pa.string()),
        })
        ds = rd.from_arrow(t).repartition(max(8, cpus)).materialize()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = pivot_counts(ds, "url", "lang", CATS).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        assert n <= n_keys
        out[str(n_keys)] = round(best, 3)

    ray.shutdown()
    per_key_us = {k: round(v / int(k) * 1e6, 2) for k, v in out.items()}
    print(json.dumps({
        "metric": "pivot_counts_sec_by_distinct_keys",
        "num_cpus": cpus,
        "sec": out,
        "per_key_usec": per_key_us,
    }))


if __name__ == "__main__":
    main()
