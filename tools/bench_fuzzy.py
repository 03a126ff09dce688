"""Micro-bench: fuzzy_pairs scaling evidence — the operator's cost is
driven by the DISTINCT-value count, not the corpus row count.

    python tools/bench_fuzzy.py [n_rows] [n_distinct] [num_cpus]

Builds a synthetic corpus of ``n_rows`` rows drawn from ``n_distinct``
short names (every 10th distinct name is a planted 1-edit variant of
its predecessor, so real pairs exist), times fuzzy_pairs at the same
row count for two distinct-cardinalities, and reports rows/s plus the
pair count. Results recorded in BASELINE.md.
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

_FIRST = ["red", "blue", "cold", "warm", "late", "early", "big", "tiny",
          "fast", "slow", "dark", "pale", "gray", "bold", "calm", "neat"]
_SECOND = ["bolt", "gear", "ring", "pipe", "claw", "disk", "fork", "gate",
           "hook", "lens", "mast", "node", "pump", "rail", "seal", "vane"]


def _name(k: int) -> str:
    base = f"{_FIRST[k % 16]} {_SECOND[(k // 16) % 16]} {k // 256}"
    if k % 10 == 9:  # planted 1-edit variant of k-1's name
        prev = _name(k - 1)
        return prev[:-1] + ("x" if prev[-1] != "x" else "y")
    return base


def build(n_rows: int, n_distinct: int, path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)

    def make(t: pa.Table) -> pa.Table:
        idx = t["id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "name": pa.array([_name(int(i) % n_distinct) for i in idx],
                             pa.string()),
        })

    rd.range(n_rows).map_batches(make, batch_format="pyarrow").write_parquet(path)


def run(n_rows: int, n_distinct: int, num_cpus: int) -> None:
    from pappermate_ray.stages.fuzzy import fuzzy_pairs

    path = f"/tmp/bench_fuzzy_{n_rows}_{n_distinct}"
    build(n_rows, n_distinct, path)
    ds = rd.read_parquet(path)
    t0 = time.perf_counter()
    out = fuzzy_pairs(ds, "name", max_dist=1,
                      n_distinct_hint=n_distinct)
    n_pairs = out.count()
    dt = time.perf_counter() - t0
    print(f"rows={n_rows} distinct={n_distinct} pairs={n_pairs} "
          f"wall={dt:.2f}s rows/s={n_rows / dt:,.0f}")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_distinct = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        # same corpus size, two distinct-cardinalities: wall time should
        # track the SECOND knob, not the first
        run(n_rows, n_distinct, num_cpus)
        run(n_rows, n_distinct * 4, num_cpus)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
