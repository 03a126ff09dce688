"""Scale bench for the one-pass moment reduce (ops/linalg.py).

What it evidences: covariance over N embeddings of dimension d costs
one float64 matmul per block plus a d²-sized reduction whose driver
transit is INDEPENDENT of block count (the dense_vector_sum contract)
— so the wall clock should track N·d² flops, not blocks. Verified
exactly against a single-process numpy covariance on the same rows.

Usage:
    python tools/bench_linalg.py [rows] [dim] [blocks] [cpus]
    # defaults: 2_000_000 rows, 64 dims, 256 blocks, 32 cpus

Prints one JSON line: seconds per (blocks, rows) cell, flop rate, and
the max |Δ| vs the numpy reference.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def _mat(rows: int, dim: int) -> np.ndarray:
    # deterministic, cheap, anisotropic (per-dim scale varies)
    i = np.arange(rows, dtype=np.float64)[:, None]
    j = np.arange(dim, dtype=np.float64)[None, :]
    return np.sin(i * 0.001 + j) * (1.0 + j / dim)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.ops.linalg import covariance_stats

    X = _mat(rows, dim).astype(np.float32)

    def ds_with_blocks(b: int):
        parts = np.array_split(np.arange(rows), b)
        tabs = [pa.table({"embedding": pa.array(X[p].tolist(),
                                                pa.list_(pa.float32()))})
                for p in parts]
        return rd.from_arrow_refs([ray.put(t) for t in tabs])

    out = {"rows": rows, "dim": dim, "cpus": cpus, "cells": {}}
    ref_g = None
    for b in (max(blocks // 4, 1), blocks):
        ds = ds_with_blocks(b)
        t0 = time.perf_counter()
        g, s, n = covariance_stats(ds, d=dim)
        dt = time.perf_counter() - t0
        assert n == rows
        if ref_g is None:
            Xd = X.astype(np.float64)
            ref_g = Xd.T @ Xd
            out["max_abs_err_vs_numpy"] = float(
                np.max(np.abs(g - ref_g)) / max(np.max(np.abs(ref_g)), 1.0))
        out["cells"][f"blocks={b}"] = {
            "sec": round(dt, 2),
            "gflops": round(2 * rows * dim * dim / dt / 1e9, 1),
        }

    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
