"""Micro-bench for the greedy selection loop (stages/select.py).

Evidence for the scale claim: exact greedy MMR / k-center is k
sequential argmaxes, and the operator's cost must be exactly k
streaming scans — the selected-set state never grows past k·d floats
(one ray.put per round), the per-row fold is one matvec against ONE
new embedding (never O(|S|·d)), and each round's argmax reaches the
driver as per-block top-1 partials (O(blocks) rows). If any of that
regressed — a per-round re-rank against the whole selected set, or a
sort exchange for the argmax — per-round wall would grow with k or
with the selected set; here it must stay flat.

Usage:
    python tools/bench_greedy_select.py [rows...] [--k K] [--cpus N]
    # default: 200_000 1_000_000 rows, k=8, 32 cpus

Prints one JSON line per row count: total seconds, rows/s, and the
per-round walls (flat = the claim holds).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

D = 32


def _emb_ds(n: int, blocks: int):
    import ray.data as rd

    def gen(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # deterministic pseudo-embeddings: hash-seeded sin lattice
        base = (i[:, None] * 2654435761 + np.arange(D)[None, :] * 40503) % 100003
        x = np.sin(base.astype(np.float64) * 1e-3).astype(np.float32)
        return pa.table({
            "vec_id": pa.array(i, pa.int64()),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
        })

    return (rd.range(n, override_num_blocks=blocks)
            .map_batches(gen, batch_format="pyarrow"))


def main():
    import ray

    k = 8
    cpus = 32
    sizes = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--k":
            k = int(next(it))
        elif a == "--cpus":
            cpus = int(next(it))
        else:
            sizes.append(int(a))
    sizes = sizes or [200_000, 1_000_000]

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.stages.select import mmr_select

    for n in sizes:
        ds = _emb_ds(n, blocks=64).materialize()
        q = np.array(ds.take(1)[0]["embedding"], dtype=np.float64)
        # per-round flatness evidenced by halving k: if rounds are flat,
        # sec/round at k and k/2 agree (any per-round cost growing with
        # |S| would make the k run's average strictly worse)
        walls = {}
        for kk in (max(2, k // 2), k):
            t0 = time.perf_counter()
            out = mmr_select(ds, q, k=kk, lam=0.7, exclude_ids=[0])
            walls[kk] = time.perf_counter() - t0
            assert out.num_rows == kk
        total = walls[k]
        print(json.dumps({
            "rows": n, "k": k,
            "total_sec": round(total, 2),
            "scan_rows_per_sec": int(n * k / total),
            "sec_per_round": {str(kk): round(w / kk, 3)
                              for kk, w in walls.items()},
            "cpus": cpus,
        }), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
