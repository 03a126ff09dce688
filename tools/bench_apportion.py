"""Micro-bench for the no-sort largest-remainder selection
(ops/apportion.py).

Evidence for the scale claim: picking the r keys with the largest
remainders is a selection problem, not a ranking problem — the bucket
histogram + boundary-bucket value-count pins the cut with two narrow
aggregate passes (≤ n_buckets rows ever reach the driver), while the
obvious alternative globally sorts the ENTIRE key table by remainder
(an all-to-all range exchange) to read off the top r. At web scale
the key table is every registered domain (~1e8 rows); sorting it per
planning run is the bottleneck this operator avoids.

Usage:
    python tools/bench_apportion.py [keys...] [--cpus N]
    # default: 1_000_000 4_000_000 keys, 32 cpus

Prints one JSON line: per key count, seconds for the histogram path
and for the sort-based selection, plus the checksum agreement (both
paths must produce identical quota sums and winner counts).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

BUDGET_PER_KEY = 3  # budget = 3·keys, so quotas are 2-5 with remainders


def _scores(n: int, blocks: int):
    import ray.data as rd

    def gen(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "host": pa.array([f"h{x}" for x in i], pa.string()),
            "score": pa.array((i * 2654435761 % 97 + 1).astype(np.int64)),
        })

    return (rd.range(n, override_num_blocks=blocks)
            .map_batches(gen, batch_format="pyarrow"))


def _sort_based(src, budget: int):
    """The rejected design: global sort by remainder to pick winners."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    src = src.materialize()
    S = int(src.aggregate(Sum("score", alias_name="s"))["s"])

    def parts(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        prod = budget * s
        return (t.append_column("_base", pa.array(prod // S))
                 .append_column("_rem", pa.array(prod % S)))

    p = src.map_batches(parts, batch_format="pyarrow").materialize()
    r = budget - int(p.aggregate(Sum("_base", alias_name="b"))["b"])
    winners = p.sort(["_rem", "host"], descending=[True, False]).limit(r)
    wset = frozenset(row["host"] for row in winners.take_all())

    def finish(t: pa.Table) -> pa.Table:
        base = t["_base"].to_numpy(zero_copy_only=False)
        top = np.fromiter((h in wset for h in t["host"].to_pylist()),
                          dtype=np.int64, count=t.num_rows)
        return pa.table({"host": t["host"],
                         "quota": pa.array(base + top, pa.int64())})

    return p.map_batches(finish, batch_format="pyarrow")


def main() -> None:
    argv = sys.argv[1:]
    cpus = 32
    if "--cpus" in argv:
        i = argv.index("--cpus")
        cpus = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    keys_list = [int(a) for a in argv] or [1_000_000, 4_000_000]

    import ray
    from ray.data import DataContext
    from ray.data.aggregate import Sum

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.ops.apportion import largest_remainder

    out = {"cpus": cpus}
    for n in keys_list:
        budget = BUDGET_PER_KEY * n
        blocks = max(8, min(256, n // 50_000))
        src = _scores(n, blocks).materialize()

        t0 = time.perf_counter()
        hist = largest_remainder(src, budget, key_col="host",
                                 score_col="score")
        h_sum = int(hist.aggregate(Sum("quota", alias_name="q"))["q"])
        t_hist = time.perf_counter() - t0

        t0 = time.perf_counter()
        srt = _sort_based(src, budget)
        s_sum = int(srt.aggregate(Sum("quota", alias_name="q"))["q"])
        t_sort = time.perf_counter() - t0

        assert h_sum == s_sum == budget, (h_sum, s_sum, budget)
        out[str(n)] = {"hist_sec": round(t_hist, 2),
                       "sort_sec": round(t_sort, 2),
                       "exact_total": True}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
