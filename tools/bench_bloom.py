"""Micro-bench: Bloom-pruned incremental anti-join vs plain anti-join
at crawl-delta scale (ops/bloom.py evidence).

    python tools/bench_bloom.py [n_new] [n_seen] [num_cpus]

Builds a synthetic crawl delta where 10% of the new crawl's keys were
already seen (the typical mostly-new recrawl regime where the prune
pays: 90% of rows never enter the exchange). Times both strategies on
identical materialized input, verifies identical output counts.
Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def build(n_new: int, n_seen: int, tmp: str):
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)

    # ~2 KB payload per row: the anti-join must shuttle the document
    # bytes through the exchange; the bloom path only ships the
    # maybe-seen sliver (the regime the operator exists for)
    filler = "loremipsum " * 186

    def new_batch(t: pa.Table) -> pa.Table:
        i = t["id"]
        return pa.table({
            "key": pc.binary_join_element_wise(
                pa.array(["k"] * t.num_rows), pc.cast(i, pa.string()), "-"),
            "n_chars": pc.add(pc.cast(i, pa.int64()), 17),
            "text": pc.binary_join_element_wise(
                pa.array([filler] * t.num_rows), pc.cast(i, pa.string()), "|"),
        })

    # seen = every 10th new key, padded with keys outside the new range
    def seen_batch(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy(zero_copy_only=False)
        mapped = [v * 10 if v * 10 < n_new else n_new + v for v in i]
        return pa.table({
            "key": pa.array([f"k-{v}" for v in mapped], pa.string()),
        })

    rd.range(n_new).map_batches(new_batch, batch_format="pyarrow").write_parquet(
        f"{tmp}/new")
    rd.range(n_seen).map_batches(seen_batch, batch_format="pyarrow").write_parquet(
        f"{tmp}/seen")


def main(n_new: int, n_seen: int, ncpu: int) -> None:
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.ops.bloom import incremental_new
    from pappermate_ray.ops.joins import anti_join, default_num_partitions

    tmp = f"/tmp/pappermate_bench_bloom_{n_new}_{n_seen}"
    build(n_new, n_seen, tmp)
    schema_new = pa.schema([("key", pa.string()), ("n_chars", pa.int64()),
                            ("text", pa.string())])
    schema_seen = pa.schema([("key", pa.string())])

    def read():
        return (rd.read_parquet(f"{tmp}/new"),
                rd.read_parquet(f"{tmp}/seen"))

    # warmup (worker spawn)
    rd.range(1000).map_batches(lambda t: t, batch_format="pyarrow").count()

    new, seen = read()
    t0 = time.perf_counter()
    n_plain = anti_join(new, seen, on="key",
                        left_schema=schema_new, right_schema=schema_seen).count()
    t_plain = time.perf_counter() - t0

    new, seen = read()
    t0 = time.perf_counter()
    n_bloom = incremental_new(new, seen, "key", n_seen_hint=n_seen,
                              new_schema=schema_new,
                              seen_schema=schema_seen).count()
    t_bloom = time.perf_counter() - t0

    assert n_plain == n_bloom, (n_plain, n_bloom)
    print({
        "n_new": n_new, "n_seen": n_seen, "num_cpus": ncpu,
        "out_rows": n_plain,
        "plain_anti_join_sec": round(t_plain, 2),
        "bloom_pruned_sec": round(t_bloom, 2),
        "speedup": round(t_plain / t_bloom, 2),
    })
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 120_000,
         int(sys.argv[3]) if len(sys.argv) > 3 else 32)
