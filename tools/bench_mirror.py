"""Micro-bench: host_mirror_pairs scale shape — evidences that wall
tracks the (fp, host) scan and the planted-pair output, not host
cardinality, and that the storm cap keeps a universal boilerplate
fingerprint from exploding quadratically.

    python tools/bench_mirror.py [n_hosts] [pages_per_host] [num_cpus]

Corpus: every host carries `pages_per_host` distinct fingerprints plus
ONE boilerplate fingerprint shared by ALL hosts (the storm row —
excluded by max_hosts_per_fp, so it must cost nothing but the scan).
Every 5th host pair (2j, 2j+1 with j % 5 == 0) is a full mirror
(identical page fingerprints). Invariants verified exactly per run:
the output is EXACTLY the planted mirror pairs, each with n_shared =
pages_per_host, totals pages_per_host + 1 per side, and is_mirror true
(jaccard = P/(P+2) ≥ 0.5 for P ≥ 2). Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

import ray
import ray.data as rd


def build_corpus(n_hosts: int, pages: int, path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
    ids = rd.range(n_hosts)

    def make(t: pa.Table) -> pa.Table:
        hosts, fps = [], []
        for i in t["id"].to_numpy(zero_copy_only=False):
            h = f"h{i}.example"
            j = i // 2
            mirrored = j % 5 == 0
            for p in range(pages):
                hosts.append(h)
                fps.append(f"m{j}-{p}" if mirrored else f"u{i}-{p}")
            hosts.append(h)
            fps.append("boiler")  # the universal fingerprint — capped
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "fp": pa.array(fps, pa.string())})

    ids.map_batches(make, batch_format="pyarrow").write_parquet(path)


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 19
    ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    assert n_hosts % 2 == 0 and pages >= 2
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pappermate_ray.stages.links import host_mirror_pairs

    path = f"/tmp/bench_mirror_{n_hosts}_{pages}"
    build_corpus(n_hosts, pages, path)
    n_rows = n_hosts * (pages + 1)

    ds = rd.read_parquet(path, columns=["host", "fp"])
    t0 = time.time()
    out = host_mirror_pairs(ds, min_shared=1, max_hosts_per_fp=1000,
                            mirror_permille=500).take_all()
    wall = time.time() - t0

    expect_pairs = {(f"h{2 * j}.example", f"h{2 * j + 1}.example")
                    for j in range(n_hosts // 2) if j % 5 == 0}
    got_pairs = {(r["host_a"], r["host_b"]) for r in out}
    ok = (
        got_pairs == expect_pairs
        and all(r["n_shared"] == pages and r["n_a"] == pages + 1
                and r["n_b"] == pages + 1 and r["is_mirror"] for r in out)
    )
    print({"n_hosts": n_hosts, "pages_per_host": pages, "n_rows": n_rows,
           "num_cpus": ncpu, "wall_s": round(wall, 2),
           "rows_per_sec": round(n_rows / wall),
           "pairs": len(out), "expect_pairs": len(expect_pairs), "ok": ok})
    ray.shutdown()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
