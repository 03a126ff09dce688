"""Micro-bench: host_boilerplate_removal scale shape at high doc count —
evidences that wall-clock tracks the corpus scan, not host count or hot
vocabulary size (only int64 keys ride the two narrow exchanges).

    python tools/bench_host_boilerplate.py [n_docs] [n_hosts] [num_cpus]

Builds a synthetic crawl corpus (n_docs docs over n_hosts hosts; each
host carries a host-distinct nav paragraph on 60% of its pages, docs
have 6 unique 12-word body paragraphs), times the operator end-to-end,
and verifies the removal count exactly (0.6 * n_docs nav instances
dropped, nothing else). Results recorded in BASELINE.md.
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


def build_corpus(n_docs: int, n_hosts: int, path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
    ids = rd.range(n_docs)

    def make(t: pa.Table) -> pa.Table:
        idx = t["id"].to_numpy(zero_copy_only=False)
        hosts, texts = [], []
        for i in idx:
            h = f"h{i % n_hosts}.example"
            paras = ([f"site {h} navigation menu home about contact login"]
                     if i % 5 < 3 else [])
            paras += [" ".join(f"w{i}x{p}y{k}" for k in range(12))
                      for p in range(6)]
            hosts.append(h)
            texts.append("\n".join(paras))
        return pa.table({
            "doc_id": pa.array(idx, pa.int64()),
            "host": pa.array(hosts, pa.string()),
            "text": pa.array(texts, pa.string()),
        })

    ids.map_batches(make, batch_format="pyarrow").write_parquet(path)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ray.data.aggregate import Sum

    from pappermate_ray.stages.webclean import host_boilerplate_removal

    path = f"/tmp/bench_hostbp_{n_docs}_{n_hosts}"
    build_corpus(n_docs, n_hosts, path)

    ds = rd.read_parquet(path, columns=["doc_id", "host", "text"])
    t0 = time.time()
    out = host_boilerplate_removal(
        ds, host_col="host", id_col="doc_id", text_col="text",
        min_host_permille=400, min_docs=2)
    stats = out.aggregate(Sum("n_removed", alias_name="removed"),
                          Sum("n_paras", alias_name="paras"))
    wall = time.time() - t0
    # every host's nav para sits on 3/5 of its pages (600‰ ≥ 400‰, and
    # ≥2 docs once a host has ≥4 pages) → exactly the carried instances drop
    expect = sum(1 for i in range(n_docs) if i % 5 < 3)
    ok = stats["removed"] == expect
    print({"n_docs": n_docs, "n_hosts": n_hosts, "num_cpus": ncpu,
           "wall_s": round(wall, 2),
           "docs_per_sec": round(n_docs / wall),
           "removed": stats["removed"], "expect": expect, "ok": ok})
    ray.shutdown()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
