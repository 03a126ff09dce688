"""Benchmark harness — prints ONE JSON line with headline + per-query times.

Usage:
    python bench.py              # $GRAFT_SF_DIR (default /root/testdata/sf0.1),
                                 # $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # same job at 8 and 32 CPUs in fresh
                                 # processes → throughput + scaling efficiency

Headline: the flagship extraction pipeline (pages synthesized from the
documents table, replicated ×REPLICATE for a meaningful corpus) consumed by
a partitioned parquet write to /tmp. Metric: seconds (+docs/sec).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "10"))


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False

    import pyarrow as pa

    import ray.data as rd
    from pappermate_ray.fixtures import pages_batch_from_documents
    from pappermate_ray.pipelines.extract_pipeline import build_extraction_pipeline

    # warm the page cache (untimed)
    import pyarrow.parquet as pq

    pq.read_table(f"{sf_dir}/documents.parquet")

    def read_replicated_pages() -> "rd.Dataset":
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

        def replicate(t: pa.Table) -> pa.Table:
            if REPLICATE == 1:
                return t
            tabs = []
            for r in range(REPLICATE):
                ids = pa.array([d * REPLICATE + r for d in t["doc_id"].to_pylist()], pa.int64())
                tabs.append(pa.table({"doc_id": ids, "text": t["text"], "lang": t["lang"]}))
            return pa.concat_tables(tabs)

        docs = docs.map_batches(replicate, batch_format="pyarrow", batch_size=256)
        return docs.map_batches(pages_batch_from_documents, batch_format="pyarrow", batch_size=256)

    out_dir = f"/tmp/bench_out_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)

    n_docs = 0
    t0 = time.perf_counter()
    docs = build_extraction_pipeline(
        read_replicated_pages(),
        batch_size=128,
        parse_actors=num_cpus,
        span_actors=num_cpus,
    )
    flat = docs.drop_columns(["blocks", "entities"])
    flat.write_parquet(out_dir)
    headline = time.perf_counter() - t0
    import pyarrow.dataset as pads

    n_docs = pads.dataset(out_dir).count_rows()

    # per-query timings over the operator battery
    from pappermate_ray.queries import SQL_QUERIES

    extra = {
        "minhash_near_dups": None,
        "knn_bruteforce": None,
        "text_analysis": None,
    }
    from pappermate_ray.queries import NOSQL_QUERIES

    qtimes = {}
    for name in (
        "event_histogram", "lineitem_pricing", "events_hourly", "orderstatus_lineitem",
        "mktsegment_revenue", "dedup_exact", "stratified_sample", "top_docs",
        "knn_bruteforce", "token_counts",
    ):
        fn = SQL_QUERIES[name]
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "count"):
            res.count()
        qtimes[name] = round(time.perf_counter() - t0, 3)
    for name in ("minhash_near_dups", "text_analysis", "embedding_near_dups"):
        fn = NOSQL_QUERIES[name]
        t0 = time.perf_counter()
        fn(sf_dir).count()
        qtimes[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "extraction_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
        "queries": qtimes,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "replicate": REPLICATE,
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        def run(ncpu: int) -> dict:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        lo, hi = 8, 32
        r_lo, r_hi = run(lo), run(hi)
        tp_lo = r_lo["docs_per_sec"]
        tp_hi = r_hi["docs_per_sec"]
        eff = (tp_hi / tp_lo) / (hi / lo)
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "cpus_lo": lo, "cpus_hi": hi,
            "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
            "docs_per_sec_lo": tp_lo, "docs_per_sec_hi": tp_hi,
            "sf": sf_dir,
        }))
        return

    print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
