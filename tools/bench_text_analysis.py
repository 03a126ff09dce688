"""Micro-bench: vectorized vs scalar text-analysis kernels at scale.

    python tools/bench_text_analysis.py [n_docs] [num_cpus]

Builds an n_docs corpus by tiling the sf0.1 documents table (texts reused
verbatim so the character mix is the real corpus'), materializes it to
/tmp parquet (task granularity comes from source blocks), then times the
fused analyze_text_batch stage end-to-end through Ray Data, plus the
single-core kernel-only comparison (batch kernels vs the scalar loop the
stage used before round 4). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    base = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                         columns=["doc_id", "text"])
    reps = (n_docs + len(base) - 1) // len(base)
    texts = base["text"].to_pylist() * reps
    texts = texts[:n_docs]

    # single-core kernel comparison on a 20k slice (scalar loop is slow)
    sl = [t or "" for t in texts[:20_000]]
    from pappermate_ray.functions.quality import (
        bpe_ish_token_count, detect_language, detect_language_batch,
        fingerprint, fingerprint_batch, quality_score, quality_score_batch,
        text_metrics_batch, token_count)
    t0 = time.perf_counter()
    for x in sl:
        detect_language(x); quality_score(x); token_count(x)
        bpe_ish_token_count(x); fingerprint(x)
    t_scalar = time.perf_counter() - t0
    best_vec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        m = text_metrics_batch(sl)
        quality_score_batch(sl, metrics=m)
        detect_language_batch(sl)
        fingerprint_batch(sl)
        best_vec = min(best_vec, time.perf_counter() - t0)

    # distributed pass over a materialized parquet corpus, keyed on
    # FIXTURES_VERSION so a regenerated sf0.1 never serves stale texts
    from pappermate_ray.fixtures import FIXTURES_VERSION
    src = f"/tmp/bench_ta_v{FIXTURES_VERSION}_{n_docs}"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        os.makedirs(src, exist_ok=True)
        ids = np.arange(n_docs, dtype=np.int64)
        rows_per_file = 50_000
        for i in range(0, n_docs, rows_per_file):
            pq.write_table(
                pa.table({"doc_id": ids[i:i + rows_per_file],
                          "text": pa.array(texts[i:i + rows_per_file],
                                           pa.string())}),
                os.path.join(src, f"part-{i // rows_per_file:05d}.parquet"))
        open(os.path.join(src, "_SUCCESS"), "w").close()

    import ray
    import ray.data as rd
    from pappermate_ray.stages.quality import analyze_text_batch

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    t0 = time.perf_counter()
    n_out = (rd.read_parquet(src, columns=["doc_id", "text"])
             .map_batches(analyze_text_batch, batch_format="pyarrow")
             .count())
    wall = time.perf_counter() - t0
    ray.shutdown()
    assert n_out == n_docs

    print(json.dumps({
        "metric": "text_analysis_docs_per_sec",
        "value": round(n_docs / wall, 1),
        "wall_sec": round(wall, 2),
        "n_docs": n_docs,
        "num_cpus": num_cpus,
        "kernel_scalar_sec_20k": round(t_scalar, 3),
        "kernel_vector_sec_20k": round(best_vec, 3),
        "kernel_speedup": round(t_scalar / best_vec, 2),
    }))


if __name__ == "__main__":
    main()
