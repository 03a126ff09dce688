"""Micro-bench: decontaminate (substring, O(|grams|) scans per doc) vs
decontaminate_ngrams (rolling-hash token windows, O(tokens) per doc) as
the benchmark-suite size grows.

    python tools/bench_decontaminate.py [n_docs] [n_grams] [num_cpus]

Builds a synthetic word corpus; every 10th doc gets one planted gram.
Times both modes over identical input and verifies identical hit sets
(all planted grams are token-aligned, so the modes agree exactly).
Results recorded in BASELINE.md.
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

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def gram_text(g: int) -> str:
    return " ".join(f"bench{g}w{j}" for j in range(6))


def build_docs(n_docs: int, n_grams: int):
    ids = rd.range(n_docs)

    def make(t: pa.Table) -> pa.Table:
        idx = t["id"].to_numpy(zero_copy_only=False)
        texts = []
        for i in idx:
            rng = np.random.default_rng(int(i))  # seeded per row — deterministic
            words = [VOCAB[k] for k in rng.integers(0, len(VOCAB), 300)]
            if i % 10 == 0:
                pos = int(rng.integers(0, len(words)))
                words[pos:pos] = gram_text(int(i) % n_grams).split()
            texts.append(" ".join(words))
        return pa.table({"doc_id": pa.array(idx, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ids.map_batches(make, batch_format="pyarrow").materialize()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_grams = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from pappermate_ray.stages.webclean import decontaminate, decontaminate_ngrams

    docs = build_docs(n_docs, n_grams)
    grams = [gram_text(g) for g in range(n_grams)]

    t0 = time.perf_counter()
    n_sub = decontaminate(docs, grams).count()
    t_sub = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_tok = decontaminate_ngrams(docs, grams, n=6).count()
    t_tok = time.perf_counter() - t0

    assert n_sub == n_tok == (n_docs + 9) // 10, (n_sub, n_tok)
    print({
        "n_docs": n_docs, "n_grams": n_grams, "num_cpus": cpus,
        "substring_sec": round(t_sub, 2), "ngram_sec": round(t_tok, 2),
        "speedup": round(t_sub / t_tok, 2), "hits": n_tok,
    })
    ray.shutdown()


if __name__ == "__main__":
    main()
