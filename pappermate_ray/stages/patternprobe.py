"""Pattern × document similarity probe (SURVEY.md §2.4 J4).

The reference scores every domain-pattern text against every document via
sentence-transformer embeddings in a nested loop
(processing/entity_extractor.py:197-226, 292-312). The Ray-native shape:
patterns are embedded ONCE on the driver and broadcast (``ray.put``); each
batch computes a (docs × patterns) cosine matrix and emits the argmax
segment per (doc, pattern) pair above threshold — a broadcast nested-loop
join with a similarity predicate, no shuffle.

Deterministic embedding: hashed bag-of-words (feature hashing into a
fixed-dim float vector, L2-normalized) — a public-standard trick that
stands in for the model while keeping the engine hermetic.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

import ray

from ..functions.quality import fnv1a64

DIM = 256


def hashed_bow(text: str, dim: int = DIM) -> np.ndarray:
    """Feature-hashed bag-of-words embedding (deterministic)."""
    v = np.zeros(dim, dtype=np.float64)
    for w in text.lower().split():
        h = fnv1a64(w.encode("utf-8"))
        v[h % dim] += 1.0 if (h >> 63) == 0 else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class PatternProbe:
    """Actor-pool stage: per batch, score docs against the broadcast
    pattern matrix; emit (url, entity_type, pattern, similarity,
    best_segment) rows for scores ≥ threshold."""

    def __init__(self, patterns_ref, threshold: float = 0.35):
        # patterns_ref: ray.put({entity_type: [phrase, ...]})
        pats: Dict[str, List[str]] = ray.get(patterns_ref)
        self.entries: List[Tuple[str, str]] = [
            (etype, phrase) for etype, phrases in pats.items() for phrase in phrases
        ]
        self.P = np.stack([hashed_bow(p) for _, p in self.entries]) if self.entries else np.zeros((0, DIM))
        self.threshold = threshold

    def _best_segment(self, text: str, pvec: np.ndarray) -> str:
        """Argmax sentence by similarity (reference T9 in-row argmax)."""
        best, best_s = "", -1.0
        for seg in text.split("."):
            seg = seg.strip()
            if len(seg) < 10:
                continue
            s = float(hashed_bow(seg) @ pvec)
            if s > best_s:
                best, best_s = seg, s
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, etypes, phrases, sims, segs = [], [], [], [], []
        if len(self.entries):
            for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
                if not text:
                    continue
                d = hashed_bow(text[:5000])
                scores = self.P @ d
                for idx in np.nonzero(scores >= self.threshold)[0]:
                    etype, phrase = self.entries[idx]
                    urls.append(url)
                    etypes.append(etype)
                    phrases.append(phrase)
                    sims.append(round(float(scores[idx]), 6))
                    segs.append(self._best_segment(text[:5000], self.P[idx]))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "entity_type": pa.array(etypes, pa.string()),
                "pattern": pa.array(phrases, pa.string()),
                "similarity": pa.array(sims, pa.float64()),
                "best_segment": pa.array(segs, pa.string()),
            }
        )
