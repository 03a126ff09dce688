"""Entity-span actor stage (SURVEY.md §2.3 ST3/ST4).

``EntitySpans`` is the canonical stateful actor-pool stage: the pattern
store is built once per actor in ``__init__`` (the reference loads BERT /
RoBERTa / sentence-transformer weights + merged OpenAI pattern packs there,
processing/entity_extractor.py:48-89, 228-290); ``__call__`` scans a batch.
Spans are deduped in-row (D1) and emitted as a nested Arrow list column.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

from ..functions.spans import BASE_PATTERNS, extract_spans, mean_confidence

ENTITIES_TYPE = pa.list_(
    pa.struct(
        [
            ("text", pa.string()),
            ("entity_type", pa.string()),
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("confidence", pa.float32()),
            ("model", pa.string()),
        ]
    )
)


class EntitySpans:
    """docs(text, status) → + entities(list<struct>), n_entities, span_confidence."""

    def __init__(self, extra_patterns: Optional[Dict[str, List[str]]] = None, max_chars: int = 100_000):
        # once per actor: merge base pattern store with caller-supplied packs
        # (the ST4 merge, dict.fromkeys dedup order-preserving)
        merged: Dict[str, List[str]] = {k: list(v) for k, v in BASE_PATTERNS.items()}
        for etype, texts in (extra_patterns or {}).items():
            merged.setdefault(etype, []).extend(texts)
            merged[etype] = list(dict.fromkeys(merged[etype]))
        self.patterns = merged
        self.max_chars = max_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        statuses = batch["status"].to_pylist()
        ents, n_ents, confs = [], [], []
        for text, status in zip(texts, statuses):
            if status == "error" or not text:
                ents.append([])
                n_ents.append(0)
                confs.append(0.0)
                continue
            try:
                spans = extract_spans(text, self.patterns, self.max_chars)
            except Exception:  # soft-fail per row
                spans = []
            ents.append(spans)
            n_ents.append(len(spans))
            confs.append(mean_confidence(spans))
        out = batch.append_column("entities", pa.array(ents, type=ENTITIES_TYPE))
        out = out.append_column("n_entities", pa.array(n_ents, type=pa.int32()))
        out = out.append_column("span_confidence", pa.array(confs, type=pa.float64()))
        return out
