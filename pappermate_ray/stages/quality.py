"""Text-analysis stage: language-ID, quality, token counts, fingerprints.

One fused ``map_batches`` pass (single scan, no shuffle) adding four
columns — the cheap-per-row ops are batched together so the corpus is
read once (at 100 TB a second pass is the expensive part, not the ops).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.quality import (
    bpe_ish_token_count,
    detect_language,
    fingerprint,
    quality_score,
    token_count,
)


def analyze_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    langs, quals, toks, btoks, fps = [], [], [], [], []
    for t in texts:
        t = t or ""
        langs.append(detect_language(t))
        quals.append(quality_score(t))
        toks.append(token_count(t))
        btoks.append(bpe_ish_token_count(t))
        fps.append(fingerprint(t))
    out = batch.append_column("pred_lang", pa.array(langs, pa.string()))
    out = out.append_column("quality", pa.array(quals, pa.float64()))
    out = out.append_column("n_tokens", pa.array(toks, pa.int64()))
    out = out.append_column("n_bpe_tokens", pa.array(btoks, pa.int64()))
    out = out.append_column("fingerprint", pa.array(fps, pa.int64()))
    return out
