"""Deterministic cached translator stage (SURVEY.md §2.2 M21, §2.3 ST5).

The reference translates text → EN through an API with an in-memory
``hash(text) → result`` cache and passthrough for English
(processing/translator.py:39-110). The deterministic sibling here applies
the fixed CJK term map (functions/naming.py) for ja/zh rows and passes
everything else through — same cache-in-front-of-expensive-work shape,
with the cache held per actor (the per-actor LRU pattern)."""

from __future__ import annotations

from collections import OrderedDict

import pyarrow as pa

from ..functions.naming import map_cjk_terms


class CachedTranslator:
    """Actor-pool stage: text column → translated column with per-actor cache."""

    def __init__(self, text_col: str = "contract_name", lang_col: str = "lang",
                 max_cache: int = 10_000):
        self.text_col = text_col
        self.lang_col = lang_col
        self.cache: "OrderedDict[str, str]" = OrderedDict()
        self.max_cache = max_cache
        self.hits = 0
        self.misses = 0

    def _translate(self, text: str, lang: str) -> str:
        if lang not in ("ja", "zh") or not text:
            return text  # passthrough (reference: lang=='en' short-circuit)
        hit = self.cache.get(text)
        if hit is not None:
            self.cache.move_to_end(text)
            self.hits += 1
            return hit
        self.misses += 1
        out = map_cjk_terms(text)
        self.cache[text] = out
        if len(self.cache) > self.max_cache:
            self.cache.popitem(last=False)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        langs = batch[self.lang_col].to_pylist()
        outs = [self._translate(t or "", l or "") for t, l in zip(texts, langs)]
        changed = [o != (t or "") for o, t in zip(outs, texts)]
        out = batch.append_column("translated_name", pa.array(outs, pa.string()))
        return out.append_column("was_translated", pa.array(changed, pa.bool_()))
