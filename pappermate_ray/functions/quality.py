"""Text-analysis functions for large-scale training-data pipelines.

Beyond-reference operators (driver brief): language-ID (n-gram/stopword
heuristic), quality scoring (length/punct/stopword ratios), token counting
(whitespace + BPE-ish regex), and document fingerprinting (rolling hash).
All deterministic, pure, and vectorization-friendly.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

_TOKEN_WS = re.compile(r"\S+")
_TOKEN_BPE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_PUNCT = re.compile(r"[^\w\s]")

# tiny per-language stopword profiles (public common-word lists)
_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the and of to a in is it you that he was for on are with as i his they be at".split()),
    "pt": frozenset("de a o que e do da em um para é com não uma os no se na por mais as dos".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al lo como".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans a par plus pas au".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein".split()),
}
_CJK_RANGES: Tuple[Tuple[int, int], ...] = (
    (0x4E00, 0x9FFF),   # CJK unified
    (0x3040, 0x309F),   # hiragana
    (0x30A0, 0x30FF),   # katakana
)
_KANA = ((0x3040, 0x309F), (0x30A0, 0x30FF))


def token_count(text: str) -> int:
    """Whitespace-separated token count (0 for empty/blank)."""
    return len(_TOKEN_WS.findall(text))


def bpe_ish_token_count(text: str) -> int:
    """BPE-ish token estimate: letter runs, digit runs, single punctuation."""
    return len(_TOKEN_BPE.findall(text))


def detect_language(text: str, sample_chars: int = 1000) -> str:
    """Heuristic language id over the first ``sample_chars`` chars.

    The reference detects on the first 1000 chars (processing/translator.py:33).
    CJK scripts are resolved by codepoint ranges (kana ⇒ ja, else zh);
    Latin languages by stopword-hit ratio; deterministic tie-break by
    language-code sort order; 'unknown' when nothing scores.
    """
    sample = text[:sample_chars]
    if not sample.strip():
        return "unknown"
    cjk = kana = 0
    for ch in sample:
        cp = ord(ch)
        for lo, hi in _CJK_RANGES:
            if lo <= cp <= hi:
                cjk += 1
                break
        for lo, hi in _KANA:
            if lo <= cp <= hi:
                kana += 1
                break
    if cjk >= max(5, len(sample) // 20):
        return "ja" if kana > 0 else "zh"
    words = [w for w in re.findall(r"[a-zà-ÿäöüß]+", sample.lower()) if w]
    if not words:
        return "unknown"
    best_lang, best_score = "unknown", 0.0
    for lang in sorted(_STOPWORDS):
        hits = sum(1 for w in words if w in _STOPWORDS[lang])
        score = hits / len(words)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score > 0.02 else "unknown"


def quality_score(text: str) -> float:
    """Composite document-quality score in [0, 1].

    Components (equal-weighted): length adequacy (saturates at 500 chars),
    mean-word-length plausibility (3-12 chars), punctuation ratio ≤ 0.25,
    stopword presence (any profile), uppercase ratio ≤ 0.3.
    """
    n = len(text)
    if n == 0:
        return 0.0
    toks = _TOKEN_WS.findall(text)
    if not toks:
        return 0.0
    length_c = min(n / 500.0, 1.0)
    mwl = sum(len(t) for t in toks) / len(toks)
    mwl_c = 1.0 if 3.0 <= mwl <= 12.0 else 0.0
    punct_ratio = len(_PUNCT.findall(text)) / n
    punct_c = 1.0 if punct_ratio <= 0.25 else 0.0
    low = [t.lower() for t in toks]
    stop_hits = sum(1 for t in low if any(t in sw for sw in _STOPWORDS.values()))
    stop_c = min(4.0 * stop_hits / len(toks), 1.0)
    upper = sum(1 for c in text if c.isupper())
    upper_c = 1.0 if upper / n <= 0.3 else 0.0
    return round((length_c + mwl_c + punct_c + stop_c + upper_c) / 5.0, 6)


_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a64(data: bytes) -> int:
    """64-bit FNV-1a rolling hash (public-domain algorithm)."""
    h = _FNV_OFFSET
    for b in data:
        h ^= b
        h = (h * _FNV_PRIME) & _MASK64
    return h


def fingerprint(text: str) -> int:
    """Document fingerprint: FNV-1a over whitespace-normalized lowercased text.

    Signed-int64 view so it round-trips through Arrow int64 columns.
    """
    norm = " ".join(text.split()).lower().encode("utf-8")
    h = fnv1a64(norm)
    return h - (1 << 64) if h >= (1 << 63) else h
