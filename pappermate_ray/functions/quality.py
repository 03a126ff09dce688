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


# --------------------------------------------------------------------------
# Vectorized batch kernels — EXACT equivalents of the scalar functions above
# (property-tested equal on arbitrary unicode, tests/test_quality_vec.py).
#
# Design: decode the whole batch to one flat uint32 codepoint array, classify
# only the UNIQUE codepoints with the very same Python predicates the scalar
# path uses (re '\s' / '[^\w\s]' / str.isupper — so unicode semantics can
# never drift), broadcast the verdicts back with a searchsorted gather, and
# reduce per-document with cumsum differences (empty-doc-safe, unlike
# reduceat). Python-level work is O(unique codepoints + docs), not O(chars).
# --------------------------------------------------------------------------

import numpy as np

_WS_ONE = re.compile(r"\s")
_DIGIT_ONE = re.compile(r"\d")
_STOP_UNION = frozenset().union(*_STOPWORDS.values())
# token t counts as a stop hit iff lower(t) ∈ union; tokens are \S+ runs and
# str.lower never maps non-space→space, so a guarded alternation over the
# lowered text matches exactly the tokens whose lowercase form is a stopword
_STOP_RE = re.compile(
    r"(?<!\S)(?:" + "|".join(sorted(_STOP_UNION)) + r")(?!\S)")


def _flat_codepoints(texts):
    """(flat uint32 codepoints, offsets[n+1]) for a list of strings."""
    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    offs = np.concatenate(([0], np.cumsum(lens)))
    flat = np.frombuffer("".join(texts).encode("utf-32-le"), np.uint32)
    return flat, offs


def _seg_counts(mask, offs):
    """Per-document True counts of a flat boolean mask (empty-doc-safe)."""
    cum = np.concatenate(([0], np.cumsum(mask, dtype=np.int64)))
    return cum[offs[1:]] - cum[offs[:-1]]


def _run_starts(mask, offs):
    """Flat mask of run starts (doc boundaries break runs)."""
    prev = np.empty_like(mask)
    prev[0] = False
    prev[1:] = mask[:-1]
    prev[offs[:-1][offs[:-1] < len(mask)]] = False
    return mask & ~prev


def _luts(uniq):
    """Classify unique codepoints with the scalar path's own predicates."""
    chars = [chr(c) for c in uniq.tolist()]
    ws = np.fromiter((_WS_ONE.match(c) is not None for c in chars),
                     bool, len(chars))
    punct = np.fromiter((_PUNCT.match(c) is not None for c in chars),
                        bool, len(chars))
    upper = np.fromiter((c.isupper() for c in chars), bool, len(chars))
    digit = np.fromiter((_DIGIT_ONE.match(c) is not None for c in chars),
                        bool, len(chars))
    letter = ((uniq >= 65) & (uniq <= 90)) | ((uniq >= 97) & (uniq <= 122))
    return ws, punct, upper, digit, letter


def text_metrics_batch(texts):
    """Exact per-doc counters for a batch: dict of int64 arrays with keys
    ``n_chars, n_tokens, n_bpe_tokens, n_punct, n_upper, n_nonws,
    stop_hits`` — each equal to the scalar-path value for every row."""
    n = len(texts)
    texts = [t or "" for t in texts]
    flat, offs = _flat_codepoints(texts)
    if len(flat) == 0:
        z = np.zeros(n, np.int64)
        return {k: z.copy() for k in (
            "n_chars", "n_tokens", "n_bpe_tokens", "n_punct", "n_upper",
            "n_nonws", "stop_hits")}
    uniq = np.unique(flat)
    idx = np.searchsorted(uniq, flat)
    ws_l, punct_l, upper_l, digit_l, letter_l = _luts(uniq)
    ws = ws_l[idx]
    nonws = ~ws
    letter = letter_l[idx]
    digit = digit_l[idx] & ~letter  # '[A-Za-z]+' wins over '\d+' in the union
    other = nonws & ~letter & ~digit
    out = {
        "n_chars": offs[1:] - offs[:-1],
        "n_tokens": _seg_counts(_run_starts(nonws, offs), offs),
        "n_bpe_tokens": (_seg_counts(_run_starts(letter, offs), offs)
                         + _seg_counts(_run_starts(digit, offs), offs)
                         + _seg_counts(other, offs)),
        "n_punct": _seg_counts(punct_l[idx], offs),
        "n_upper": _seg_counts(upper_l[idx], offs),
        "n_nonws": _seg_counts(nonws, offs),
    }
    out["stop_hits"] = np.fromiter(
        (len(_STOP_RE.findall(t.lower())) for t in texts), np.int64, n)
    return out


def quality_score_batch(texts, metrics=None):
    """Vector ``quality_score`` — identical floats (same op order, and the
    final ``round(x, 6)`` is the scalar Python round, not np.round).
    Pass precomputed ``text_metrics_batch`` output to share the scan."""
    m = text_metrics_batch(texts) if metrics is None else metrics
    n = m["n_chars"].astype(np.float64)
    ntok = m["n_tokens"].astype(np.float64)
    valid = (m["n_chars"] > 0) & (m["n_tokens"] > 0)
    safe_n = np.where(valid, n, 1.0)
    safe_t = np.where(valid, ntok, 1.0)
    length_c = np.minimum(n / 500.0, 1.0)
    mwl = m["n_nonws"] / safe_t
    mwl_c = ((mwl >= 3.0) & (mwl <= 12.0)).astype(np.float64)
    punct_c = (m["n_punct"] / safe_n <= 0.25).astype(np.float64)
    stop_c = np.minimum(4.0 * m["stop_hits"] / safe_t, 1.0)
    upper_c = (m["n_upper"] / safe_n <= 0.3).astype(np.float64)
    q = (length_c + mwl_c + punct_c + stop_c + upper_c) / 5.0
    return np.array([round(v, 6) if ok else 0.0
                     for v, ok in zip(q.tolist(), valid.tolist())],
                    np.float64)


def detect_language_batch(texts, sample_chars: int = 1000):
    """Vector ``detect_language``: the per-char CJK/blank scan runs as
    range masks over flat codepoints; only the Latin stopword scoring
    (one C-speed findall + set lookups per row) stays per-row."""
    texts = [t or "" for t in texts]
    samples = [t[:sample_chars] for t in texts]
    flat, offs = _flat_codepoints(samples)
    if len(flat) == 0:
        return ["unknown"] * len(texts)
    uniq = np.unique(flat)
    sp_l = np.fromiter((chr(c).isspace() for c in uniq.tolist()),
                       bool, len(uniq))
    nonblank = _seg_counts(~sp_l[np.searchsorted(uniq, flat)], offs)
    cjk_m = np.zeros(len(flat), bool)
    for lo, hi in _CJK_RANGES:
        cjk_m |= (flat >= lo) & (flat <= hi)
    kana_m = np.zeros(len(flat), bool)
    for lo, hi in _KANA:
        kana_m |= (flat >= lo) & (flat <= hi)
    cjk = _seg_counts(cjk_m, offs)
    kana = _seg_counts(kana_m, offs)
    slens = offs[1:] - offs[:-1]
    out = []
    for i, sample in enumerate(samples):
        if nonblank[i] == 0:
            out.append("unknown")
            continue
        if cjk[i] >= max(5, int(slens[i]) // 20):
            out.append("ja" if kana[i] > 0 else "zh")
            continue
        words = re.findall(r"[a-zà-ÿäöüß]+", sample.lower())
        if not words:
            out.append("unknown")
            continue
        best_lang, best_score = "unknown", 0.0
        for lang in ("de", "en", "es", "fr", "pt"):
            hits = sum(1 for w in words if w in _STOPWORDS[lang])
            score = hits / len(words)
            if score > best_score:
                best_lang, best_score = lang, score
        out.append(best_lang if best_score > 0.02 else "unknown")
    return out


def fnv1a64_batch(blobs):
    """Vector FNV-1a over a list of byte strings (wrap-exact: uint64 xor
    and multiply wrap mod 2^64 like the masked scalar loop).

    Docs are sorted longest-first and hashed position-by-position across
    the batch (one fancy-index gather + two vector ops per byte
    position); once fewer than 33 docs remain active the stragglers
    finish on the scalar loop, so a single huge doc costs the same as
    before, not max_len numpy dispatches."""
    n = len(blobs)
    if n == 0:
        return np.empty(0, np.int64)
    lens = np.fromiter((len(b) for b in blobs), np.int64, n)
    order = np.argsort(-lens, kind="stable")
    sl = lens[order]
    flat = np.frombuffer(b"".join(blobs[i] for i in order), np.uint8)
    offs = np.concatenate(([0], np.cumsum(sl[:-1])))
    h = np.full(n, _FNV_OFFSET, np.uint64)
    prime = np.uint64(_FNV_PRIME)
    asc = sl[::-1]
    j, active = 0, n
    while True:
        active = n - int(np.searchsorted(asc, j, side="right"))
        if active <= 32 or j >= int(sl[0]):
            break
        b = flat[offs[:active] + j].astype(np.uint64)
        h[:active] = (h[:active] ^ b) * prime
        j += 1
    for k in range(active):  # scalar tail for the few longest docs
        hk = int(h[k])
        for byte in flat[offs[k] + j: offs[k] + sl[k]].tolist():
            hk = ((hk ^ byte) * _FNV_PRIME) & _MASK64
        h[k] = hk
    out = np.empty(n, np.uint64)
    out[order] = h
    return out.view(np.int64)  # two's-complement view == scalar signed fixup


def fingerprint_batch(texts):
    """Vector ``fingerprint``: same normalization, batch FNV."""
    blobs = [" ".join((t or "").split()).lower().encode("utf-8")
             for t in texts]
    return fnv1a64_batch(blobs)
