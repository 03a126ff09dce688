"""Entity-span extraction with per-doc normalize + dedup.

Deterministic sibling of the reference's ML span extractor
(processing/entity_extractor.py, SURVEY.md §2.2 M23-M26, §2.3 ST3/ST4,
§2.7 D1). The reference runs BERT/RoBERTa/sentence-transformers; the
deterministic spec reimplemented here is its regex/pattern-store scaffolding:

- spans carry (text, entity_type, start, end, confidence, model) with
  *global character offsets* (the chunker carries chunk start offsets,
  entity_extractor.py:346-362),
- the 14-type closed entity set (entity_extractor.py:39-44),
- the pattern store (base CONTRACT_TYPE / SERVICE_TYPE / BUSINESS_AREA
  phrase lists, entity_extractor.py:264-277) searched as literal phrases,
- dedup: sort by confidence desc, key = (normalize(text), type),
  first-wins (entity_extractor.py:409-434).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

ENTITY_TYPES = [
    "SUPPLIER", "CUSTOMER", "CONTRACT_ID", "CONTRACT_TYPE",
    "START_DATE", "END_DATE", "AMOUNT", "CURRENCY",
    "SERVICE_TYPE", "BUSINESS_AREA", "PROJECT_SCOPE",
    "SIGNATURE_DATE", "EFFECTIVE_DATE", "EXPIRATION_DATE",
]

# entity_extractor.py:264-277 — base pattern store (ST4)
BASE_PATTERNS: Dict[str, List[str]] = {
    "CONTRACT_TYPE": [
        "Statement of Work", "Master Service Agreement", "Non-Disclosure Agreement",
        "Sales Contract", "Framework Agreement", "Service Agreement",
    ],
    "SERVICE_TYPE": [
        "Information Technology", "Marketing Services", "Supply Chain",
        "Consulting Services", "Professional Services", "Technical Support",
    ],
    "BUSINESS_AREA": [
        "Data Management", "Cloud Services", "Digital Transformation",
        "Business Process", "Technology Infrastructure", "Customer Experience",
    ],
}

# regex span rules: (entity_type, pattern, confidence, model tag)
_SPAN_RULES: List[Tuple[str, "re.Pattern[str]", float, str]] = [
    # contract_analyzer.py:223-227 common id format XX-YYYY-ZZZ
    ("CONTRACT_ID", re.compile(r"\b([A-Z]{2,3}-\d{4}-\d{3,4})\b"), 0.80, "regex"),
    # date formats (contract_parser.py:33-37)
    ("START_DATE", re.compile(r"\b\d{1,2}/\d{1,2}/\d{4}\b"), 0.85, "regex"),
    ("START_DATE", re.compile(r"\b\d{4}-\d{1,2}-\d{1,2}\b"), 0.85, "regex"),
    # amounts with currency marker (contract_parser.py:30)
    ("AMOUNT", re.compile(r"(?:R\$|US\$|USD|EUR|€|£)\s*[\d.,]*\d"), 0.90, "regex"),
    ("CURRENCY", re.compile(r"R\$|US\$|USD|BRL|EUR|€|£"), 0.70, "regex"),
]

_AMOUNT_NORM_STRIP = re.compile(r"[^Vdt .,]+")


def load_pattern_pack(jsonl_dir: str) -> Dict[str, List[str]]:
    """Load extra entity patterns from a directory of JSONL files.

    Reference ST4 (processing/entity_extractor.py:228-260): each line may
    carry ``{"entities": [{"entity_type":..., "text":...}]}`` or
    ``{"metadata": {...}}`` whose contract_type/supplier/business_area/
    service_type values become patterns of the upper-cased key. Malformed
    lines are skipped (the reference logs-and-continues).
    """
    import json
    import os

    patterns: Dict[str, List[str]] = {}
    if not os.path.isdir(jsonl_dir):
        return patterns
    meta_keys = ("contract_type", "supplier", "business_area", "service_type")
    for name in sorted(os.listdir(jsonl_dir)):
        if not name.endswith(".jsonl"):
            continue
        with open(os.path.join(jsonl_dir, name), encoding="utf-8") as f:
            for line in f:
                try:
                    data = json.loads(line.strip())
                except (ValueError, TypeError):
                    continue
                if isinstance(data, dict) and "entities" in data:
                    for ent in data["entities"]:
                        etype, text = ent.get("entity_type"), ent.get("text")
                        if etype and text:
                            patterns.setdefault(etype, []).append(text)
                elif isinstance(data, dict) and "metadata" in data:
                    for key, value in data["metadata"].items():
                        if key in meta_keys and value:
                            patterns.setdefault(key.upper(), []).append(value)
    # order-preserving dedup (reference dict.fromkeys)
    return {k: list(dict.fromkeys(v)) for k, v in patterns.items()}


def chunk_text(text: str, max_length: int = 512) -> List[Tuple[int, str]]:
    """≤max_length chunks broken at sentence boundary, with global offsets.

    Reference entity_extractor.py:346-362.
    """
    chunks: List[Tuple[int, str]] = []
    start = 0
    while start < len(text):
        end = start + max_length
        if end < len(text):
            last_period = text.rfind(".", start, end)
            if last_period > start:
                end = last_period + 1
        chunks.append((start, text[start:end]))
        start = end
    return chunks


def segment_text(text: str) -> List[Tuple[str, str]]:
    """Sentence split + keyword routing into amount/date/identifier segments.

    Reference entity_extractor.py:364-384.
    """
    segments: List[Tuple[str, str]] = []
    for sentence in text.split("."):
        sentence = sentence.strip()
        if len(sentence) < 10:
            continue
        low = sentence.lower()
        if any(w in low for w in ["$", "€", "£", "amount", "value", "cost"]):
            segments.append((sentence, "amount"))
        elif any(w in low for w in ["date", "effective", "expiration", "valid"]):
            segments.append((sentence, "date"))
        elif any(w in low for w in ["contract", "agreement", "sow", "msa"]):
            segments.append((sentence, "identifier"))
    return segments


_DATE_TYPES = frozenset(
    ("START_DATE", "END_DATE", "SIGNATURE_DATE", "EFFECTIVE_DATE", "EXPIRATION_DATE"))
# fast paths for the two span shapes the date rules emit; anything else
# (month names, partial dates, junk) falls back to dateutil. Exhaustive
# equivalence with dateutil over the full numeric domain is pinned in
# tests/test_functions.py.
_FAST_DMY = re.compile(r"(\d{1,2})/(\d{1,2})/(\d{4})$")
_FAST_YMD = re.compile(r"(\d{4})-(\d{1,2})-(\d{1,2})$")


def _fast_date_norm(text: str) -> Optional[str]:
    """dateutil-identical normalization for pure numeric dates: dateutil's
    default order is month-first, retrying day-first when the first number
    can't be a month; any failure defers to dateutil itself."""
    from datetime import datetime

    m = _FAST_DMY.match(text)
    if m:
        a, b, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if 1 <= a <= 12:
            try:
                return datetime(y, a, b).strftime("%Y-%m-%d")
            except ValueError:
                return None
        if 1 <= b <= 12:
            try:
                return datetime(y, b, a).strftime("%Y-%m-%d")
            except ValueError:
                return None
        return None
    m = _FAST_YMD.match(text)
    if m:
        try:
            return datetime(int(m.group(1)), int(m.group(2)),
                            int(m.group(3))).strftime("%Y-%m-%d")
        except ValueError:
            return None
    return None


def normalize_entity_text(text: str, entity_type: str) -> str:
    """Per-type normalization used as the dedup key.

    Reference entity_extractor.py:386-407 — pinned quirks included: the
    AMOUNT branch strips with ``[^Vdt .,]+`` (which removes the digits
    themselves), so float() nearly always fails and the lowercased text is
    returned; the date branch parses with dateutil.
    """
    text = text.lower().strip()
    if entity_type in _DATE_TYPES:
        fast = _fast_date_norm(text)
        if fast is not None:
            return fast
        try:
            from dateutil.parser import parse
            return parse(text).strftime("%Y-%m-%d")
        except Exception:
            pass
    elif entity_type == "AMOUNT":
        stripped = _AMOUNT_NORM_STRIP.sub("", text)
        stripped = stripped.replace(".", "").replace(",", ".")
        try:
            return str(float(stripped))
        except ValueError:
            pass
    return text


def dedupe_spans(spans: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Sort by confidence desc (stable), first-wins on (normalized, type).

    Reference entity_extractor.py:409-434.
    """
    if not spans:
        return []
    ordered = sorted(spans, key=lambda s: -s["confidence"])
    seen = set()
    out: List[Dict[str, Any]] = []
    for span in ordered:
        key = (normalize_entity_text(span["text"], span["entity_type"]), span["entity_type"])
        if key not in seen:
            seen.add(key)
            out.append(span)
    return out


def extract_spans(
    text: str,
    patterns: Optional[Dict[str, List[str]]] = None,
    max_chars: int = 100_000,
) -> List[Dict[str, Any]]:
    """All spans for one document, deduped; offsets are global chars.

    Scans chunk-by-chunk (the reference's 512-char BERT chunking shape)
    carrying chunk start offsets, then runs the literal pattern store,
    then dedupes. ``max_chars`` caps scan work per doc (the reference caps
    model input at 4-5k chars; here the cap is generous but bounded so one
    giant doc cannot stall an actor).
    """
    if not text:
        return []
    text = text[:max_chars]
    spans: List[Dict[str, Any]] = []
    for chunk_start, chunk in chunk_text(text):
        for etype, pat, conf, model in _SPAN_RULES:
            for m in pat.finditer(chunk):
                spans.append({
                    "text": m.group(0),
                    "entity_type": etype,
                    "start": chunk_start + m.start(),
                    "end": chunk_start + m.end(),
                    "confidence": conf,
                    "model": model,
                })
    pat_store = patterns if patterns is not None else BASE_PATTERNS
    for etype, phrases in pat_store.items():
        for phrase in phrases:
            at = 0
            while True:
                idx = text.find(phrase, at)
                if idx < 0:
                    break
                spans.append({
                    "text": phrase,
                    "entity_type": etype,
                    "start": idx,
                    "end": idx + len(phrase),
                    "confidence": 0.65,
                    "model": "pattern-store",
                })
                at = idx + len(phrase)
    return dedupe_spans(spans)


def mean_confidence(spans: List[Dict[str, Any]]) -> float:
    """Per-doc mean span confidence; reference entity_extractor.py:436-442."""
    if not spans:
        return 0.0
    return sum(s["confidence"] for s in spans) / len(spans)
