"""Filename / organization naming functions.

Deterministic reimplementation of the reference's filename sanitization
(services/file_handler.py:226-389, SURVEY.md §2.2 M14-M17) and canonical
contract-filename generation (scripts/system_contract_organizer.py:209-277,
M27-M30). Only the no-API deterministic fallback paths are reimplemented —
the translation-service branches are out of scope by design (determinism).
"""

from __future__ import annotations

from typing import List, Tuple

from .textnorm import clean_translated_text, is_ascii

# services/file_handler.py:346-389 — fixed CJK/JA/ZH business-term map
CJK_TERM_MAP = {
    "【": "", "】": "",
    "御見積書": "Quotation",
    "見積書": "Quotation",
    "見積": "Estimate",
    "請求書": "Invoice",
    "契約書": "Contract",
    "契約": "Contract",
    "システム": "System",
    "運用": "Operations",
    "サポート": "Support",
    "合同": "Contract",
    "报价": "Quotation",
    "系统": "System",
    "支持": "Support",
}
# NOTE: the reference dict lists 契約 before 契約書; Python dict iteration uses
# insertion order, so its replace('契約') would also eat the prefix of 契約書.
# We order longest-first here intentionally and pin it with a unit test —
# this matches the reference's *documented* mapping (見積書→Quotation etc.,
# tests/test_file_handler.py:44-57) rather than the accidental ordering.

_DELIMITERS = ["_", "-", " ", "　", "、", "。", "（", "）"]


def split_filename(filename: str) -> List[str]:
    """Split on the first delimiter that yields parts of len>1.

    Reference file_handler.py:301-323.
    """
    for delimiter in _DELIMITERS:
        if delimiter in filename:
            parts = [p.strip() for p in filename.split(delimiter) if p.strip() and len(p.strip()) > 1]
            if parts:
                return parts
    return [filename]


def map_cjk_terms(base_name: str) -> str:
    """Deterministic CJK term-map fallback; reference file_handler.py:346-389."""
    parts = split_filename(base_name)
    mapped: List[str] = []
    for part in parts:
        original = part
        for k, v in CJK_TERM_MAP.items():
            if k in part:
                part = part.replace(k, v)
        mapped.append(part if part else original)
    if not mapped:
        return base_name
    return "_".join(mapped)


def sanitize_filename(filename: str) -> Tuple[str, str, str]:
    """Sanitize a filename without any translation service.

    Returns (sanitized, status, error). Mirrors the no-client branch of
    reference file_handler.py:226-299: ASCII names pass through with
    status 'success'; non-ASCII names get the deterministic CJK fallback
    map + cleanup with status 'failed' (reference semantics: fallback
    mapping is recorded as a failed *translation*).
    """
    dot = filename.rfind(".")
    if dot > 0:
        base_name, extension = filename[:dot], filename[dot:]
    else:
        base_name, extension = filename, ""
    if is_ascii(base_name):
        return filename, "success", ""
    mapped = map_cjk_terms(base_name)
    if mapped and mapped != base_name:
        return (
            clean_translated_text(mapped) + extension,
            "failed",
            "Translation failed: No translation service available - applied fallback mapping",
        )
    return filename, "failed", "No translation service available"


def normalize_supplier_name(supplier: str) -> str:
    """Supplier → folder-safe name; reference system_contract_organizer.py:222-235."""
    if not supplier:
        return "Unknown"
    normalized = supplier.replace(" ", "_").replace("-", "_")
    normalized = "".join(c for c in normalized if c.isalnum() or c == "_")
    return normalized[:50]


def canonical_contract_filename(
    supplier: str, contract_type: str, start_year: str, end_year: str, contract_id: str
) -> str:
    """[SUPPLIER]_[TYPE]_[YEARS]_[ID].pdf; reference system_contract_organizer.py:237-263."""
    supplier_normalized = normalize_supplier_name(supplier)
    ctype = contract_type.upper() if contract_type else "UNKNOWN"
    year_range = start_year if start_year == end_year else f"{start_year}_{end_year}"
    cid = (contract_id or "").replace(" ", "_").replace("/", "_").replace("-", "_")
    if not cid or cid == "null":
        cid = "UNKNOWN_ID"
    filename = f"{supplier_normalized}_{ctype}_{year_range}_{cid}.pdf"
    return "".join(c for c in filename if c.isalnum() or c in "._-")


def operation_type(original_filename: str) -> str:
    """Route rename-vs-translate; reference system_contract_organizer.py:265-277."""
    if not is_ascii(original_filename):
        return "translate"
    return "rename"
