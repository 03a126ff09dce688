"""Text normalization utilities.

Deterministic siblings of the reference's cell-text cleanup
(services/table_processor_fixed.py:394-435, SURVEY.md §2.2 M34/M35) and
translated-text cleanup (services/file_handler.py:325-344, M16).
"""

from __future__ import annotations

import re

# services/table_processor_fixed.py:424-431
_SPACE_CHARS = [" ", " ", " ", "​"]  # em, en, nbsp, zwsp
_DOT_LEADER = re.compile(r"(\s\.){2,}")
_DOT_RUN = re.compile(r"\.{2,}")
_QUOTES = re.compile(r"[\"'`]")
_NON_WORD = re.compile(r"[^\w\s\-]")
_WS_RUN = re.compile(r"\s+")


def normalize_spaces(text: str) -> str:
    """em/en/nbsp/zwsp → plain space; reference table_processor_fixed.py:418-435."""
    for ch in _SPACE_CHARS:
        text = text.replace(ch, " ")
    return text


def finalize_line(text: str) -> str:
    """Cell/line finalizer: drop '.'-only, strip dot leaders, normalize spaces.

    Reference table_processor_fixed.py:394-416 (ftfy step replaced by the
    deterministic space normalization only — ftfy is not available here and
    its mojibake repair is not exercised by the synthetic corpus).
    Returns "" when the line should be dropped.
    """
    text = text.strip()
    if not text or text == ".":
        return ""
    text = _DOT_LEADER.sub("", text)
    text = _DOT_RUN.sub("", text)
    return normalize_spaces(text)


def clean_translated_text(text: str) -> str:
    """Strip quotes, non-word → '_', whitespace → '_'; reference file_handler.py:325-344."""
    text = _QUOTES.sub("", text)
    text = _NON_WORD.sub("_", text)
    text = _WS_RUN.sub("_", text)
    return text.strip("_")


def is_ascii(s: str) -> bool:
    """ASCII-safety predicate; reference file_handler.py:578-592."""
    try:
        s.encode("ascii")
        return True
    except UnicodeEncodeError:
        return False


def truncate(text: str, n: int) -> str:
    """Deterministic char cap (reference truncations at 1000/4000/5000 chars)."""
    return text[:n]
