"""Small reference-parity utilities.

- ``decode_cascade``: encoding-fallback reader (utf-8 → latin-1 → cp1252 →
  iso-8859-1), reference processing/translator.py:112-141 (M22).
- ``strip_json_fences``: LLM-response fence stripping + tolerant JSON parse,
  reference scripts/system_contract_organizer.py:163-203 (M31).
- ``md5_operation_hash``: lineage record hash,
  reference scripts/system_contract_organizer.py:359-362.
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Any, Optional, Tuple

ENCODINGS = ["utf-8", "latin-1", "cp1252", "iso-8859-1"]

_FENCE_OPEN = re.compile(r"^```(?:json)?\s*", re.MULTILINE)
_FENCE_CLOSE = re.compile(r"```\s*$", re.MULTILINE)


def decode_cascade(data: bytes) -> Tuple[str, str]:
    """Decode bytes via the reference's encoding cascade.

    Returns (text, encoding_used). latin-1 never fails, so the cascade
    always succeeds by the second step — same effective behavior as the
    reference loop.
    """
    for enc in ENCODINGS:
        try:
            return data.decode(enc), enc
        except (UnicodeDecodeError, LookupError):
            continue
    return data.decode("latin-1", errors="replace"), "latin-1"


def strip_json_fences(text: str) -> Optional[Any]:
    """Strip ```json fences and parse; None on failure (reference M31)."""
    if not text:
        return None
    cleaned = text.strip()
    cleaned = _FENCE_OPEN.sub("", cleaned)
    cleaned = _FENCE_CLOSE.sub("", cleaned)
    try:
        return json.loads(cleaned.strip())
    except (json.JSONDecodeError, ValueError):
        return None


def md5_operation_hash(*parts: str) -> str:
    """md5 over joined operation fields (reference op-hash)."""
    return hashlib.md5("|".join(parts).encode("utf-8")).hexdigest()
