"""Date extraction (reference: services/contract_parser.py:377-415).

Three patterns, matches collected per pattern then globally sorted by
character position. The reference's PT month-name pattern captures only two
groups (day, year) and is therefore silently skipped by the ``len(groups)==3``
gate (services/contract_parser.py:385) — that behavior is preserved here and
asserted by the reference's own test ("the month format might not work as
expected", tests/parser/test_contract_parser.py:198-199).
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any, Dict, List, Optional

DATE_PATTERNS = [
    re.compile(r"(\d{1,2})/(\d{1,2})/(\d{4})", re.IGNORECASE),  # DD/MM/YYYY
    re.compile(r"(\d{4})-(\d{1,2})-(\d{1,2})", re.IGNORECASE),  # YYYY-MM-DD
    re.compile(
        r"(\d{1,2})\s+(?:de\s+)?(?:jan|fev|mar|abr|mai|jun|jul|ago|set|out|nov|dez)[a-z]*\s+(\d{4})",
        re.IGNORECASE,
    ),  # DD Month YYYY (PT) — 2 groups: dropped by the ==3 gate, as in the reference
]

_YEAR_RE = re.compile(r"\b(19|20)\d{2}\b")


def extract_dates(content: str) -> List[Dict[str, Any]]:
    """Extract ``{date, text, position}`` structs, sorted by position.

    Reference: services/contract_parser.py:377-415.
    """
    dates: List[Dict[str, Any]] = []
    for i, pattern in enumerate(DATE_PATTERNS):
        for match in pattern.finditer(content):
            try:
                if len(match.groups()) == 3:
                    if i == 0:  # DD/MM/YYYY ('/' in pattern)
                        day, month, year = match.groups()
                        date_obj = datetime(int(year), int(month), int(day))
                    else:  # YYYY-MM-DD ('-' in pattern)
                        year, month, day = match.groups()
                        date_obj = datetime(int(year), int(month), int(day))
                    dates.append(
                        {"date": date_obj, "text": match.group(0), "position": match.start()}
                    )
            except (ValueError, TypeError):
                continue
    dates.sort(key=lambda x: x["position"])
    return dates


def extract_year(date_string: Optional[str]) -> str:
    """First 4-digit 19xx/20xx year in the string, else "".

    Reference: scripts/system_contract_organizer.py:209-220.
    """
    if not date_string:
        return ""
    m = _YEAR_RE.search(date_string)
    return m.group() if m else ""
