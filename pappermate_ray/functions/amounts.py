"""Monetary-amount parsing (reference: services/contract_parser.py:467-483).

Reproduces the reference's exact semantics, including the documented quirk
that US-format ``"US$ 50,000.00"`` parses to ``50.0`` (asserted in the
reference's tests/parser/test_contract_parser.py:243-245): the char-class
strip removes R,$,U,S,D,€,£ and whitespace; a string containing both ``,``
and ``.`` is treated as Brazilian (dots = thousands, comma = decimal).
"""

from __future__ import annotations

import re
from typing import Optional

_CURRENCY_STRIP = re.compile(r"[R$US$USD€£\s]")


def parse_amount(amount_str: Optional[str]) -> Optional[float]:
    """Parse an amount string to float; None on failure.

    Semantics pinned to reference services/contract_parser.py:467-483.
    """
    if amount_str is None:
        return None
    try:
        clean = _CURRENCY_STRIP.sub("", amount_str)
        if "," in clean and "." in clean:
            # Brazilian format: dots for thousands, comma for decimal
            clean = clean.replace(".", "").replace(",", ".")
        elif "," in clean:
            # European format: comma for decimal
            clean = clean.replace(",", ".")
        return float(clean)
    except (ValueError, TypeError):
        return None
