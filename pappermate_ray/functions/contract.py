"""Contract metadata / section / entity parsing.

Faithful deterministic reimplementation of the reference's
``services/contract_parser.py`` regex cascades (SURVEY.md §2.2 M1-M13).
Notable pinned quirks:

- the section-splitter header regex ``^#{1,2,3}\\s+(.+)$``
  (contract_parser.py:252) contains a malformed quantifier which Python
  treats as the literal text ``#{1,2,3}`` — so markdown sections, in
  practice, always come from the bold ``**Name:** value`` fallback
  (contract_parser.py:268-278). Preserved verbatim.
- first extracted date = effective, second = expiration
  (contract_parser.py:513-517).
- defaults: contract_number/client/vendor "N/A", currency "USD",
  contract_type "msa" when undetected (contract_parser.py:506, 520-530).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

from .amounts import parse_amount
from .dates import extract_dates

# --- patterns (contract_parser.py:27-48) ------------------------------------
PAT_CONTRACT_NUMBER = re.compile(
    r"(?i)(?:contract\s+number|número\s+do\s+contrato|ref|reference)[\s:]*([A-Z0-9\-_/]+)"
)
PAT_BOLD_CONTRACT_NUMBER = re.compile(r"\*\*Contract Number:\*\*\s*([A-Z0-9\-_/]+)")
PAT_CURRENCY = re.compile(r"(?i)(R\$|US\$|USD|BRL|EUR|€|£)")
PAT_AMOUNT = re.compile(r"(?i)(?:valor|value|amount|total)[\s:]*([R$US$USD€£]?\s*[\d,]+\.?\d*)")
PAT_BOLD_AMOUNT = re.compile(r"\*\*Total Value:\*\*\s*([R$US$USD€£]?\s*[\d,]+\.?\d*)")
PAT_BOLD_EFFECTIVE = re.compile(r"\*\*Effective Date:\*\*\s*(\d{1,2}/\d{1,2}/\d{4})")
PAT_BOLD_EXPIRATION = re.compile(r"\*\*Expiration Date:\*\*\s*(\d{1,2}/\d{1,2}/\d{4})")
PAT_TITLE = re.compile(r"^#{1,2}\s+(.+)$", re.MULTILINE)
PAT_BOLD_CLIENT = re.compile(r"\*\*Client:\*\*\s*([A-Z][A-Za-z\s&\.]+)")
PAT_BOLD_VENDOR = re.compile(r"\*\*Vendor:\*\*\s*([A-Z][A-Za-z\s&\.]+)")
PAT_EMAIL = re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b")
PAT_CNPJ_CPF = re.compile(r"(?:\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2}|\d{3}\.\d{3}\.\d{3}-\d{2})")
PAT_TABLE_LINE = re.compile(r"^\|.*\|$", re.MULTILINE)
# literal-brace quirk preserved (contract_parser.py:252)
PAT_SECTION_HEADER = re.compile(r"^#{1,2,3}\s+(.+)$")
PAT_BOLD_SECTION = re.compile(r"\*\*([^*]+):\*\*([^*\n]*)")

CLIENT_PATTERNS = [
    re.compile(
        r"(?i)(?:cliente|client|contratante|buyer)[\s:]*([A-Z][A-Za-z\s&\.]+?)(?=\s+(?:vendor|fornecedor|contratado|seller|supplier|prestador|provider|contractor)|$)"
    ),
    re.compile(
        r"(?i)(?:empresa|company|corporation)[\s:]*([A-Z][A-Za-z\s&\.]+?)(?=\s+(?:vendor|fornecedor|contratado|seller|supplier|prestador|provider|contractor)|$)"
    ),
]
VENDOR_PATTERNS = [
    re.compile(
        r"(?i)(?:fornecedor|vendor|contratado|seller|supplier)[\s:]*([A-Z][A-Za-z\s&\.]+?)(?=\s+(?:cliente|client|contratante|buyer|empresa|company|corporation)|$)"
    ),
    re.compile(
        r"(?i)(?:prestador|provider|contractor)[\s:]*([A-Z][A-Za-z\s&\.]+?)(?=\s+(?:cliente|client|contratante|buyer|empresa|company|corporation)|$)"
    ),
]

# contract_parser.py:41-48
SECTION_HEADERS = [
    "vigência", "duração", "termo", "prazo", "expiração",
    "rescisão", "terminação", "cancelamento",
    "confidencialidade", "sigilo", "não divulgação",
    "pagamentos", "pagamento", "valor", "preço", "compensação",
    "obrigações", "responsabilidades", "deveres",
    "foro", "jurisdição", "lei aplicável", "disputas",
]

# contract_parser.py:448-465 — ordered keyword → type cascade
_TYPE_RULES = [
    (["master service agreement", "msa", "acordo quadro"], "msa"),
    (["local service agreement", "lsa", "acordo local"], "lsa"),
    (["statement of work", "sow", "escopo de trabalho"], "sow"),
    (["project work order", "pwo", "ordem de serviço"], "pwo"),
    (["change request", "cr", "solicitação de mudança"], "cr"),
    (["change notification form", "cnf", "formulário de notificação"], "cnf"),
]


def detect_contract_type(content: str) -> Optional[str]:
    """6-way keyword classifier; reference contract_parser.py:448-465."""
    content_lower = content.lower()
    for terms, ctype in _TYPE_RULES:
        if any(term in content_lower for term in terms):
            return ctype
    return None


def extract_parties(content: str) -> Dict[str, str]:
    """Client/vendor lookahead extraction; reference contract_parser.py:417-446."""
    parties: Dict[str, str] = {}
    for pattern in CLIENT_PATTERNS:
        m = pattern.search(content)
        if m:
            parties["client_name"] = m.group(1).strip()
            break
    for pattern in VENDOR_PATTERNS:
        m = pattern.search(content)
        if m:
            parties["vendor_name"] = m.group(1).strip()
            break
    return parties


def extract_metadata(content: str) -> Dict[str, Any]:
    """First-match-wins metadata cascade; reference contract_parser.py:110-194."""
    metadata: Dict[str, Any] = {}

    m = PAT_TITLE.search(content)
    if m:
        metadata["title"] = m.group(1).strip()

    m = PAT_CONTRACT_NUMBER.search(content)
    if m:
        metadata["contract_number"] = m.group(1).strip()
    if not metadata.get("contract_number"):
        m = PAT_BOLD_CONTRACT_NUMBER.search(content)
        if m:
            metadata["contract_number"] = m.group(1).strip()

    m = PAT_CURRENCY.search(content)
    if m:
        metadata["currency"] = m.group(1)
        am = PAT_AMOUNT.search(content)
        if am:
            metadata["total_value"] = parse_amount(am.group(1))
    if not metadata.get("total_value"):
        am = PAT_BOLD_AMOUNT.search(content)
        if am:
            metadata["total_value"] = parse_amount(am.group(1))

    dates = extract_dates(content)
    if dates:
        metadata["dates"] = dates
    if not metadata.get("dates"):
        em = PAT_BOLD_EFFECTIVE.search(content)
        if em:
            eff = extract_dates(em.group(0))
            if eff:
                metadata["dates"] = eff
        xm = PAT_BOLD_EXPIRATION.search(content)
        if xm and metadata.get("dates"):
            exp = extract_dates(xm.group(0))
            if exp:
                metadata["dates"].extend(exp)

    parties = extract_parties(content)
    if parties:
        metadata.update(parties)
    if not metadata.get("client_name"):
        m = PAT_BOLD_CLIENT.search(content)
        if m:
            metadata["client_name"] = m.group(1).strip()
    if not metadata.get("vendor_name"):
        m = PAT_BOLD_VENDOR.search(content)
        if m:
            metadata["vendor_name"] = m.group(1).strip()

    ctype = detect_contract_type(content)
    if ctype:
        metadata["contract_type"] = ctype
    return metadata


def extract_sections(content: str) -> Dict[str, str]:
    """Section segmentation; reference contract_parser.py:241-280.

    The header loop is effectively dead (literal-brace quirk); the bold
    ``**Name:** value`` fallback is what fires on real markdown.
    """
    sections: Dict[str, str] = {}
    lines = content.split("\n")
    current_section: Optional[str] = None
    current_content: List[str] = []
    for line in lines:
        # the quirk regex can only match a literal "#{1,2,3}" prefix —
        # the startswith guard skips the regex machinery per line without
        # changing semantics (asserted by the frozen goldens)
        header_match = PAT_SECTION_HEADER.match(line) if line.startswith("#{1,2,3}") else None
        if header_match:
            if current_section and current_content:
                sections[current_section] = "\n".join(current_content).strip()
            current_section = header_match.group(1).lower()
            current_content = []
        elif current_section:
            current_content.append(line)
    if current_section and current_content:
        sections[current_section] = "\n".join(current_content).strip()

    if not sections:
        for match in PAT_BOLD_SECTION.finditer(content):
            section_name = match.group(1).lower()
            section_content = match.group(2).strip()
            if section_content:
                sections[section_name] = section_content
    return sections


def extract_entities(content: str) -> Dict[str, Any]:
    """Emails / CNPJ-CPF / table lines / key-clause flags.

    Reference contract_parser.py:308-339. ``list(set(...))`` in the
    reference is nondeterministically ordered; here dedup preserves
    first-occurrence order (sorted-stable choice documented for
    byte-identical goldens).
    """
    entities: Dict[str, Any] = {}
    emails = PAT_EMAIL.findall(content)
    if emails:
        entities["emails"] = list(dict.fromkeys(emails))
    cnpj = PAT_CNPJ_CPF.findall(content)
    if cnpj:
        entities["cnpj_cpf"] = list(dict.fromkeys(cnpj))
    table_lines = PAT_TABLE_LINE.findall(content)
    if table_lines:
        entities["tables"] = {
            "count": len(table_lines),
            "has_headers": any("---" in line for line in table_lines),
        }
    key_clauses: Dict[str, bool] = {}
    content_lower = content.lower()
    for header in SECTION_HEADERS:
        if header in content_lower:
            key_clauses[header] = True
    if key_clauses:
        entities["key_clauses"] = key_clauses
    return entities


def calculate_confidence(
    metadata: Dict[str, Any], sections: Dict[str, str], entities: Dict[str, Any]
) -> float:
    """6-check weighted completeness score; reference contract_parser.py:544-577."""
    score = 0.0
    total_checks = 0
    if metadata.get("title"):
        score += 1.0
    total_checks += 1
    if metadata.get("contract_number"):
        score += 1.0
    total_checks += 1
    if metadata.get("client_name") and metadata.get("vendor_name"):
        score += 1.0
    total_checks += 1
    if metadata.get("dates"):
        score += 1.0
    total_checks += 1
    if sections:
        score += min(len(sections) / 5.0, 1.0)
    total_checks += 1
    if entities.get("key_clauses"):
        score += min(len(entities["key_clauses"]) / 3.0, 1.0)
    total_checks += 1
    return score / total_checks if total_checks > 0 else 0.0


def parse_contract(content: str, default_name: str = "") -> Dict[str, Any]:
    """Full parse of one document's extracted text → flat contract record.

    Mirrors ContractParser.parse_from_markdown + _create_contract_model
    (contract_parser.py:50-78, 501-542) minus wall-clock fields
    (extraction_date dropped for determinism). Dates surface as first =
    effective, second = expiration.
    """
    metadata = extract_metadata(content)
    sections = extract_sections(content)
    entities = extract_entities(content)

    dates = metadata.get("dates", [])
    effective_date = dates[0]["date"] if len(dates) >= 1 else None
    expiration_date = dates[1]["date"] if len(dates) >= 2 else None

    return {
        "contract_type": metadata.get("contract_type", "msa"),
        "contract_number": metadata.get("contract_number", "N/A"),
        "contract_name": metadata.get("title", default_name),
        "client_name": metadata.get("client_name", "N/A"),
        "vendor_name": metadata.get("vendor_name", "N/A"),
        "effective_date": effective_date,
        "expiration_date": expiration_date,
        "total_value": metadata.get("total_value"),
        "currency": metadata.get("currency", "USD"),
        "n_sections": len(sections),
        "emails": entities.get("emails", []),
        "cnpj_cpf": entities.get("cnpj_cpf", []),
        "n_table_lines": entities.get("tables", {}).get("count", 0),
        "key_clauses": sorted(entities.get("key_clauses", {}).keys()),
        "confidence": calculate_confidence(metadata, sections, entities),
    }
