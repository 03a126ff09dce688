"""Blocks-input contract parsing (the Marker-JSON path).

Faithful reimplementation of the reference's JSON-render branch
(services/contract_parser.py:196-239 metadata, :282-306 sections,
:341-375 entities; SURVEY.md §2.2 M2/M4/M6): the document arrives as an
ordered block list ``[{type, text, order}]`` (heading | paragraph | table)
instead of raw markdown. First-value-wins per field while walking blocks
in order.
"""

from __future__ import annotations

from typing import Any, Dict, List

from .contract import (
    PAT_CNPJ_CPF,
    PAT_CONTRACT_NUMBER,
    PAT_CURRENCY,
    PAT_EMAIL,
    SECTION_HEADERS,
    calculate_confidence,
    detect_contract_type,
    extract_parties,
)
from .dates import extract_dates


def extract_metadata_from_blocks(blocks: List[Dict[str, Any]]) -> Dict[str, Any]:
    """First-value-wins field walk over ordered blocks (reference :196-239)."""
    metadata: Dict[str, Any] = {}
    for block in blocks:
        btype = block.get("type")
        text = block.get("text", "") or ""
        if btype == "heading":
            if not metadata.get("title"):
                metadata["title"] = text.strip()
        elif btype == "paragraph":
            if not metadata.get("contract_number"):
                m = PAT_CONTRACT_NUMBER.search(text)
                if m:
                    metadata["contract_number"] = m.group(1).strip()
            if not metadata.get("currency"):
                m = PAT_CURRENCY.search(text)
                if m:
                    metadata["currency"] = m.group(1)
            if not metadata.get("dates"):
                dates = extract_dates(text)
                if dates:
                    metadata["dates"] = dates
            if not metadata.get("client_name") or not metadata.get("vendor_name"):
                parties = extract_parties(text)
                if parties:
                    metadata.update(parties)
    # whole-document type detection on the concatenated repr (reference
    # passes str(data); we use the joined block texts — same keyword space)
    joined = " ".join(b.get("text", "") or "" for b in blocks)
    if not metadata.get("contract_type"):
        ctype = detect_contract_type(joined)
        if ctype:
            metadata["contract_type"] = ctype
    return metadata


def extract_sections_from_blocks(blocks: List[Dict[str, Any]]) -> Dict[str, str]:
    """Heading blocks delimit sections over paragraph blocks (reference :282-306)."""
    sections: Dict[str, str] = {}
    current_section = None
    current_content: List[str] = []
    for block in blocks:
        btype = block.get("type")
        text = block.get("text", "") or ""
        if btype == "heading":
            if current_section and current_content:
                sections[current_section] = "\n".join(current_content).strip()
            current_section = text.lower()
            current_content = []
        elif btype == "paragraph" and current_section:
            current_content.append(text)
    if current_section and current_content:
        sections[current_section] = "\n".join(current_content).strip()
    return sections


def extract_entities_from_blocks(blocks: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Emails/CNPJ over concatenated text + table-block counting (reference :341-375)."""
    entities: Dict[str, Any] = {}
    content = " ".join(b.get("text", "") for b in blocks if b.get("text"))
    emails = PAT_EMAIL.findall(content)
    if emails:
        entities["emails"] = list(dict.fromkeys(emails))
    cnpj = PAT_CNPJ_CPF.findall(content)
    if cnpj:
        entities["cnpj_cpf"] = list(dict.fromkeys(cnpj))
    table_blocks = [b for b in blocks if b.get("type") == "table"]
    if table_blocks:
        entities["tables"] = {
            "count": len(table_blocks),
            "has_content": any(b.get("text") for b in table_blocks),
        }
    key_clauses: Dict[str, bool] = {}
    content_lower = content.lower()
    for header in SECTION_HEADERS:
        if header in content_lower:
            key_clauses[header] = True
    if key_clauses:
        entities["key_clauses"] = key_clauses
    return entities


def parse_contract_from_blocks(
    blocks: List[Dict[str, Any]], default_name: str = ""
) -> Dict[str, Any]:
    """Blocks → flat contract record (the parse_from_json lifecycle,
    reference :80-108 + :501-542)."""
    metadata = extract_metadata_from_blocks(blocks)
    sections = extract_sections_from_blocks(blocks)
    entities = extract_entities_from_blocks(blocks)
    dates = metadata.get("dates", [])
    return {
        "contract_type": metadata.get("contract_type", "msa"),
        "contract_number": metadata.get("contract_number", "N/A"),
        "contract_name": metadata.get("title", default_name),
        "client_name": metadata.get("client_name", "N/A"),
        "vendor_name": metadata.get("vendor_name", "N/A"),
        "effective_date": dates[0]["date"] if len(dates) >= 1 else None,
        "expiration_date": dates[1]["date"] if len(dates) >= 2 else None,
        "total_value": metadata.get("total_value"),
        "currency": metadata.get("currency", "USD"),
        "n_sections": len(sections),
        "emails": entities.get("emails", []),
        "cnpj_cpf": entities.get("cnpj_cpf", []),
        "n_table_blocks": entities.get("tables", {}).get("count", 0),
        "key_clauses": sorted(entities.get("key_clauses", {}).keys()),
        "confidence": calculate_confidence(metadata, sections, entities),
    }
