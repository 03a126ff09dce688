"""Contract / document / hierarchy validation stage (SURVEY.md §3.3).

The reference revalidates parsed contracts with pydantic + business rules
(validation/schema.py:102-260). Schema validation is structural (Arrow
enforces the schema here); ALL THREE business-rule families are
reimplemented verbatim — error messages byte-identical to the reference
strings — as vectorizable batch fns:

- contract rules       validation/schema.py:169-210 (incl. the
                       entities-structure checks :199-208)
- document rules       validation/schema.py:211-230
- hierarchy rules      validation/schema.py:233-260

The engine's row model maps onto the reference's object model as: a docs
row's ``entities`` dict = {sections (n_sections>0), extracted_entities
(entities column present), parsing_metadata (parse_confidence present)};
a document's filename/file_path derive from the url, file_size from the
page payload bytes.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

ERRORS_TYPE = pa.list_(pa.string())


def validate_record(
    contract_name: Optional[str],
    contract_number: Optional[str],
    client_name: Optional[str],
    vendor_name: Optional[str],
    effective_date,
    expiration_date,
    total_value: Optional[float],
    currency: Optional[str],
    entities_present: bool = False,
    has_sections: bool = True,
    has_extracted_entities: bool = True,
    has_parsing_metadata: bool = True,
) -> List[str]:
    """Business rules, reference validation/schema.py:169-210 — the
    contract field rules plus the entities-structure checks (:199-208):
    when the entities dict is populated at all, it must carry the three
    parser-product keys."""
    errors: List[str] = []
    if not contract_name or contract_name == "N/A":
        errors.append("Contract must have a valid name")
    if not contract_number or contract_number == "N/A":
        errors.append("Contract must have a valid contract number")
    if not client_name or client_name == "N/A":
        errors.append("Contract must have a valid client name")
    if not vendor_name or vendor_name == "N/A":
        errors.append("Contract must have a valid vendor name")
    if effective_date and expiration_date:
        if effective_date >= expiration_date:
            errors.append("Effective date must be before expiration date")
    if total_value is not None:
        if total_value <= 0:
            errors.append("Contract total value must be positive")
        if not currency:
            errors.append("Contract must have currency when value is specified")
    if entities_present:
        if not has_sections:
            errors.append("Contract entities must include sections")
        if not has_extracted_entities:
            errors.append("Contract entities must include extracted entities")
        if not has_parsing_metadata:
            errors.append("Contract entities must include parsing metadata")
    return errors


def validate_document_record(
    filename: Optional[str],
    file_path: Optional[str],
    file_size: Optional[int],
    status: Optional[str],
    error_message: Optional[str],
    content: Optional[str],
) -> List[str]:
    """Document business rules, reference validation/schema.py:211-230
    (byte-identical messages)."""
    errors: List[str] = []
    if not filename:
        errors.append("Document must have a valid filename")
    if not file_path:
        errors.append("Document must have a valid file path")
    if file_size is None or file_size <= 0:
        errors.append("Document must have a positive file size")
    if status == "error" and not error_message:
        errors.append("Document with error status must have an error message")
    if content and file_size is not None and len(content) > file_size:
        errors.append("Document content length cannot exceed file size")
    return errors


def validate_hierarchy_record(
    name: Optional[str],
    root_contract_id: Optional[str],
    contract_ids: Optional[List[str]],
    is_valid: bool,
    validation_errors: Optional[List[str]],
) -> List[str]:
    """Hierarchy business rules, reference validation/schema.py:233-260
    (byte-identical messages). ``contract_ids`` is the Ray-native flat
    analog of ``[c.document.id for c in hierarchy.contracts]``."""
    errors: List[str] = []
    if not name:
        errors.append("Contract hierarchy must have a valid name")
    if not root_contract_id:
        errors.append("Contract hierarchy must have a root contract ID")
    if contract_ids:
        if root_contract_id not in contract_ids:
            errors.append("Root contract ID must exist in contracts list")
    if not is_valid and not validation_errors:
        errors.append("Invalid hierarchy must have validation error messages")
    return errors


def validate_documents_batch(batch: pa.Table) -> pa.Table:
    """docs-shaped batch → + doc_is_valid, doc_validation_errors.

    Expects (filename, file_path, file_size, status, error, text)
    columns; the query layer derives filename/file_path from the url and
    file_size from the page payload (see queries.q_validate_documents).
    """
    cols = {
        name: batch[name].to_pylist()
        for name in ("filename", "file_path", "file_size", "status", "error", "text")
    }
    all_errors = [
        validate_document_record(
            cols["filename"][i], cols["file_path"][i], cols["file_size"][i],
            cols["status"][i], cols["error"][i], cols["text"][i],
        )
        for i in range(batch.num_rows)
    ]
    out = batch.append_column("doc_is_valid", pa.array([not e for e in all_errors], pa.bool_()))
    return out.append_column("doc_validation_errors", pa.array(all_errors, ERRORS_TYPE))


def validate_hierarchies_batch(batch: pa.Table) -> pa.Table:
    """hierarchy rows (hierarchy_id, name, root_contract_id, contract_ids,
    is_valid, validation_errors) → + rule_errors column."""
    cols = {
        name: batch[name].to_pylist()
        for name in ("name", "root_contract_id", "contract_ids", "is_valid",
                     "validation_errors")
    }
    all_errors = [
        validate_hierarchy_record(
            cols["name"][i], cols["root_contract_id"][i], cols["contract_ids"][i],
            cols["is_valid"][i], cols["validation_errors"][i],
        )
        for i in range(batch.num_rows)
    ]
    return batch.append_column("rule_errors", pa.array(all_errors, ERRORS_TYPE))


def validate_contracts_batch(batch: pa.Table) -> pa.Table:
    """docs → + is_valid, validation_errors. Error rows validate to invalid
    with a document-level message (reference document rule: error status
    must carry an error message, validation/schema.py:227-229).

    Entities-structure checks (validation/schema.py:199-208): the engine's
    parser — like the reference's (contract_parser.py:531-539) — always
    populates all three entities keys for parsed rows, so those rules
    only fire for externally-supplied batches that carry explicit
    ``has_sections`` / ``has_extracted_entities`` / ``has_parsing_metadata``
    boolean columns (absent columns mean present keys).
    """
    names = set(batch.schema.names)
    cols = {
        name: batch[name].to_pylist()
        for name in (
            "status", "error", "contract_name", "contract_number", "client_name",
            "vendor_name", "effective_date", "expiration_date", "total_value", "currency",
        )
    }
    flags = {
        name: (batch[name].to_pylist() if name in names else None)
        for name in ("has_sections", "has_extracted_entities", "has_parsing_metadata")
    }
    all_errors: List[List[str]] = []
    for i in range(batch.num_rows):
        if cols["status"][i] == "error":
            msgs = ["Document must have a positive file size"] if not cols["error"][i] else [
                f"Document conversion failed: {cols['error'][i]}"
            ]
            all_errors.append(msgs)
            continue
        all_errors.append(
            validate_record(
                cols["contract_name"][i], cols["contract_number"][i],
                cols["client_name"][i], cols["vendor_name"][i],
                cols["effective_date"][i], cols["expiration_date"][i],
                cols["total_value"][i], cols["currency"][i],
                entities_present=True,
                has_sections=True if flags["has_sections"] is None else bool(flags["has_sections"][i]),
                has_extracted_entities=True if flags["has_extracted_entities"] is None else bool(flags["has_extracted_entities"][i]),
                has_parsing_metadata=True if flags["has_parsing_metadata"] is None else bool(flags["has_parsing_metadata"][i]),
            )
        )
    out = batch.append_column(
        "is_valid", pa.array([not e for e in all_errors], pa.bool_())
    )
    return out.append_column("validation_errors", pa.array(all_errors, ERRORS_TYPE))
