"""Contract validation stage (SURVEY.md §3.3 SchemaValidator).

The reference revalidates parsed contracts with pydantic + business rules
(validation/schema.py:102-127, 169-210). Schema validation is structural
(Arrow enforces the schema here); the business rules are reimplemented
verbatim — error messages byte-identical to the reference strings — as a
vectorizable batch fn emitting ``is_valid`` + ``validation_errors``.
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
) -> List[str]:
    """Business rules, reference validation/schema.py:169-210 (contract part)."""
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
    return errors


def validate_contracts_batch(batch: pa.Table) -> pa.Table:
    """docs → + is_valid, validation_errors. Error rows validate to invalid
    with a document-level message (reference document rule: error status
    must carry an error message, validation/schema.py:227-229)."""
    cols = {
        name: batch[name].to_pylist()
        for name in (
            "status", "error", "contract_name", "contract_number", "client_name",
            "vendor_name", "effective_date", "expiration_date", "total_value", "currency",
        )
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
            )
        )
    out = batch.append_column(
        "is_valid", pa.array([not e for e in all_errors], pa.bool_())
    )
    return out.append_column("validation_errors", pa.array(all_errors, ERRORS_TYPE))
