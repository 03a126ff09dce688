"""JSON-Schema generation / export / validation (SURVEY.md §3.3).

Ray-native reimplementation of the reference's SchemaValidator schema
surface (reference validation/schema.py:31-54 generation, :63-104 export,
:255-282 validate_json_against_schema, :288-326 structure walk). The
reference derives JSON Schemas from Pydantic models; this engine's row
models are Arrow schemas, so the equivalent artifacts are generated from
hand-maintained model descriptors that mirror the reference models
(models/document.py:30-124) field-for-field — same titles, required
lists and enum values — plus a generic ``arrow_schema_to_json_schema``
for exporting any Dataset's Arrow schema to downstream consumers.

Error-message strings are byte-identical to the reference
(schema.py:292-325).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import pyarrow as pa

# --- enums (reference models/document.py:13-27, 60-67) ----------------------
DOCUMENT_TYPES = ["pdf", "markdown", "json", "text"]
DOCUMENT_STATUSES = ["uploaded", "processing", "converted", "analyzed", "error"]
CONTRACT_TYPES = ["msa", "lsa", "sow", "pwo", "cr", "cnf"]


def _field(typ: str, description: str, **extra) -> Dict[str, Any]:
    out = {"type": typ, "description": description}
    out.update(extra)
    return out


def _optional(typ: str, description: str, **extra) -> Dict[str, Any]:
    out = {"anyOf": [{"type": typ}, {"type": "null"}], "description": description}
    out.update(extra)
    return out


def _document_schema() -> Dict[str, Any]:
    """Document model schema (reference models/document.py:30-57)."""
    return {
        "title": "Document",
        "type": "object",
        "properties": {
            "id": _field("string", "Unique document identifier"),
            "filename": _field("string", "Original filename"),
            "file_path": _field("string", "Path to stored file"),
            "document_type": _field("string", "Type of document", enum=DOCUMENT_TYPES),
            "mime_type": _field("string", "MIME type of the document"),
            "file_size": _field("integer", "File size in bytes"),
            "status": _field("string", "Current processing status",
                             enum=DOCUMENT_STATUSES, default="uploaded"),
            "uploaded_at": _field("string", "Upload timestamp", format="date-time"),
            "processed_at": _optional("string", "Processing completion timestamp",
                                      format="date-time"),
            "content": _optional("string", "Extracted text content"),
            "metadata": _field("object", "Additional metadata"),
            "error_message": _optional("string", "Error message if processing failed"),
        },
        "required": ["id", "filename", "file_path", "document_type", "mime_type",
                     "file_size"],
    }


def _contract_schema() -> Dict[str, Any]:
    """Contract model schema (reference models/document.py:70-100)."""
    return {
        "title": "Contract",
        "type": "object",
        "properties": {
            "document": _document_schema(),
            "contract_type": _field("string", "Type of contract", enum=CONTRACT_TYPES),
            "contract_number": _field("string", "Contract identifier number"),
            "contract_name": _field("string", "Name/title of the contract"),
            "client_name": _field("string", "Client company name"),
            "vendor_name": _field("string", "Vendor/contractor company name"),
            "effective_date": _optional("string", "Contract effective date",
                                        format="date-time"),
            "expiration_date": _optional("string", "Contract expiration date",
                                         format="date-time"),
            "total_value": _optional("number", "Total contract value"),
            "currency": _field("string", "Contract currency", default="USD"),
            "parent_contract_id": _optional("string", "Parent contract ID (for hierarchy)"),
            "child_contracts": _field("array", "Child contract IDs",
                                      items={"type": "string"}),
            "entities": _field("object", "Extracted entities and clauses"),
        },
        "required": ["document", "contract_type", "contract_number", "contract_name",
                     "client_name", "vendor_name"],
    }


def _hierarchy_schema() -> Dict[str, Any]:
    """ContractHierarchy model schema (reference models/document.py:103-124)."""
    return {
        "title": "ContractHierarchy",
        "type": "object",
        "properties": {
            "hierarchy_id": _field("string", "Unique hierarchy identifier"),
            "name": _field("string", "Hierarchy name/description"),
            "root_contract_id": _field("string", "Root contract ID"),
            "contracts": _field("array", "All contracts in hierarchy",
                                items=_contract_schema()),
            "created_at": _field("string", "Hierarchy creation timestamp",
                                 format="date-time"),
            "updated_at": _field("string", "Last update timestamp", format="date-time"),
            "is_valid": _field("boolean", "Whether hierarchy is valid", default=True),
            "validation_errors": _field("array", "Validation error messages",
                                        items={"type": "string"}),
        },
        "required": ["hierarchy_id", "name", "root_contract_id"],
    }


_ARROW_TO_JSON = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_integer, "integer"),
    (pa.types.is_floating, "number"),
    (pa.types.is_decimal, "number"),
    (pa.types.is_string, "string"),
    (pa.types.is_large_string, "string"),
    (pa.types.is_binary, "string"),
    (pa.types.is_large_binary, "string"),
    (pa.types.is_timestamp, "string"),
    (pa.types.is_date, "string"),
    (pa.types.is_time, "string"),
]


def _arrow_type_to_json(typ: pa.DataType) -> Dict[str, Any]:
    if pa.types.is_list(typ) or pa.types.is_large_list(typ) or pa.types.is_fixed_size_list(typ):
        return {"type": "array", "items": _arrow_type_to_json(typ.value_type)}
    if pa.types.is_struct(typ):
        props = {typ.field(i).name: _arrow_type_to_json(typ.field(i).type)
                 for i in range(typ.num_fields)}
        return {"type": "object", "properties": props}
    if pa.types.is_map(typ):
        return {"type": "object",
                "additionalProperties": _arrow_type_to_json(typ.item_type)}
    for pred, name in _ARROW_TO_JSON:
        if pred(typ):
            out: Dict[str, Any] = {"type": name}
            if pa.types.is_timestamp(typ):
                out["format"] = "date-time"
            if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                out["contentEncoding"] = "base64"
            return out
    return {}  # unconstrained


def arrow_schema_to_json_schema(schema: pa.Schema, title: str) -> Dict[str, Any]:
    """Any Arrow schema (e.g. a docs Dataset's) → a JSON-Schema document.

    The engine-native generation path: downstream consumers of the
    Parquet outputs get a machine-checkable contract without Pydantic.
    Nullability maps to anyOf-null; all fields are listed required (Arrow
    columns always exist — null is the optionality signal).
    """
    props: Dict[str, Any] = {}
    for field in schema:
        body = _arrow_type_to_json(field.type)
        if field.nullable and "type" in body:
            body = {"anyOf": [dict(body), {"type": "null"}]}
        props[field.name] = body
    return {
        "title": title,
        "type": "object",
        "properties": props,
        "required": list(schema.names),
    }


class SchemaValidator:
    """Schema generation / export / JSON validation.

    API-parity with the reference SchemaValidator (validation/schema.py:
    22-104, 255-326); the model-rule validation lives in
    ``stages/validate.py`` as vectorizable batch fns.
    """

    def __init__(self):
        self.schemas: Dict[str, Any] = {}
        self._generate_schemas()

    def _generate_schemas(self) -> None:
        """Reference validation/schema.py:31-54."""
        self.schemas["Document"] = _document_schema()
        self.schemas["Contract"] = _contract_schema()
        self.schemas["ContractHierarchy"] = _hierarchy_schema()
        self.schemas["ContractValidation"] = {
            "type": "object",
            "properties": {
                "document": self.schemas["Document"],
                "contract": self.schemas["Contract"],
            },
            "required": ["document", "contract"],
            "additionalProperties": False,
        }

    def get_schema(self, model_name: str) -> Optional[Dict[str, Any]]:
        return self.schemas.get(model_name)

    def get_all_schemas(self) -> Dict[str, Any]:
        return self.schemas.copy()

    def export_schemas(self, output_dir: str = "schemas") -> List[str]:
        """Write one JSON file per schema + the combined validation schema.

        Reference validation/schema.py:63-104 (same filenames, same
        combined-artifact header).
        """
        output_path = Path(output_dir)
        output_path.mkdir(exist_ok=True)
        exported: List[str] = []
        for schema_name, schema_data in self.schemas.items():
            file_path = output_path / f"{schema_name.lower()}_schema.json"
            with open(file_path, "w", encoding="utf-8") as f:
                json.dump(schema_data, f, indent=2, ensure_ascii=False)
            exported.append(str(file_path))
        validation_schema = {
            "title": "PapperMate Contract Validation Schema",
            "version": "1.0.0",
            "description": "Combined schema for validating contracts and documents",
            "schemas": self.schemas,
        }
        validation_file = output_path / "validation_schema.json"
        with open(validation_file, "w", encoding="utf-8") as f:
            json.dump(validation_schema, f, indent=2, ensure_ascii=False)
        exported.append(str(validation_file))
        return exported

    def validate_json_against_schema(
        self, json_data: Union[str, Dict[str, Any]], schema_name: str = "Contract"
    ) -> List[str]:
        """Reference validation/schema.py:255-282 (byte-identical messages)."""
        errors: List[str] = []
        try:
            data = json.loads(json_data) if isinstance(json_data, str) else json_data
            schema = self.get_schema(schema_name)
            if not schema:
                errors.append(f"Schema '{schema_name}' not found")
                return errors
            errors.extend(self._validate_json_structure(data, schema))
        except json.JSONDecodeError as e:
            errors.append(f"Invalid JSON format: {e}")
        except Exception as e:  # pragma: no cover - parity with reference
            errors.append(f"Validation error: {e}")
        return errors

    def _validate_json_structure(self, data: Any, schema: Dict[str, Any]) -> List[str]:
        """Reference validation/schema.py:288-326 (byte-identical messages)."""
        errors: List[str] = []
        required_fields = schema.get("required", [])
        if isinstance(data, dict):
            for field in required_fields:
                if field not in data:
                    errors.append(f"Required field '{field}' is missing")
        if "type" in schema:
            expected_type = schema["type"]
            if expected_type == "object" and not isinstance(data, dict):
                errors.append(f"Expected object type, got {type(data).__name__}")
            elif expected_type == "array" and not isinstance(data, list):
                errors.append(f"Expected array type, got {type(data).__name__}")
            elif expected_type == "string" and not isinstance(data, str):
                errors.append(f"Expected string type, got {type(data).__name__}")
            elif expected_type == "integer" and not isinstance(data, int):
                errors.append(f"Expected integer type, got {type(data).__name__}")
            elif expected_type == "number" and not isinstance(data, (int, float)):
                errors.append(f"Expected number type, got {type(data).__name__}")
            elif expected_type == "boolean" and not isinstance(data, bool):
                errors.append(f"Expected boolean type, got {type(data).__name__}")
        if isinstance(data, dict) and "properties" in schema:
            for prop_name, prop_schema in schema["properties"].items():
                if prop_name in data:
                    prop_errors = self._validate_json_structure(data[prop_name], prop_schema)
                    errors.extend([f"Property '{prop_name}': {err}" for err in prop_errors])
        if isinstance(data, list) and "items" in schema:
            for i, item in enumerate(data):
                item_errors = self._validate_json_structure(item, schema["items"])
                errors.extend([f"Item {i}: {err}" for err in item_errors])
        return errors
