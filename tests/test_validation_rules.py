"""Validation rule parity with the reference SchemaValidator.

Mirrors reference/tests/validation/test_schema_validation.py — same
planted-failure fixtures, same byte-identical error strings — against the
engine's batch validators (stages/validate.py) and the JSON-Schema
surface (io/jsonschema.py).
"""

import datetime as dt
import json
from pathlib import Path

import pyarrow as pa

from pappermate_ray.io.jsonschema import SchemaValidator, arrow_schema_to_json_schema
from pappermate_ray.stages.validate import (
    validate_contracts_batch,
    validate_document_record,
    validate_documents_batch,
    validate_hierarchies_batch,
    validate_hierarchy_record,
    validate_record,
)


def _contract_batch(**overrides):
    base = {
        "status": "converted", "error": "",
        "contract_name": "Test Master Service Agreement",
        "contract_number": "MSA-2024-001",
        "client_name": "Test Client Inc.", "vendor_name": "Test Vendor Ltd.",
        "effective_date": dt.datetime(2024, 1, 1),
        "expiration_date": dt.datetime(2024, 12, 31),
        "total_value": 100000.0, "currency": "USD",
    }
    base.update(overrides)
    return pa.Table.from_pylist([base])


class TestContractRules:
    """Reference test_schema_validation.py:129-222."""

    def test_success(self):
        out = validate_contracts_batch(_contract_batch())
        assert out["is_valid"][0].as_py() is True
        assert out["validation_errors"][0].as_py() == []

    def test_missing_required_fields(self):
        out = validate_contracts_batch(_contract_batch(
            contract_name="N/A", contract_number="N/A",
            client_name="N/A", vendor_name="N/A",
        ))
        errors = out["validation_errors"][0].as_py()
        assert "Contract must have a valid name" in errors
        assert "Contract must have a valid contract number" in errors
        assert "Contract must have a valid client name" in errors
        assert "Contract must have a valid vendor name" in errors

    def test_invalid_dates(self):
        out = validate_contracts_batch(_contract_batch(
            effective_date=dt.datetime(2024, 12, 31),
            expiration_date=dt.datetime(2024, 1, 1),
        ))
        assert "Effective date must be before expiration date" in (
            out["validation_errors"][0].as_py()
        )

    def test_invalid_value(self):
        out = validate_contracts_batch(_contract_batch(total_value=-1000.0))
        assert "Contract total value must be positive" in (
            out["validation_errors"][0].as_py()
        )

    def test_value_without_currency(self):
        errors = validate_record("N", "C-1", "Cl", "V", None, None, 10.0, "")
        assert "Contract must have currency when value is specified" in errors

    def test_missing_entities_structure(self):
        """Reference :201-222 — entities dict present but incomplete."""
        batch = _contract_batch()
        batch = batch.append_column("has_sections", pa.array([True]))
        batch = batch.append_column("has_extracted_entities", pa.array([False]))
        batch = batch.append_column("has_parsing_metadata", pa.array([False]))
        errors = validate_contracts_batch(batch)["validation_errors"][0].as_py()
        assert "Contract entities must include extracted entities" in errors
        assert "Contract entities must include parsing metadata" in errors
        assert "Contract entities must include sections" not in errors

    def test_entities_all_missing(self):
        errors = validate_record("N", "C-1", "Cl", "V", None, None, None, "USD",
                                 entities_present=True, has_sections=False,
                                 has_extracted_entities=False,
                                 has_parsing_metadata=False)
        assert errors == [
            "Contract entities must include sections",
            "Contract entities must include extracted entities",
            "Contract entities must include parsing metadata",
        ]


class TestDocumentRules:
    """Reference test_schema_validation.py:224-256."""

    def test_success(self):
        errors = validate_document_record(
            "test_contract.pdf", "/path/to/test_contract.pdf", 1024,
            "converted", None, "Sample contract content")
        assert errors == []

    def test_missing_fields(self):
        errors = validate_document_record("", "", 0, "error", "", None)
        assert "Document must have a valid filename" in errors
        assert "Document must have a valid file path" in errors
        assert "Document must have a positive file size" in errors
        assert "Document with error status must have an error message" in errors

    def test_content_exceeds_file_size(self):
        errors = validate_document_record("f.pdf", "/f.pdf", 5, "converted",
                                          None, "longer than five")
        assert "Document content length cannot exceed file size" in errors

    def test_batch(self):
        batch = pa.Table.from_pylist([
            {"filename": "a.pdf", "file_path": "/a.pdf", "file_size": 100,
             "status": "converted", "error": None, "text": "ok"},
            {"filename": "", "file_path": "/b.pdf", "file_size": 0,
             "status": "error", "error": "", "text": None},
        ])
        out = validate_documents_batch(batch)
        assert out["doc_is_valid"].to_pylist() == [True, False]
        assert len(out["doc_validation_errors"][1].as_py()) == 3


class TestHierarchyRules:
    """Reference test_schema_validation.py:258-279."""

    def test_success(self):
        errors = validate_hierarchy_record(
            "Test Contract Hierarchy", "test-doc-1", ["test-doc-1"], True, [])
        assert errors == []

    def test_missing_fields(self):
        errors = validate_hierarchy_record("", "", [], False, [])
        assert "Contract hierarchy must have a valid name" in errors
        assert "Contract hierarchy must have a root contract ID" in errors
        assert "Invalid hierarchy must have validation error messages" in errors

    def test_root_not_in_contracts(self):
        errors = validate_hierarchy_record("H", "root-1", ["child-1"], True, [])
        assert errors == ["Root contract ID must exist in contracts list"]

    def test_batch(self):
        batch = pa.Table.from_pylist([
            {"hierarchy_id": "h1", "name": "H", "root_contract_id": "r",
             "contract_ids": ["r", "c"], "is_valid": True, "validation_errors": []},
            {"hierarchy_id": "h2", "name": "", "root_contract_id": "r2",
             "contract_ids": ["x"], "is_valid": False, "validation_errors": []},
        ])
        out = validate_hierarchies_batch(batch)
        assert out["rule_errors"][0].as_py() == []
        errs = out["rule_errors"][1].as_py()
        assert "Contract hierarchy must have a valid name" in errs
        assert "Root contract ID must exist in contracts list" in errs
        assert "Invalid hierarchy must have validation error messages" in errs


class TestSchemaValidatorSurface:
    """Reference test_schema_validation.py:72-128, 281-338."""

    def setup_method(self):
        self.validator = SchemaValidator()

    def test_validator_initialization(self):
        for name in ("Document", "Contract", "ContractHierarchy", "ContractValidation"):
            assert name in self.validator.schemas

    def test_get_schema(self):
        assert self.validator.get_schema("Document")["title"] == "Document"
        assert self.validator.get_schema("Contract")["title"] == "Contract"
        assert self.validator.get_schema("NonExistent") is None

    def test_get_all_schemas_is_copy(self):
        all_schemas = self.validator.get_all_schemas()
        assert all_schemas is not self.validator.schemas
        assert set(all_schemas) == set(self.validator.schemas)

    def test_export_schemas(self, tmp_path):
        exported = self.validator.export_schemas(str(tmp_path))
        assert len(exported) == 5  # 4 individual + 1 combined
        for fp in exported:
            assert Path(fp).exists() and Path(fp).stat().st_size > 0
        assert (tmp_path / "document_schema.json").exists()
        with open(tmp_path / "validation_schema.json") as f:
            combined = json.load(f)
        assert combined["title"] == "PapperMate Contract Validation Schema"
        assert combined["version"] == "1.0.0"
        assert "schemas" in combined

    def test_validate_json_success(self):
        valid = {
            "document": {
                "id": "test-doc-1", "filename": "t.pdf", "file_path": "/t.pdf",
                "document_type": "pdf", "mime_type": "application/pdf",
                "file_size": 1024, "status": "converted",
                "content": "Sample content", "metadata": {"source": "test"},
            },
            "contract_type": "msa", "contract_number": "TEST-001",
            "contract_name": "Test Contract", "client_name": "Test Client",
            "vendor_name": "Test Vendor",
            "entities": {"sections": {}, "extracted_entities": {},
                         "parsing_metadata": {}},
        }
        assert self.validator.validate_json_against_schema(valid, "Contract") == []

    def test_validate_json_missing_required(self):
        errors = self.validator.validate_json_against_schema(
            {"contract_name": "Test Contract"}, "Contract")
        assert any("Required field" in e for e in errors)

    def test_validate_json_invalid_format(self):
        errors = self.validator.validate_json_against_schema(
            "invalid json content", "Contract")
        assert any("Invalid JSON format" in e for e in errors)

    def test_unknown_schema(self):
        errors = self.validator.validate_json_against_schema({}, "Nope")
        assert errors == ["Schema 'Nope' not found"]


class TestArrowSchemaExport:
    def test_docs_schema_roundtrip(self):
        sch = pa.schema([
            ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()), ("n_chars", pa.int64()),
            ("quality", pa.float64()), ("ok", pa.bool_()),
            ("tags", pa.list_(pa.string())),
            ("blocks", pa.list_(pa.struct([("type", pa.string()),
                                           ("page", pa.int32())]))),
        ])
        js = arrow_schema_to_json_schema(sch, "Docs")
        assert js["title"] == "Docs"
        p = js["properties"]
        assert p["url"]["anyOf"][0]["type"] == "string"
        assert p["warc_ts"]["anyOf"][0]["format"] == "date-time"
        assert p["n_chars"]["anyOf"][0]["type"] == "integer"
        assert p["tags"]["anyOf"][0]["type"] == "array"
        blocks = p["blocks"]["anyOf"][0]
        assert blocks["items"]["properties"]["page"]["type"] == "integer"
        assert js["required"] == list(sch.names)


def test_cli_schemas_export(tmp_path):
    from pappermate_ray.__main__ import main

    main(["schemas", "--output", str(tmp_path)])
    names = sorted(p.name for p in tmp_path.iterdir())
    assert "document_schema.json" in names
    assert "validation_schema.json" in names
    assert len(names) == 5
