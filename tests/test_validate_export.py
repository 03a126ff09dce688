"""Tests: validation rules, blocks-path parsing, CSV/JSONL exports,
cached translator, sessionization."""

from datetime import datetime

import pyarrow as pa
import pytest

from pappermate_ray.functions.blocksparse import (
    extract_metadata_from_blocks,
    extract_sections_from_blocks,
    parse_contract_from_blocks,
)
from pappermate_ray.stages.validate import validate_record

# the reference's own JSON fixture (tests/parser/test_contract_parser.py:56-73)
SAMPLE_BLOCKS = [
    {"type": "heading", "text": "Master Service Agreement", "order": 0},
    {"type": "paragraph", "text": "Contract Number: MSA-2024-001", "order": 1},
    {"type": "paragraph", "text": "Client: TechCorp Inc.", "order": 2},
    {"type": "paragraph", "text": "Vendor: DevSolutions Ltd.", "order": 3},
    {"type": "paragraph", "text": "Total Value: R$ 150.000,00", "order": 4},
    {"type": "paragraph", "text": "Effective Date: 01/01/2024", "order": 5},
    {"type": "heading", "text": "Key Clauses", "order": 6},
    {"type": "paragraph", "text": "Vigência: valid for 2 years.", "order": 7},
    {"type": "paragraph", "text": "Email: contracts@techcorp.com", "order": 8},
    {"type": "table", "text": "a | b", "order": 9},
]


class TestBlocksParse:
    def test_metadata(self):
        md = extract_metadata_from_blocks(SAMPLE_BLOCKS)
        assert md["title"] == "Master Service Agreement"
        assert md["contract_number"] == "MSA-2024-001"
        assert md["currency"] == "R$"
        assert md["client_name"] == "TechCorp Inc."
        assert md["dates"][0]["date"] == datetime(2024, 1, 1)
        assert md["contract_type"] == "msa"

    def test_sections(self):
        s = extract_sections_from_blocks(SAMPLE_BLOCKS)
        # heading starts a section; paragraphs accumulate under it
        assert "master service agreement" in s
        assert "key clauses" in s
        assert "Vigência: valid for 2 years." in s["key clauses"]

    def test_full(self):
        r = parse_contract_from_blocks(SAMPLE_BLOCKS)
        assert r["contract_number"] == "MSA-2024-001"
        assert r["emails"] == ["contracts@techcorp.com"]
        assert r["n_table_blocks"] == 1
        assert "vigência" in r["key_clauses"]


class TestValidation:
    def test_valid_contract(self):
        errs = validate_record(
            "MSA", "MSA-2024-001", "A Corp", "B Ltd",
            datetime(2024, 1, 1), datetime(2025, 1, 1), 100.0, "USD",
        )
        assert errs == []

    def test_reference_messages(self):
        errs = validate_record("N/A", "N/A", "N/A", "N/A", None, None, None, None)
        assert errs == [
            "Contract must have a valid name",
            "Contract must have a valid contract number",
            "Contract must have a valid client name",
            "Contract must have a valid vendor name",
        ]

    def test_date_and_value_rules(self):
        errs = validate_record(
            "X", "N-1", "A", "B", datetime(2025, 1, 1), datetime(2024, 1, 1), -5.0, "",
        )
        assert "Effective date must be before expiration date" in errs
        assert "Contract total value must be positive" in errs
        assert "Contract must have currency when value is specified" in errs


class TestExports:
    def test_csv_and_jsonl(self, ray_session, tmp_path):
        import ray.data as rd

        from pappermate_ray.fixtures import build_pages_table
        from pappermate_ray.io.export import csv_projection, training_rows
        from pappermate_ray.pipelines.extract_pipeline import build_extraction_pipeline

        docs = build_extraction_pipeline(rd.from_arrow(build_pages_table(60)), batch_size=32)
        csv = csv_projection(docs)
        rows = csv.take_all()
        assert set(rows[0]) >= {"url", "emails", "key_clauses"}
        assert all(isinstance(r["emails"], str) for r in rows)  # '; ' joined
        joined = [r for r in rows if r["key_clauses"] and ";" in r["key_clauses"]]
        assert joined, "expected at least one multi-clause row joined with '; '"

        tr = training_rows(docs).take_all()
        assert all(set(r["labels"]) == {"contract_type", "contract_number", "client_name",
                                        "vendor_name", "currency"} for r in tr[:3])
        assert all(r["metadata"]["url"].startswith("https://") for r in tr[:3])
        # only converted docs become training rows
        assert len(tr) < 60


class TestSinkRoundTrips:
    def test_csv_and_jsonl_read_back(self, ray_session, tmp_path):
        import ray.data as rd

        from pappermate_ray.fixtures import build_pages_table
        from pappermate_ray.io.export import write_csv, write_training_jsonl
        from pappermate_ray.pipelines.extract_pipeline import build_extraction_pipeline

        docs = build_extraction_pipeline(rd.from_arrow(build_pages_table(60)), batch_size=32)
        csv_dir = str(tmp_path / "csv")
        jsonl_dir = str(tmp_path / "jsonl")
        write_csv(docs, csv_dir)
        write_training_jsonl(docs, jsonl_dir)

        back_csv = rd.read_csv(csv_dir)
        assert back_csv.count() == 60
        assert "contract_number" in back_csv.schema().names

        back_jsonl = rd.read_json(jsonl_dir)
        n = back_jsonl.count()
        assert 0 < n < 60  # only converted docs become training rows
        row = back_jsonl.take(1)[0]
        assert "labels" in row and "metadata" in row


class TestTranslator:
    def test_cache_and_passthrough(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.translate import CachedTranslator

        st = CachedTranslator(text_col="name", lang_col="lang")
        t = pa.table(
            {
                "name": ["見積書", "見積書", "hello", "契約書"],
                "lang": ["ja", "ja", "en", "ja"],
            }
        )
        out = st(t)
        vals = out["translated_name"].to_pylist()
        assert vals[0] == "Quotation" and vals[1] == "Quotation"
        assert vals[2] == "hello"  # passthrough
        assert vals[3] == "Contract"
        assert st.hits == 1 and st.misses == 2  # cache hit on the repeat
        assert out["was_translated"].to_pylist() == [True, True, False, True]


class TestSessions:
    def test_user_sessions_matches_pandas(self, ray_session):
        from pappermate_ray.queries import q_user_sessions

        import duckdb

        sf = "/root/testdata/sf0.001"
        got = {r["user_id"]: r["n_sessions"] for r in q_user_sessions(sf).take_all()}
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        from pappermate_ray.queries import ORACLE_SQL

        want = dict(con.execute(ORACLE_SQL["user_sessions"]).fetchall())
        assert got == want


class TestJsonlRoundtrip:
    def test_unicode_newlines_survive(self, ray_session, tmp_path):
        import ray.data as rd

        from pappermate_ray.io.export import read_jsonl, write_jsonl

        rows = [{"doc_id": 0, "text": "plain"},
                {"doc_id": 1, "text": "中文 φράση é́"},
                {"doc_id": 2, "text": "line1\nline2\ttab \"quoted\" \\slash"},
                {"doc_id": 3, "text": ""}]
        out = str(tmp_path / "jl")
        write_jsonl(rd.from_items(rows, override_num_blocks=2), out)
        got = {r["doc_id"]: r["text"] for r in read_jsonl(out).take_all()}
        assert got == {r["doc_id"]: r["text"] for r in rows}


class TestCsvRoundtrip:
    def test_quotes_newlines_unicode_survive(self, ray_session, tmp_path):
        import ray.data as rd

        from pappermate_ray.io.export import read_csv

        rows = [{"doc_id": 0, "text": "plain"},
                {"doc_id": 1, "text": "中文 φράση é"},
                {"doc_id": 2, "text": 'a,comma "quoted"\nsecond line'},
                {"doc_id": 3, "text": "semi;colon\ttab"}]
        out = str(tmp_path / "csv")
        rd.from_items(rows, override_num_blocks=2).write_csv(out)
        got = {r["doc_id"]: r["text"] for r in read_csv(out).take_all()}
        assert got == {r["doc_id"]: r["text"] for r in rows}
