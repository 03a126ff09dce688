"""Unit tests for the pure function library.

Mirrors the reference's test strategy (SURVEY.md §5): exact-value asserts on
inline fixture strings, including the pinned quirks
(tests/parser/test_contract_parser.py of the reference).
"""

from datetime import datetime

from pappermate_ray.functions.amounts import parse_amount
from pappermate_ray.functions.contract import (
    detect_contract_type,
    extract_entities,
    extract_metadata,
    extract_parties,
    extract_sections,
    parse_contract,
)
from pappermate_ray.functions.dates import extract_dates, extract_year
from pappermate_ray.functions.naming import (
    canonical_contract_filename,
    map_cjk_terms,
    normalize_supplier_name,
    operation_type,
    sanitize_filename,
)
from pappermate_ray.functions.quality import (
    detect_language,
    fingerprint,
    quality_score,
    token_count,
)
from pappermate_ray.functions.spans import (
    chunk_text,
    dedupe_spans,
    extract_spans,
    normalize_entity_text,
)
from pappermate_ray.functions.textnorm import finalize_line, normalize_spaces

SAMPLE_MD = """# Master Service Agreement

## Contract Information
**Contract Number:** MSA-2024-001
**Client:** TechCorp Inc.
**Vendor:** DevSolutions Ltd.

## Financial Terms
**Total Value:** R$ 150.000,00
**Currency:** BRL

## Dates
**Effective Date:** 01/01/2024
**Expiration Date:** 31/12/2025

## Key Clauses
### Vigência
This agreement is valid for 2 years.

### Pagamentos
Monthly payments of R$ 6.250,00.

### Confidencialidade
All information shared is confidential.

## Contact Information
**Email:** contracts@techcorp.com
**CNPJ:** 12.345.678/0001-90
"""


class TestAmounts:
    def test_brl(self):
        assert parse_amount("R$ 150.000,00") == 150000.0

    def test_usd_quirk(self):
        # the reference's pinned quirk (its tests/parser/test_contract_parser.py:243-245)
        assert parse_amount("US$ 50,000.00") == 50.0

    def test_eur(self):
        assert parse_amount("€ 25.000,00") == 25000.0

    def test_plain(self):
        assert parse_amount("150.000,00") == 150000.0

    def test_invalid(self):
        assert parse_amount("invalid") is None
        assert parse_amount("") is None
        assert parse_amount(None) is None


class TestDates:
    def test_formats(self):
        content = "Start date: 01/01/2024\nEnd date: 2024-12-31\nAnother date: 15 de março 2024"
        dates = extract_dates(content)
        # PT month format silently dropped (reference's 3-group gate) → 2 dates
        assert len(dates) == 2
        assert dates[0]["date"] == datetime(2024, 1, 1)
        assert dates[0]["text"] == "01/01/2024"
        assert dates[1]["date"] == datetime(2024, 12, 31)
        # sorted by position
        assert dates[0]["position"] < dates[1]["position"]

    def test_invalid_date_skipped(self):
        assert extract_dates("date 99/99/2024 end") == []

    def test_year(self):
        assert extract_year("01/01/2024") == "2024"
        assert extract_year("no year") == ""
        assert extract_year("") == ""


class TestContractParse:
    def test_metadata(self):
        md = extract_metadata(SAMPLE_MD)
        assert md["title"] == "Master Service Agreement"
        assert md["contract_number"] == "MSA-2024-001"
        assert md["client_name"] == "TechCorp Inc."
        assert md["vendor_name"] == "DevSolutions Ltd."
        assert md["currency"] == "R$"
        assert md["contract_type"] == "msa"
        # reference-faithful: bold R$-prefixed amount does NOT parse
        # (single-char currency class can't span "R$ ")
        assert "total_value" not in md
        assert [d["date"] for d in md["dates"]][:2] == [
            datetime(2024, 1, 1),
            datetime(2025, 12, 31),
        ]

    def test_sections_bold_fallback(self):
        # header regex is the literal-brace quirk → bold pairs fire
        sections = extract_sections(SAMPLE_MD)
        assert sections["contract number"] == "MSA-2024-001"
        assert sections["client"] == "TechCorp Inc."
        assert "email" in sections

    def test_entities(self):
        ents = extract_entities(SAMPLE_MD)
        assert ents["emails"] == ["contracts@techcorp.com"]
        assert ents["cnpj_cpf"] == ["12.345.678/0001-90"]
        assert ents["key_clauses"]["vigência"] is True
        assert ents["key_clauses"]["pagamentos"] is True
        assert ents["key_clauses"]["confidencialidade"] is True

    def test_parties(self):
        parties = extract_parties("Client: ABC Corporation\nVendor: XYZ Services")
        assert parties["client_name"] == "ABC Corporation"
        assert parties["vendor_name"] == "XYZ Services"

    def test_type_detection(self):
        assert detect_contract_type("This is a Master Service Agreement") == "msa"
        assert detect_contract_type("Statement of Work for Project Alpha") == "sow"
        assert detect_contract_type("Some random text") is None

    def test_full_parse(self):
        rec = parse_contract(SAMPLE_MD, default_name="x.md")
        assert rec["contract_number"] == "MSA-2024-001"
        assert rec["effective_date"] == datetime(2024, 1, 1)
        assert rec["expiration_date"] == datetime(2025, 12, 31)
        assert rec["currency"] == "R$"
        assert rec["confidence"] > 0.8

    def test_defaults(self):
        rec = parse_contract("nothing here", default_name="f.md")
        assert rec["contract_number"] == "N/A"
        assert rec["client_name"] == "N/A"
        assert rec["currency"] == "USD"
        assert rec["contract_type"] == "msa"
        assert rec["effective_date"] is None


class TestNaming:
    def test_cjk_map(self):
        mapped = map_cjk_terms("【御見積書】_システム運用サポート")
        assert "Quotation" in mapped
        assert "System" in mapped and "Operations" in mapped and "Support" in mapped

    def test_sanitize_ascii_passthrough(self):
        assert sanitize_filename("contract_2024.pdf") == ("contract_2024.pdf", "success", "")

    def test_sanitize_cjk(self):
        name, status, err = sanitize_filename("見積書.pdf")
        assert name == "Quotation.pdf"
        assert status == "failed"  # reference semantics: fallback = failed translation
        assert "fallback" in err

    def test_supplier_normalize(self):
        assert normalize_supplier_name("Dev Solutions-Ltd.") == "Dev_Solutions_Ltd"
        assert normalize_supplier_name("") == "Unknown"
        assert len(normalize_supplier_name("x" * 80)) == 50

    def test_canonical_filename(self):
        fn = canonical_contract_filename("Acme Corp", "msa", "2024", "2026", "MSA-2024-001")
        assert fn == "Acme_Corp_MSA_2024_2026_MSA_2024_001.pdf"
        fn2 = canonical_contract_filename("", None, "2024", "2024", "")
        assert fn2 == "Unknown_UNKNOWN_2024_UNKNOWN_ID.pdf"

    def test_operation_type(self):
        assert operation_type("abc.pdf") == "rename"
        assert operation_type("見積.pdf") == "translate"


class TestTextNorm:
    def test_spaces(self):
        assert normalize_spaces("a b c​d") == "a b c d"

    def test_finalize(self):
        assert finalize_line("  . ") == ""
        assert finalize_line("Intro . . . . 5") == "Intro 5"
        assert finalize_line("Chapter........3") == "Chapter3"


class TestSpans:
    def test_chunking_offsets(self):
        text = ("Sentence one. " * 60).strip()
        chunks = chunk_text(text, 512)
        assert all(len(c) <= 512 for _, c in chunks)
        # offsets reassemble the document
        assert "".join(c for _, c in chunks) == text
        assert chunks[0][0] == 0

    def test_extract_and_dedupe(self):
        text = "Contract MSA-2024-001 effective 01/01/2024 value US$ 500. Also MSA-2024-001 again."
        spans = extract_spans(text)
        ids = [s for s in spans if s["entity_type"] == "CONTRACT_ID"]
        assert len(ids) == 1  # deduped on normalized key
        assert ids[0]["start"] == text.index("MSA-2024-001")
        dates = [s for s in spans if s["entity_type"] == "START_DATE"]
        assert dates[0]["text"] == "01/01/2024"

    def test_normalize_date(self):
        assert normalize_entity_text("01/01/2024", "START_DATE") == "2024-01-01"

    def test_normalize_amount_quirk(self):
        # the reference's [^Vdt .,] strip removes digits → float fails → lowercased text
        assert normalize_entity_text("R$ 150.000,00", "AMOUNT") == "r$ 150.000,00"

    def test_dedupe_keeps_max_confidence(self):
        spans = [
            {"text": "X-2024-001", "entity_type": "CONTRACT_ID", "start": 0, "end": 5, "confidence": 0.5, "model": "a"},
            {"text": "x-2024-001", "entity_type": "CONTRACT_ID", "start": 9, "end": 14, "confidence": 0.9, "model": "b"},
        ]
        out = dedupe_spans(spans)
        assert len(out) == 1
        assert out[0]["confidence"] == 0.9


class TestQuality:
    def test_token_count(self):
        assert token_count("a b  c") == 3
        assert token_count("") == 0
        assert token_count("   ") == 0

    def test_langid(self):
        assert detect_language("the cat and the dog are in the house with a hat") == "en"
        assert detect_language("o contrato é válido e não pode ser alterado para os fins") == "pt"
        assert detect_language("これはシステムのサポート契約です。よろしくお願いします。") == "ja"
        assert detect_language("") == "unknown"

    def test_quality(self):
        good = "The quick brown fox jumps over the lazy dog. " * 20
        assert quality_score(good) > 0.7
        assert quality_score("") == 0.0
        assert quality_score("!!! ??? !!!") < 0.5

    def test_fingerprint_deterministic(self):
        assert fingerprint("Hello  World") == fingerprint("hello world")
        assert fingerprint("a") != fingerprint("b")


class TestPatternPack:
    def test_load_jsonl_pack(self, tmp_path):
        import json

        from pappermate_ray.functions.spans import extract_spans, load_pattern_pack

        p = tmp_path / "packs"
        p.mkdir()
        with open(p / "a.jsonl", "w") as f:
            f.write(json.dumps({"entities": [
                {"entity_type": "SERVICE_TYPE", "text": "Quantum Plumbing"},
                {"entity_type": "SERVICE_TYPE", "text": "Quantum Plumbing"},  # dedup
            ]}) + "\n")
            f.write("not json\n")  # skipped, reference logs-and-continues
            f.write(json.dumps({"metadata": {"supplier": "Acme Corp", "ignored_key": "x"}}) + "\n")
        pack = load_pattern_pack(str(p))
        assert pack == {"SERVICE_TYPE": ["Quantum Plumbing"], "SUPPLIER": ["Acme Corp"]}

        # merged pack is found by the span extractor
        spans = extract_spans("We provide Quantum Plumbing services here.", 
                              {**pack})
        assert any(s["entity_type"] == "SERVICE_TYPE" and s["text"] == "Quantum Plumbing"
                   for s in spans)

    def test_missing_dir(self):
        from pappermate_ray.functions.spans import load_pattern_pack

        assert load_pattern_pack("/nonexistent/dir") == {}


class TestFastDateNorm:
    def test_exhaustive_equivalence_with_dateutil(self):
        """The _fast_date_norm shortcut must agree with the dateutil path
        byte-for-byte over the whole numeric domain the date span rules
        can emit (normalize_entity_text's golden-frozen behavior)."""
        from dateutil.parser import parse

        from pappermate_ray.functions.spans import normalize_entity_text

        def dateutil_ref(text):
            text = text.lower().strip()
            try:
                return parse(text).strftime("%Y-%m-%d")
            except Exception:
                return text

        cases = []
        for a in list(range(1, 14)) + [15, 28, 29, 30, 31, 32, 99]:
            for b in list(range(1, 14)) + [28, 29, 30, 31, 32, 99]:
                for y in (2020, 2024, 1999):
                    cases.append(f"{a:02d}/{b:02d}/{y}")
                    cases.append(f"{a}/{b}/{y}")
                    cases.append(f"{y}-{a:02d}-{b:02d}")
        cases += ["2024-02-29", "2023-02-29", "0000-01-01", "15 de março 2022",
                  "march 5 2021", "not a date", "13/13/2022", "00/05/2022",
                  "05/00/2022"]
        for c in cases:
            assert normalize_entity_text(c, "START_DATE") == dateutil_ref(c), c
