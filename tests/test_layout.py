"""Geometric layout parser tests (functions/layout.py — Marker semantics:
furniture removal, reading-order resolution, heading/table detection)."""

import json

from pappermate_ray.fixtures import pdf_payload
from pappermate_ray.functions.layout import (
    PDF_MAGIC,
    detect_columns,
    detect_furniture,
    extract_pdf_text,
    parse_pdf_layout,
)


def _doc(pages):
    return PDF_MAGIC + json.dumps({"pages": pages}).encode()


def _line(x, y, text, h=12.0, cells=None):
    d = {"x": x, "y": y, "w": 200.0, "h": h, "text": text}
    if cells:
        d["cells"] = cells
    return d


class TestFurniture:
    def test_repeated_header_footer_dropped(self):
        body = ["alpha opening clause text", "beta payment terms body", "gamma closing remarks"]
        pages = [
            {"width": 612, "height": 792, "lines": [
                _line(50, 20, "CONFIDENTIAL"),
                _line(50, 100, body[p]),
                _line(280, 772, f"Page {p + 1}"),
            ]}
            for p in range(3)
        ]
        blocks, err = parse_pdf_layout(_doc(pages))
        assert err == ""
        texts = " ".join(b["text"] for b in blocks)
        assert "CONFIDENTIAL" not in texts
        assert "Page 1" not in texts  # page numbers digit-normalized → furniture
        assert "alpha opening clause text" in texts and "gamma closing remarks" in texts

    def test_single_page_keeps_everything(self):
        pages = [{"width": 612, "height": 792, "lines": [
            _line(50, 20, "CONFIDENTIAL"), _line(50, 100, "Body line content")]}]
        blocks, _ = parse_pdf_layout(_doc(pages))
        assert any("CONFIDENTIAL" in b["text"] for b in blocks)


class TestReadingOrder:
    def test_two_column_order(self):
        lines = [
            _line(50, 100, "left one"), _line(50, 120, "left two"),
            _line(330, 100, "right one"), _line(330, 120, "right two"),
        ]
        cols = detect_columns(lines, 612.0)
        assert len(cols) == 2
        pages = [{"width": 612, "height": 792, "lines": lines}]
        blocks, _ = parse_pdf_layout(_doc(pages))
        text = "\n".join(b["text"] for b in blocks)
        # full left column precedes right column
        assert text.index("left two") < text.index("right one")

    def test_single_column(self):
        lines = [_line(50, 100, "a line"), _line(52, 120, "b line")]
        assert len(detect_columns(lines, 612.0)) == 1


class TestBlocks:
    def test_heading_detection_and_gap_grouping(self):
        pages = [{"width": 612, "height": 792, "lines": [
            _line(50, 60, "Big Title Line", h=20.0),
            _line(50, 100, "first paragraph line one"),
            _line(50, 114, "first paragraph line two"),
            _line(50, 200, "second paragraph after a large gap"),
        ]}]
        blocks, _ = parse_pdf_layout(_doc(pages))
        kinds = [(b["type"], b["text"]) for b in blocks]
        assert kinds[0][0] == "heading" and "Big Title" in kinds[0][1]
        assert "line one first paragraph line two" in kinds[1][1].replace("first paragraph ", "", 1) or \
            "first paragraph line one first paragraph line two" == kinds[1][1]
        assert kinds[2][1] == "second paragraph after a large gap"

    def test_table_detection(self):
        pages = [{"width": 612, "height": 792, "lines": [
            _line(50, 100, "intro paragraph before the table here"),
            _line(50, 130, "Name\tQty\tPrice", cells=[50, 200, 330]),
            _line(50, 144, "Hours\t40\tR$ 100,00", cells=[50, 200, 330]),
        ]}]
        blocks, _ = parse_pdf_layout(_doc(pages))
        tables = [b for b in blocks if b["type"] == "table"]
        assert len(tables) == 1
        assert tables[0]["text"] == "Name | Qty | Price\nHours | 40 | R$ 100,00"

    def test_page_index_carried(self):
        texts = ["first page distinct body", "second page other content"]
        pages = [
            {"width": 612, "height": 792, "lines": [_line(50, 100, texts[p])]}
            for p in range(2)
        ]
        blocks, _ = parse_pdf_layout(_doc(pages))
        assert [b["page"] for b in blocks] == [0, 1]
        assert [b["order"] for b in blocks] == [0, 1]


class TestSoftFail:
    def test_malformed_payload(self):
        text, blocks, status, err = extract_pdf_text(PDF_MAGIC + b"{not json")
        assert status == "error" and "pdf parse error" in err

    def test_empty_pages(self):
        text, blocks, status, err = extract_pdf_text(_doc([]))
        assert status == "error"


class TestFixtureIntegration:
    def test_fixture_pdf_docs_parse(self):
        payload = pdf_payload(3, "filler words here for the body text")
        text, blocks, status, err = extract_pdf_text(payload)
        assert status == "converted"
        assert "CONFIDENTIAL" not in text or "Page" not in text  # furniture dropped on multipage
        kinds = {b["type"] for b in blocks}
        assert "heading" in kinds and "table" in kinds
        # the contract fields survive layout for the parse stage
        assert "Contract Number:" in text


class TestTableCells:
    """Structured cell model (reference table_processor_fixed.py:181-203)."""

    def test_fixture_table_cells(self):
        payload = pdf_payload(3, "filler words here")
        _, blocks, status, _ = extract_pdf_text(payload)
        assert status == "converted"
        tables = [b for b in blocks if b["type"] == "table"]
        assert len(tables) == 1
        cells = tables[0]["cells"]
        assert len(cells) == 9  # 3x3 fixture table
        assert [c["col_id"] for c in cells] == [0, 1, 2] * 3
        assert all(c["rowspan"] == 1 and c["colspan"] == 1 for c in cells)
        assert [c["is_header"] for c in cells[:3]] == [True] * 3
        assert not any(c["is_header"] for c in cells[3:])
        assert cells[0]["text"] == "Item 3" and cells[8]["text"] == "R$ 250,00"

    def test_colspan_from_missing_column(self):
        from pappermate_ray.functions.layout import table_cells

        lines = [
            {"text": "A\tB\tC", "cells": [10.0, 50.0, 90.0]},
            {"text": "wide\tC2", "cells": [10.0, 90.0]},  # spans cols 0-1
        ]
        cells = table_cells(lines)
        wide = [c for c in cells if c["text"] == "wide"][0]
        assert wide["col_id"] == 0 and wide["colspan"] == 2
        c2 = [c for c in cells if c["text"] == "C2"][0]
        assert c2["col_id"] == 2 and c2["colspan"] == 1

    def test_non_table_blocks_have_null_cells(self):
        payload = pdf_payload(3, "filler words here")
        _, blocks, _, _ = extract_pdf_text(payload)
        for b in blocks:
            if b["type"] != "table":
                assert b.get("cells") is None
