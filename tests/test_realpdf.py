"""Real-PDF text extraction (functions/pdfreal.py + the shared layout
geometry): build→extract round trips, Flate streams, furniture removal,
two-column reading order, table cells, operator coverage (TJ, T*, ',
Tm, hex/octal strings), and soft-fail on malformed bytes."""

import zlib

import pytest

from pappermate_ray.functions.layout import (extract_pdf_text,
                                             is_pdf_payload,
                                             parse_pdf_layout)
from pappermate_ray.functions.pdfreal import (build_pdf, is_real_pdf,
                                              parse_real_pdf_pages)


def _body(texts, x=50, y0=40, dy=12, h=10):
    return [{"x": x, "y": y0 + dy * i, "h": h, "text": t}
            for i, t in enumerate(texts)]


def test_single_column_roundtrip_and_dispatch():
    pdf = build_pdf([{"width": 612, "height": 792,
                      "lines": _body(["alpha beta", "gamma delta"])}])
    assert pdf.startswith(b"%PDF-1.4")
    assert is_real_pdf(pdf) and is_pdf_payload(pdf)
    text, blocks, status, err = extract_pdf_text(pdf)
    assert status == "converted" and err == ""
    assert text == "alpha beta gamma delta"  # close lines merge into one block


def test_flate_stream_equals_plain():
    pages = [{"width": 612, "height": 792,
              "lines": _body(["one two three", "four five six"])}]
    assert (extract_pdf_text(build_pdf(pages))[0]
            == extract_pdf_text(build_pdf(pages, compress=True))[0])


def test_repeated_header_is_furniture():
    hdr = {"x": 50, "y": 10, "h": 10, "text": "Quarterly Report"}
    pgs = [{"width": 612, "height": 792,
            "lines": [hdr] + _body([f"unique body words {chr(97 + p)}"])}
           for p in range(3)]
    text, _, status, _ = extract_pdf_text(build_pdf(pgs))
    assert status == "converted"
    assert "Quarterly Report" not in text
    assert text == ("unique body words a\nunique body words b\n"
                    "unique body words c")


def test_two_column_reading_order():
    lines = (_body(["left one", "left two"], x=50)
             + _body(["right one", "right two"], x=400))
    text, _, _, _ = extract_pdf_text(
        build_pdf([{"width": 612, "height": 792, "lines": lines}]))
    assert text == "left one left two\nright one right two"


def test_table_cells_from_run_gaps():
    lines = [
        {"x": 50, "y": 40, "h": 10, "text": "name\tamount",
         "cells": [50, 300]},
        {"x": 50, "y": 52, "h": 10, "text": "alpha\t42",
         "cells": [50, 300]},
    ]
    text, blocks, _, _ = extract_pdf_text(
        build_pdf([{"width": 612, "height": 792, "lines": lines}]))
    assert blocks[0]["type"] == "table"
    assert text == "name | amount\nalpha | 42"
    cells = blocks[0]["cells"]
    assert {(c["row_id"], c["col_id"], c["text"]) for c in cells} == {
        (0, 0, "name"), (0, 1, "amount"), (1, 0, "alpha"), (1, 1, "42")}


def _pdf_from_stream(content: bytes, compress=False) -> bytes:
    if compress:
        z = zlib.compress(content)
        stream = (b"<< /Length " + str(len(z)).encode()
                  + b" /Filter /FlateDecode >>\nstream\n" + z
                  + b"\nendstream")
    else:
        stream = (b"<< /Length " + str(len(content)).encode()
                  + b" >>\nstream\n" + content + b"\nendstream")
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
            b"/MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n" + stream + b"\nendobj\n"
            b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")


def test_tj_array_with_kerning_spaces():
    # adjustment -250 inserts a space; -40 does not
    content = (b"BT /F1 10 Tf 50 700 Td "
               b"[(Hel) -40 (lo) -250 (world)] TJ ET")
    pages, err = parse_real_pdf_pages(_pdf_from_stream(content))
    assert err == ""
    assert pages[0]["lines"][0]["text"] == "Hello world"


def test_tstar_and_quote_advance_lines():
    content = (b"BT /F1 10 Tf 14 TL 50 700 Td (first line) Tj "
               b"T* (second line) Tj (third line) ' ET")
    pages, err = parse_real_pdf_pages(_pdf_from_stream(content))
    assert err == ""
    texts = [l["text"] for l in pages[0]["lines"]]
    assert texts == ["first line", "second line", "third line"]
    ys = [l["y"] for l in pages[0]["lines"]]
    assert ys == sorted(ys)  # top-based reading order


def test_tm_positioning_and_scale():
    # Tm scale d=2 doubles the effective size (h = 10*2)
    content = b"BT /F1 10 Tf 2 0 0 2 80 600 Tm (BigHeading) Tj ET"
    pages, err = parse_real_pdf_pages(_pdf_from_stream(content))
    assert err == ""
    (line,) = pages[0]["lines"]
    assert line["text"] == "BigHeading"
    assert line["h"] == 20.0
    assert line["x"] == 80.0


def test_hex_string_and_octal_escape():
    content = (b"BT /F1 10 Tf 50 700 Td <48656C6C6F> Tj ET\n"
               b"BT /F1 10 Tf 50 680 Td (oct\\101l \\(esc\\)) Tj ET")
    pages, err = parse_real_pdf_pages(_pdf_from_stream(content))
    assert err == ""
    texts = [l["text"] for l in pages[0]["lines"]]
    assert texts == ["Hello", "octAl (esc)"]


def test_flate_binary_containing_endobj_bytes():
    # a stream whose compressed bytes are adversarially salted with
    # object-delimiter text must still parse via /Length skipping
    content = (b"BT /F1 10 Tf 50 700 Td (payload words) Tj ET\n"
               b"% endobj 9 0 obj stream endstream\n")
    pages, err = parse_real_pdf_pages(_pdf_from_stream(content, compress=True))
    assert err == ""
    assert pages[0]["lines"][0]["text"] == "payload words"


def test_malformed_pdfs_soft_fail():
    assert parse_real_pdf_pages(b"%PDF-1.4\ngarbage")[1] != ""
    text, blocks, status, err = extract_pdf_text(b"%PDF-1.4\nnothing here")
    assert status == "error" and text == "" and blocks == []
    # unsupported filter soft-fails, never raises
    bad = _pdf_from_stream(b"BT ET").replace(
        b"<< /Length", b"<< /Filter /LZWDecode /Length")
    assert parse_real_pdf_pages(bad)[1] != ""


def test_pdfsyn_still_routes_and_parses():
    payload = (b"%PDF-SYN" + b'{"pages": [{"width": 612, "height": 792,'
               b' "lines": [{"x": 50, "y": 40, "w": 100, "h": 10,'
               b' "text": "syn path intact"}]}]}')
    assert is_pdf_payload(payload) and not is_real_pdf(payload)
    blocks, err = parse_pdf_layout(payload)
    assert err == "" and blocks[0]["text"] == "syn path intact"


def test_contents_array_multiple_streams():
    c1 = b"BT /F1 10 Tf 50 700 Td (part one) Tj ET"
    c2 = b"BT /F1 10 Tf 50 680 Td (part two) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /MediaBox [0 0 612 792] "
           b"/Contents [4 0 R 5 0 R] >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(c1)).encode()
           + b" >>\nstream\n" + c1 + b"\nendstream\nendobj\n"
           b"5 0 obj\n<< /Length " + str(len(c2)).encode()
           + b" >>\nstream\n" + c2 + b"\nendstream\nendobj\n"
           b"%%EOF\n")
    pages, err = parse_real_pdf_pages(pdf)
    assert err == ""
    assert [l["text"] for l in pages[0]["lines"]] == ["part one", "part two"]


def test_build_pdf_deterministic():
    pages = [{"width": 612, "height": 792, "lines": _body(["same input"])}]
    assert build_pdf(pages) == build_pdf(pages)
    assert build_pdf(pages, compress=True) == build_pdf(pages, compress=True)
