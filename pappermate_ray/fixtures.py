"""Deterministic synthetic ``pages`` corpus (FIXTURES.md §1/§3).

Builds Common-Crawl-style page rows with the authoritative input shape from
BASELINE.json input_hint: ``url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string``. Content derives ONLY from the row index and the
driver's ``documents.parquet`` filler text (no wall-clock, no RNG state) —
identical output for every run.

Document kinds cycle so every extractor path is exercised (the reference's
inline test fixtures, tests/parser/test_contract_parser.py:26-73 and
scripts/sample_contracts.py:7-147):

- ``contract``     markdown contract with bold fields, PT clause sections,
                   email, CNPJ, pipe table
- ``relation``     parent/child referencing contracts (edge-join fixture)
- ``dates``        multi-format date doc
- ``cjk``          CJK-titled doc (term-map path)
- ``plain``        filler text only
- degenerate rows  (~5%) truncated/invalid bytes → error column
- pre-extracted    (~14%, i%7==3) ``text`` set, ``html`` empty
- giant rows       (i%499==0, i>0) ~60x median size → skew bucket
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, List, Optional

import pyarrow as pa

# bump when generated content changes — cached bench corpora AND the
# /tmp persisted-index caches (minhash sorted-band layout) key on this
FIXTURES_VERSION = 3

EPOCH = _dt.datetime(2024, 1, 1)
SUPPLIERS = ["DevSolutions Ltd.", "Acme Corp.", "Globex GmbH.", "Initech LLC.", "Umbrella SA."]
CLIENTS = ["TechCorp Inc.", "Wayne Enterprises", "Stark Industries", "Hooli Inc.", "Pied Piper"]
CTYPES = ["MSA", "SOW", "PWO", "LSA", "CR", "CNF"]
CJK_TITLES = ["【御見積書】_システム運用サポート", "【請求書】_システム契約", "合同_系统支持_报价"]
LANGS = ["en", "pt", "ja", "zh", "de"]
KINDS = ["contract", "plain", "relation", "pdf", "dates", "cjk"]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _contract_md(i: int, filler: str) -> str:
    ct = CTYPES[i % len(CTYPES)]
    year = 2020 + (i % 6)
    num = f"{ct}-{year}-{i % 1000:03d}"
    supplier = SUPPLIERS[i % len(SUPPLIERS)]
    client = CLIENTS[(i // 2) % len(CLIENTS)]
    value = f"{(i % 900) + 100}.{i % 10}00,00"
    day, month = (i % 28) + 1, (i % 12) + 1
    lines = [
        f"# Master Service Agreement {num}" if ct == "MSA" else f"# Statement of Work {num}",
        "## Contract Information",
        f"**Contract Number:** {num}",
        f"**Client:** {client}",
        f"**Vendor:** {supplier}",
        "## Financial Terms",
        f"**Total Value:** R$ {value}",
        "**Currency:** BRL",
        "## Dates",
        f"**Effective Date:** {day:02d}/{month:02d}/{year}",
        f"**Expiration Date:** {day:02d}/{month:02d}/{year + 2}",
        "## Key Clauses",
        "### Vigência",
        f"This agreement is valid for {2 + i % 3} years.",
        "### Pagamentos",
        f"Monthly payments of R$ {(i % 90) + 10}.250,00 are due.",
        "### Confidencialidade",
        "All information shared is confidential.",
        "## Contact Information",
        f"**Email:** contracts{i % 50}@techcorp.com",
        "**CNPJ:** 12.345.678/0001-90",
        f"| Item {i % 9} | Quantity | Price |",
        "| --- | --- | --- |",
        f"| Support hours | {i % 40 + 1} | R$ 100,00 |",
    ]
    if filler:
        lines.append(filler)
    return "\n".join(lines)


def _relation_md(i: int, filler: str) -> str:
    child = f"DEV-{2020 + i % 6}-{i % 1000:03d}"
    parent = f"MAIN-{2019 + i % 4}-{(i * 7) % 1000:03d}"
    return "\n".join(
        [
            f"# Project Work Order {child}",
            f"**Contract Number:** {child}",
            f"This PWO is a child of master agreement {parent} and governs delivery.",
            f"Parent contract reference: {parent}",
            f"**Client:** {CLIENTS[i % len(CLIENTS)]}",
            f"**Vendor:** {SUPPLIERS[(i + 1) % len(SUPPLIERS)]}",
            filler,
        ]
    )


def _dates_md(i: int, filler: str) -> str:
    d1, m1, y = (i % 28) + 1, (i % 12) + 1, 2020 + i % 6
    return "\n".join(
        [
            f"# Service Agreement Amendment {i}",
            f"Start date: {d1:02d}/{m1:02d}/{y} applies to all annexes of this agreement.",
            f"End date: {y + 1}-{m1:02d}-{d1:02d} unless renewed in writing.",
            f"Another date: 15 de março {y} (assinatura).",
            f"Total value: {(i % 900) + 100}.{i % 10}00,00 EUR for the full term.",
            filler,
        ]
    )


def _cjk_md(i: int, filler: str) -> str:
    title = CJK_TITLES[i % len(CJK_TITLES)]
    return "\n".join(
        [
            f"# {title}",
            f"契約 reference {i} — システム運用サポート quotation.",
            f"Contract Number: QUO-{2020 + i % 6}-{i % 1000:03d}",
            filler,
        ]
    )


def pdf_payload(i: int, filler: str) -> bytes:
    """Deterministic PDFSYN layout document (functions/layout.py format).

    Multi-page with repeated header/footer furniture, a heading, body
    paragraphs (two-column on every 3rd pdf doc), and a cell-aligned table
    — exercising furniture removal, column reading order, line→block
    grouping, heading and table detection.
    """
    import json as _json

    md = _contract_md(i, filler)
    body_lines = [l for l in md.split("\n") if l.strip() and not l.startswith("|")]
    two_col = (i // 6) % 3 == 0
    pages = []
    per_page = 18
    page_count = max(1, (len(body_lines) + per_page - 1) // per_page)
    for p in range(page_count):
        chunk = body_lines[p * per_page : (p + 1) * per_page]
        lines = [
            {"x": 50.0, "y": 20.0, "w": 300.0, "h": 10.0,
             "text": f"CONFIDENTIAL — Agreement {CTYPES[i % len(CTYPES)]}"},
            {"x": 280.0, "y": 772.0, "w": 60.0, "h": 10.0, "text": f"Page {p + 1}"},
        ]
        if two_col and len(chunk) >= 6:
            half = len(chunk) // 2
            cols = [(50.0, chunk[:half]), (330.0, chunk[half:])]
        else:
            cols = [(50.0, chunk)]
        for x0, col_chunk in cols:
            y = 60.0
            for line in col_chunk:
                is_heading = line.startswith("#")
                text = line.lstrip("# ") if is_heading else line
                h = 18.0 if is_heading else 12.0
                gap = 30.0 if is_heading else 14.0
                lines.append({"x": x0, "y": y, "w": 250.0, "h": h, "text": text})
                y += gap
        if p == page_count - 1:  # table on the last page
            ty = 700.0
            for row in (f"Item {i % 9}\tQuantity\tPrice",
                        f"Support hours\t{i % 40 + 1}\tR$ 100,00",
                        f"Licenses\t{i % 7 + 1}\tR$ 250,00"):
                lines.append({"x": 50.0, "y": ty, "w": 400.0, "h": 12.0,
                              "text": row, "cells": [50.0, 200.0, 330.0]})
                ty += 14.0
        pages.append({"width": 612.0, "height": 792.0, "lines": lines})
    from .functions.layout import PDF_MAGIC

    return PDF_MAGIC + _json.dumps({"pages": pages}).encode("utf-8")


def doc_markdown(i: int, filler: str) -> str:
    """The main-content markdown for row i (pure function of i + filler)."""
    kind = KINDS[i % len(KINDS)]
    if kind == "contract":
        md = _contract_md(i, filler)
    elif kind == "relation":
        md = _relation_md(i, filler)
    elif kind == "dates":
        md = _dates_md(i, filler)
    elif kind == "cjk":
        md = _cjk_md(i, filler)
    else:
        md = f"# Notes {i}\n" + (filler or f"Short unstructured note number {i}.")
    if i > 0 and i % 499 == 0:  # giant-doc skew tail (~100x median)
        sections = [md] + [
            f"## Annex {j}\nAnnex {j} body for giant document {i}. " + (filler + " ") * 5
            for j in range(200)
        ]
        md = "\n".join(sections)
    return md


_BOILER_LINKS = "".join(
    f'<a href="/s/{j}">Category {j}</a> ' for j in range(12)
)


def wrap_html(i: int, md: str) -> bytes:
    """Wrap markdown lines in a boilerplate-laden page (nav/sidebar/footer)."""
    site = i % 97
    body_parts: List[str] = []
    for line in md.split("\n"):
        if not line.strip():
            continue
        body_parts.append(f"<p>{_escape(line)}</p>")
    main = "\n".join(body_parts)
    html = (
        f"<html><head><title>doc {i}</title><script>var t={i};</script>"
        f"<style>p{{margin:0}}</style></head><body>"
        f'<nav>{_BOILER_LINKS}</nav><header><h1>Site {site} portal</h1></header>'
        f'<div class="sidebar"><ul>'
        + "".join(f'<li><a href="/p/{j}">Related page {j} long teaser text</a></li>' for j in range(8))
        + f"</ul></div><article>{main}</article>"
        f'<footer><a href="/about">About</a><a href="/privacy">Privacy</a> © site{site}.example</footer>'
        f"</body></html>"
    )
    return html.encode("utf-8")


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def make_page_row(i: int, filler: str, lang: Optional[str] = None) -> Dict:
    """One deterministic page row (FIXTURES.md §1)."""
    kind = KINDS[i % len(KINDS)]
    lang = lang if lang is not None else LANGS[i % len(LANGS)]
    url = f"https://site{i % 97}.example/{kind}/{i}"
    ts = EPOCH + _dt.timedelta(seconds=37 * i)
    md = doc_markdown(i, filler)
    if i % 20 == 13:  # malformed: truncate mid-multibyte / corrupt payload
        raw = pdf_payload(i, filler) if kind == "pdf" else wrap_html(i, md)
        cut = raw[:200] + "é".encode("utf-8")[:1]
        return {"url": url, "warc_ts": ts, "html": cut, "text": None, "lang": lang}
    if kind == "pdf":  # PDF-layout row (geometric parse path)
        return {"url": url, "warc_ts": ts, "html": pdf_payload(i, filler), "text": None, "lang": lang}
    if i % 7 == 3:  # pre-extracted row (arrives already converted)
        return {"url": url, "warc_ts": ts, "html": b"", "text": md, "lang": lang}
    return {"url": url, "warc_ts": ts, "html": wrap_html(i, md), "text": None, "lang": lang}


def pages_batch_from_documents(batch: pa.Table) -> pa.Table:
    """map_batches fn: driver ``documents`` rows → synthetic ``pages`` rows.

    Streaming-friendly: each documents block maps to a pages block; the
    filler text is the document's own text so the page payload scales with
    the sf tier.
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    rows = [
        make_page_row(int(d), t or "", lang=l)
        for d, t, l in zip(doc_ids, texts, langs)
    ]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def build_pages_table(n_rows: int) -> pa.Table:
    """Standalone deterministic pages table (for unit tests, no testdata)."""
    fillers = [f"Generic filler sentence number {i} about data processing." for i in range(n_rows)]
    rows = [make_page_row(i, fillers[i]) for i in range(n_rows)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def read_pages(sf_dir: str):
    """``pages`` Dataset derived from the driver's documents table.

    Column-pruned read (only doc_id/text/lang leave storage) and a
    stateless map_batches synthesis — no materialization.
    """
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    return docs.map_batches(pages_batch_from_documents, batch_format="pyarrow")
