"""Geometric layout parsing for PDF-like documents (Marker semantics).

The reference's primary reader is the vendored Marker fork: pages →
blocks → polygons → text lines, with reading order from ``page.structure``
and table cells carrying row/col ids (services/table_processor_fixed.py:
80-110, 181-203; SURVEY.md §1.1). The torch models are out of scope by
design; this module reimplements the *geometry* deterministically:

- **header/footer detection**: lines whose digit-normalized text repeats
  at a similar y-band on ≥ 60% of pages are furniture and dropped (the
  Marker analog of ignoring page furniture during conversion);
- **column detection**: line x-starts are clustered; a bimodal split at
  > 35% page width yields two columns, read left column top-down then
  right column (reading-order resolution);
- **line → block grouping**: consecutive lines in reading order merge
  while the vertical gap is < 1.8 × median line height;
- **heading detection**: line height > 1.25 × median line height;
- **table detection**: runs of ≥ 2 consecutive lines sharing ≥ 2 aligned
  cell x-positions become one table block; cells join with ``" | "``
  and rows with newline (cell text cleaned by the M34/M35 finalizers).

Input format ``PDFSYN`` (deterministic stand-in for parsed PDF content,
since real PDFs/torch are unavailable): payload bytes =
``b"%PDF-SYN" + json`` with::

    {"pages": [{"width": W, "height": H,
                "lines": [{"x":..,"y":..,"w":..,"h":..,
                           "text": "...", "cells": [x0, x1, ...]?}]}]}

``cells`` (optional) are the cell x-positions for table rows.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional, Tuple

from .textnorm import finalize_line

PDF_MAGIC = b"%PDF-SYN"

_DIGITS = re.compile(r"\d+")


def is_pdf_payload(data: Optional[bytes]) -> bool:
    """PDFSYN or real PDF bytes (both route through this module)."""
    if not data:
        return False
    return (data[: len(PDF_MAGIC)] == PDF_MAGIC
            or data[:5] == b"%PDF-")


def _median(vals: List[float]) -> float:
    if not vals:
        return 0.0
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def detect_furniture(pages: List[Dict[str, Any]]) -> set:
    """(page_idx, line_idx) pairs that are repeated headers/footers."""
    if len(pages) < 2:
        return set()
    # key = (digit-normalized text, y rounded to a 24pt band)
    seen: Dict[Tuple[str, int], List[Tuple[int, int]]] = {}
    for pi, page in enumerate(pages):
        for li, line in enumerate(page.get("lines", [])):
            key = (_DIGITS.sub("#", line["text"]).strip(), int(line["y"] // 24))
            seen.setdefault(key, []).append((pi, li))
    furniture = set()
    page_count = len(pages)
    for key, locs in seen.items():
        pages_hit = {pi for pi, _ in locs}
        if len(pages_hit) >= max(2, int(0.6 * page_count)):
            furniture.update(locs)
    return furniture


def detect_columns(lines: List[Dict[str, Any]], page_width: float) -> List[List[int]]:
    """Split line indices into reading-order column groups (1 or 2)."""
    if not lines:
        return []
    xs = sorted(line["x"] for line in lines)
    # largest gap between consecutive distinct x-starts
    best_gap, split_at = 0.0, None
    for a, b in zip(xs, xs[1:]):
        if b - a > best_gap:
            best_gap, split_at = b - a, (a + b) / 2.0
    if split_at is None or best_gap < 0.35 * page_width:
        return [list(range(len(lines)))]
    left = [i for i, l in enumerate(lines) if l["x"] < split_at]
    right = [i for i, l in enumerate(lines) if l["x"] >= split_at]
    # require both sides substantial, else treat as single column
    if len(left) < 2 or len(right) < 2:
        return [list(range(len(lines)))]
    return [left, right]


def table_cells(table_lines: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Structured cell model for a run of table lines.

    The reference's Marker TableProcessor emits cells carrying
    rowspan/colspan/row_id/col_id/is_header
    (services/table_processor_fixed.py:181-203, from the Surya table-rec
    model). Deterministic geometric analog: column slots are the distinct
    aligned cell x-positions across the run; ``col_id`` is a cell's slot,
    ``colspan`` the slots it covers until the row's next cell (rows
    missing trailing columns span to the table edge); ``rowspan`` is 1
    (PDFSYN has no merged-cell geometry — documented stand-in for the
    model's output); the first row is the header row.
    """
    col_xs = sorted({x for l in table_lines for x in l.get("cells", [])})
    out: List[Dict[str, Any]] = []
    for row_id, l in enumerate(table_lines):
        texts = [finalize_line(c) for c in l["text"].split("\t")]
        xs = list(l.get("cells", []))
        for i, text in enumerate(texts):
            if not text:
                continue
            col_id = col_xs.index(xs[i]) if i < len(xs) and xs[i] in col_xs else i
            if i + 1 < len(xs) and xs[i + 1] in col_xs:
                colspan = max(1, col_xs.index(xs[i + 1]) - col_id)
            else:
                colspan = max(1, len(col_xs) - col_id)
            out.append({
                "text": text,
                "row_id": row_id,
                "col_id": col_id,
                "rowspan": 1,
                "colspan": colspan,
                "is_header": row_id == 0,
            })
    return out


def parse_pdf_layout(payload: bytes) -> Tuple[List[Dict[str, Any]], str]:
    """PDF payload → (ordered blocks [{type,text,page,order}], error).

    PDFSYN payloads decode their JSON page model; REAL PDF bytes go
    through the text-object reader (`functions/pdfreal.py`) to the
    same page model — one shared geometry pipeline after that.
    Soft-fails: returns ([], message) on malformed payloads.
    """
    if payload[: len(PDF_MAGIC)] != PDF_MAGIC and payload[:5] == b"%PDF-":
        from .pdfreal import parse_real_pdf_pages

        pages, err = parse_real_pdf_pages(payload)
        if err:
            return [], err
        return _blocks_from_pages(pages)
    try:
        doc = json.loads(payload[len(PDF_MAGIC):].decode("utf-8"))
        pages = doc["pages"]
    except Exception as e:
        return [], f"pdf parse error: {type(e).__name__}"
    return _blocks_from_pages(pages)


def _blocks_from_pages(
    pages: List[Dict[str, Any]],
) -> Tuple[List[Dict[str, Any]], str]:
    """Shared geometry pipeline: page model → ordered blocks."""
    furniture = detect_furniture(pages)
    blocks: List[Dict[str, Any]] = []
    order = 0
    for pi, page in enumerate(pages):
        lines = [
            l for li, l in enumerate(page.get("lines", []))
            if (pi, li) not in furniture and l.get("text", "").strip()
        ]
        if not lines:
            continue
        heights = [l["h"] for l in lines]
        med_h = _median(heights) or 1.0
        for col in detect_columns(lines, page.get("width", 612.0)):
            col_lines = sorted((lines[i] for i in col), key=lambda l: (l["y"], l["x"]))
            i = 0
            current: List[Dict[str, Any]] = []
            current_kind = None

            def flush():
                nonlocal order, current, current_kind
                if not current:
                    return
                cell_structs = None
                if current_kind == "table":
                    rows = []
                    for l in current:
                        cells = [finalize_line(c) for c in l["text"].split("\t")]
                        cells = [c for c in cells if c]
                        rows.append(" | ".join(cells))
                    text = "\n".join(r for r in rows if r)
                    cell_structs = table_cells(current)
                else:
                    text = " ".join(finalize_line(l["text"]) for l in current).strip()
                if text:
                    blocks.append(
                        {"type": current_kind or "paragraph", "text": text,
                         "page": current[0]["_page"], "order": order,
                         "cells": cell_structs}
                    )
                    order += 1
                current, current_kind = [], None

            prev_y = None
            for l in col_lines:
                l = dict(l, _page=pi)
                is_table = bool(l.get("cells")) and len(l.get("cells", [])) >= 2
                is_heading = l["h"] > 1.25 * med_h
                kind = "table" if is_table else ("heading" if is_heading else "paragraph")
                gap_break = prev_y is not None and (l["y"] - prev_y) > 1.8 * med_h
                if current and (kind != current_kind or gap_break or current_kind == "heading"):
                    flush()
                current.append(l)
                current_kind = kind
                prev_y = l["y"] + l["h"]
            flush()
    # single-line "tables" are degenerate → demote to paragraph
    for b in blocks:
        if b["type"] == "table" and "\n" not in b["text"] and " | " not in b["text"]:
            b["type"] = "paragraph"
            b["cells"] = None
    return blocks, ""


def extract_pdf_text(payload: bytes) -> Tuple[str, List[Dict[str, Any]], str, str]:
    """PDFSYN payload → (text, blocks, status, error) — extract_main_text shape."""
    blocks, err = parse_pdf_layout(payload)
    if err:
        return "", [], "error", err
    if not blocks:
        return "", [], "error", "no layout content"
    text = "\n".join(b["text"] for b in blocks)
    return text, blocks, "converted", ""
