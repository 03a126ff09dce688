"""Minimal real-PDF text extraction — PDF 1.4 text objects → the line
geometry consumed by `functions/layout.py`.

Closes the PDFSYN representational gap (round-3 verdict #5): the
reference's primary reader wraps a vendored Marker fork
(services/pdf_converter.py:222-257, services/marker_wrapper.py:65-151)
whose directory is empty in the snapshot, so the geometry semantics
were reconstructed over a synthetic payload. This module parses REAL
PDF bytes — the documented subset below — and feeds the SAME
furniture/column/reading-order/table machinery, so real and synthetic
payloads share one layout pipeline.

Supported subset (deterministic, stdlib-only):

- body object scan (``N 0 obj … endobj``) — the page list is the
  file-order sequence of ``/Type /Page`` objects (no xref/page-tree
  walk; incremental-update files that shadow objects are out of scope);
- content streams referenced via ``/Contents N 0 R`` or an array of
  refs; ``/FlateDecode`` streams inflate with ``zlib``; other filters
  soft-fail the document;
- text operators: BT/ET, Tf (size), Td/TD/Tm (positioning), TL, T*,
  Tj, ' and TJ (array show with kerning); literal ``(…)`` strings with
  escapes/octal and hex ``<…>`` strings, decoded latin-1 (CMaps /
  multibyte fonts are out of scope — documented stand-in, like the
  reference's non-OCR path);
- geometry: glyph width is approximated as ``0.5 × font size`` (the
  Helvetica average; no font-metric tables in scope). A TJ kerning
  adjustment ≤ −100/1000 em inserts a space.

Line model handed to layout: runs sharing a y-band (±2 pt) form one
line, sorted by x; a gap > 2 × size between adjacent runs splits the
line into TAB-separated cells with their x-starts recorded — which is
exactly the ``cells`` contract `parse_pdf_layout` uses for table
detection. y converts to top-based (``H − y − h``) to match PDFSYN.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, List, Optional, Tuple

REAL_PDF_MAGIC = b"%PDF-"

_STREAM_RE = re.compile(rb"stream\r?\n")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]")
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_ARR_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

_TOKEN_RE = re.compile(
    rb"%[^\r\n]*"                        # comment
    rb"|\((?:\\.|[^\\()])*\)"            # literal string (1-level; nesting below)
    rb"|<[0-9A-Fa-f\s]*>"                # hex string
    rb"|<<|>>|\[|\]"
    rb"|/[^\s/<>\[\]()]*"                # name
    rb"|[-+]?\d*\.?\d+"                  # number
    rb"|[A-Za-z'\"][A-Za-z0-9'\"*]*"     # operator
)

_ESCAPES = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
            b"(": "(", b")": ")", b"\\": "\\"}


def is_real_pdf(data: Optional[bytes]) -> bool:
    """True for genuine PDF bytes (not the PDFSYN synthetic payload)."""
    from .layout import PDF_MAGIC

    return (bool(data) and data[:len(REAL_PDF_MAGIC)] == REAL_PDF_MAGIC
            and data[:len(PDF_MAGIC)] != PDF_MAGIC)


def _decode_literal(raw: bytes) -> str:
    """PDF literal string body (without outer parens) → text."""
    out: List[str] = []
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\":
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
            elif nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j:j + 1].isdigit():
                    j += 1
                out.append(chr(int(raw[i + 1:j], 8) & 0xFF))
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and raw[i:i + 1] == b"\n":
                    i += 1
            else:  # lone backslash: drop it (PDF spec)
                i += 1
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out)


def _decode_hex(raw: bytes) -> str:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("latin-1")


def _scan_string(data: bytes, start: int) -> Tuple[str, int]:
    """Parse a literal string starting at ``data[start] == b'('`` with
    nested parens; returns (text, index after closing paren)."""
    depth = 0
    i = start
    body_start = start + 1
    while i < len(data):
        c = data[i:i + 1]
        if c == b"\\":
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return _decode_literal(data[body_start:i]), i + 1
        i += 1
    return _decode_literal(data[body_start:]), len(data)


_OBJ_HDR_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")


def _parse_objects(data: bytes) -> Dict[int, bytes]:
    """Scan body objects. Stream payloads are binary and can contain
    the literal bytes ``endobj``/``N 0 obj``, so the scanner jumps over
    stream data via the dict's literal ``/Length`` before looking for
    the object end (a naive regex truncates Flate streams)."""
    objs: Dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_HDR_RE.search(data, pos)
        if not m:
            return objs
        start = m.end()
        em = data.find(b"endobj", start)
        sm = _STREAM_RE.search(data, start)
        if sm and (em == -1 or sm.start() < em):
            lm = _LENGTH_RE.search(data, start, sm.start())
            skip_to = sm.end() + int(lm.group(1)) if lm else sm.end()
            es = data.find(b"endstream", skip_to)
            em = data.find(b"endobj", es if es != -1 else start)
        end = em if em != -1 else len(data)
        objs[int(m.group(1))] = data[start:end]
        pos = end + 6 if em != -1 else len(data)


def _stream_bytes(body: bytes) -> Optional[bytes]:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    dict_part = body[:m.start()]
    lm = _LENGTH_RE.search(dict_part)
    if lm:
        data = body[m.end():m.end() + int(lm.group(1))]
    else:
        end = body.rfind(b"endstream")
        if end < 0:
            return None
        data = body[m.end():end]
        # the EOL before `endstream` is not stream data
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n") or data.endswith(b"\r"):
            data = data[:-1]
    if b"/FlateDecode" in dict_part:
        data = zlib.decompress(data)
    elif b"/Filter" in dict_part:
        raise ValueError("unsupported stream filter")
    return data


def _extract_runs(content: bytes) -> List[Dict[str, Any]]:
    """Content-stream text runs: [{x, y, size, text}] in stream order."""
    runs: List[Dict[str, Any]] = []
    tf_size = 12.0
    tm_scale = 1.0  # |d| of the text matrix; effective size = Tf × |d|
    leading = 0.0
    # text-space origin; BT resets, Td/TD/Tm move, T*/' advance lines
    x = y = 0.0
    line_x = line_y = 0.0
    stack: List[Any] = []
    i = 0
    n = len(content)

    def show(text: str) -> None:
        nonlocal x
        if text:
            size = tf_size * tm_scale
            runs.append({"x": x, "y": y, "size": size, "text": text})
            x += 0.5 * size * len(text)

    while i < n:
        c = content[i:i + 1]
        if c in b" \t\r\n\f\0":
            i += 1
            continue
        if c == b"(":
            s, i = _scan_string(content, i)
            stack.append(s)
            continue
        m = _TOKEN_RE.match(content, i)
        if not m:
            i += 1
            continue
        tok = m.group(0)
        i = m.end()
        if tok.startswith(b"%"):
            continue
        if tok.startswith(b"<") and tok.endswith(b">") and tok != b"<<":
            stack.append(_decode_hex(tok[1:-1]))
        elif tok in (b"<<", b">>"):
            continue
        elif tok == b"[":
            stack.append("[")
        elif tok == b"]":
            arr: List[Any] = []
            while stack and stack[-1] != "[":
                arr.append(stack.pop())
            if stack:
                stack.pop()
            arr.reverse()
            stack.append(arr)
        elif tok.startswith(b"/"):
            stack.append(tok.decode("latin-1"))
        elif re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
            stack.append(float(tok))
        else:  # operator
            op = tok
            try:
                if op == b"BT":
                    x = y = line_x = line_y = 0.0
                    tm_scale = 1.0
                elif op == b"Tf" and len(stack) >= 1:
                    tf_size = float(stack[-1])
                elif op in (b"Td", b"TD") and len(stack) >= 2:
                    tx, ty = float(stack[-2]), float(stack[-1])
                    line_x += tx
                    line_y += ty
                    x, y = line_x, line_y
                    if op == b"TD":
                        leading = -ty
                elif op == b"Tm" and len(stack) >= 6:
                    d, e, f = float(stack[-3]), float(stack[-2]), float(stack[-1])
                    line_x, line_y = e, f
                    x, y = e, f
                    if abs(d) > 1e-9:
                        tm_scale = abs(d)
                elif op == b"TL" and len(stack) >= 1:
                    leading = float(stack[-1])
                elif op == b"T*":
                    line_y -= leading
                    x, y = line_x, line_y
                elif op == b"Tj" and stack and isinstance(stack[-1], str):
                    show(stack[-1])
                elif op == b"'" and stack and isinstance(stack[-1], str):
                    line_y -= leading
                    x, y = line_x, line_y
                    show(stack[-1])
                elif op == b"TJ" and stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        if isinstance(el, str):
                            show(el)
                        elif isinstance(el, float) and el <= -100.0:
                            show(" ")
            finally:
                stack.clear()
    return runs


def _runs_to_lines(runs: List[Dict[str, Any]], page_h: float,
                   page_w: float, y_tol: float = 2.0,
                   col_frac: float = 0.45) -> List[Dict[str, Any]]:
    """Group runs into PDFSYN-shaped lines: same y-band merges, sorted
    by x. A run gap > 2 × size becomes a TAB cell boundary with the
    x-start recorded (the table contract); a gap wider than
    ``col_frac × page width`` instead starts a SEPARATE line — that is
    a column break, which layout's own x-clustering then resolves into
    reading order (tables align tighter than columns separate)."""
    if not runs:
        return []
    bands: List[List[Dict[str, Any]]] = []
    for r in sorted(runs, key=lambda r: (-r["y"], r["x"])):
        if bands and abs(bands[-1][0]["y"] - r["y"]) <= y_tol:
            bands[-1].append(r)
        else:
            bands.append([r])
    lines: List[Dict[str, Any]] = []
    for band in bands:
        band.sort(key=lambda r: r["x"])
        # split the band at column-width gaps first
        segments: List[List[Dict[str, Any]]] = [[band[0]]]
        for prev, r in zip(band, band[1:]):
            prev_end = prev["x"] + 0.5 * prev["size"] * len(prev["text"])
            if r["x"] - prev_end > col_frac * page_w:
                segments.append([r])
            else:
                segments[-1].append(r)
        for seg in segments:
            h = max(r["size"] for r in seg)
            parts: List[str] = []
            cell_xs: List[float] = []
            prev_end = None
            for r in seg:
                w_r = 0.5 * r["size"] * len(r["text"])
                if prev_end is None:
                    parts.append(r["text"])
                    cell_xs.append(r["x"])
                elif r["x"] - prev_end > 2.0 * r["size"]:
                    parts.append("\t")
                    parts.append(r["text"])
                    cell_xs.append(r["x"])
                elif r["x"] - prev_end > 0.25 * r["size"]:
                    parts.append(" " + r["text"])
                else:
                    parts.append(r["text"])
                prev_end = r["x"] + w_r
            line = {
                "x": seg[0]["x"],
                "y": page_h - seg[0]["y"] - h,  # top-based, like PDFSYN
                "w": (prev_end or seg[0]["x"]) - seg[0]["x"],
                "h": h,
                "text": "".join(parts),
            }
            if len(cell_xs) >= 2:
                line["cells"] = cell_xs
            lines.append(line)
    lines.sort(key=lambda l: (l["y"], l["x"]))
    return lines


def parse_real_pdf_pages(payload: bytes) -> Tuple[List[Dict[str, Any]], str]:
    """Real PDF bytes → (PDFSYN-shaped pages, error). Soft-fails."""
    try:
        objs = _parse_objects(payload)
        pages: List[Dict[str, Any]] = []
        for num in sorted(objs):
            body = objs[num]
            # match page dicts only: /Type /Page but not /Pages
            if not re.search(rb"/Type\s*/Page(?![a-zA-Z])", body):
                continue
            mb = _MEDIABOX_RE.search(body)
            if mb:
                x0, y0, x1, y1 = (float(mb.group(k)) for k in range(1, 5))
                width, height = x1 - x0, y1 - y0
            else:
                width, height = 612.0, 792.0
            refs: List[int] = []
            arr = _CONTENTS_ARR_RE.search(body)
            if arr:
                refs = [int(g.group(1)) for g in
                        _ARR_REF_RE.finditer(arr.group(1))]
            else:
                ref = _CONTENTS_REF_RE.search(body)
                if ref:
                    refs = [int(ref.group(1))]
            runs: List[Dict[str, Any]] = []
            for r in refs:
                if r not in objs:
                    continue
                data = _stream_bytes(objs[r])
                if data is not None:
                    runs.extend(_extract_runs(data))
            pages.append({"width": width, "height": height,
                          "lines": _runs_to_lines(runs, height, width)})
        if not pages:
            return [], "pdf parse error: no pages"
        return pages, ""
    except Exception as e:
        return [], f"pdf parse error: {type(e).__name__}"


# ---------------------------------------------------------------------------
# Deterministic builder — fixture/test PDFs (valid enough for any reader)
# ---------------------------------------------------------------------------

def _escape(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(pages: List[Dict[str, Any]], compress: bool = False) -> bytes:
    """Serialize a minimal real PDF from PDFSYN-shaped page specs:
    ``[{"width", "height", "lines": [{"x", "y" (top-based), "h",
    "text", "cells"?: [x, ...]}]}]``. A line with ``cells`` emits one
    text object per TAB-separated cell at its x. Deterministic bytes
    for identical input."""
    objects: List[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    cat = add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages_obj = add(b"")  # placeholder, filled once kids are known
    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    kid_ids: List[int] = []
    for page in pages:
        w = float(page.get("width", 612.0))
        h = float(page.get("height", 792.0))
        ops: List[str] = []
        for line in page.get("lines", []):
            size = float(line.get("h", 12.0))
            y_pdf = h - float(line["y"]) - size
            texts = line["text"].split("\t")
            xs = list(line.get("cells", [])) or [float(line["x"])]
            for i, cell in enumerate(texts):
                x = float(xs[i]) if i < len(xs) else float(xs[-1]) + 100.0 * i
                ops.append(
                    f"BT /F1 {size:g} Tf {x:g} {y_pdf:g} Td "
                    f"({_escape(cell)}) Tj ET")
        content = "\n".join(ops).encode("latin-1")
        if compress:
            z = zlib.compress(content, 9)
            stream = (b"<< /Length " + str(len(z)).encode()
                      + b" /Filter /FlateDecode >>\nstream\n" + z
                      + b"\nendstream")
        else:
            stream = (b"<< /Length " + str(len(content)).encode()
                      + b" >>\nstream\n" + content + b"\nendstream")
        c_id = add(stream)
        kid_ids.append(add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 "
            + f"{w:g} {h:g}".encode() + b"] /Contents "
            + str(c_id).encode() + b" 0 R /Resources << /Font << /F1 "
            + str(font).encode() + b" 0 R >> >> >>"))
    kids = b"[" + b" ".join(str(k).encode() + b" 0 R" for k in kid_ids) + b"]"
    objects[pages_obj - 1] = (b"<< /Type /Pages /Kids " + kids
                              + b" /Count " + str(len(kid_ids)).encode() + b" >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, 1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objects) + 1).encode()
            + b" /Root " + str(cat).encode() + b" 0 R >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)
