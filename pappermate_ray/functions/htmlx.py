"""HTML main-content extraction (boilerplate stripping).

The Ray-native analog of the reference's Marker layout parse for
Common-Crawl-style HTML rows (BASELINE.json north_star: "HTML boilerplate
stripping (text-density + link-density DOM heuristics a la readability)").
The reference converts PDFs via Marker into an ordered block list
(heading/paragraph/table, consumed at services/contract_parser.py:196-239);
this module produces the same block model from HTML:

- parse the DOM with the stdlib ``html.parser`` (no external deps),
- drop non-content subtrees (script/style/nav/header/footer/aside/form...),
- segment text by block-level elements, preserving document order,
- score each segment by link density (chars under <a> / total chars) and
  length; keep headings and sufficiently text-dense segments,
- emit ``(extracted_text, blocks)`` where blocks is the ordered
  ``[{type, text, order}]`` list (types: heading | paragraph | table —
  the Marker JSON block model).

Everything is deterministic and pure; byte-identical goldens are generated
by running exactly these functions serially (FIXTURES.md §2).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from typing import Any, Dict, List, Optional, Tuple

# subtrees that never contribute content
STRIP_TAGS = frozenset(
    "script style noscript template svg iframe nav header footer aside form button select option".split()
)
# elements that delimit text segments
BLOCK_TAGS = frozenset(
    "p div article section main h1 h2 h3 h4 h5 h6 li ul ol td th tr table pre blockquote figcaption br title".split()
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "title"})
TABLE_TAGS = frozenset({"td", "th"})

MAX_LINK_DENSITY = 0.3
MIN_PARAGRAPH_CHARS = 12

_WS = re.compile(r"[ \t\r\f\v]+")


class _Segment:
    __slots__ = ("kind", "pieces", "total_chars", "link_chars")

    def __init__(self, kind: str) -> None:
        self.kind = kind
        self.pieces: List[str] = []
        self.total_chars = 0
        self.link_chars = 0


class _ContentParser(HTMLParser):
    """Collects ordered text segments with link-char accounting.

    Reference implementation (stdlib HTMLParser). The production path is
    ``_scan_segments`` — a ~3x faster tag-name-only scanner kept
    behavior-identical to this class by a differential test
    (tests/test_extract.py::test_scanner_matches_htmlparser)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: List[_Segment] = []
        self._strip_depth = 0
        self._a_depth = 0
        self._block_stack: List[str] = []
        self._current: Optional[_Segment] = None

    def _kind(self) -> str:
        for tag in reversed(self._block_stack):
            if tag in HEADING_TAGS:
                return "heading"
            if tag in TABLE_TAGS:
                return "table"
            break
        return "paragraph"

    def _break_segment(self) -> None:
        self._current = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in STRIP_TAGS:
            self._strip_depth += 1
            return
        if self._strip_depth:
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            if tag != "br":
                self._block_stack.append(tag)
            self._break_segment()

    def handle_endtag(self, tag: str) -> None:
        if tag in STRIP_TAGS:
            if self._strip_depth:
                self._strip_depth -= 1
            return
        if self._strip_depth:
            return
        if tag == "a" and self._a_depth:
            self._a_depth -= 1
        if tag in BLOCK_TAGS and tag != "br":
            for i in range(len(self._block_stack) - 1, -1, -1):
                if self._block_stack[i] == tag:
                    del self._block_stack[i:]
                    break
            self._break_segment()

    def handle_data(self, data: str) -> None:
        if self._strip_depth or not data:
            return
        if self._current is None:
            self._current = _Segment(self._kind())
            self.segments.append(self._current)
        seg = self._current
        seg.pieces.append(data)
        n = len(data.strip())
        seg.total_chars += n
        if self._a_depth:
            seg.link_chars += n


_NL_RUN = re.compile(r" ?\n ?")


def _normalize_segment_text(pieces: List[str]) -> str:
    text = "".join(pieces)
    text = _WS.sub(" ", text)
    # collapse newline runs inside a segment; segments join with "\n" later
    text = _NL_RUN.sub(" ", text)
    return text.strip()


# elements whose content is raw text (no nested tags) per the HTML spec
_RAWTEXT = frozenset({"script", "style", "textarea", "title"})

# Fast-path tag matchers (anchored with .match): a tag whose body holds
# no quote and no '<' — the overwhelming majority on real HTML — parses
# in ONE C regex call (name capture + '>'), skipping the find/slice/
# per-char-name-loop slow path. Quote or '<' in the body falls back to
# the quote-aware rescan below. Charsets mirror the slow path EXACTLY:
# start names end at " \t\n\r\f/" or '>' (NOT \v — HTMLParser's
# tagfind_tolerant keeps \v in the name); end names are
# unicode-alnum/[-.:_] from the first char — _FAST_END covers the ASCII
# subset and the scan loop rejects non-ASCII matches to the slow path.
_FAST_START = re.compile(r"([^ \t\n\r\f/>\"'<]+)[^>\"'<]*>")
_FAST_END = re.compile(r"([-.a-zA-Z0-9:_]*)[^>\"'<]*>")

# Strip-mode fast-forward: while inside a stripped subtree the ONLY
# events that can matter are comments/declarations (their content must
# still be skipped by the normal rules) and strip-tag opens/closes —
# every other tag and all text is ignored. Consume a maximal run of
# "boring" units in ONE C regex call instead of parsing every
# <a>/<li>/text run in a nav/footer. A unit is boring only when skipping
# it cannot change scanner state: a text run, a complete non-candidate
# tag whose quoted attribute values contain no '<'/'>' (a quoted
# '</nav>' must NOT be re-interpreted as markup — the main loop's
# quote-aware rescan owns that case), or a literal '<' before an ASCII
# non-tag char. Everything else (candidate prefixes like '<navigation>',
# tags with angle brackets inside quotes, unicode-alpha '<x' cases)
# stops the run and falls back to the main loop's exact semantics.
# Alternatives are first-character disjoint, so matching is linear.
_STRIP_RUN = re.compile(
    r"""(?:
        [^<]+                                    # text: no-op while stripping
      | <(?![!?]
           |/?(?:script|style|noscript|template|svg|iframe|nav|header
               |footer|aside|form|button|select|option))
        (?=[a-zA-Z/])
        (?:[^>"'<]|"[^"<>]*"|'[^'<>]*')*>        # whole tag, quote-safe
      | <(?![a-zA-Z/!?])(?=[\x00-\x7f])          # literal '<' (ASCII next)
    )*""",
    re.IGNORECASE | re.VERBOSE,
)


def _scan_segments(html_str: str) -> List[_Segment]:
    """Single-pass tag scanner collecting ordered text segments.

    Equivalent to the HTMLParser-based collector but ~3x faster: we only
    need tag NAMES (no attributes, no charref callbacks), so a find-based
    scan with explicit rawtext skipping does the job. Entity unescaping
    applies to text nodes containing '&' (convert_charrefs semantics).

    Matched HTMLParser behaviors (fuzz-verified, tests/test_extract.py):
    literal '<' before non-tag chars, EOF flush of unterminated tags,
    tolerant tag names (weird chars extend the NAME), quoted '>' inside
    attribute values, '<!'/'<?' declarations ending at the first raw '>'.
    Known divergence (≈0.1% of garbage-random docs, 0 on realistic html):
    malformed END tags containing '<' or quotes — CPython's bogus-comment
    recovery differs; this scanner's deterministic output is the engine's
    spec there.
    """
    low = html_str.lower()
    segments: List[_Segment] = []
    strip_depth = 0
    a_depth = 0
    block_stack: List[str] = []
    current: Optional[_Segment] = None

    def kind_of() -> str:
        if block_stack:
            tag = block_stack[-1]
            if tag in HEADING_TAGS:
                return "heading"
            if tag in TABLE_TAGS:
                return "table"
        return "paragraph"

    def emit(text: str) -> None:
        nonlocal current
        if not text or strip_depth:
            return
        if current is None:
            current = _Segment(kind_of())
            segments.append(current)
        if "&" in text:
            text = unescape(text)
        current.pieces.append(text)
        stripped = len(text.strip())
        current.total_chars += stripped
        if a_depth:
            current.link_chars += stripped

    i, n = 0, len(html_str)
    while i < n:
        if strip_depth:
            # fast-forward over text + state-inert tags (emit is a no-op
            # while stripping); stops before anything that needs the main
            # loop's exact parse — see _STRIP_RUN
            i = _STRIP_RUN.match(html_str, i).end()
            if i >= n:
                break
        lt = html_str.find("<", i)
        if lt < 0:
            emit(html_str[i:])
            break
        if lt > i:
            emit(html_str[i:lt])
        # '<' not followed by a tag-ish char is literal text (HTMLParser
        # "invalid markup" semantics)
        nxt = html_str[lt + 1] if lt + 1 < n else ""
        if not (nxt.isalpha() or (nxt and nxt in "/!?")):
            emit("<")
            i = lt + 1
            continue
        if html_str.startswith("<!--", lt):
            end = html_str.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if nxt in "!?":
            # declaration / processing instruction: ends at the FIRST '>'
            # regardless of quotes (HTMLParser bogus-comment semantics);
            # unterminated at EOF → flushed as text on close
            end = html_str.find(">", lt + 2)
            if end < 0:
                emit(html_str[lt:])
                break
            i = end + 1
            continue
        closing = nxt == "/"
        m = (_FAST_END.match(html_str, lt + 2) if closing
             else _FAST_START.match(html_str, lt + 1))
        if m and closing and not m.group(0).isascii():
            # end-tag names extend over UNICODE alnum (str.isalnum below);
            # _FAST_END's charset is ASCII — '</navé>' must keep the full
            # name and stay a no-op, so any non-ASCII body takes the
            # unicode-aware general path
            m = None
        if m:
            name = m.group(1).lower()
            i = m.end()
            self_closing = not closing and html_str[i - 2] == "/"
        else:
            gt = html_str.find(">", lt + 1)
            seg_fast = html_str[lt + 1 : gt] if gt >= 0 else ""
            if gt >= 0 and ('"' in seg_fast or "'" in seg_fast):
                # a '>' may sit inside a quoted attribute value — rescan
                # respecting quotes (HTMLParser semantics); an unquoted '<'
                # does NOT end the tag (it becomes part of the name/attrs)
                j = lt + 1
                quote = None
                gt = -1
                while j < n:
                    ch = html_str[j]
                    if quote:
                        if ch == quote:
                            quote = None
                    elif ch in "\"'":
                        quote = ch
                    elif ch == ">":
                        gt = j
                        break
                    j += 1
            if gt < 0:
                # unterminated tag at EOF: HTMLParser flushes the remainder
                # as data on close()
                emit(html_str[lt:])
                break
            raw = html_str[lt + 1 : gt]
            i = gt + 1
            if not raw:
                continue
            name = raw[1:] if closing else raw
            if closing:
                # endtag name charset (HTMLParser): [a-zA-Z][-.a-zA-Z0-9:_]*
                end_name = 0
                while end_name < len(name) and (
                    name[end_name].isalnum() or name[end_name] in "-.:_"
                ):
                    end_name += 1
                name = name[:end_name].lower()
            else:
                # starttag name (tagfind_tolerant): everything up to
                # whitespace, '/', or end — weird chars stay part of the
                # NAME, so '<P&x>' is a tag named 'p&x', not 'p'
                end_name = 0
                while end_name < len(name) and name[end_name] not in " \t\n\r\f/":
                    end_name += 1
                name = name[:end_name].lower()
            self_closing = not closing and raw.endswith("/")
        if not name:
            continue
        if closing:
            if name in STRIP_TAGS:
                if strip_depth:
                    strip_depth -= 1
                continue
            if strip_depth:
                continue
            if name == "a":
                if a_depth:
                    a_depth -= 1
            if name in BLOCK_TAGS and name != "br":
                for j in range(len(block_stack) - 1, -1, -1):
                    if block_stack[j] == name:
                        del block_stack[j:]
                        break
                current = None
        else:
            if name in STRIP_TAGS:
                if not self_closing:
                    strip_depth += 1
                    if name in _RAWTEXT:
                        # skip raw content up to the real closing tag
                        close = low.find(f"</{name}", i)
                        if close < 0:
                            break
                        gt2 = html_str.find(">", close)
                        i = n if gt2 < 0 else gt2 + 1
                        strip_depth -= 1
                continue
            if strip_depth:
                continue
            if name == "a":
                a_depth += 1
            if name in BLOCK_TAGS:
                if name != "br":
                    block_stack.append(name)
                    if name in _RAWTEXT:
                        close = low.find(f"</{name}", i)
                        if close >= 0:
                            text = html_str[i:close]
                            seg = _Segment(kind_of())
                            segments.append(seg)
                            if "&" in text:
                                text = unescape(text)
                            seg.pieces.append(text)
                            seg.total_chars += len(text.strip())
                            gt2 = html_str.find(">", close)
                            i = n if gt2 < 0 else gt2 + 1
                            block_stack.pop()
                            current = None
                            continue
                current = None
                if self_closing and name != "br":
                    if block_stack and block_stack[-1] == name:
                        block_stack.pop()
    return segments


def extract_blocks(html_str: str) -> List[Dict[str, Any]]:
    """Parse HTML → ordered kept blocks ``[{type, text, page, order}]``.

    HTML has no pages; ``page`` is 0 (the PDF layout path fills real page
    indices, functions/layout.py)."""
    segments = _scan_segments(html_str)
    blocks: List[Dict[str, Any]] = []
    order = 0
    for seg in segments:
        if seg.total_chars == 0:
            continue
        text = _normalize_segment_text(seg.pieces)
        if not text:
            continue
        density = seg.link_chars / seg.total_chars
        if density > MAX_LINK_DENSITY:
            continue
        if seg.kind != "heading" and len(text) < MIN_PARAGRAPH_CHARS:
            continue
        blocks.append({"type": seg.kind, "text": text, "page": 0, "order": order})
        order += 1
    return blocks


def extract_main_text(
    html_bytes: Optional[bytes], pre_text: Optional[str] = None
) -> Tuple[str, List[Dict[str, Any]], str, str]:
    """One page → ``(extracted_text, blocks, status, error)``.

    ``pre_text`` mirrors reference rows that arrive already converted
    (DocumentType markdown/text, models/document.py:13-18): it is passed
    through verbatim and block-segmented by lines.
    Failures (undecodable bytes, empty content) soft-fail with
    status='error' — the SafeProcessor semantics
    (services/safe_table_processor.py:17-30): never raise per row.
    """
    if pre_text is not None and pre_text != "":
        blocks = []
        for i, line in enumerate(pre_text.split("\n")):
            line = line.strip()
            if not line:
                continue
            kind = "heading" if line.startswith("#") else "paragraph"
            if line.startswith("|") and line.endswith("|"):
                kind = "table"
            blocks.append({"type": kind, "text": line, "page": 0, "order": len(blocks)})
        return pre_text, blocks, "converted", ""
    if html_bytes is None or len(html_bytes) == 0:
        return "", [], "error", "empty html"
    from .layout import extract_pdf_text, is_pdf_payload

    if is_pdf_payload(html_bytes):
        return extract_pdf_text(html_bytes)
    try:
        html_str = html_bytes.decode("utf-8", errors="strict")
    except UnicodeDecodeError as e:
        return "", [], "error", f"decode error: {e.reason} at byte {e.start}"
    try:
        blocks = extract_blocks(html_str)
    except Exception as e:  # HTMLParser is lenient; belt-and-braces soft fail
        return "", [], "error", f"parse error: {type(e).__name__}: {e}"
    if not blocks:
        return "", [], "error", "no main content"
    text = "\n".join(b["text"] for b in blocks)
    return text, blocks, "converted", ""
