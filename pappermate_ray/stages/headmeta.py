"""HTML head-metadata extraction — title / meta description / canonical /
robots directives / document language from crawl pages.

Beyond-reference webtext operator (no PapperMate analog; the reference
extracts body text only — ``services/pdf_converter.py`` /
``contract_parser.py``). Every Common-Crawl-style curation stack keeps
page-level head metadata next to the extracted text: the title and meta
description feed quality/relevance scoring, ``rel=canonical`` feeds the
redirect/duplicate graph (``ops/pointer.py``), and ``<meta name=robots>``
``noindex``/``nofollow`` gate whether a page may enter the corpus or
contribute outlinks (``stages/links.py``).

Scale shape
-----------
One stateless ``map_batches`` pass, zero exchanges. Only the first
``head_bytes`` (default 64 KiB) of each page is scanned — the head
always precedes the body, so cost per page is bounded regardless of
document size (a 200 MB PDF-sized page costs the same as a 10 KB one).
All parsing is compiled-RE2 pyarrow kernels over the sliced head; no
Python-per-row work anywhere (a lossy-decode fallback exists for blocks
containing invalid-UTF-8 pages, rare in practice).

Parsing rules (documented contract, pinned by tests):

- first match wins when a tag repeats (leftmost RE2 match);
- title whitespace is collapsed to single spaces and trimmed;
- attribute values must be quoted (single or double) except for
  ``<html lang=...>`` and bare canonical hrefs; attribute order within
  ``<meta>`` / ``<link>`` may vary (name-first and content-first forms
  both parse); tag and attribute names are case-insensitive;
- HTML entities are NOT unescaped (raw capture — byte-faithful to the
  page, matching the goldens discipline for body text);
- ``robots_noindex`` / ``robots_nofollow`` are False when no robots
  meta exists (crawler default: index, follow).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# All groups named: pyarrow extract_regex requires it. RE2 syntax only
# (no lookaround / backreferences).
_TITLE_RE = r"(?is)<title[^>]*>\s*(?P<v>[^<]*?)\s*</title>"

# <meta name="description" content="..."> in both attribute orders and
# both quote styles; [^>]* keeps the scan inside one tag.
_DESC_RES = (
    r'(?is)<meta[^>]*name\s*=\s*["\']description["\'][^>]*content\s*=\s*"(?P<v>[^"]*)"',
    r"(?is)<meta[^>]*name\s*=\s*['\"]description['\"][^>]*content\s*=\s*'(?P<v>[^']*)'",
    r'(?is)<meta[^>]*content\s*=\s*"(?P<v>[^"]*)"[^>]*name\s*=\s*["\']description["\']',
    r"(?is)<meta[^>]*content\s*=\s*'(?P<v>[^']*)'[^>]*name\s*=\s*['\"]description['\"]",
)

_CANON_RES = (
    r'(?is)<link[^>]*rel\s*=\s*["\']canonical["\'][^>]*href\s*=\s*["\']?(?P<v>[^"\' >]+)',
    r'(?is)<link[^>]*href\s*=\s*["\']?(?P<v>[^"\' >]+)["\']?[^>]*rel\s*=\s*["\']canonical["\']',
)

_ROBOTS_RES = (
    r'(?is)<meta[^>]*name\s*=\s*["\']robots["\'][^>]*content\s*=\s*["\'](?P<v>[^"\']*)',
    r'(?is)<meta[^>]*content\s*=\s*["\'](?P<v>[^"\']*)["\'][^>]*name\s*=\s*["\']robots["\']',
)

_LANG_RE = r'(?is)<html[^>]*?\slang\s*=\s*["\']?(?P<v>[A-Za-z][A-Za-z0-9-]*)'

FIELDS = ("title", "meta_description", "canonical_url",
          "robots_noindex", "robots_nofollow", "html_lang")


def _head_str(html: pa.ChunkedArray | pa.Array, head_bytes: int) -> pa.Array:
    """First ``head_bytes`` of each page as a utf8 array (lossy on the
    rare invalid-UTF-8 page — truncated/corrupt crawl payloads)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    head = pc.binary_slice(html, 0, head_bytes)
    try:
        return pc.cast(head, pa.string())
    except pa.ArrowInvalid:
        return pa.array(
            [None if v is None else v.decode("utf-8", "replace")
             for v in head.to_pylist()],
            pa.string(),
        )


def _first_group(s: pa.Array, patterns) -> pa.Array:
    """Document-order first match across alternative patterns
    (attribute-order / quote-style variants of the same tag class).

    The variants are fused into ONE alternation so RE2's leftmost-match
    rule picks whichever variant occurs FIRST in the page — coalescing
    separate per-variant extracts would instead rank by pattern order,
    returning the wrong duplicate when repeated tags use different
    attribute orders. Each alternative is wrapped in a marker group
    because Arrow's extract_regex yields "" (not null) for groups that
    did not participate in the match — an empty marker distinguishes
    "matched with empty value" from "different alternative matched"."""
    alts = []
    for i, pat in enumerate(patterns):
        body = pat[5:] if pat.startswith("(?is)") else pat
        alts.append(f"(?P<m{i}>" + body.replace("(?P<v>", f"(?P<v{i}>") + ")")
    st = pc.extract_regex(s, pattern="(?is)" + "|".join(alts))
    out = None
    for i in range(len(patterns)):
        g = pc.if_else(pc.not_equal(pc.struct_field(st, f"m{i}"), ""),
                       pc.struct_field(st, f"v{i}"),
                       pa.scalar(None, pa.string()))
        out = g if out is None else pc.coalesce(out, g)
    return out


def head_metadata_batch(
    t: pa.Table,
    html_col: str = "html",
    url_col: str = "url",
    head_bytes: int = 65536,
) -> pa.Table:
    """Pure-Arrow kernel: one row per page with the six head fields."""
    s = _head_str(t[html_col], head_bytes)

    title = pc.struct_field(pc.extract_regex(s, pattern=_TITLE_RE), "v")
    title = pc.replace_substring_regex(title, pattern=r"\s+",
                                       replacement=" ")
    desc = _first_group(s, _DESC_RES)
    canon = _first_group(s, _CANON_RES)
    robots = _first_group(s, _ROBOTS_RES)
    noindex = pc.fill_null(
        pc.match_substring_regex(robots, pattern=r"(?i)noindex"), False)
    nofollow = pc.fill_null(
        pc.match_substring_regex(robots, pattern=r"(?i)nofollow"), False)
    lang = pc.struct_field(pc.extract_regex(s, pattern=_LANG_RE), "v")

    return pa.table({
        url_col: t[url_col],
        "title": title,
        "meta_description": desc,
        "canonical_url": canon,
        "robots_noindex": noindex,
        "robots_nofollow": nofollow,
        "html_lang": lang,
    })


def html_head_metadata(ds, html_col: str = "html", url_col: str = "url",
                       head_bytes: int = 65536):
    """Dataset wrapper: (url, title, meta_description, canonical_url,
    robots_noindex, robots_nofollow, html_lang), one row per input page."""

    def batch(t: pa.Table) -> pa.Table:
        return head_metadata_batch(t, html_col=html_col, url_col=url_col,
                                   head_bytes=head_bytes)

    return ds.map_batches(batch, batch_format="pyarrow")


_TAG_RE = None  # compiled lazily per worker process


def template_fingerprints(
    ds,
    url_col: str = "url",
    html_col: str = "html",
) -> "object":
    """Page-structure template fingerprints: ``(url, host,
    template_id)`` where ``template_id`` = md5 hex of the page's
    lowercase TAG-NAME sequence (opening tags in document order;
    attributes, text and closing tags are ignored). Pages rendered
    from the same site template share an id even when every word and
    attribute differs — the STRUCTURE-level member of the boilerplate
    family (``stages/webclean.host_boilerplate_removal`` removes
    repeated paragraph CONTENT; this finds the repeated skeleton), and
    the grouping key template-aware extraction or per-template sampling
    wants. md5 is the id on purpose: DuckDB computes the identical hex
    string, so the operator is oracle-checkable end to end.

    Scale shape: one stateless streaming pass, zero exchanges; one
    compiled regex + one hash per page (the stages/links.py per-page
    scan discipline); hosts come from the same vectorized RE2
    decompose every url operator shares. Rollups (host × template ×
    n_pages) are one narrow groupby downstream."""
    import hashlib
    import re as _re

    from .urls import _decompose

    global _TAG_RE
    if _TAG_RE is None:
        _TAG_RE = _re.compile(r"<([a-z][a-z0-9]*)")

    def batch(t: pa.Table) -> pa.Table:
        urls = t[url_col]
        _, hosts, _, _, _, _ = _decompose(urls)
        tid = [hashlib.md5(
                   " ".join(_TAG_RE.findall((h or "").lower())).encode()
               ).hexdigest()
               for h in t[html_col].to_pylist()]
        return pa.table({
            "url": pc.cast(urls, pa.string()),
            "host": hosts,
            "template_id": pa.array(tid, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Structured-data extraction (OpenGraph / JSON-LD / microdata) — the
# page-metadata layer Common Crawl publishes as WAT records. No
# PapperMate analog (the reference extracts body text only); every
# web-corpus stack keeps these signals next to the extracted text:
# og:* cards feed title/description quality scoring, JSON-LD @type and
# microdata itemtype drive page-type routing (Article vs Product vs
# Forum) for corpus mixing, and itemprop density is a cheap
# template-vs-content signal.
#
# Scale shape: one stateless map_batches pass, zero exchanges, at most
# ``max_bytes`` scanned per page (structured data is overwhelmingly in
# the head / first template screens; a 200 MB page costs the same as a
# 100 KB one). Arrow RE2 kernels for the first-wins scalar fields and
# the counters; the only per-row Python is the JSON-LD @type findall
# over pages that HAVE ld+json blocks (list-valued output — same
# bounded per-page discipline as template_fingerprints' md5).
#
# Contract (pinned by the q:structured_data oracle, which re-extracts
# the same fields in DuckDB SQL with the identical RE2 patterns):
# - absent string fields are '' (not null) — matches SQL regexp_extract;
# - og_* take the FIRST matching tag (any attribute order, either
#   quote style, case-insensitive);
# - ld_types = sorted distinct bare `"@type": "X"` string values across
#   all ld+json blocks, comma-joined ('' when none); nested/array
#   @type forms are out of scope (documented, not silently wrong:
#   n_ld_blocks still counts the block);
# - n_itemprops counts `itemprop=` attribute occurrences; itemtype is
#   the first `itemtype="..."` value.
# --------------------------------------------------------------------------

_OG_RES = {
    "og_title": (
        r'(?is)<meta[^>]*property\s*=\s*["\']og:title["\'][^>]*content\s*=\s*"(?P<v>[^"]*)"',
        r"(?is)<meta[^>]*property\s*=\s*['\"]og:title['\"][^>]*content\s*=\s*'(?P<v>[^']*)'",
        r'(?is)<meta[^>]*content\s*=\s*"(?P<v>[^"]*)"[^>]*property\s*=\s*["\']og:title["\']',
        r"(?is)<meta[^>]*content\s*=\s*'(?P<v>[^']*)'[^>]*property\s*=\s*['\"]og:title['\"]",
    ),
    "og_type": (
        r'(?is)<meta[^>]*property\s*=\s*["\']og:type["\'][^>]*content\s*=\s*"(?P<v>[^"]*)"',
        r"(?is)<meta[^>]*property\s*=\s*['\"]og:type['\"][^>]*content\s*=\s*'(?P<v>[^']*)'",
        r'(?is)<meta[^>]*content\s*=\s*"(?P<v>[^"]*)"[^>]*property\s*=\s*["\']og:type["\']',
        r"(?is)<meta[^>]*content\s*=\s*'(?P<v>[^']*)'[^>]*property\s*=\s*['\"]og:type['\"]",
    ),
    "og_image": (
        r'(?is)<meta[^>]*property\s*=\s*["\']og:image["\'][^>]*content\s*=\s*"(?P<v>[^"]*)"',
        r"(?is)<meta[^>]*property\s*=\s*['\"]og:image['\"][^>]*content\s*=\s*'(?P<v>[^']*)'",
        r'(?is)<meta[^>]*content\s*=\s*"(?P<v>[^"]*)"[^>]*property\s*=\s*["\']og:image["\']',
        r"(?is)<meta[^>]*content\s*=\s*'(?P<v>[^']*)'[^>]*property\s*=\s*['\"]og:image['\"]",
    ),
}

_LD_BLOCK_PAT = r'(?is)<script[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>'
_LD_TYPE_PAT = r'"@type"\s*:\s*"([A-Za-z][A-Za-z0-9]*)"'
_ITEMPROP_PAT = r"(?i)itemprop\s*="
_ITEMTYPE_PAT = r'(?is)itemtype\s*=\s*["\'](?P<v>[^"\']*)'

_LD_SCAN_RE = None  # compiled lazily per worker (block + @type, one pass)


def structured_data_batch(
    t: pa.Table,
    html_col: str = "html",
    url_col: str = "url",
    max_bytes: int = 1 << 20,
) -> pa.Table:
    """Pure kernel: (url, og_title, og_type, og_image, n_ld_blocks,
    ld_types, n_itemprops, itemtype) — one row per page."""
    import re as _re

    global _LD_SCAN_RE
    if _LD_SCAN_RE is None:
        _LD_SCAN_RE = _re.compile(_LD_TYPE_PAT)

    col = t[html_col]
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pc.utf8_slice_codeunits(col, 0, max_bytes)
    else:
        s = _head_str(col, max_bytes)

    cols = {url_col: t[url_col]}
    for name, pats in _OG_RES.items():
        cols[name] = pc.fill_null(_first_group(s, pats), "")

    n_ld = pc.count_substring_regex(s, pattern=_LD_BLOCK_PAT)
    cols["n_ld_blocks"] = pc.cast(n_ld, pa.int64())

    # @type findall only on pages that have at least one ld+json block
    # (the common web page has zero — the Python loop touches the
    # minority and each scan is bounded by max_bytes).
    has_ld = pc.greater(n_ld, 0).to_pylist()
    ld_types = []
    for flag, page in zip(has_ld, s.to_pylist()):
        if not flag or page is None:
            ld_types.append("")
        else:
            ld_types.append(",".join(sorted(set(_LD_SCAN_RE.findall(page)))))
    cols["ld_types"] = pa.array(ld_types, pa.string())

    cols["n_itemprops"] = pc.cast(
        pc.count_substring_regex(s, pattern=_ITEMPROP_PAT), pa.int64())
    cols["itemtype"] = pc.fill_null(
        pc.struct_field(pc.extract_regex(s, pattern=_ITEMTYPE_PAT), "v"), "")

    return pa.table(cols)


def structured_data(ds, html_col: str = "html", url_col: str = "url",
                    max_bytes: int = 1 << 20):
    """Dataset wrapper for ``structured_data_batch`` (see the family
    docstring above for the contract and scale shape)."""

    def batch(t: pa.Table) -> pa.Table:
        return structured_data_batch(t, html_col=html_col,
                                     url_col=url_col, max_bytes=max_bytes)

    return ds.map_batches(batch, batch_format="pyarrow")
