"""Shared markup-cleaning helpers for the crawl-side parsers
(stages/links.py, feeds.py, sitemaps.py, htmltables.py).

One implementation of tag stripping / whitespace collapse / XML entity
unescaping — the four modules previously carried diverging private
copies (feeds handled ``&quot;``, sitemaps did not; links skipped the
trim), so an entity fix could land in one parser and silently not the
others. Per-caller differences are now EXPLICIT flags, and each call
site keeps its pinned (oracled/tested) semantics.

Entity order matters: ``&amp;`` must be replaced LAST, else
``&amp;lt;`` double-unescapes to ``<``.
"""

from __future__ import annotations

import re

TAG_RE = re.compile(r"<[^>]*>")
WS_RE = re.compile(r"\s+")


def unescape_xml(s: str, quot: bool = False, strip: bool = True) -> str:
    """Minimal XML entity unescape (&lt; &gt; [&quot;] &amp;)."""
    s = s.replace("&lt;", "<").replace("&gt;", ">")
    if quot:
        s = s.replace("&quot;", '"')
    s = s.replace("&amp;", "&")
    return s.strip() if strip else s


def strip_tags_collapse(s: str) -> str:
    """Inner-HTML → visible text: drop tags, unescape, collapse runs of
    whitespace to single spaces, trim (the table-cell cleaning rule)."""
    return WS_RE.sub(" ", unescape_xml(TAG_RE.sub(" ", s),
                                       strip=False)).strip()
