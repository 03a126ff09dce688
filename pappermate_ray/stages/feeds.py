"""RSS/Atom feed parsing — the push side of crawl discovery: feed XML
payloads → one row per entry with (feed_url, kind, title, link, guid,
pubdate).

Beyond-reference webtext operator, the syndication twin of
``stages/sitemaps.parse_sitemaps`` (same streaming shape, same
loc-required rule applied to the entry link): sitemaps enumerate a
site, feeds announce what changed — a freshness-driven frontier polls
feeds between sitemap sweeps and hands new links to the recrawl
scheduler (``ops/snapshot.recrawl_priority``).

Contract (pinned by tests + the planted oracle):

- RSS 2.0 ``<item>`` blocks and Atom ``<entry>`` blocks scan
  non-recursively in document order; ``kind`` is ``'rss'`` /
  ``'atom'`` per block type (a payload carrying both parses both);
- the entry link is required (rows without one drop): RSS reads
  ``<link>text</link>``, Atom reads the first ``<link ... href="...">``
  attribute; ``title`` / ``guid`` (Atom ``<id>``) / ``pubdate`` (Atom
  ``<updated>``) are null when absent;
- values are trimmed and entity-unescaped (lt/gt/amp/quot);
- tags match case-insensitively; undecodable bytes soft-fail per row
  (SafeProcessor rule).

Scale shape: stateless streaming ``map_batches``, zero exchanges,
regexes compiled once per worker process.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data as rd

from ..functions.markup import unescape_xml

_ITEM_RE = re.compile(r"<(item|entry)[\s>](.*?)</\1\s*>",
                      re.IGNORECASE | re.DOTALL)
_KIND = {"item": "rss", "entry": "atom"}
_TEXT_RES = {
    "title": re.compile(r"<title[^>]*>(.*?)</title\s*>",
                        re.IGNORECASE | re.DOTALL),
    "link": re.compile(r"<link\s*>(.*?)</link\s*>",
                       re.IGNORECASE | re.DOTALL),
    "guid": re.compile(r"<guid[^>]*>(.*?)</guid\s*>",
                       re.IGNORECASE | re.DOTALL),
    "id": re.compile(r"<id\s*>(.*?)</id\s*>", re.IGNORECASE | re.DOTALL),
    "pubdate": re.compile(r"<pubdate\s*>(.*?)</pubdate\s*>",
                          re.IGNORECASE | re.DOTALL),
    "updated": re.compile(r"<updated\s*>(.*?)</updated\s*>",
                          re.IGNORECASE | re.DOTALL),
}
# either XML quote style is legal for href (single-quoted Atom links are
# common in the wild — a double-quote-only pattern silently drops entries)
_HREF_RE = re.compile(r"<link[^>]*?href\s*=\s*(\"([^\"]*)\"|'([^']*)')",
                      re.IGNORECASE | re.DOTALL)


def _unescape(s: str) -> str:
    # feed titles are prose: &quot; unescapes here by pinned contract
    return unescape_xml(s, quot=True, strip=True)


def _field(body: str, name: str):
    m = _TEXT_RES[name].search(body)
    return _unescape(m.group(1)) if m else None


def parse_feeds(
    ds: "rd.Dataset",
    url_col: str = "url",
    xml_col: str = "xml",
) -> "rd.Dataset":
    """(feed_url, kind, title, link, guid, pubdate) — one row per
    RSS ``<item>`` / Atom ``<entry>`` carrying a link."""

    def batch(t: pa.Table) -> pa.Table:
        srcs, kinds, titles, links, guids, dates = [], [], [], [], [], []
        for src, raw in zip(t[url_col].to_pylist(), t[xml_col].to_pylist()):
            if not raw:
                continue
            try:
                xml = raw.decode("utf-8") if isinstance(raw, bytes) else str(raw)
            except UnicodeDecodeError:
                xml = raw.decode("utf-8", errors="ignore")
            for hit in _ITEM_RE.finditer(xml):
                kind = _KIND[hit.group(1).lower()]
                body = hit.group(2)
                if kind == "rss":
                    link = _field(body, "link")
                    guid = _field(body, "guid")
                    date = _field(body, "pubdate")
                else:
                    hm = _HREF_RE.search(body)
                    link = _unescape(hm.group(2) if hm.group(2) is not None
                                     else hm.group(3)) if hm else None
                    guid = _field(body, "id")
                    date = _field(body, "updated")
                if not link:
                    continue
                srcs.append(src)
                kinds.append(kind)
                titles.append(_field(body, "title"))
                links.append(link)
                guids.append(guid)
                dates.append(date)
        return pa.table({
            "feed_url": pa.array(srcs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "title": pa.array(titles, pa.string()),
            "link": pa.array(links, pa.string()),
            "guid": pa.array(guids, pa.string()),
            "pubdate": pa.array(dates, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
