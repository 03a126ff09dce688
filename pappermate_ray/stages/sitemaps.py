"""Sitemap parsing — the crawl-frontier discovery surface: XML sitemap
payloads (urlset or sitemapindex, sitemaps.org protocol) → one row per
entry with (sitemap_url, kind, loc, lastmod, changefreq, priority).

Beyond-reference webtext operator: the frontier side of the crawl the
recrawl scheduler (``ops/snapshot.recrawl_priority``) prioritizes and
the robots gate (``stages/urls.robots_filter``) filters. ``kind`` is
``'url'`` for page entries and ``'sitemap'`` for index entries, so a
frontier loop can recurse on index rows without a second parse.

Contract (pinned by tests + the planted oracle):

- ``<url>``/``<sitemap>`` blocks scan non-recursively in document
  order; ``<loc>`` is required (blocks without one drop), the other
  fields are null when absent;
- values are trimmed and entity-unescaped (lt/gt/amp — XML escapes in
  ``<loc>`` query strings);
- ``priority`` parses to float64 (null on absence or non-numeric);
- gzip sitemaps are the CALLER's concern (decompress upstream — the
  repo's jsonl-gz sink shows the idiom); this pass sees XML bytes.

Scale shape: stateless streaming ``map_batches``, zero exchanges,
compiled regexes once per worker process; per-row soft-fail on
undecodable bytes (SafeProcessor rule).
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data as rd

from ..functions.markup import unescape_xml

_BLOCK_RE = re.compile(r"<(url|sitemap)\s*>(.*?)</\1\s*>",
                       re.IGNORECASE | re.DOTALL)
_FIELD_RES = {
    "loc": re.compile(r"<loc\s*>(.*?)</loc\s*>", re.IGNORECASE | re.DOTALL),
    "lastmod": re.compile(r"<lastmod\s*>(.*?)</lastmod\s*>",
                          re.IGNORECASE | re.DOTALL),
    "changefreq": re.compile(r"<changefreq\s*>(.*?)</changefreq\s*>",
                             re.IGNORECASE | re.DOTALL),
    "priority": re.compile(r"<priority\s*>(.*?)</priority\s*>",
                           re.IGNORECASE | re.DOTALL),
}


def _unescape(s: str) -> str:
    # sitemap values are URLs/dates: no &quot; handling by pinned contract
    return unescape_xml(s, quot=False, strip=True)


def parse_sitemaps(
    ds: "rd.Dataset",
    url_col: str = "url",
    xml_col: str = "xml",
) -> "rd.Dataset":
    """(sitemap_url, kind, loc, lastmod, changefreq, priority) — one row
    per <url>/<sitemap> entry carrying a <loc>."""

    def batch(t: pa.Table) -> pa.Table:
        srcs, kinds, locs, mods, freqs, prios = [], [], [], [], [], []
        for src, raw in zip(t[url_col].to_pylist(), t[xml_col].to_pylist()):
            if not raw:
                continue
            try:
                xml = raw.decode("utf-8") if isinstance(raw, bytes) else str(raw)
            except UnicodeDecodeError:
                xml = raw.decode("utf-8", errors="ignore")
            for hit in _BLOCK_RE.finditer(xml):
                body = hit.group(2)
                m = _FIELD_RES["loc"].search(body)
                if not m:
                    continue
                fields = {}
                for k in ("lastmod", "changefreq", "priority"):
                    fm = _FIELD_RES[k].search(body)
                    fields[k] = _unescape(fm.group(1)) if fm else None
                prio = None
                if fields["priority"] is not None:
                    try:
                        prio = float(fields["priority"])
                    except ValueError:
                        prio = None
                srcs.append(src)
                kinds.append(hit.group(1).lower())
                locs.append(_unescape(m.group(1)))
                mods.append(fields["lastmod"])
                freqs.append(fields["changefreq"])
                prios.append(prio)
        return pa.table({
            "sitemap_url": pa.array(srcs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "loc": pa.array(locs, pa.string()),
            "lastmod": pa.array(mods, pa.string()),
            "changefreq": pa.array(freqs, pa.string()),
            "priority": pa.array(prios, pa.float64()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
