"""Structured-table harvest from crawl HTML — the HTML-side analog of
the PDF path's cell model (``functions/layout.table_cells``, which
mirrors the reference's Marker TableProcessor cells,
``services/table_processor_fixed.py:181-203``): pages(url, html) →
one row per cell with (table_id, row_id, col_id, is_header, cell).

Like ``stages/links.py``, deliberately separate from the golden-frozen
extractor (``functions/htmlx.py`` flattens table text into the
byte-identical extraction; THIS pass preserves the grid structure for
downstream structured-data consumers).

Contract (pinned by tests + the planted oracle):

- ``table_id`` is the 0-based order of ``<table>`` on the page,
  ``row_id`` the ``<tr>`` order within it, ``col_id`` the column slot;
- ``colspan`` advances the next cell's slot (a spanned cell occupies
  its starting slot); ``rowspan`` is NOT tracked (documented stand-in,
  same as the PDF path's rowspan=1);
- ``is_header`` ⇔ the cell is a ``<th>``;
- cell text is tag-stripped, entity-unescaped (lt/gt/amp), whitespace-
  collapsed and trimmed; empty cells are kept (grid-faithful);
- nested tables are out of scope: the scan is non-recursive, an inner
  table's cells surface as (tag-stripped) text of the outer cell.

Scale shape: stateless streaming ``map_batches``, zero exchanges; one
compiled-regex pass per page (regex state builds once per worker
process at import). Per-row soft-fail on undecodable bytes — the
SafeProcessor rule every extraction stage follows.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data as rd

from ..functions.markup import strip_tags_collapse as _clean

_TABLE_RE = re.compile(r"<table[^>]*>(.*?)</table\s*>",
                       re.IGNORECASE | re.DOTALL)
_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr\s*>", re.IGNORECASE | re.DOTALL)
_CELL_RE = re.compile(r"<(t[hd])\b([^>]*)>(.*?)</t[hd]\s*>",
                      re.IGNORECASE | re.DOTALL)
_COLSPAN_RE = re.compile(r"colspan\s*=\s*[\"']?(\d+)", re.IGNORECASE)
def html_tables(
    ds: "rd.Dataset",
    url_col: str = "url",
    html_col: str = "html",
) -> "rd.Dataset":
    """(url, table_id, row_id, col_id, is_header, cell) — one row per
    ``<th>``/``<td>`` across every first-level ``<table>`` on the page."""

    def batch(t: pa.Table) -> pa.Table:
        urls, tids, rids, cids, hdrs, cells = [], [], [], [], [], []
        for src, raw in zip(t[url_col].to_pylist(), t[html_col].to_pylist()):
            if not raw:
                continue
            try:
                html = raw.decode("utf-8") if isinstance(raw, bytes) else str(raw)
            except UnicodeDecodeError:
                html = raw.decode("utf-8", errors="ignore")
            for tid, tmatch in enumerate(_TABLE_RE.finditer(html)):
                for rid, rmatch in enumerate(_TR_RE.finditer(tmatch.group(1))):
                    col = 0
                    for cmatch in _CELL_RE.finditer(rmatch.group(1)):
                        span = _COLSPAN_RE.search(cmatch.group(2))
                        urls.append(src)
                        tids.append(tid)
                        rids.append(rid)
                        cids.append(col)
                        hdrs.append(cmatch.group(1).lower() == "th")
                        cells.append(_clean(cmatch.group(3)))
                        col += max(int(span.group(1)), 1) if span else 1
        return pa.table({
            url_col: pa.array(urls, pa.string()),
            "table_id": pa.array(tids, pa.int64()),
            "row_id": pa.array(rids, pa.int64()),
            "col_id": pa.array(cids, pa.int64()),
            "is_header": pa.array(hdrs, pa.bool_()),
            "cell": pa.array(cells, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
