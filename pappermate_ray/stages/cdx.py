"""CDX-style capture index over a sorted SURT layout.

Web archives and Common Crawl answer "give me every capture of this
page / this site" through a CDX index: one line per capture, keyed by
``SURT-url + ' ' + 14-digit timestamp``, stored globally sorted so a
url or prefix lookup is a binary search and a whole-site scan is one
contiguous range. This module builds that shape Ray-Data-first:

- ``cdx_records``: append ``surt`` (``stages/urls.surt_key_batch``),
  the 14-digit ``ts14`` and the composite ``cdx_key`` — a stateless
  vectorized ``map_batches``, no exchange;
- ``build_cdx_index``: range-sorted Parquet export of the records on
  ``cdx_key`` via ``ops/rangesort.range_sorted_export`` — the ONE
  irreducible all-to-all of the build, manifest + deterministic
  per-range files, resume-by-missing-range;
- ``cdx_prefix_lookup``: manifest-pruned prefix scan — opens ONLY the
  files whose key range intersects ``[prefix, prefix+chr(0x7f))``
  (CDX keys are lowercase printable ASCII, so ``chr(0x7f)`` upper-
  bounds every extension of the prefix), then one vectorized
  ``starts_with`` trim. A site lookup over a 100 TB crawl reads
  |site| / |corpus| of the files, never the corpus.

The reference organizes its corpus as sanitized filenames in
directories (reference/src/pappermate/services/file_organizer.py); the
CDX layout is the web-scale analog of that same "find it again later"
contract. Incremental crawls ride the layout's LSM merge
(``ops/rangesort.merge_sorted_layout``) unchanged — ``cdx_key`` is
just the sort key.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc

from .urls import surt_key_batch


def cdx_records(
    ds,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    key_col: str = "cdx_key",
):
    """Append ``surt``, ``ts14`` (``%Y%m%d%H%M%S``) and ``cdx_key =
    surt + ' ' + ts14``. Rows whose url does not parse get a null key
    (the sorted export drops them — route them to the dead-letter sink
    upstream if they must be kept)."""

    def batch(t: pa.Table) -> pa.Table:
        t = surt_key_batch(t, url_col=url_col, out_col="surt")
        # cast to second resolution first: Arrow %S on a us-timestamp
        # emits fractional seconds, which is not the 14-digit CDX form
        ts14 = pc.strftime(t[ts_col].cast(pa.timestamp("s")),
                           format="%Y%m%d%H%M%S")
        key = pc.binary_join_element_wise(t["surt"], " ", ts14, "")
        return t.append_column("ts14", ts14).append_column(key_col, key)

    return ds.map_batches(batch, batch_format="pyarrow")


def build_cdx_index(
    ds,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    partitions: int = 16,
    sample_mod: Optional[int] = None,
):
    """Build the sorted CDX layout under ``out_dir`` and return the
    manifest Dataset (``range_id, n_rows, key_min, key_max, path``).
    Pass ``sample_mod`` at scale (urls are unbounded-distinct, so the
    exact-quantile edge path would carry every distinct key — the
    TeraSort hash-sample cut streams instead)."""
    from ..ops.rangesort import range_sorted_export

    recs = cdx_records(ds, url_col=url_col, ts_col=ts_col)
    return range_sorted_export(
        recs, "cdx_key", out_dir, partitions=partitions,
        sample_mod=sample_mod)


def cdx_prefix_lookup(manifest: List[dict], prefix: str):
    """Every capture whose ``cdx_key`` starts with ``prefix`` — a url
    lookup (prefix = ``surt + ' '``), a page-over-time scan (prefix =
    surt), or a whole-site scan (prefix = reversed host + ``)`` or any
    shorter comma-cut). Manifest-pruned: only intersecting range files
    open."""
    from ..ops.rangesort import read_sorted_range

    scan = read_sorted_range(manifest, prefix, prefix + "\x7f")

    def trim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pc.starts_with(t["cdx_key"], prefix))

    return scan.map_batches(trim, batch_format="pyarrow")
