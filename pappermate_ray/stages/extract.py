"""Main-content extraction stage + size-bucket skew handling.

``extract_pages_batch`` is the engine's S3 analog (the reference's Marker
conversion, services/pdf_converter.py:222-257) re-expressed as a stateless
``map_batches`` transform over zero-copy Arrow batches: HTML boilerplate
strip via text-/link-density heuristics (functions/htmlx.py), emitting the
ordered nested ``blocks`` column (the Marker JSON block model consumed at
services/contract_parser.py:196-239) and per-row status/error columns.

Skew handling (SURVEY.md §4): ``add_size_bucket`` tags each row with a log2
size bucket of the html payload; ``bucket_repartition`` groups giant docs
together so they don't ride along in blocks with thousands of small docs
(one 100 MB row must not determine a whole block's memory footprint).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.htmlx import extract_main_text

# Marker block model + structured table cells (table_processor_fixed.py:
# 181-203: rowspan/colspan/row_id/col_id/is_header per cell); non-table
# blocks carry a null cells list
CELLS_TYPE = pa.list_(
    pa.struct(
        [("text", pa.string()), ("row_id", pa.int32()), ("col_id", pa.int32()),
         ("rowspan", pa.int32()), ("colspan", pa.int32()), ("is_header", pa.bool_())]
    )
)
BLOCKS_TYPE = pa.list_(
    pa.struct(
        [("type", pa.string()), ("text", pa.large_string()),
         ("page", pa.int32()), ("order", pa.int32()), ("cells", CELLS_TYPE)]
    )
)


MAX_DOC_BYTES = 32 * 1024 * 1024  # cap per-row work: one giant doc must not OOM a worker


def extract_pages_batch(batch: pa.Table, max_doc_bytes: int = MAX_DOC_BYTES) -> pa.Table:
    """pages(url, warc_ts, html, text, lang) → docs(+text, blocks, status, error).

    Pure function of the batch; html/pre-text routing mirrors the
    reference's converted-input branch (models/document.py:13-18).
    Payloads over ``max_doc_bytes`` are truncated before parsing (the
    reference's text-truncation caps, SURVEY.md §2.2 M36 / §4 skew) and
    tagged ``truncated`` in the error column while still converting —
    the lenient scanner tolerates a mid-tag cut.
    """
    htmls = batch["html"].to_pylist()
    pre_texts = batch["text"].to_pylist()
    texts: List[str] = []
    blocks_col: List[List[dict]] = []
    statuses: List[str] = []
    errors: List[str] = []
    for html, pre in zip(htmls, pre_texts):
        truncated = False
        if html is not None and len(html) > max_doc_bytes:
            html = html[:max_doc_bytes]
            truncated = True
        text, blocks, status, error = extract_main_text(html, pre)
        if truncated and status == "converted":
            error = "truncated: payload exceeded max_doc_bytes"
        texts.append(text)
        blocks_col.append(blocks)
        statuses.append(status)
        errors.append(error)
    n_chars = pa.array([len(t) for t in texts], type=pa.int64())
    out = pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "text": pa.array(texts, type=pa.large_string()),
            "blocks": pa.array(blocks_col, type=BLOCKS_TYPE),
            "n_chars": n_chars,
            "status": pa.array(statuses, type=pa.string()),
            "error": pa.array(errors, type=pa.string()),
        }
    )
    return out


def add_size_bucket(batch: pa.Table, column: str = "html") -> pa.Table:
    """Append ``size_bucket`` = floor(log2(payload bytes + 1)), vectorized."""
    sizes = pc.binary_length(batch[column]) if batch.schema.field(column).type in (
        pa.binary(), pa.large_binary()
    ) else pc.utf8_length(batch[column])
    arr = sizes.to_numpy(zero_copy_only=False).astype(np.float64)
    bucket = np.floor(np.log2(arr + 1.0)).astype(np.int8)
    return batch.append_column("size_bucket", pa.array(bucket, type=pa.int8()))


def split_oversized(batch: pa.Table, column: str, max_bytes: int) -> pa.Table:
    """Filter helper: keep rows whose payload ≤ max_bytes (route the rest
    to a dedicated big-doc path). Reference analog: text truncation caps
    (scripts/system_contract_organizer.py:140)."""
    sizes = pc.binary_length(batch[column])
    return batch.filter(pc.less_equal(sizes, pa.scalar(max_bytes)))
