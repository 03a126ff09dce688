"""Export sinks (SURVEY.md §2.1 S9/S10).

- CSV projection: fixed flat columns, list columns joined with "; "
  (the reference's CSV writer, scripts/openai_contract_explorer.py:411-455).
- JSONL training rows: one ``{text, labels{...}, metadata{...}}`` per line
  (reference :457-496), emitted as a struct column for ``write_json``.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

CSV_COLUMNS = [
    "url", "lang", "status", "contract_number", "contract_type", "contract_name",
    "client_name", "vendor_name", "currency", "total_value", "n_sections",
    "n_table_lines", "emails", "key_clauses", "parse_confidence",
]


def csv_projection(docs: "rd.Dataset") -> "rd.Dataset":
    """Stringify list columns ('; ' join, the reference separator) and
    project the fixed CSV column set."""

    def _proj(t: pa.Table) -> pa.Table:
        cols = {}
        for name in CSV_COLUMNS:
            col = t[name]
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                joined = ["; ".join(v or []) for v in col.to_pylist()]
                cols[name] = pa.array(joined, pa.string())
            else:
                cols[name] = col
        return pa.table(cols)

    return docs.map_batches(_proj, batch_format="pyarrow")


def write_csv(docs: "rd.Dataset", out_dir: str) -> None:
    csv_projection(docs).write_csv(out_dir)


def training_rows(docs: "rd.Dataset") -> "rd.Dataset":
    """One training record per successfully parsed doc: text + label block
    + metadata block (reference JSONL layout :457-496)."""
    import pyarrow.compute as pc

    def _rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["status"], "converted"))
        labels = pa.StructArray.from_arrays(
            [t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
             for c in ("contract_type", "contract_number", "client_name", "vendor_name", "currency")],
            names=["contract_type", "contract_number", "client_name", "vendor_name", "currency"],
        )
        meta = pa.StructArray.from_arrays(
            [t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
             for c in ("url", "lang", "n_chars")],
            names=["url", "lang", "n_chars"],
        )
        return pa.table({"text": t["text"], "labels": labels, "metadata": meta})

    return docs.map_batches(_rows, batch_format="pyarrow")


def write_training_jsonl(docs: "rd.Dataset", out_dir: str) -> None:
    training_rows(docs).write_json(out_dir)


def write_jsonl(ds: "rd.Dataset", out_dir: str) -> None:
    """Generic JSONL sink: one JSON object per row, one file per block
    (Ray's native write_json) — the interchange format every training
    stack reads. Resumability comes from the file-per-block layout plus
    the manifest machinery in io/sink.py when composed there."""
    ds.write_json(out_dir)


def read_jsonl(paths, **kwargs) -> "rd.Dataset":
    """JSONL source: parallelism = file count (same source-block rule as
    parquet — materialize tiny-file corpora before long map chains,
    BASELINE.md). Schema is inferred per file; keep JSONL shards
    homogeneous or pass an explicit schema via kwargs."""
    return rd.read_json(paths, **kwargs)


def read_csv(paths, **kwargs) -> "rd.Dataset":
    """CSV source (pyarrow reader under Ray): embedded newlines, quotes
    and unicode roundtrip with ``Dataset.write_csv`` — integrity-gated
    by q:csv_roundtrip. Parallelism = file count (source-block rule)."""
    return rd.read_csv(paths, **kwargs)


def write_jsonl_gz(
    ds: "rd.Dataset",
    out_dir: str,
    key_col: str,
    num_shards: int = 8,
) -> "rd.Dataset":
    """Gzip-compressed JSONL shards — the Common-Crawl-style wire format
    (crawl dumps ship as .jsonl.gz/.warc.gz). Same determinism/resume
    contract as io/webdataset.py: shard membership is content-keyed
    (md5(key) mod S, stable under repartitioning and retries), rows are
    key-sorted, JSON encoding is canonical (sorted keys, no ASCII
    escaping) and the gzip header mtime is pinned to 0 — so re-runs are
    byte-identical; shards land via atomic rename and existing shards
    are skipped (their manifest row derives from the existing file).
    Returns the (lazy) manifest (shard, path, n_rows, md5); consuming
    it performs the write."""
    import gzip
    import io as _io
    import json

    import pandas as pd

    from .webdataset import content_keyed_shard_sink

    def encode(g: pd.DataFrame) -> bytes:
        buf = _io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as zf:
            for rec in g.to_dict("records"):
                zf.write(json.dumps(rec, sort_keys=True,
                                    ensure_ascii=False,
                                    separators=(",", ":")).encode("utf-8"))
                zf.write(b"\n")
        return buf.getvalue()

    def count_existing(path: str) -> int:
        with gzip.open(path, "rb") as f:
            return sum(1 for _ in f)

    return content_keyed_shard_sink(
        ds, out_dir, key_col, num_shards,
        filename=lambda sid: f"shard-{sid:05d}.jsonl.gz",
        encode=encode, count_existing=count_existing,
        count_name="n_rows")
