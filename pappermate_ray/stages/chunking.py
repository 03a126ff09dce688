"""Token-window document chunking — the RAG/embedding-ingestion
primitive (split each document into fixed-size token windows with
overlap) that sits opposite sequence packing (ops/prefix.py packs docs
INTO windows; this splits docs into them).

Distinct from the reference's 512-char sentence-boundary chunker
(functions/spans.py chunk_text — golden-frozen extraction behavior):
this one is corpus-prep, token-based, and stride-overlapped.

Embarrassingly parallel flat-map: no shuffle, no state; output rows
carry (id, chunk_id, n_tokens, chunk_text). A doc with T tokens yields
ceil(T/stride) chunks (every start < T; the last window may be short),
so output size is corpus_tokens/stride rows — the caller picks stride
to budget it. Deterministic and SQL-reproducible (window rule =
``range(0, len, stride)`` + ``list_slice``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def chunk_documents(
    ds: "rd.Dataset",
    chunk_tokens: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """``(id_col, chunk_id, n_tokens, chunk_text)`` rows; whitespace
    tokenization, chunk i covers tokens [i·stride, i·stride+chunk).
    ``stride`` ≤ ``chunk_tokens`` gives overlapping windows (RAG
    default); equal gives a partition."""
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")

    def chunk(t: pa.Table) -> pa.Table:
        out_id, out_cid, out_n, out_txt = [], [], [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            w = (x or "").split()
            for start in range(0, len(w), stride):
                piece = w[start:start + chunk_tokens]
                out_id.append(did)
                out_cid.append(start // stride)
                out_n.append(len(piece))
                out_txt.append(" ".join(piece))
        return pa.table({
            id_col: pa.array(out_id, t[id_col].type),
            "chunk_id": pa.array(np.array(out_cid, np.int64), pa.int64()),
            "n_tokens": pa.array(np.array(out_n, np.int64), pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")
