"""Winnowing fingerprints — the MOSS local document fingerprinting
algorithm (Schleimer, Wilkerson & Aiken 2003): hash every token
k-gram, slide a window of w consecutive gram hashes over the doc, and
keep each window's minimum. The guarantee: any shared run of at least
w+k−1 tokens between two documents contributes at least one COMMON
fingerprint, while the fingerprint density stays ~2/(w+1) — the
robust sparse signature layer between exact substring dedup
(stages/webclean.py, every window) and MinHash (stages/dedup.py,
whole-doc).

Ties inside a window break by LEFTMOST position (the original paper
uses rightmost; any position rule that depends only on window CONTENT
preserves the guarantee, because a fully-shared window selects the
same relative gram in both documents). The selection key is the
packed string ``hash_8hex || zero-padded-position`` so "min of the
pair (hash, pos)" is one lexicographic string min — the same trick
that makes the DuckDB oracle a plain window-function MIN.

Shuffle-free streaming map: fingerprints emit per batch; downstream
dedup/pair-mining groups on the fp key (16 bytes) exactly like
paragraph_dedup's md5 keys. Docs shorter than k tokens emit nothing;
docs with 1 ≤ n_grams < w emit the single whole-doc window's minimum
(so every doc with a full k-gram has ≥1 fingerprint).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _gram_hashes(w_tokens: list, k: int) -> np.ndarray:
    """8-hex md5 prefix per k-gram of the token list (object array)."""
    n = len(w_tokens) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=object)
    out = np.empty(n, dtype=object)
    for j in range(n):
        g = " ".join(w_tokens[j:j + k])
        out[j] = hashlib.md5(g.encode()).hexdigest()[:8]
    return out


def winnow_fingerprints(
    ds: "rd.Dataset",
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """``(id_col, pos, fp)`` — the selected k-gram positions and their
    8-hex fingerprints, one row per distinct selection per doc."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")

    def batch(t: pa.Table) -> pa.Table:
        out_id, out_pos, out_fp = [], [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = (x or "").split()
            h = _gram_hashes(toks, k)
            n = len(h)
            if n == 0:
                continue
            pk = np.array([f"{h[j]}{j:08d}" for j in range(n)], dtype=object)
            # trailing-window min at each end position >= first full
            # (or whole-doc) window
            acc = pk.copy()
            for s in range(1, min(w, n)):
                acc[s:] = np.minimum(acc[s:], pk[:-s])
            start = min(w, n) - 1
            sel = np.unique(acc[start:])
            for v in sel:
                out_id.append(did)
                out_pos.append(int(v[8:]))
                out_fp.append(v[:8])
        return pa.table({
            id_col: pa.array(out_id, t[id_col].type),
            "pos": pa.array(np.array(out_pos, np.int64), pa.int64()),
            "fp": pa.array(out_fp, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")


def winnow_clone_pairs(
    ds: "rd.Dataset",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_fp_docs: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Clone detection over winnowing fingerprints — the MOSS report:
    ``(id_a, id_b, n_shared)`` for document pairs sharing at least
    ``min_shared`` distinct fingerprints.

    Distributed shape — TWO exchanges total (the LSH pair machinery
    from stages/dedup.py with the classic combiner push-down on top):
    fingerprint rows hash-partition by fp (all rows of one fp land in
    one partition group, so the per-(fp, doc) dedup, the occupancy
    prune, the ``max_fp_docs`` cap AND the triu cross-product all run
    inside the partition fn), which emits LOCALLY-COMBINED packed
    (pair, partial-count) rows; a final narrow groupby-sum on the
    packed pair key finishes the count. Doc ids must be < 2^31 (pairs
    pack into one int64). ``max_fp_docs`` drops fingerprints shared by
    more than that many docs — boilerplate/template fingerprints whose
    pair cross-products explode and which carry no clone signal
    (MOSS's common-fingerprint prune); the oracle applies the same
    BETWEEN bound.
    """
    from ray.data.aggregate import Sum

    from ..ops.joins import default_num_partitions

    fps = winnow_fingerprints(ds, k, w, id_col, text_col)
    # partitions track cores: the work unit is fingerprint groups
    # (many per doc), not docs
    npart = default_num_partitions()

    def to_pkey(t: pa.Table) -> pa.Table:
        v = np.fromiter((int(f, 16) for f in t["fp"].to_pylist()),
                        np.int64, t.num_rows)
        return pa.table({
            "fp": pa.array(v, pa.int64()),
            id_col: t[id_col],
            "_pkey": pa.array(v % npart, pa.int64()),
        })

    def pair_partials(t: pa.Table) -> pa.Table:
        # whole fp groups co-locate here: dedup (fp, doc), find runs,
        # cap, cross-product, and pre-combine pair counts locally
        fp = np.asarray(t["fp"], np.int64)
        doc = np.asarray(t[id_col], np.int64)
        uniq = np.unique(fp * (np.int64(1) << np.int64(31)) + doc)
        f = uniq >> np.int64(31)
        d = uniq & ((np.int64(1) << np.int64(31)) - np.int64(1))
        change = np.ones(len(uniq), bool)
        change[1:] = f[1:] != f[:-1]
        starts = np.flatnonzero(change)
        lens = np.append(starts[1:], len(uniq)) - starts
        sel = (lens >= 2) & (lens <= max_fp_docs)
        keys = []
        for s, ln in zip(starts[sel], lens[sel]):
            i, j = np.triu_indices(int(ln), 1)
            # docs are ascending within the run (packed sort)
            keys.append(d[s + i] * (np.int64(1) << np.int64(31)) + d[s + j])
        if keys:
            pk, cnt = np.unique(np.concatenate(keys), return_counts=True)
        else:
            pk = np.zeros(0, np.int64)
            cnt = np.zeros(0, np.int64)
        return pa.table({
            "pair": pa.array(pk, pa.int64()),
            "n_part": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    shared = (
        fps.map_batches(to_pkey, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(pair_partials, batch_format="pyarrow")
        .groupby("pair", num_partitions=min(npart, 8))
        .aggregate(Sum("n_part", alias_name="n_shared"))
    )
    if min_shared > 1:
        shared = shared.filter(expr=f"n_shared >= {min_shared}")

    def unpack(t: pa.Table) -> pa.Table:
        p = np.asarray(t["pair"], np.int64)
        return pa.table({
            "id_a": pa.array(p >> np.int64(31), pa.int64()),
            "id_b": pa.array(p & ((np.int64(1) << np.int64(31)) - np.int64(1)),
                             pa.int64()),
            "n_shared": t["n_shared"],
        })

    return shared.map_batches(unpack, batch_format="pyarrow")
