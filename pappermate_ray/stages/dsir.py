"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents that look like a small
target corpus by scoring each doc under a pair of hashed-n-gram bag
models and keeping the highest importance weights. This is the
published data-selection primitive for building pretraining mixtures
(select web text that resembles Wikipedia/books) and it composes with
the rest of the curation chain (quality filter → dedup → DSIR select).

Three Ray-Data-shaped phases, two streaming passes over the raw corpus:

- **count** (``hashed_gram_counts``): one pass per corpus emits
  per-block ``(bucket, n_part)`` partials over hashed unigram+bigram
  features; a ``groupby(bucket).Sum`` shuffles only DISTINCT buckets
  (≤ 16^hex_chars rows per block, int32+int64 — never the grams
  themselves), and the ≤65k-row result collects into a dense count
  vector. The vector is a model property (bucket space), not a corpus
  property, so the driver collect is bounded at any corpus size.
- **weight** (``dsir_weights``): the per-bucket log-ratio vector
  ``ln(ct[b]+1) − ln(cr[b]+1) + (ln(Tr+m) − ln(Tt+m))`` (add-1
  smoothed multinomials; m = bucket-space size) ships via ``ray.put``
  ONCE; the second pass resolves every doc's grams to buckets with
  vectorized md5-on-unique-grams (dictionary-encode first — the
  decontaminate trick) and accumulates per-doc sums with one
  ``np.add.at`` — no per-token Python.
- **select** (``dsir_select``): per-block local top-k prune (k rows
  leave each block) then a tiny global sort+limit — the scatter-gather
  top-k shape, never a full-corpus sort.

Bucket rule pinned for the SQL oracle: bucket = the LAST ``hex_chars``
characters of ``md5(gram)`` (DuckDB: ``substr(md5(g), 33-h, h)``), so
the bucket space is 16^h and both engines hash identical gram strings
(tokens from ``str.split()`` ≡ ``string_split_regex(trim(text),'\\s+')``
on this corpus; bigrams joined with a single space). Weights are
summed per doc and rounded to 3 decimals — coarse enough that
cross-engine double-summation-order noise (~1e-12) cannot flip a
digit (the lm_perplexity precedent).
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _flat_grams(t: pa.Table, text_col: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat gram array over the batch, per-doc unigram lens, per-doc
    bigram lens). Grams are doc-major: all of doc 0's unigrams, then
    doc 1's … then all of doc 0's bigrams, doc 1's …"""
    docs = [(x or "").split() for x in t[text_col].to_pylist()]
    lens = np.array([len(w) for w in docs], dtype=np.int64)
    flat = np.array([tok for w in docs for tok in w], dtype=object)
    if len(flat) == 0:
        return flat, lens, np.maximum(lens - 1, 0)
    # masks are laid out over nonempty docs only (empty docs contribute
    # zero tokens to flat, so their starts would alias the next doc's)
    lens_nz = lens[lens > 0]
    starts = np.concatenate(([0], np.cumsum(lens_nz)[:-1]))
    keep_w1 = np.ones(len(flat), bool)
    keep_w1[starts + lens_nz - 1] = False
    keep_w2 = np.ones(len(flat), bool)
    keep_w2[starts] = False
    w1 = pa.array(flat[keep_w1], pa.string())
    w2 = pa.array(flat[keep_w2], pa.string())
    bigrams = pc.binary_join_element_wise(w1, w2, " ").to_numpy(zero_copy_only=False)
    return np.concatenate([flat, bigrams]), lens, np.maximum(lens - 1, 0)


def _bucket_ids(grams: np.ndarray, hex_chars: int) -> np.ndarray:
    """md5-last-hex-chars bucket per gram; md5 runs once per UNIQUE gram."""
    if len(grams) == 0:
        return np.zeros(0, np.int64)
    nbytes = (hex_chars + 1) // 2
    odd = hex_chars % 2 == 1
    uniq, inv = np.unique(grams, return_inverse=True)

    def h(g: str) -> int:
        v = int.from_bytes(hashlib.md5(g.encode()).digest()[-nbytes:], "big")
        return v & ((1 << (4 * hex_chars)) - 1) if odd else v

    ub = np.fromiter((h(g) for g in uniq), np.int64, len(uniq))
    return ub[inv]


def hashed_gram_counts(
    ds: "rd.Dataset", text_col: str = "text", hex_chars: int = 4
) -> np.ndarray:
    """Dense int64 count vector over the 16^hex_chars bucket space."""
    m = 16 ** hex_chars

    def block_counts(t: pa.Table) -> pa.Table:
        grams, _, _ = _flat_grams(t, text_col)
        counts = np.bincount(_bucket_ids(grams, hex_chars), minlength=m)
        nz = np.flatnonzero(counts)
        return pa.table({
            "bucket": pa.array(nz, pa.int64()),
            "n_part": pa.array(counts[nz], pa.int64()),
        })

    agg = (
        ds.map_batches(block_counts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_part", alias_name="n"))
    )
    out = np.zeros(m, dtype=np.int64)
    for t in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        out[np.asarray(t["bucket"], np.int64)] = np.asarray(t["n"], np.int64)
    return out


def dsir_weights(
    raw: "rd.Dataset",
    target: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 4,
    round_to: int = 3,
) -> "rd.Dataset":
    """Per-doc DSIR log importance weight: ``(id_col, lw)`` for every
    raw doc with ≥1 token (empty/whitespace-only docs are skipped, the
    same rows the oracle's ``trim(text) <> ''`` drops)."""
    m = 16 ** hex_chars
    ct = hashed_gram_counts(target, text_col, hex_chars)
    cr = hashed_gram_counts(raw, text_col, hex_chars)
    const = float(np.log(cr.sum() + float(m)) - np.log(ct.sum() + float(m)))
    delta = np.log(ct + 1.0) - np.log(cr + 1.0) + const
    ref = ray.put(delta)

    def score(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        grams, ulens, blens = _flat_grams(t, text_col)
        vals = d[_bucket_ids(grams, hex_chars)]
        ndocs = len(ulens)
        doc_of = np.concatenate([
            np.repeat(np.arange(ndocs), ulens),
            np.repeat(np.arange(ndocs), blens),
        ])
        lw = np.zeros(ndocs, np.float64)
        np.add.at(lw, doc_of, vals)
        keep = ulens > 0
        return pa.table({
            id_col: t[id_col].filter(pa.array(keep)),
            "lw": pa.array(np.round(lw[keep], round_to), pa.float64()),
        })

    return raw.map_batches(score, batch_format="pyarrow")


def dsir_select(
    raw: "rd.Dataset",
    target: "rd.Dataset",
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 4,
    round_to: int = 3,
    num_partitions: Optional[int] = None,
) -> "rd.Dataset":
    """Top-``k`` raw docs by (rounded lw DESC, id ASC): the resampling
    step, deterministic because ties inside one rounded weight resolve
    by id. Per-block top-k prune first — only k rows leave each block,
    so the global sort touches ≤ k×blocks rows, never the corpus."""
    weights = dsir_weights(raw, target, id_col, text_col, hex_chars, round_to)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = np.lexsort((
            np.asarray(t[id_col], np.int64),
            -np.asarray(t["lw"], np.float64),
        ))[:k]
        return t.take(pa.array(np.sort(idx)))

    pruned = weights.map_batches(local_topk, batch_format="pyarrow")
    return pruned.sort(["lw", id_col], descending=[True, False]).limit(k)


def corpus_drift(
    old: "rd.Dataset",
    new: "rd.Dataset",
    text_col: str = "text",
    hex_chars: int = 4,
    round_to: int = 6,
) -> "rd.Dataset":
    """Distribution drift between two corpora over the hashed-gram
    bucket space: one row ``(kl, tv)`` — KL(new‖old) and total
    variation distance between the add-1-smoothed bucket multinomials.
    The crawl-monitoring stat that flags a snapshot whose content
    shifted (spam flood, template change) before it enters the mix.

    Reuses ``hashed_gram_counts`` — one streaming pass per corpus,
    shuffles carry only (bucket, count) ints, the two m-vectors meet
    on the driver (m = 16^hex_chars, a model property). Rounded so the
    65k-term double sum's cross-engine ordering noise (~1e-13) cannot
    flip a digit.
    """
    m = float(16 ** hex_chars)
    co = hashed_gram_counts(old, text_col, hex_chars).astype(np.float64)
    cn = hashed_gram_counts(new, text_col, hex_chars).astype(np.float64)
    po = (co + 1.0) / (co.sum() + m)
    pn = (cn + 1.0) / (cn.sum() + m)
    kl = float(np.sum(pn * np.log(pn / po)))
    tv = 0.5 * float(np.sum(np.abs(pn - po)))
    return rd.from_items([{
        "kl": round(kl, round_to),
        "tv": round(tv, round_to),
    }])
