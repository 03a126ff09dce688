"""Corpus language-model perplexity scoring — the CCNet-style quality
pass (Wenzek et al. 2020): train a small LM on reference text, score
every candidate document, and filter/bucket by perplexity. Here the LM
is an add-alpha-smoothed bigram model so the whole pass stays
deterministic and SQL-oracle-checkable (no external model artifacts).

Two phases, both Ray-Data-shaped:

- **train** (``train_bigram_lm``): one streaming pass emits per-block
  gram counts (an Arrow table of ``(gram, is_bigram, n_part)``), a
  ``groupby(gram, is_bigram).Sum`` shuffles only DISTINCT grams, a
  distributed ``min_count`` prune bounds the model, and the surviving
  counts collect into flat numpy arrays. The collected model is the
  broadcast artifact — the exact analog of CCNet's trained KenLM file —
  and its size is a model property (vocabulary), not a corpus property:
  at 100 TB you raise ``min_count`` (or train on a bottom-k sample) and
  the artifact stays put-once small while the corpus side streams.
- **score** (``perplexity_score``): the model ships via ``ray.put``
  ONCE; each batch concatenates its docs' tokens and resolves ALL of
  them with two ``np.searchsorted`` passes (token→vocab-id, bigram
  pair-key→count), then per-doc log-prob sums fall out of one
  ``np.add.reduceat`` — no per-token Python in the hot path.

Model math (pinned so the DuckDB oracle can reproduce it exactly):
``P(w2|w1) = (c(w1 w2) + a) / (c(w1) + a*V)`` with ``V`` = training
vocabulary size; ``ppl(doc) = exp(-sum(ln P) / n_bigrams)`` over the
doc's consecutive-token bigrams, rounded to 2 decimals (coarse enough
that cross-engine 1e-12 double-sum noise cannot flip a digit). Docs
with fewer than 2 tokens have no bigrams and are not emitted.
"""

from __future__ import annotations

from collections import Counter
from typing import NamedTuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum


class BigramLM(NamedTuple):
    vocab: np.ndarray      # sorted unigram strings
    uni_n: np.ndarray      # counts aligned with vocab (int64)
    big_keys: np.ndarray   # sorted pair keys id1*(V+1)+id2 (int64)
    big_n: np.ndarray      # counts aligned with big_keys (int64)
    alpha: float


def train_bigram_lm(
    ds: "rd.Dataset",
    text_col: str = "text",
    alpha: float = 0.5,
    min_count: int = 1,
) -> BigramLM:
    """Count unigrams+bigrams distributed, prune, and assemble the model."""

    def block_counts(t: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        big: Counter = Counter()
        for x in t[text_col].to_pylist():
            w = (x or "").split()
            uni.update(w)
            big.update(zip(w, w[1:]))
        grams = list(uni.keys()) + [f"{a} {b}" for a, b in big.keys()]
        kinds = [False] * len(uni) + [True] * len(big)
        ns = list(uni.values()) + list(big.values())
        return pa.table({
            "gram": pa.array(grams, pa.string()),
            "is_bigram": pa.array(kinds, pa.bool_()),
            "n_part": pa.array(ns, pa.int64()),
        })

    counts = (
        ds.map_batches(block_counts, batch_format="pyarrow")
        .groupby(["gram", "is_bigram"])
        .aggregate(Sum("n_part", alias_name="n"))
    )
    if min_count > 1:
        counts = counts.filter(expr=f"n >= {min_count}")

    unis: list = []
    bigs: list = []
    for t in counts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for gram, isb, n in zip(
            t["gram"].to_pylist(), t["is_bigram"].to_pylist(), t["n"].to_pylist()
        ):
            (bigs if isb else unis).append((gram, n))

    unis.sort()
    vocab = np.array([g for g, _ in unis], dtype=object)
    uni_n = np.array([n for _, n in unis], dtype=np.int64)
    v = len(vocab)

    def tok_id(tok: str) -> int:
        i = int(np.searchsorted(vocab, tok))
        return i if i < v and vocab[i] == tok else v  # v = OOV sentinel

    pairs = []
    for gram, n in bigs:
        w1, w2 = gram.split(" ", 1)
        pairs.append((tok_id(w1) * (v + 1) + tok_id(w2), n))
    pairs.sort()
    big_keys = np.array([k for k, _ in pairs], dtype=np.int64)
    big_n = np.array([n for _, n in pairs], dtype=np.int64)
    return BigramLM(vocab, uni_n, big_keys, big_n, alpha)


def perplexity_score(
    ds: "rd.Dataset",
    model: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple = (),
) -> "rd.Dataset":
    """Per-doc bigram perplexity under the broadcast model.

    Emits ``(id_col, *carry_cols, n_bigrams, ppl)`` for every doc with
    ≥1 bigram (``carry_cols`` pass through row-aligned — the lang
    column for per-language bucketing rides along instead of paying a
    doc_id join afterwards).
    """
    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        m: BigramLM = ray.get(ref)
        v = len(m.vocab)
        docs = [(i, did, (x or "").split()) for i, (did, x) in enumerate(
                zip(t[id_col].to_pylist(), t[text_col].to_pylist()))]
        docs = [(i, did, w) for i, did, w in docs if len(w) >= 2]
        rows = pa.array([i for i, _, _ in docs], pa.int64())
        docs = [(did, w) for _, did, w in docs]
        carried = {c: t[c].take(rows) for c in carry_cols}
        if not docs:
            return pa.table({
                id_col: pa.array([], t[id_col].type),
                **{c: pa.array([], t[c].type) for c in carry_cols},
                "n_bigrams": pa.array([], pa.int64()),
                "ppl": pa.array([], pa.float64()),
            })
        flat = np.array([tok for _, w in docs for tok in w], dtype=object)
        lens = np.array([len(w) for _, w in docs], dtype=np.int64)
        # token -> vocab id (v = OOV) in one searchsorted over the batch
        ids = np.searchsorted(m.vocab, flat)
        ids_c = np.minimum(ids, v - 1) if v else np.zeros(len(flat), np.int64)
        ids = np.where((ids < v) & (m.vocab[ids_c] == flat), ids, v).astype(np.int64)
        # consecutive pairs within each doc: drop each doc's last token as
        # w1 and first token as w2
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        keep_w1 = np.ones(len(flat), bool)
        keep_w1[starts + lens - 1] = False
        keep_w2 = np.ones(len(flat), bool)
        keep_w2[starts] = False
        id1, id2 = ids[keep_w1], ids[keep_w2]
        c1 = np.where(id1 < v, m.uni_n[np.minimum(id1, v - 1)], 0) if v else np.zeros(len(id1))
        keys = id1 * (v + 1) + id2
        if len(m.big_keys):
            pos = np.minimum(np.searchsorted(m.big_keys, keys), len(m.big_keys) - 1)
            c12 = np.where(m.big_keys[pos] == keys, m.big_n[pos], 0)
        else:
            c12 = np.zeros(len(keys), np.int64)
        logp = np.log(c12 + m.alpha) - np.log(c1 + m.alpha * v)
        nb = lens - 1
        bstarts = np.concatenate(([0], np.cumsum(nb)[:-1]))
        sums = np.add.reduceat(logp, bstarts)
        ppl = np.round(np.exp(-sums / nb), 2)
        return pa.table({
            id_col: pa.array([did for did, _ in docs], t[id_col].type),
            **carried,
            "n_bigrams": pa.array(nb, pa.int64()),
            "ppl": pa.array(ppl, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def ccnet_buckets(
    ds: "rd.Dataset",
    model: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> "rd.Dataset":
    """CCNet's deployment step (Wenzek et al. 2020 §4.3): bucket every
    document into head / middle / tail by its perplexity's position
    within its OWN language's distribution (lower ppl = cleaner =
    head). Emits ``(id_col, lang, ppl, bucket)``.

    Thresholds are per-language discrete quantiles (p25/p75 — exactly
    representable q values, same pinned rule as ops/quantiles.py) over
    the scored corpus; the threshold table is O(#languages) rows, so
    collecting and re-broadcasting it is bounded like BPE's per-round
    driver pick. The scored lineage streams twice (threshold pass +
    assignment pass) rather than materializing a corpus-length
    intermediate.
    """
    from ..ops.quantiles import grouped_quantiles

    scored = perplexity_score(ds, model, id_col, text_col,
                              carry_cols=(lang_col,))
    thr = grouped_quantiles(scored, lang_col, "ppl", [0.25, 0.75])
    tmap = {r[lang_col]: (r["p25"], r["p75"]) for r in thr.take_all()}
    ref = ray.put(tmap)

    def assign(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        langs = np.array(t[lang_col].to_pylist(), dtype=object)
        ppl = np.asarray(t["ppl"], np.float64)
        bucket = np.empty(len(langs), dtype=object)
        for lg in np.unique(langs):
            p25, p75 = m[lg]
            rows = langs == lg
            bucket[rows] = np.where(
                ppl[rows] <= p25, "head",
                np.where(ppl[rows] <= p75, "middle", "tail"))
        return pa.table({
            id_col: t[id_col],
            lang_col: t[lang_col],
            "ppl": t["ppl"],
            "bucket": pa.array(bucket, pa.string()),
        })

    return scored.map_batches(assign, batch_format="pyarrow")
