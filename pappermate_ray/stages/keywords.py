"""Per-document TF-IDF keyword extraction — the classic summarization /
indexing signal (Salton & Buckley 1988; Spärck Jones 1972 idf) a corpus
pipeline emits next to BM25 postings (stages/search.py) and hashed BoW
embeddings.

Two Ray-Data phases, one narrow exchange:

- **document frequencies**: each block pre-aggregates its docs'
  DISTINCT terms to ``(term, n_part)`` partials, a ``groupby(term).Sum``
  shuffles only distinct terms, and the surviving table collects into
  sorted numpy arrays (the lm.py broadcast-model shape). The artifact
  is vocabulary-sized, not corpus-sized; at 100 TB ``min_df`` prunes
  the hapax tail distributed-side before the collect, exactly like
  train_bigram_lm's ``min_count`` (pruned terms keep idf = ln(N/1) —
  a rank-only approximation documented on the parameter).
- **score + select**: the (vocab, df) arrays ship via ``ray.put``
  ONCE; each batch resolves (doc, term, tf) runs with one lexsort over
  the batch's tokens, looks up df by searchsorted, and keeps each
  doc's top-k by ``tf · ln(N/df)`` with ascending-term tiebreak.

Determinism note: the score is ONE multiplication of two doubles that
both engines derive identically (integer tf; ln of the same quotient),
so cross-engine ordering is bit-stable without any pre-rank rounding —
unlike summed log-scores (lm_perplexity), which need a rounding grid.
True ties (equal tf and df) resolve by term.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum


class DfModel(NamedTuple):
    vocab: np.ndarray   # sorted term strings
    df: np.ndarray      # document frequencies aligned with vocab
    n_docs: int         # docs with >=1 token


def _doc_term_runs(t: pa.Table, id_col: str, text_col: str):
    """(doc ids run-aligned, term per run, tf per run): one lexsort over
    the batch's tokens, no per-doc Python. Ids stay an object array so
    any id type (int, string) round-trips — emit with ``t[id_col].type``
    like the sibling stages (winnow, chunking, phrase_search)."""
    docs = [(did, (x or "").split())
            for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist())]
    docs = [(did, w) for did, w in docs if w]
    if not docs:
        return np.array([], object), np.array([], object), np.array([], np.int64)
    flat = np.array([tok for _, w in docs for tok in w], dtype=object)
    lens = np.array([len(w) for _, w in docs], dtype=np.int64)
    doc_of = np.repeat(np.arange(len(docs)), lens)
    # dictionary-encode terms so the sort is over ints
    uniq, inv = np.unique(flat, return_inverse=True)
    order = np.lexsort((inv, doc_of))
    d, g = doc_of[order], inv[order]
    change = np.ones(len(d), bool)
    change[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
    starts = np.flatnonzero(change)
    tf = np.diff(np.append(starts, len(d)))
    ids = np.empty(len(docs), dtype=object)
    ids[:] = [did for did, _ in docs]
    return ids[d[starts]], uniq[g[starts]], tf.astype(np.int64)


def df_dataset(
    ds: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> "rd.Dataset":
    """Distributed ``(term, df)`` document-frequency table — block
    partials pre-combine, ONE distinct-term groupby-sum is the only
    exchange, ``min_df`` prunes the hapax tail distributed-side. Stays a
    Dataset: the broadcast collect (``train_df``) and the join fallback
    (``tfidf_topk`` beyond ``broadcast_limit``) both consume it."""

    def block_df(t: pa.Table) -> pa.Table:
        _, terms, _ = _doc_term_runs(t, id_col, text_col)
        uniq, counts = np.unique(terms, return_counts=True)
        return pa.table({
            "term": pa.array(uniq, pa.string()),
            "n_part": pa.array(counts.astype(np.int64), pa.int64()),
        })

    agg = (
        ds.map_batches(block_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n_part", alias_name="df"))
    )
    if min_df > 1:
        agg = agg.filter(expr=f"df >= {min_df}")
    return agg


def count_nonempty_docs(
    ds: "rd.Dataset", text_col: str = "text"
) -> int:
    """N for the idf quotient: docs with ≥1 token. One streaming pass;
    the per-block scalar partials reduce through the bounded-partials
    contract (``ops/vecreduce``), so driver transit stays O(1) even at
    ~10⁶ blocks (round-4 verdict #1's rule applied to the stats side)."""
    from ..ops.vecreduce import dense_vector_sum

    def make_vec(t: pa.Table) -> np.ndarray:
        n = sum(1 for x in t[text_col].to_pylist() if (x or "").split())
        return np.array([n], dtype=np.float64)

    return int(dense_vector_sum(ds, make_vec, 1, np.float64)[0])


def train_df(
    ds: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DfModel:
    """Collected document-frequency model (sorted vocab + aligned df) —
    the BROADCAST artifact. Use only when the surviving vocabulary is
    known to fit the driver; ``tfidf_topk`` auto-falls-back to the join
    path beyond ``broadcast_limit``."""
    agg = df_dataset(ds, id_col, text_col, min_df)
    return _collect_df(agg, count_nonempty_docs(ds, text_col))


def _collect_df(dft: "rd.Dataset", n_docs: int) -> DfModel:
    terms: list = []
    dfs: list = []
    for t in dft.iter_batches(batch_size=65536, batch_format="pyarrow"):
        terms.extend(t["term"].to_pylist())
        dfs.extend(t["df"].to_pylist())
    order = np.argsort(np.array(terms, dtype=object))
    vocab = np.array(terms, dtype=object)[order]
    df = np.array(dfs, dtype=np.int64)[order]
    return DfModel(vocab, df, n_docs)


def _tfidf_topk_join(
    ds: "rd.Dataset",
    dft: "rd.Dataset",
    k: int,
    id_col: str,
    text_col: str,
) -> "rd.Dataset":
    """Join fallback for vocabularies too big to broadcast: the df model
    stays distributed. Per-doc ``(id, term, tf)`` runs (a corpus-bounded
    explode — distinct terms per doc, never the raw token stream) join
    ``(term, df)`` left-outer on term (min_df-pruned tail → df = 1, the
    same rank proxy the broadcast path applies to unknown terms); the
    score is the SAME single multiplication of two identically-derived
    doubles, so ranking agrees bit-stably with the broadcast path; a
    combiner-pushdown grouped top-k finishes, rounding after the cut."""
    from ..ops.joins import hash_join
    from ..ops.sample import grouped_topk

    n_docs = count_nonempty_docs(ds, text_col)
    sch = ds.schema()
    sch = getattr(sch, "base_schema", sch)
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def explode(t: pa.Table) -> pa.Table:
        dids, terms, tf = _doc_term_runs(t, id_col, text_col)
        return pa.table({
            id_col: pa.array(list(dids), t[id_col].type),
            "term": pa.array(list(terms), pa.string()),
            "tf": pa.array(tf, pa.int64()),
        })

    joined = hash_join(
        ds.map_batches(explode, batch_format="pyarrow"), dft, on="term",
        join_type="left_outer",
        left_schema=pa.schema([(id_col, id_type), ("term", pa.string()),
                               ("tf", pa.int64())]),
        right_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dfv = np.asarray(pc.fill_null(t["df"], 1), np.float64)
        tf = np.asarray(t["tf"], np.float64)
        s = tf * np.log(np.float64(n_docs) / dfv)
        return pa.table({
            id_col: t[id_col],
            "term": t["term"],
            "tf": t["tf"],
            "s": pa.array(s, pa.float64()),
        })

    top = grouped_topk(
        joined.map_batches(score, batch_format="pyarrow"),
        id_col, "s", "term", k=k)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "term": t["term"],
            "tf": t["tf"],
            "score": pa.array(
                np.round(np.asarray(t["s"], np.float64), 6), pa.float64()),
        })

    return top.map_batches(finish, batch_format="pyarrow")


def tfidf_topk(
    ds: "rd.Dataset",
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    model: DfModel | None = None,
    broadcast_limit: int = 2_000_000,
) -> "rd.Dataset":
    """Top-``k`` keywords per doc: ``(id_col, term, tf, score)`` with
    ``score = tf · ln(n_docs / df)`` rounded to 6 decimals AFTER
    ranking (the raw product ranks bit-stably; see module notes).

    Hybrid DF-model handling (the ``bpe_token_counts`` rule, round-4
    verdict #2): a vocabulary surviving ``min_df`` with ≤
    ``broadcast_limit`` distinct terms collects to sorted arrays and
    ships ONCE via ``ray.put`` (no further exchange). On web-scale
    corpora the distinct-term set runs to billions (junk tokens defeat
    Heaps' law), so beyond the bound the model NEVER reaches the
    driver: per-doc ``(id, term, tf)`` runs left-outer-join the
    distributed ``(term, df)`` table and a partition-grouped per-doc
    top-k finishes — both paths rank the same raw double and are
    asserted identical in tests at a forced-low bound."""
    if model is None:
        dft = df_dataset(ds, id_col, text_col, min_df).materialize()
        if dft.count() > broadcast_limit:
            return _tfidf_topk_join(ds, dft, k, id_col, text_col)
        m = _collect_df(dft, count_nonempty_docs(ds, text_col))
    else:
        m = model
    ref = ray.put(m)

    def score(t: pa.Table) -> pa.Table:
        mm: DfModel = ray.get(ref)
        v = len(mm.vocab)
        dids, terms, tf = _doc_term_runs(t, id_col, text_col)
        if len(dids) == 0:
            return pa.table({
                id_col: pa.array([], t[id_col].type),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        pos = np.searchsorted(mm.vocab, terms)
        pos_c = np.minimum(pos, max(v - 1, 0))
        known = (pos < v) & (mm.vocab[pos_c] == terms) if v else np.zeros(len(terms), bool)
        dfv = np.where(known, mm.df[pos_c], 1)  # pruned tail: df=1 rank proxy
        s = tf * np.log(np.float64(mm.n_docs) / dfv)
        out_d, out_t, out_tf, out_s = [], [], [], []
        change = np.ones(len(dids), bool)
        change[1:] = dids[1:] != dids[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(dids))
        for a, b in zip(starts, ends):
            # terms are ascending within the run; stable argsort keeps
            # that order among equal scores = the term tiebreak
            top = np.argsort(-s[a:b], kind="stable")[:k]
            out_d.extend([dids[a]] * len(top))
            out_t.extend(terms[a + top])
            out_tf.append(tf[a + top])
            out_s.append(np.round(s[a + top], 6))
        return pa.table({
            id_col: pa.array(out_d, t[id_col].type),
            "term": pa.array(out_t, pa.string()),
            "tf": pa.array(np.concatenate(out_tf), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def collocations_pmi(
    ds: "rd.Dataset",
    k: int = 30,
    text_col: str = "text",
    min_count: int = 3,
    round_to: int = 6,
) -> "rd.Dataset":
    """Top-``k`` collocations by pointwise mutual information (Church &
    Hanks 1990) — the corpus-analysis pass that surfaces multiword
    expressions ("Hong Kong", boilerplate phrases) for tokenizer /
    template diagnostics.

    Counting is the distributed bigram-LM pass (stages/lm.py: distinct
    grams in the shuffle, ``min_count`` prunes the hapax tail
    DISTRIBUTED-side so the collected model is vocabulary-sized — a
    bigram surviving ``min_count`` guarantees both its unigrams do too,
    so the pruned model still holds exact c1/c2 for every surviving
    pair). T1/T2 (total unigram/bigram tokens — totals over the FULL
    corpus, not the pruned vocab) come from a separate per-block
    counting pass whose partials sum driver-side: O(blocks) rows, no
    exchange. The PMI expression is written as the SAME left-associated
    chain of ln's both engines evaluate identically (no product
    overflow past 2^53, no summation-order noise), rounded AFTER
    ranking would be redundant — ties resolve by (w1, w2).

    ``pmi = ln(c12) − ln(T2) − ln(c1) + ln(T1) − ln(c2) + ln(T1)``
    with T1/T2 = total unigram/bigram tokens.
    """
    from .lm import train_bigram_lm

    def tok_totals(t: pa.Table) -> pa.Table:
        n1 = n2 = 0
        for x in t[text_col].to_pylist():
            w = (x or "").split()
            n1 += len(w)
            n2 += max(0, len(w) - 1)
        return pa.table({"t1": pa.array([n1], pa.int64()),
                         "t2": pa.array([n2], pa.int64())})

    totals = ds.map_batches(tok_totals, batch_format="pyarrow").take_all()
    t1 = float(sum(r["t1"] for r in totals))
    t2 = float(sum(r["t2"] for r in totals))

    m = train_bigram_lm(ds, text_col=text_col, min_count=min_count)
    v = len(m.vocab)
    keep = m.big_n >= min_count
    keys, c12 = m.big_keys[keep], m.big_n[keep].astype(np.float64)
    id1, id2 = keys // (v + 1), keys % (v + 1)
    ok = (id1 < v) & (id2 < v)  # OOV sentinel never appears here, but guard
    id1, id2, c12 = id1[ok], id2[ok], c12[ok]
    c1 = m.uni_n[id1].astype(np.float64)
    c2 = m.uni_n[id2].astype(np.float64)
    lt1, lt2 = np.log(t1), np.log(t2)
    pmi = np.log(c12) - lt2 - np.log(c1) + lt1 - np.log(c2) + lt1
    pmi = np.round(pmi, round_to)
    w1 = m.vocab[id1]
    w2 = m.vocab[id2]
    # vocab is sorted, so word ids ARE lexicographic ranks — lexsort
    # over ints gives the (pmi DESC, w1, w2) order
    order = np.lexsort((id2, id1, -pmi))[:k]
    return rd.from_items([
        {"w1": str(w1[i]), "w2": str(w2[i]), "n": int(c12[i]),
         "pmi": float(pmi[i])}
        for i in order
    ])


def distinctive_terms(
    ds: "rd.Dataset",
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 5,
    alpha: float = 0.01,
    round_to: int = 6,
    broadcast_limit: int = 2_000_000,
) -> "rd.Dataset":
    """Top-``k`` DISTINCTIVE terms per group by Dirichlet-smoothed
    log-odds ratio (Monroe, Colaresi & Quinn 2008, "Fightin' Words") —
    what a slice over-uses RELATIVE to the rest of the corpus, the
    diagnostic that separates "frequent" from "characteristic"
    (grouped_top_words vs this).

        delta(g, w) = ln((c_gw + α) / (T_g + αV − c_gw − α))
                    − ln((c_rw + α) / (T_r + αV − c_rw − α))

    with c_rw / T_r the rest-of-corpus counts and V the vocabulary
    size. Distributed shape: per-block (group, word) Counter partials
    pre-combine, ONE distinct-pair groupby-sum is the only big
    exchange; group totals are O(#groups) (always driver-safe). Word
    totals follow the hybrid DF-model rule (round-4 verdict #2):
    vocabulary ≤ ``broadcast_limit`` collects to sorted arrays and
    ships via ``ray.put``; beyond the bound the ``(word, cw)`` table
    stays distributed and joins back onto the pair counts — both paths
    evaluate the IDENTICAL fixed left-associated ln chain (rounded
    before ranking, ties by word) and are asserted equal in tests at a
    forced-low bound.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..ops.sample import grouped_topk

    def partials(t: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for g, x in zip(t[group_col].to_pylist(), t[text_col].to_pylist()):
            for tok in (x or "").split():
                cnt[(g, tok)] += 1
        return pa.table({
            group_col: pa.array([kk[0] for kk in cnt], pa.string()),
            "word": pa.array([kk[1] for kk in cnt], pa.string()),
            "n_part": pa.array(list(cnt.values()), pa.int64()),
        })

    counts = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([group_col, "word"])
        .aggregate(Sum("n_part", alias_name="n"))
        .materialize()  # consumed below (totals + scoring)
    )
    # bound decision on the metadata-cheap distinct-pair count (≥ the
    # distinct-word count): under the bound, ONE driver pass builds both
    # total maps — no extra exchange, the round-4 fast path unchanged
    broadcast = counts.count() <= broadcast_limit

    if broadcast:
        from collections import Counter as _Counter

        gt: dict = {}
        wt: _Counter = _Counter()
        for t in counts.iter_batches(batch_size=65536,
                                     batch_format="pyarrow"):
            for g, w_, n in zip(t[group_col].to_pylist(),
                                t["word"].to_pylist(), t["n"].to_pylist()):
                gt[g] = gt.get(g, 0) + n
                wt[w_] += n
        vocab = np.array(sorted(wt), dtype=object)
        wtot = np.array([wt[w_] for w_ in vocab], dtype=np.int64)
        tt = int(wtot.sum())
        v = len(vocab)
    else:
        gt = {r[group_col]: int(r["tg"]) for r in
              counts.groupby(group_col)
                    .aggregate(Sum("n", alias_name="tg")).take_all()}
        tt = int(sum(gt.values()))
        wtab = (counts.groupby("word")
                .aggregate(Sum("n", alias_name="cw")).materialize())
        v = wtab.count()
    av = alpha * v

    def delta_chain(n, tg, cw):
        cr = cw - n
        tr = float(tt) - tg
        # fixed left-associated chain — identical in the SQL oracle
        return (np.log(n + alpha) - np.log(tg + av - n - alpha)
                - np.log(cr + alpha) + np.log(tr + av - cr - alpha))

    if broadcast:
        ref = ray.put((gt, vocab, wtot))

        def score(t: pa.Table) -> pa.Table:
            g_tot, vc, wv = ray.get(ref)
            gs = t[group_col].to_pylist()
            ws = np.array(t["word"].to_pylist(), dtype=object)
            n = np.asarray(t["n"], np.float64)
            tg = np.array([g_tot[g] for g in gs], dtype=np.float64)
            cw = wv[np.searchsorted(vc, ws)].astype(np.float64)
            delta = delta_chain(n, tg, cw)
            return pa.table({
                group_col: t[group_col],
                "word": t["word"],
                "n": t["n"],
                "delta": pa.array(np.round(delta, round_to), pa.float64()),
            })

        scored = counts.map_batches(score, batch_format="pyarrow")
    else:
        # join fallback: word totals never reach the driver
        from ..ops.joins import hash_join

        gref = ray.put(gt)
        joined = hash_join(
            counts, wtab, on="word",
            left_schema=pa.schema([(group_col, pa.string()),
                                   ("word", pa.string()),
                                   ("n", pa.int64())]),
            right_schema=pa.schema([("word", pa.string()),
                                    ("cw", pa.int64())]),
        )

        def score_joined(t: pa.Table) -> pa.Table:
            g_tot = ray.get(gref)
            gs = t[group_col].to_pylist()
            n = np.asarray(t["n"], np.float64)
            tg = np.array([g_tot[g] for g in gs], dtype=np.float64)
            cw = np.asarray(t["cw"], np.float64)
            delta = delta_chain(n, tg, cw)
            return pa.table({
                group_col: t[group_col],
                "word": t["word"],
                "n": t["n"],
                "delta": pa.array(np.round(delta, round_to), pa.float64()),
            })

        scored = joined.map_batches(score_joined, batch_format="pyarrow")
    return grouped_topk(scored, group_col, "delta", "word", k=k)


def zipf_fit(
    ds: "rd.Dataset",
    text_col: str = "text",
    top_k: int = 1000,
) -> pa.Table:
    """Zipf power-law fit over the corpus frequency spectrum — the
    one-number health check of a text corpus (natural language sits
    near slope −1; template/boilerplate floods flatten the head,
    spam/gibberish fattens the tail; drift between crawls shows up
    before any downstream metric moves).

    ln(count) is least-squares fit on ln(rank) over the TOP ``top_k``
    words, rank ordered (count desc, word asc) — the head is where the
    law holds and the tie-granularity of the tail would make rank
    order engine-dependent. Shape: per-batch partial wordcount combine
    → one narrow (word, count) groupby → bounded sort+limit (top_k
    rows to the driver) → closed-form fit. The corpus text never rides
    an exchange; the only driver materialization is top_k rows.

    Returns a ONE-ROW pyarrow table (n_words_fit, zipf_slope,
    zipf_intercept), slope/intercept rounded to 6 (q:zipf_slope's
    DuckDB oracle reproduces the fit with the same explicit-sums
    formula)."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for text in t[text_col].to_pylist():
            for w in (text or "").split():
                counts[w] = counts.get(w, 0) + 1
        return pa.table({
            "word": pa.array(list(counts.keys()), pa.string()),
            "c": pa.array(list(counts.values()), pa.int64()),
        })

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("word").aggregate(Sum("c", alias_name="cnt")))
    top = counts.sort(["cnt", "word"], descending=[True, False]) \
                .limit(top_k).take_all()
    k = len(top)
    if k < 2:
        raise ValueError("zipf_fit needs at least 2 distinct words")
    r = np.arange(1, k + 1, dtype=np.float64)
    y = np.log(np.array([row["cnt"] for row in top], dtype=np.float64))
    x = np.log(r)
    sx, sy = float(x.sum()), float(y.sum())
    sxy, sxx = float((x * y).sum()), float((x * x).sum())
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy * sxx - sx * sxy) / (k * sxx - sx * sx)
    return pa.table({
        "n_words_fit": pa.array([k], pa.int64()),
        "zipf_slope": pa.array([round(slope, 6)], pa.float64()),
        "zipf_intercept": pa.array([round(intercept, 6)], pa.float64()),
    })
