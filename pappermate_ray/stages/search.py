"""Full-text retrieval over the corpus: inverted postings + BM25 top-k.

The lexical sibling of ``stages/similarity.py``'s embedding kNN — the
retrieval op a training-data pipeline uses for "find documents about X"
(targeted curation, eval-set mining, seed expansion). Okapi BM25
(Robertson/Sparck Jones):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Distributed shape (100 TB design point):

- postings carry their own length norm: each row is
  ``(term, doc_id, tf, dl)`` — the standard store-the-norm-in-the-posting
  layout, so scoring never joins back to a per-doc table;
- the query is the broadcast small side: postings are pruned to query
  terms with a vectorized ``pc.is_in`` BEFORE anything shuffles, so the
  ``df`` aggregate and the per-doc score sum exchange only matched rows;
- per-term ``df``/idf collect to the driver bounded by |query terms|
  (a handful of rows by construction), then ship back via closure;
- the final top-k is scatter-gather (per-block local top-k, tiny global
  merge), NOT a full sort of all matching docs.

Scores round to 4 decimals before ranking on BOTH the engine and oracle
sides, so cross-engine 1e-12 float-sum noise cannot reorder the cut.
"""

from __future__ import annotations

from collections import Counter
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum


def build_postings(
    ds: "rd.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "rd.Dataset":
    """Tokenize → one ``(term, doc_id, tf, dl)`` row per distinct term
    per doc. Docs with no tokens emit nothing."""

    def explode(t: pa.Table) -> pa.Table:
        terms, dids, tfs, dls = [], [], [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            w = (x or "").split()
            if not w:
                continue
            for term, n in Counter(w).items():
                terms.append(term)
                dids.append(did)
                tfs.append(n)
                dls.append(len(w))
        return pa.table({
            "term": pa.array(terms, pa.string()),
            id_col: pa.array(dids, t[id_col].type),
            "tf": pa.array(tfs, pa.int64()),
            "dl": pa.array(dls, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")



def _corpus_stats(ds: "rd.Dataset", text_col: str) -> tuple:
    """(n_docs, sum_dl) over docs with >=1 token. The per-block scalar
    partials reduce through the bounded-partials contract
    (``ops/vecreduce`` — round-4 verdict #1 applied to the stats side):
    at ~10^6 blocks the driver sees one 2-float vector, not one row per
    block."""
    from ..ops.vecreduce import dense_vector_sum

    def make_vec(t: pa.Table) -> np.ndarray:
        dls = [len((x or "").split()) for x in t[text_col].to_pylist()]
        dls = [d for d in dls if d]
        return np.array([len(dls), sum(dls)], dtype=np.float64)

    v = dense_vector_sum(ds, make_vec, 2, np.float64)
    return int(v[0]), int(v[1])


def bm25_topk(
    ds: "rd.Dataset",
    query_terms: List[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> "rd.Dataset":
    """Top-k docs for ``query_terms`` with rounded BM25 scores.

    Returns ``(id_col, score)`` ordered by (score desc, id asc).
    """
    postings = build_postings(ds, id_col, text_col)

    # corpus scalars (N, avgdl) straight off the doc table — bounded
    # vecreduce partials, O(1) driver transit at any block count
    n_docs, sum_dl = _corpus_stats(ds, text_col)
    avgdl = sum_dl / n_docs if n_docs else 0.0

    qset = pa.array(sorted(set(query_terms)), pa.string())
    # prune to query terms BEFORE any shuffle; materialize the pruned
    # postings (object-store blocks, spillable — never the driver) so the
    # df aggregate and the scoring pass don't re-run tokenization
    matched = postings.map_batches(
        lambda t: t.filter(pc.is_in(t["term"], value_set=qset)),
        batch_format="pyarrow",
    ).materialize()
    # df per query term: bounded by |query| rows — a legitimate driver
    # collect (the idf table IS the broadcast artifact)
    dfs = {
        r["term"]: r["df"]
        for r in matched.groupby("term").aggregate(Count(alias_name="df")).take_all()
    }
    idf = {t: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
           for t, df in dfs.items()}

    return _bm25_finish(matched, idf, avgdl, k, id_col, k1, b)


def _bm25_finish(
    matched: "rd.Dataset",
    idf: dict,
    avgdl: float,
    k: int,
    id_col: str,
    k1: float,
    b: float,
) -> "rd.Dataset":
    """Shared BM25 tail: score matched postings, per-doc Sum, rounded
    scatter-gather top-k. Used by both the in-session ``bm25_topk`` and
    the persisted-index ``bm25_search_index`` so the two paths cannot
    drift."""

    def score(t: pa.Table) -> pa.Table:
        w = np.array([idf[x] for x in t["term"].to_pylist()], np.float64)
        tf = np.asarray(t["tf"], np.float64)
        dl = np.asarray(t["dl"], np.float64)
        s = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({id_col: t[id_col], "s_part": pa.array(s, pa.float64())})

    per_doc = (
        matched.map_batches(score, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("s_part", alias_name="s"))
    )

    def local_topk(t: pa.Table) -> pa.Table:
        s = np.round(np.asarray(t["s"], np.float64), 4)
        ids = np.asarray(t[id_col])
        order = np.lexsort((ids, -s))[:k]
        return pa.table({
            id_col: pa.array(ids[order], t[id_col].type),
            "score": pa.array(s[order], pa.float64()),
        })

    partials = per_doc.map_batches(local_topk, batch_format="pyarrow")
    return partials.sort(["score", id_col], descending=[True, False]).limit(k)


def phrase_search(
    ds: "rd.Dataset",
    phrase: List[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Exact token-phrase matching via positional-posting alignment —
    the phrase-query sibling of ``bm25_topk`` (eval-set mining, quote
    detection, boilerplate hunting). Emits ``(id_col, n_matches)`` for
    every doc containing the phrase at least once.

    The classic positional-index intersection, shuffled once: each
    occurrence of phrase term ``phrase[i]`` at token position ``p``
    claims aligned start ``a = p − i``; a start where ALL k slots are
    claimed is a match (slot rows are distinct by construction — one
    token position claims a given (a, i) at most once, so a plain
    count == k detects the full phrase, repeated phrase terms
    included).

    Scale shape: the phrase is the broadcast small side (closure) and
    pruning happens AT TOKENIZATION — only phrase-term occurrences
    enter the exchange; then one (doc, a) groupby-count and one narrow
    per-doc count, both on the same doc-id key family.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    k = len(phrase)
    slots = [(term, i) for i, term in enumerate(phrase)]

    def aligned(t: pa.Table) -> pa.Table:
        out_id, out_a = [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            w = (x or "").split()
            if not w:
                continue
            arr = np.array(w, dtype=object)
            for term, i in slots:
                ps = np.flatnonzero(arr == term)
                if len(ps):
                    out_id.extend([did] * len(ps))
                    out_a.extend(ps - i)
        return pa.table({
            id_col: pa.array(out_id, t[id_col].type),
            "a": pa.array(np.array(out_a, np.int64), pa.int64()),
        })

    al = ds.map_batches(aligned, batch_format="pyarrow")
    starts = (
        al.groupby([id_col, "a"])
        .aggregate(Count(alias_name="n_slots"))
        .filter(expr=f"n_slots == {k}")
    )
    matches = (
        starts.groupby(id_col)
        .aggregate(Count(alias_name="n_matches"))
    )
    return matches.select_columns([id_col, "n_matches"])


# ---------------------------------------------------------------------------
# Persisted, incrementally-appendable inverted index — the lexical
# sibling of stages/dedup.build_minhash_index and the PQ index in
# stages/similarity.py. bm25_topk re-tokenizes the corpus per query;
# at 100 TB the index is built ONCE (and grown append-only as crawl
# increments land), and every search touches only the query terms'
# postings buckets, never the corpus.
#
# Layout under {index_dir}:
#   postings/add_NNNNN/bucket=B/*.parquet  (term, id, tf, dl) rows,
#       hash(term)-bucketed so a search lists+reads only |q| buckets
#   df/add_NNNNN/bucket=B/*.parquet        (term, df) partials
#   stats/add_NNNNN/*.parquet              one (n_docs, sum_dl) row
# Each text_index_add() call appends a new add_NNNNN increment; df and
# stats merge additively at search time (df is read pruned to the query
# terms, so the merge is |q|·#increments rows on the driver — the idf
# table IS the broadcast artifact). BM25 over the merged index is
# exactly BM25 over the union corpus; pinned in tests.
# ---------------------------------------------------------------------------

_N_TERM_BUCKETS = 64


def _term_buckets(terms: List[str]) -> np.ndarray:
    """Deterministic md5 term→bucket (no Python hash(); stable across
    processes and runs — the determinism invariant)."""
    import hashlib

    return np.array(
        [int(hashlib.md5(t.encode("utf-8", "surrogatepass")).hexdigest()[:8],
             16) % _N_TERM_BUCKETS for t in terms],
        dtype=np.int64,
    )


def _next_increment(index_dir: str, sub: str) -> str:
    import os

    d = os.path.join(index_dir, sub)
    os.makedirs(d, exist_ok=True)
    n = len([x for x in os.listdir(d)
             if x.startswith("add_") and not x.endswith(".tmp")])
    return os.path.join(d, f"add_{n:05d}")


def write_increment(ds: "rd.Dataset", index_dir: str, sub: str,
                    partition_cols=None) -> str:
    """Atomic append of one store increment (round-5 hardening, shared
    by every persisted incremental store — text index, fuzzy variants,
    moment store, HDR/HLL sketches, stats store): leftover ``*.tmp``
    dirs from a KILLED prior write are removed, the new increment lands
    under ``add_NNNNN.tmp`` and renames into place — so a completed
    ``add_NNNNN`` dir is always a COMPLETE increment and a retry after
    a mid-write kill can never double-count a batch."""
    import os
    import shutil

    d = os.path.join(index_dir, sub)
    os.makedirs(d, exist_ok=True)
    for x in os.listdir(d):
        if x.endswith(".tmp"):
            shutil.rmtree(os.path.join(d, x), ignore_errors=True)
    target = _next_increment(index_dir, sub)
    tmp = target + ".tmp"
    if partition_cols:
        ds.write_parquet(tmp, partition_cols=partition_cols)
    else:
        ds.write_parquet(tmp)
    os.rename(tmp, target)
    return target


def _write_at(ds: "rd.Dataset", index_dir: str, sub: str, n: int,
              partition_cols=None) -> str:
    """Write sub-increment ``add_NNNNN`` at an EXPLICIT index via
    tmp+rename, replacing any uncommitted leftover at that index (used
    by the grouped text-index commit below; single-table stores use
    ``write_increment``)."""
    import os
    import shutil

    d = os.path.join(index_dir, sub)
    os.makedirs(d, exist_ok=True)
    target = os.path.join(d, f"add_{n:05d}")
    for x in (target, target + ".tmp"):
        if os.path.isdir(x):
            shutil.rmtree(x)
    if partition_cols:
        ds.write_parquet(target + ".tmp", partition_cols=partition_cols)
    else:
        ds.write_parquet(target + ".tmp")
    os.rename(target + ".tmp", target)
    return target


def _committed_incs(index_dir: str):
    """Set of committed increment names, or None for a legacy
    (pre-marker) index where every complete add_ dir counts."""
    import os

    commits = os.path.join(index_dir, "commits")
    if not os.path.isdir(commits):
        return None
    return {x for x in os.listdir(commits) if x.startswith("add_")}


def text_index_add(
    ds: "rd.Dataset",
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Append one corpus increment to the inverted index (creating the
    index on first call — ``build_text_index`` is the alias for that).
    One tokenization pass over the NEW docs only; postings land
    hash-bucketed by term, df partials per bucket, corpus scalars as a
    single row. Caller contract: doc ids must be unique across
    increments (re-crawls go through latest_by_url / snapshot_diff
    first).

    Group-atomic commit (round-5 hardening): the three sub-increments
    (postings, df, stats) land at the SAME explicit index via
    tmp+rename, and the increment only becomes visible when its marker
    file appears under ``{index_dir}/commits`` — a kill anywhere in the
    sequence leaves orphans that the next add overwrites, so readers
    can never see a postings increment without its df/stats twins, and
    a retry can never double-count a batch. Legacy marker-less indexes
    are adopted in place (markers written retroactively for their
    complete increments)."""
    import os

    commits = os.path.join(index_dir, "commits")
    os.makedirs(commits, exist_ok=True)
    committed = sorted(x for x in os.listdir(commits)
                       if x.startswith("add_"))
    if not committed:
        # legacy adoption: everything already on disk predates markers
        pdir = os.path.join(index_dir, "postings")
        if os.path.isdir(pdir):
            for x in sorted(os.listdir(pdir)):
                if x.startswith("add_") and not x.endswith(".tmp"):
                    with open(os.path.join(commits, x), "w"):
                        pass
            committed = sorted(x for x in os.listdir(commits)
                               if x.startswith("add_"))
    n = len(committed)

    postings = build_postings(ds, id_col, text_col).materialize()

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket",
            pa.array(_term_buckets(t["term"].to_pylist()), pa.int64()))

    _write_at(postings.map_batches(add_bucket, batch_format="pyarrow"),
              index_dir, "postings", n, partition_cols=["bucket"])
    df = postings.groupby("term").aggregate(Count(alias_name="df"))
    _write_at(df.map_batches(add_bucket, batch_format="pyarrow"),
              index_dir, "df", n, partition_cols=["bucket"])
    n_docs, sum_dl = _corpus_stats(ds, text_col)
    row = pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "sum_dl": pa.array([sum_dl], pa.int64()),
    })
    _write_at(rd.from_arrow(row), index_dir, "stats", n)
    with open(os.path.join(commits, f"add_{n:05d}"), "w"):
        pass  # the group commit point
    return index_dir


# first build == first append; the name states intent at call sites
build_text_index = text_index_add


def _bucket_files(index_dir: str, sub: str, buckets: set) -> List[str]:
    import glob
    import os

    out: List[str] = []
    base = os.path.join(index_dir, sub)
    committed = _committed_incs(index_dir)
    incs = [x for x in sorted(os.listdir(base))
            if x.startswith("add_") and not x.endswith(".tmp")
            and (committed is None or x in committed)]
    for inc in incs:
        for b in sorted(buckets):
            out.extend(sorted(glob.glob(
                os.path.join(base, inc, f"bucket={b}", "*.parquet"))))
    return out


def bm25_search_index(
    index_dir: str,
    query_terms: List[str],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> "rd.Dataset":
    """Okapi BM25 top-k against a PERSISTED index: stats and the query
    terms' df rows merge driver-side across increments (|q|-bounded),
    and only the |q| matching postings buckets are listed and read —
    with a row-level term filter pushed into the parquet scan. The
    corpus text is never touched; scores are exactly ``bm25_topk`` over
    the union of all increments."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pqt

    qterms = sorted(set(query_terms))
    if not qterms:
        raise ValueError("query_terms must be non-empty")
    buckets = set(_term_buckets(qterms).tolist())

    # corpus scalars: one row per COMMITTED increment
    import glob as _glob
    import os as _os

    committed = _committed_incs(index_dir)
    sdirs = [d for d in sorted(_glob.glob(f"{index_dir}/stats/add_*"))
             if not d.endswith(".tmp")
             and (committed is None or _os.path.basename(d) in committed)]
    stats = pa.concat_tables([pqt.read_table(d) for d in sdirs]) if sdirs \
        else pa.table({"n_docs": pa.array([], pa.int64()),
                       "sum_dl": pa.array([], pa.int64())})
    n_docs = int(pc.sum(stats["n_docs"]).as_py() or 0)
    sum_dl = int(pc.sum(stats["sum_dl"]).as_py() or 0)
    avgdl = sum_dl / n_docs if n_docs else 0.0

    # df for the query terms: pruned bucket read, driver-side merge
    qset = pa.array(qterms, pa.string())
    dfs: dict = {}
    df_files = _bucket_files(index_dir, "df", buckets)
    if df_files:
        dft = pqt.ParquetDataset(
            df_files, filters=pads.field("term").isin(qset)).read()
        for term, df in zip(dft["term"].to_pylist(), dft["df"].to_pylist()):
            dfs[term] = dfs.get(term, 0) + df
    idf = {t: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
           for t, df in dfs.items()}

    post_files = _bucket_files(index_dir, "postings", buckets)
    if not post_files:
        # no bucket dir for any query term (tiny index): typed empty —
        # int64 ids, matching the default id_col contract
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }))
    matched = rd.read_parquet(
        post_files, filter=pads.field("term").isin(qset),
    ).map_batches(
        # armor: drop the hive partition column and re-prune exactly
        lambda t: t.select(["term", id_col, "tf", "dl"]).filter(
            pc.is_in(t["term"], value_set=qset)),
        batch_format="pyarrow",
    )
    return _bm25_finish(matched, idf, avgdl, k, id_col, k1, b)


def search_snippets(
    ds: "rd.Dataset",
    term: str,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """KWIC (keyword-in-context) snippet generation — the result-page /
    eval-sheet view next to ``bm25_topk``'s ranking: for every doc
    containing ``term`` as an exact whitespace token, emit
    ``(id, pos, snippet)`` where ``pos`` is the 0-based token index of
    the FIRST occurrence and ``snippet`` is the ±``window``-token
    context around it, space-joined.

    Scale shape: one stateless streaming pass, zero exchanges. The
    match test is a vectorized RE2 kernel over the whole batch; only
    the MATCHING minority is tokenized in Python (the ld_types
    discipline — non-matching docs, the overwhelming majority under a
    selective query, never leave Arrow). SQL mirror: DuckDB
    regexp_split_to_array + list_position + 1-based inclusive list
    slicing reproduce the same window exactly (q:search_snippets).

    Whitespace contract: tokenization splits on the RE2 ASCII
    whitespace class ``[\\t\\n\\f\\r ]+`` — the SAME rule as the
    vectorized gate's ``\\s`` and the oracle's ``regexp_split_to_array``
    — NOT Python ``str.split()``'s Unicode whitespace, so docs with
    NBSP and friends can never diverge between the gate, the tokenizer
    and the SQL mirror (round-4 advisor finding #1)."""
    import re as _re

    pat = rf"(?:^|\s){_re.escape(term)}(?:\s|$)"
    ws = _re.compile(r"[\t\n\f\r ]+")

    def snip(t: pa.Table) -> pa.Table:
        keep = pc.fill_null(
            pc.match_substring_regex(t[text_col], pattern=pat), False)
        hit = t.filter(keep)
        ids = hit[id_col].to_pylist()
        out_pos, out_snip = [], []
        for x in hit[text_col].to_pylist():
            words = ws.split(x or "")
            i = words.index(term)
            out_pos.append(i)
            out_snip.append(" ".join(words[max(i - window, 0): i + window + 1]))
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "pos": pa.array(out_pos, pa.int64()),
            "snippet": pa.array(out_snip, pa.string()),
        })

    return ds.map_batches(snip, batch_format="pyarrow")
