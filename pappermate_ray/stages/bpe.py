"""Distributed BPE merge learning (tokenizer training).

The tokenizer is the first artifact a training-data pipeline produces
from a curated corpus; BPE merge learning (Sennrich et al. 2016,
arXiv:1508.07909) is its standard algorithm and — done naively — an
O(merges × corpus) scan. The scale shape implemented here is the one
SentencePiece/HF trainers use, distributed:

1. ``word_counts`` — ONE corpus scan: per-block partial word counts
   (dict combine inside ``map_batches``) → one ``groupby(word).sum``.
   Everything after operates on the distinct-word table, which is
   Heaps-law compressed (|vocab| ≪ corpus tokens and sublinear in it):
   at 100 TB the corpus never participates in a merge round.
2. ``learn_bpe`` — per merge round over the vocab table:
   pair counting is a vectorized explode/shift pass emitting per-block
   PARTIAL (pair, weighted-count) rows, so the round's one shuffle
   carries distinct pairs, never symbol instances; the best pair is a
   top-1 scatter-gather (max count, lexicographically smallest pair on
   ties); the merge applies as a streaming string replace over the
   vocab. State is re-materialized per round (small intermediate, same
   bounded-lineage pattern as ops/kmeans.py — without it round r
   re-executes rounds 1..r-1).

Canonical word state: symbols wrapped in a chr(31) sentinel and joined
by spaces (``\\x1fl\\x1fo\\x1fw\\x1f`` → ``"\\x1fl\\x1f \\x1fo\\x1f ..."``),
so that merging pair (a, b) is EXACTLY ``str.replace(wrapped_pair,
merged)`` — non-overlapping left-to-right, the BPE greedy order — and
the same ``replace`` call exists verbatim in SQL, which makes the whole
training run DuckDB-oracle-checkable (rounds unrolled into CTEs).
The sentinel keeps a symbol from matching inside a neighbor ("xa b"
must not match pair (a, b)); corpus text is whitespace-tokenized ASCII
(fixture invariant), so chr(31) cannot occur in a symbol.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum

SENT = "\x1f"


def word_counts(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """Whitespace word counts: per-block partial combine → one narrow
    groupby-sum. Output columns: ``word``, ``cnt``."""

    def partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for text in t[text_col].to_pylist():
            for w in (text or "").split():
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {"word": pa.array(list(counts.keys()), pa.string()),
             "c": pa.array(list(counts.values()), pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c", alias_name="cnt"))
    )


def wrap_word(word: str) -> str:
    return " ".join(SENT + ch + SENT for ch in word)


def merged_symbol(pair: str) -> str:
    """``"\\x1fa\\x1f \\x1fb\\x1f"`` → ``"\\x1fab\\x1f"`` (same expression
    as the oracle's ``replace(pair, chr(31)||' '||chr(31), '')``)."""
    return pair.replace(SENT + " " + SENT, "")


def _oov_segment(word: str, known: frozenset, max_sym: int) -> List[str]:
    """Deterministic out-of-vocabulary fallback shared by every encode
    path: greedy longest-match segmentation of the word's characters
    over the learned symbol set (WordPiece-style). Characters absent
    from the alphabet are dropped. Merge-order-free on purpose — a
    shipped tokenizer state carries the word table and symbol set, not
    the merge sequence, and longest-match needs neither; both the
    broadcast and distributed paths call this exact function so OOV
    words encode identically regardless of vocab size."""
    out: List[str] = []
    i, L = 0, len(word)
    while i < L:
        j = min(L, i + max_sym)
        while j > i:
            cand = SENT + word[i:j] + SENT
            if cand in known:
                out.append(cand)
                break
            j -= 1
        else:
            i += 1  # unknown character: drop deterministically
            continue
        i = j
    return out


def _pair_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Per-block weighted pair counts, fully vectorized: explode the
    symbol lists, shift within each word, weight by the word count."""
    df = df.reset_index(drop=True)
    ex = df["s"].str.split(" ").explode()
    nxt = ex.groupby(level=0).shift(-1)
    pairs = (ex + " " + nxt).dropna()
    if pairs.empty:
        # typed Arrow empty, NOT an object-dtype pandas frame: Ray's
        # block-size estimator calls np.vectorize over object columns
        # and logs "cannot call `vectorize` on size 0 inputs" per empty
        # block — hundreds of lines per gate run (round-4 verdict #7)
        return pa.table({"pair": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    out = pd.DataFrame(
        {"pair": pairs.values, "c": df["cnt"].loc[pairs.index].values}
    )
    return out.groupby("pair", sort=False, as_index=False)["c"].sum()


def learn_bpe(
    vocab: "ray.data.Dataset",
    num_merges: int,
    small_vocab_threshold: int = 100_000,
) -> Tuple[pa.Table, "ray.data.Dataset"]:
    """Learn ``num_merges`` BPE merges over a (word, cnt) vocab Dataset.

    Returns (merges table with columns merge_rank/left_sym/right_sym/
    pair_count, final vocab state Dataset with the wrapped symbol
    string ``s``). Stops early if no pair remains.

    Per-round best-pair reduce, sized to the (known, materialized)
    vocab: above ``small_vocab_threshold`` rows the pair counts go
    through a distributed groupby + per-block top-1 + driver pick (the
    100 TB shape — a web corpus's Heaps-law vocab is ~1e8 rows); at or
    below it the per-block partials are combined directly on the driver
    (bounded: ≤ vocab distinct pairs), skipping the per-round exchange
    entirely — template-heavy fixture corpora have tiny vocabs and were
    paying ~1.5 s of shuffle spin-up per round to count 31 rows. Both
    paths use the identical (count desc, pair asc) rule and are
    asserted equal in tests.
    """

    def init(t: pa.Table) -> pa.Table:
        return t.append_column(
            "s", pa.array([wrap_word(w) for w in t["word"].to_pylist()],
                          pa.string())
        )

    def top1_local(df: pd.DataFrame) -> pd.DataFrame:
        # one candidate row per block: global best = driver max over
        # O(blocks) rows — replaces a full distributed SORT per round
        # with the same (count desc, pair asc) order
        if df.empty:
            return pa.table({"pair": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        return df.sort_values(["c", "pair"], ascending=[False, True]).head(1)

    state = vocab.map_batches(init, batch_format="pyarrow").materialize()
    driver_combine = state.count() <= small_vocab_threshold
    merges: List[Tuple[int, str, str, int]] = []
    for r in range(1, num_merges + 1):
        partials = state.map_batches(_pair_partials, batch_format="pandas")
        if driver_combine:
            cands = partials.take_all()
            if cands:
                combined = (
                    pd.DataFrame(cands)
                    .groupby("pair", as_index=False)["c"].sum()
                )
                cands = combined.to_dict("records")
        else:
            cands = (
                partials.groupby("pair")
                .aggregate(Sum("c", alias_name="c"))
                .map_batches(top1_local, batch_format="pandas")
                .take_all()
            )
        if not cands:
            break
        best = min(cands, key=lambda row: (-int(row["c"]), row["pair"]))
        pair, count = best["pair"], int(best["c"])
        left, right = (p.replace(SENT, "") for p in pair.split(" "))
        merges.append((r, left, right, count))
        repl = merged_symbol(pair)

        def apply(df: pd.DataFrame, _pat=pair, _repl=repl) -> pd.DataFrame:
            df["s"] = df["s"].str.replace(_pat, _repl, regex=False)
            return df

        state = state.map_batches(apply, batch_format="pandas").materialize()

    table = pa.table({
        "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
        "left_sym": pa.array([m[1] for m in merges], pa.string()),
        "right_sym": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })
    return table, state


def bpe_token_counts(
    ds: "ray.data.Dataset",
    state: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """Encode the corpus with a learned vocab: per-doc whitespace-token
    and BPE-token counts (the sizing stat sequence packing / token
    budgeting needs). Docs with no tokens are dropped (the oracle's
    ``trim(text) <> ''`` gate).

    Hybrid small-side handling (round-2 verdict item #3 — the robots
    hybrid pattern, stages/urls.py): when the distinct-word vocab fits
    ``broadcast_limit`` rows it ships ONCE via ``ray.put`` and each
    batch does dict lookups (no shuffle). On web-scale corpora the
    distinct-"word" set runs to billions (typo/junk tokens defeat
    Heaps' law), so above the bound the encode becomes fully
    distributed instead: per-doc DISTINCT (id, word, tf) rows — a
    corpus-bounded explode, never the raw token stream — join the
    (word, n_sym) table on word, then one narrow per-id groupby-sum
    rebuilds the counts. Both paths are asserted identical in tests.

    Out-of-vocabulary words (encoding text the state wasn't trained
    on) fall back to ``_oov_segment`` in BOTH paths — greedy
    longest-match over the learned symbol set, identical results
    regardless of vocab size."""
    state = state.materialize()
    n_vocab = state.count()
    if n_vocab <= broadcast_limit:
        vocab_df = state.to_pandas()
        counts = {
            w: s.count(" ") + 1 for w, s in zip(vocab_df["word"], vocab_df["s"])
        }
        syms = set()
        for s in vocab_df["s"]:
            syms.update(s.split(" "))
        max_sym = max((len(s) - 2 for s in syms), default=0)
        ref = ray.put((counts, frozenset(syms), max_sym))

        def encode(t: pa.Table) -> pa.Table:
            lut, known, mx = ray.get(ref)
            memo: dict = {}
            ids, n_tok, n_bpe = [], [], []
            for i, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
                words = (text or "").split()
                if not words:
                    continue
                ids.append(i)
                n_tok.append(len(words))
                total = 0
                for w in words:
                    c = lut.get(w)
                    if c is None:
                        c = memo.get(w)
                        if c is None:
                            c = len(_oov_segment(w, known, mx))
                            memo[w] = c
                    total += c
                n_bpe.append(total)
            return pa.table({
                id_col: pa.array(ids, t[id_col].type),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            })

        return ds.map_batches(encode, batch_format="pyarrow")

    # distributed path: vocab too big to broadcast. The SYMBOL set
    # (alphabet + merges) is vocab-sized on any corpus — one distinct
    # exchange collects it for the OOV fallback broadcast.
    from ray.data.aggregate import Count

    from ..ops.joins import hash_join

    def explode_syms(t: pa.Table) -> pa.Table:
        out = set()
        for s in t["s"].to_pylist():
            out.update(s.split(" "))
        return pa.table({"sym": pa.array(sorted(out), pa.string())})

    sym_rows = (state.map_batches(explode_syms, batch_format="pyarrow")
                .groupby("sym").aggregate(Count()).take_all())
    known = frozenset(r["sym"] for r in sym_rows)
    max_sym = max((len(s) - 2 for s in known), default=0)
    symref = ray.put((known, max_sym))

    def sym_counts(t: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(t["s"], " "), 1)
        return pa.table({"word": t["word"],
                         "n_sym": pc.cast(n, pa.int64())})

    symtab = state.map_batches(sym_counts, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ids, words, tfs = [], [], []
        for i, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            w = (text or "").split()
            if not w:
                continue
            uniq, cnt = np.unique(np.array(w, dtype=object), return_counts=True)
            ids.extend([i] * len(uniq))
            words.extend(uniq)
            tfs.extend(cnt.astype(np.int64))
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "word": pa.array(words, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    sch = ds.schema()
    sch = getattr(sch, "base_schema", sch)
    id_type = dict(zip(sch.names, sch.types))[id_col]
    joined = hash_join(
        ds.map_batches(explode, batch_format="pyarrow"), symtab, on="word",
        join_type="left_outer",
        left_schema=pa.schema([(id_col, id_type), ("word", pa.string()),
                               ("tf", pa.int64())]),
        right_schema=pa.schema([("word", pa.string()), ("n_sym", pa.int64())]),
    )

    def weigh(t: pa.Table) -> pa.Table:
        n_sym = t["n_sym"]
        if n_sym.null_count:
            # OOV words: null from the outer join → longest-match length
            kn, mx = ray.get(symref)
            memo: dict = {}
            vals = [
                v if v is not None
                else memo.setdefault(w, len(_oov_segment(w, kn, mx)))
                for v, w in zip(n_sym.to_pylist(), t["word"].to_pylist())
            ]
            n_sym = pa.array(vals, pa.int64())
        return pa.table({
            id_col: t[id_col],
            "tf": t["tf"],
            "bpe": pc.multiply(t["tf"], n_sym),
        })

    agg = (
        joined.map_batches(weigh, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("tf", alias_name="n_tokens"),
                   Sum("bpe", alias_name="n_bpe_tokens"))
    )
    return agg.map_batches(
        lambda t: t.select([id_col, "n_tokens", "n_bpe_tokens"]),
        batch_format="pyarrow",
    )


def bpe_encode_ids(
    ds: "ray.data.Dataset",
    state: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """Per-document BPE token-ID sequences — the artifact a training
    pipeline actually ships (``bpe_token_counts`` is the sizing stat;
    this is the encode). Token ids are assigned deterministically:
    the learned vocab's distinct symbol set, id = rank in sorted order
    (binary/codepoint collation, identical in Python and DuckDB for
    this corpus) — engine-free, so the oracle can reproduce ids.

    Output: (id_col, n_tokens, n_bpe_tokens, token_ids list<int32>);
    docs with no tokens drop (the oracle's ``trim(text) <> ''`` gate).

    Hybrid word-table handling (the ``bpe_token_counts`` rule):
    - word table ≤ ``broadcast_limit`` rows: word → int32[] lookup
      ships ONCE via ray.put, each batch concatenates per-word id
      arrays — zero shuffles, the output streams.
    - beyond the bound the encode is fully distributed: the corpus
      explodes to (id, pos, word) rows — O(tokens), the output's own
      order of size, not an amplification — joins the (word, ids-csv)
      table on word (csv because Acero rejects list-typed non-key join
      columns), and ONE partition-grouped exchange on id rebuilds each
      document's sequence in token order. Paths asserted identical in
      tests. The SYMBOL-id table is vocab-sized (alphabet + merges) on
      any corpus and always broadcasts.

    Out-of-vocabulary words (encoding text the state wasn't trained
    on) fall back to ``_oov_segment`` in BOTH paths — greedy
    longest-match over the learned symbol set, identical ids
    regardless of vocab size.
    """
    from ..ops.grouping import partition_grouped
    from ..ops.joins import hash_join

    state = state.materialize()
    n_vocab = state.count()

    if n_vocab <= broadcast_limit:
        # the word table is already driver-sized: derive the symbol set
        # from it directly instead of a distributed distinct exchange
        vocab_df = state.to_pandas()
        syms: set = set()
        for s in vocab_df["s"]:
            syms.update(s.split(" "))
        sym2id = {s: i for i, s in enumerate(sorted(syms))}
        max_sym = max((len(s) - 2 for s in sym2id), default=0)
        lut = {w: np.array([sym2id[x] for x in s.split(" ")], np.int32)
               for w, s in zip(vocab_df["word"], vocab_df["s"])}
        ref = ray.put((lut, sym2id, max_sym))

        def encode(t: pa.Table) -> pa.Table:
            m, s2i, mx = ray.get(ref)
            known = frozenset(s2i)
            memo: dict = {}
            ids, n_tok, seqs = [], [], []
            for i, text in zip(t[id_col].to_pylist(),
                               t[text_col].to_pylist()):
                words = (text or "").split()
                if not words:
                    continue
                ids.append(i)
                n_tok.append(len(words))
                parts = []
                for w in words:
                    a = m.get(w)
                    if a is None:
                        a = memo.get(w)
                        if a is None:
                            a = np.array(
                                [s2i[x] for x in _oov_segment(w, known, mx)],
                                np.int32)
                            memo[w] = a
                    parts.append(a)
                seqs.append(np.concatenate(parts) if parts
                            else np.array([], np.int32))
            return pa.table({
                id_col: pa.array(ids, t[id_col].type),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_bpe_tokens": pa.array([len(s) for s in seqs], pa.int64()),
                "token_ids": pa.array([s.tolist() for s in seqs],
                                      pa.list_(pa.int32())),
            })

        return ds.map_batches(encode, batch_format="pyarrow")

    # ---- distributed path: word table too big to broadcast ----
    from ray.data.aggregate import Count

    def explode_syms(t: pa.Table) -> pa.Table:
        out = set()
        for s in t["s"].to_pylist():
            out.update(s.split(" "))
        return pa.table({"sym": pa.array(sorted(out), pa.string())})

    sym_rows = (state.map_batches(explode_syms, batch_format="pyarrow")
                .groupby("sym").aggregate(Count()).take_all())
    sym2id = {r["sym"]: i for i, r in
              enumerate(sorted(sym_rows, key=lambda r: r["sym"]))}
    max_sym = max((len(s) - 2 for s in sym2id), default=0)
    sref = ray.put((sym2id, max_sym))

    def ids_csv(t: pa.Table) -> pa.Table:
        m, _ = ray.get(sref)
        csvs = [",".join(str(m[x]) for x in s.split(" "))
                for s in t["s"].to_pylist()]
        return pa.table({"word": t["word"],
                         "ids_csv": pa.array(csvs, pa.string())})

    wordtab = state.map_batches(ids_csv, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ids, poss, words = [], [], []
        for i, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            w = (text or "").split()
            ids.extend([i] * len(w))
            poss.extend(range(len(w)))
            words.extend(w)
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "pos": pa.array(poss, pa.int64()),
            "word": pa.array(words, pa.string()),
        })

    sch = ds.schema()  # Ray Schema wrapper: parallel names/types lists
    id_type = dict(zip(sch.names, sch.types))[id_col]
    tokens = ds.map_batches(explode, batch_format="pyarrow")
    joined = hash_join(
        tokens, wordtab, on="word", join_type="left_outer",
        left_schema=pa.schema([(id_col, id_type), ("pos", pa.int64()),
                               ("word", pa.string())]),
        right_schema=pa.schema([("word", pa.string()),
                                ("ids_csv", pa.string())]))
    parted, gcols = partition_grouped(joined, [id_col])

    def rebuild(df):
        df = df.sort_values([id_col, "pos"], kind="mergesort")
        ids = df[id_col].to_numpy()
        change = np.r_[True, ids[1:] != ids[:-1]]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(ids)]
        out = {id_col: [], "n_tokens": [], "n_bpe_tokens": [], "token_ids": []}
        csvs = df["ids_csv"].to_numpy()
        words = df["word"].to_numpy()
        s2i = known = mx = None
        memo: dict = {}
        for s, e in zip(starts, ends):
            seq = []
            for k in range(s, e):
                c = csvs[k]
                if c is None or c != c:  # OOV: null from the outer join
                    w = words[k]
                    oov = memo.get(w)
                    if oov is None:
                        if s2i is None:
                            s2i, mx = ray.get(sref)
                            known = frozenset(s2i)
                        oov = [s2i[x] for x in _oov_segment(w, known, mx)]
                        memo[w] = oov
                    seq.extend(oov)
                else:
                    seq.extend(int(x) for x in c.split(","))
            out[id_col].append(ids[s])
            out["n_tokens"].append(int(e - s))
            out["n_bpe_tokens"].append(len(seq))
            out["token_ids"].append(seq)
        return pd.DataFrame(out)

    return parted.groupby(gcols).map_groups(rebuild, batch_format="pandas")
