"""Edit-distance near-duplicate detection with exact recall.

The missing member of the near-dup family (exact hash, MinHash-Jaccard,
SimHash, n-gram Jaccard, embedding cosine, perceptual hash): pairs of
short strings within Levenshtein distance ``k`` — entity/name/title
resolution, OCR-noise variant collapse, query-log canonicalisation.

Blocking is the SymSpell deletion neighbourhood (Garbe's symmetric
delete; public algorithm): every string emits all variants reachable by
up to ``k`` character DELETIONS, including itself. If
``lev(a, b) <= k`` there is an edit script from ``a`` to ``b`` with
``i + d + s <= k`` inserts/deletes/substitutions; deleting from ``a``
its ``d + s`` deleted/substituted positions and from ``b`` its
``i + s`` inserted/substituted positions yields the SAME string, each
side within ``k`` deletions — so candidate recall is EXACT, unlike
length- or prefix-banding. The price is a ``sum_{j<=k} C(n, j)`` row
blowup per distinct string (~56 rows for a 10-char name at k=2), which
is why the operator runs over the DISTINCT-value table, never the
corpus: the corpus contributes one narrow groupby-count exchange and
is done.

Scale shape (100 TB framing): one distinct-value aggregate over the
corpus (strings + counts only), one variant expansion map (rows carry
an 8-byte bucket hash + the short string + a count), ONE
hash-partitioned grouped exchange for within-bucket pairs (reuses
``_bucket_pairs_grouped``'s occupancy/saturation/triu machinery), a
pair-dedupe groupby, and a vectorized DP verify map. No driver-side
state, no join. Strings of length ``<= k`` all share the empty-string
variant, and correctly so — any two of them ARE within distance ``k``.

Reference has no analog (its dedup surface is exact file hashing,
``scripts/system_contract_organizer.py``); this is beyond-reference
scope for the training-data engine.
"""

from __future__ import annotations

import hashlib
from itertools import combinations
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min

from .dedup import _bucket_pairs_grouped


def deletion_variants(s: str, k: int) -> List[str]:
    """All distinct strings reachable from ``s`` by up to ``k`` deletions
    (including ``s`` itself). ``sum_{j<=k} C(len(s), j)`` upper bound."""
    n = len(s)
    out = {s}
    for j in range(1, min(k, n) + 1):
        for idx in combinations(range(n), j):
            drop = set(idx)
            out.add("".join(c for i, c in enumerate(s) if i not in drop))
    return list(out)


def _variant_hash(v: str) -> int:
    return int.from_bytes(hashlib.blake2b(v.encode("utf-8"),
                                          digest_size=8).digest(), "big",
                          signed=True)


def levenshtein_batch(a_list: List[str], b_list: List[str]) -> np.ndarray:
    """Levenshtein distance for N string pairs at once: the classic DP,
    with every cell vectorized ACROSS the pair axis — ``O(maxlen²)``
    numpy ops on length-N vectors instead of N python DPs. Rolling
    two-row buffer; each pair's answer is harvested from the row where
    ``i == len(a)``. Intended for short strings (names/titles); callers
    bound lengths upstream."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(s) for s in a_list], np.int64)
    lb = np.array([len(s) for s in b_list], np.int64)
    ma, mb = int(la.max()), int(lb.max())
    # codepoint matrices; pads get sentinel values that never match
    A = np.full((n, max(ma, 1)), -1, np.int64)
    B = np.full((n, max(mb, 1)), -2, np.int64)
    for r, s in enumerate(a_list):
        if s:
            A[r, : len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                           np.uint32).astype(np.int64)
    for r, s in enumerate(b_list):
        if s:
            B[r, : len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                           np.uint32).astype(np.int64)
    res = np.full(n, -1, np.int64)
    res[la == 0] = lb[la == 0]
    prev = np.broadcast_to(np.arange(mb + 1, dtype=np.int64),
                           (n, mb + 1)).copy()
    cur = np.empty_like(prev)
    for i in range(1, ma + 1):
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, mb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int64)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev, cur = cur, prev
    return res


def fuzzy_pairs(
    ds: "rd.Dataset",
    col: str,
    max_dist: int = 2,
    max_len: int = 64,
    max_bucket: int = 0,
    n_distinct_hint: Optional[int] = None,
) -> "rd.Dataset":
    """Distinct-value pairs of ``col`` within Levenshtein ``max_dist``,
    with multiplicity: (name_a < name_b, dist, cnt_a, cnt_b).

    ``cnt_*`` are corpus occurrence counts, so ``cnt_a * cnt_b`` is the
    number of row-level pairs the match represents — the dedup-impact
    figure — without ever forming row pairs. Raises on strings longer
    than ``max_len``: the deletion neighbourhood is quadratic in length
    at k=2, and silent blocking fallbacks would silently lose recall;
    long-text near-dup belongs to the MinHash/substring operators.
    ``max_bucket`` (0 = unlimited) drops candidate storms exactly like
    the LSH pair stage."""
    counts = ds.groupby(col).aggregate(Count(alias_name="cnt"))

    def expand(t: pa.Table) -> pa.Table:
        names = t[col].to_pylist()
        cnts = t["cnt"].to_numpy(zero_copy_only=False)
        vh: List[int] = []
        nm: List[str] = []
        ct: List[int] = []
        for name, c in zip(names, cnts):
            s = name or ""
            if len(s) > max_len:
                raise ValueError(
                    f"fuzzy_pairs: value of length {len(s)} exceeds "
                    f"max_len={max_len}; this operator is for short-string "
                    "columns (use minhash/substring dedup for long text)")
            for v in deletion_variants(s, max_dist):
                vh.append(_variant_hash(v))
                nm.append(s)
                ct.append(int(c))
        return pa.table({
            "vh": pa.array(vh, pa.int64()),
            "name": pa.array(nm, pa.string()),
            "cnt": pa.array(ct, pa.int64()),
        })

    banded = counts.map_batches(expand, batch_format="pyarrow")
    # rough exchange sizing: ~40 variants per distinct short string
    n_hint = (n_distinct_hint or 25_000) * 40
    cand = _bucket_pairs_grouped(banded, ["vh"], "name", ["cnt"],
                                 n_rows=n_hint, max_bucket=max_bucket)
    # a pair can share many deletion variants — one row per pair
    # (cnt_a/cnt_b are identical across duplicates; Min is exact)
    cand = cand.groupby(["id_a", "id_b"]).aggregate(
        Min("cnt_a", alias_name="cnt_a"), Min("cnt_b", alias_name="cnt_b"))

    def verify(t: pa.Table) -> pa.Table:
        d = levenshtein_batch(t["id_a"].to_pylist(), t["id_b"].to_pylist())
        out = t.append_column("dist", pa.array(d, pa.int64()))
        out = out.filter(pa.array(d <= max_dist))
        return pa.table({
            "name_a": out["id_a"], "name_b": out["id_b"],
            "dist": out["dist"], "cnt_a": out["cnt_a"],
            "cnt_b": out["cnt_b"],
        })

    return cand.map_batches(verify, batch_format="pyarrow")


def _cross_pairs_str(
    banded: "rd.Dataset",
    key_col: str,
    val_col: str,
    side_col: str,
    n_rows: int,
    max_bucket: int = 0,
) -> "rd.Dataset":
    """String-typed sibling of dedup's ``_cross_bucket_pairs_grouped``:
    within each bucket run, CROSS product of side-1 values × side-0
    values as (value, match) — one partition-grouped exchange, values
    carried via type-preserving ``Table.take`` (the int64-id original
    can't hold words). Runs longer than ``max_bucket`` are dropped
    wholesale (storm cap; both sides count toward the run length)."""
    from ..ops.joins import adaptive_partitions
    from .dedup import _packed_keys

    npart = adaptive_partitions(n_rows)

    def add_pkey(t: pa.Table) -> pa.Table:
        pk = (_packed_keys(t, [key_col]) % np.uint64(npart)).astype(np.int64)
        return t.append_column("_pkey", pa.array(pk, pa.int64()))

    def emit_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out_n, out_o = [], []
        if n:
            keys = t[key_col].to_numpy(zero_copy_only=False)
            order = np.argsort(keys, kind="stable")
            ts = t.take(pa.array(order, pa.int64()))
            k = ts[key_col].to_numpy(zero_copy_only=False)
            change = np.zeros(n, bool)
            change[0] = True
            change[1:] = k[1:] != k[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            sides = ts[side_col].to_numpy(zero_copy_only=False)
            for s, e in zip(starts, ends):
                if max_bucket and e - s > max_bucket:
                    continue
                idx = np.arange(s, e)
                run_new = idx[sides[s:e] == 1]
                run_old = idx[sides[s:e] == 0]
                if not len(run_new) or not len(run_old):
                    continue
                gn, go = np.meshgrid(run_new, run_old, indexing="ij")
                out_n.append(gn.ravel())
                out_o.append(go.ravel())
        nn = np.concatenate(out_n) if out_n else np.array([], np.int64)
        oo = np.concatenate(out_o) if out_o else np.array([], np.int64)
        return pa.table({
            "value": ts[val_col].take(pa.array(nn, pa.int64())) if n
            else pa.array([], pa.string()),
            "match": ts[val_col].take(pa.array(oo, pa.int64())) if n
            else pa.array([], pa.string()),
        })

    return (banded.map_batches(add_pkey, batch_format="pyarrow")
            .groupby("_pkey")
            .map_groups(emit_pairs, batch_format="pyarrow"))


def _expand_distinct(t: pa.Table, col: str, max_dist: int, max_len: int,
                     side: int) -> pa.Table:
    vh: List[int] = []
    nm: List[str] = []
    for name in t[col].to_pylist():
        s = name or ""
        if len(s) > max_len:
            raise ValueError(
                f"fuzzy index: value of length {len(s)} exceeds "
                f"max_len={max_len}; this operator is for short-string "
                "columns")
        for v in deletion_variants(s, max_dist):
            vh.append(_variant_hash(v))
            nm.append(s)
    return pa.table({
        "vh": pa.array(vh, pa.int64()),
        "word": pa.array(nm, pa.string()),
        "_side": pa.array(np.full(len(vh), side, np.int8)),
    })


def fuzzy_index_add(
    ds: "rd.Dataset",
    index_dir: str,
    col: str = "word",
    max_dist: int = 2,
    max_len: int = 64,
) -> str:
    """Append one dictionary increment to the persisted SymSpell index
    (creating it on first call — ``build_fuzzy_index`` is that alias):
    distinct values of ``col`` expand ONCE to their deletion
    neighbourhood and the (vh, word) rows land on parquet. Append-only:
    new vocabulary never re-expands or re-reads old increments — the
    same grow-without-rescan contract as the MinHash/BM25/HLL stores.
    ``max_dist`` is baked into the stored neighbourhood; probes must
    use a ``max_dist`` ≤ the smallest one the index was built with."""
    from .search import write_increment

    distinct = ds.groupby(col).aggregate(Count(alias_name="_cnt"))
    write_increment(
        distinct.map_batches(
            lambda t: _expand_distinct(t, col, max_dist, max_len, 0)
            .drop_columns(["_side"]),
            batch_format="pyarrow"),
        index_dir, "variants")
    return index_dir


build_fuzzy_index = fuzzy_index_add


def fuzzy_match_index(
    new_ds: "rd.Dataset",
    col: str,
    index_dir: str,
    max_dist: int = 2,
    max_len: int = 64,
    max_bucket: int = 0,
) -> "rd.Dataset":
    """(value, match, match_dist) for each DISTINCT new value of ``col``
    within ``max_dist`` of some indexed word — the corpus-scale sibling
    of ``fuzzy_match_lookup`` (whose broadcast dictionary dies when the
    dictionary IS a corpus). The new side is distinct-reduced and
    expands its own variants only; the old side contributes stored
    (vh, word) rows read pruned from parquet (never re-expanded); ONE
    grouped exchange emits cross-side candidates, a narrow pair dedupe,
    the vectorized DP verify, then a per-value best pick (min dist,
    lexicographic tie — the ``fuzzy_match_lookup`` rule)."""
    distinct = new_ds.groupby(col).aggregate(Count(alias_name="_cnt"))
    new_var = distinct.map_batches(
        lambda t: _expand_distinct(t, col, max_dist, max_len, 1),
        batch_format="pyarrow")
    old_var = rd.read_parquet(
        f"{index_dir}/variants", columns=["vh", "word"],
    ).map_batches(
        lambda t: t.append_column(
            "_side", pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow")
    n_old = rd.read_parquet(f"{index_dir}/variants").count()
    cand = _cross_pairs_str(old_var.union(new_var), "vh", "word", "_side",
                            n_rows=n_old * 2, max_bucket=max_bucket)
    cand = cand.groupby(["value", "match"]).aggregate(
        Count(alias_name="_n"))

    def verify(t: pa.Table) -> pa.Table:
        d = levenshtein_batch(t["value"].to_pylist(), t["match"].to_pylist())
        out = t.append_column("match_dist", pa.array(d, pa.int64()))
        return out.filter(pa.array(d <= max_dist)).select(
            ["value", "match", "match_dist"])

    verified = cand.map_batches(verify, batch_format="pyarrow")

    # per-value best (min dist, lexicographic match) rides
    # partition_grouped — one sort + first-per-run over ALL values in
    # the partition, never per-key pandas groups (round-5; the last
    # per-key map_groups in the library)
    from ..ops.grouping import partition_grouped

    part, gcols = partition_grouped(verified, ["value"])

    def pick_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["value", "match_dist", "match"],
                            kind="mergesort")
        return df.drop_duplicates("value", keep="first")[
            ["value", "match", "match_dist"]]

    return part.groupby(gcols).map_groups(pick_part, batch_format="pandas")


def fuzzy_match_lookup(
    ds: "rd.Dataset",
    col: str,
    dictionary: List[str],
    max_dist: int = 2,
    max_len: int = 64,
) -> "rd.Dataset":
    """Spell-correction join: map each corpus value of ``col`` to its
    nearest dictionary entry within ``max_dist`` (ties → lexicographic
    smallest), streaming. The dictionary's FULL deletion neighbourhood
    is built once and broadcast via ``ray.put`` (SymSpell probe side
    generates variants of the QUERY only — both sides within ``k``
    deletions of the common form, so lookup at distance ``k`` needs
    dict variants at ``k`` and query variants at ``k``); per batch the
    candidate set is verified with the vectorized DP. Adds
    ``<col>_match`` (string, null if no entry within range) and
    ``<col>_match_dist`` (int64, -1 if none). Dictionary must be
    driver-small (a vocabulary, not a corpus) — for corpus×corpus use
    ``fuzzy_pairs``."""
    import ray

    neigh: dict = {}
    for w in sorted(set(dictionary)):
        if len(w) > max_len:
            raise ValueError(f"dictionary entry longer than max_len={max_len}")
        for v in deletion_variants(w, max_dist):
            neigh.setdefault(v, []).append(w)
    neigh_ref = ray.put(neigh)

    def match(t: pa.Table) -> pa.Table:
        import ray as _ray

        nb = _ray.get(neigh_ref)
        vals = t[col].to_pylist()
        qs: List[str] = []
        cands: List[str] = []
        row_of: List[int] = []
        for r, s in enumerate(vals):
            s = s or ""
            if len(s) > max_len:
                raise ValueError(
                    f"fuzzy_match_lookup: value of length {len(s)} exceeds "
                    f"max_len={max_len}")
            seen = set()
            for v in deletion_variants(s, max_dist):
                for w in nb.get(v, ()):
                    if w not in seen:
                        seen.add(w)
                        qs.append(s)
                        cands.append(w)
                        row_of.append(r)
        best = [None] * len(vals)
        bestd = np.full(len(vals), np.iinfo(np.int64).max, np.int64)
        if qs:
            d = levenshtein_batch(qs, cands)
            for r, w, dd in zip(row_of, cands, d):
                if dd <= max_dist and (dd < bestd[r] or
                                       (dd == bestd[r] and w < best[r])):
                    bestd[r] = dd
                    best[r] = w
        out_d = np.where(bestd == np.iinfo(np.int64).max, -1, bestd)
        return t.append_column(
            f"{col}_match", pa.array(best, pa.string()),
        ).append_column(f"{col}_match_dist", pa.array(out_d, pa.int64()))

    return ds.map_batches(match, batch_format="pyarrow")
