"""Corpus-level deduplication operators (beyond-reference, driver brief).

All follow the shuffle-frugal shape from the Ray guide: per-batch vectorized
signature computation → narrow exchange on (band, hash) or bucket keys →
per-group pair emission → pair-level verification. Document payloads never
ride through the shuffle — only ids + signatures/hash sets. Since round 2
every stage is fully distributed: candidate pairs come from ONE
hash-partitioned grouped exchange (``_bucket_pairs_grouped`` — occupancy
prune, saturation cap and cross-product inside the partition function),
pair lists are deduped with grouped aggregates, and set fetches are
Dataset joins — never driver-side ``take_all`` materialization.

- exact:        md5(content) hash-partition, keep min id (D1 corpus analog)
- MinHash+LSH:  word-shingle MinHash, banded LSH buckets, signature-estimated
                Jaccard verify (Broder 1997 / MMDS ch.3)
- MinHash+LSH (exact-verified): LSH candidates verified with EXACT hashed
                word-set Jaccard via distributed joins — the oracle-checkable
                variant (every true pair ≥ threshold is found given the
                band recall; band config chosen so miss prob ≪ 1e-9)
- SimHash:      64-bit SimHash, prefix-bucketed (1..4 rotated tables),
                Hamming-distance verify (Charikar 2002)
- n-gram Jaccard: exact character-n-gram Jaccard verification for a
                candidate pair list (broadcast small side)
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min

from ..functions.dedupfn import (
    jaccard,
    lsh_bands,
    minhash_signature,
    ngram_set,
    shingles,
    simhash64,
)
from ..ops.joins import adaptive_partitions, hash_join, semi_join


def _empty_pairs(third: str = "est_jaccard", typ: pa.DataType = pa.float64()) -> "rd.Dataset":
    return rd.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                  third: pa.array([], typ)})
    )


def latest_by_url(
    pages: "rd.Dataset",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    strategy: str = "aggregate",
    num_partitions: int = None,
) -> "rd.Dataset":
    """Crawl-ingest dedup: one row per url, the LATEST capture wins
    (ties break deterministically on the larger payload, then payload
    md5; byte-identical same-timestamp captures are interchangeable and
    collapse to one row's worth of semantics).

    Re-crawled Common-Crawl-style corpora carry the same url many times;
    this is the canonical first shuffle before extraction. Default
    ``aggregate`` strategy is the 100 TB shape: a per-row packed rank key
    (ts|size|md5), a NARROW grouped max (urls + 60-byte keys only — the
    payload never rides the aggregate), then a distributed semi-join back
    to fetch the winning rows. No per-url pandas groups (billions of
    1–2-row groups pay per-group overhead that dwarfs the work —
    round-1 verdict finding #5). ``strategy="groups"`` keeps the
    original per-group path for comparison tests.
    """
    if strategy == "groups":
        def take_latest(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values(ts_col, kind="mergesort")
            return g.tail(1)

        return pages.groupby(url_col).map_groups(take_latest, batch_format="pandas")

    def add_rank(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        payloads = t[payload_col].to_pylist() if payload_col in t.schema.names else [b""] * len(t)
        keys = [
            f"{int(ts):020d}|{len(p or b''):012d}|{hashlib.md5(p or b'').hexdigest()}"
            for ts, p in zip(ts_us, payloads)
        ]
        return t.append_column("_rank", pa.array(keys, pa.string()))

    ranked = pages.map_batches(add_rank, batch_format="pyarrow")
    winners = (
        ranked.select_columns([url_col, "_rank"])
        .groupby(url_col)
        .aggregate(Max("_rank", alias_name="_rank"))
    )
    # winners' schema is known — probing schema() would run the whole
    # aggregate once before the join runs it again
    rsch = ranked.schema()
    rsch = getattr(rsch, "base_schema", rsch)
    w_schema = pa.schema([rsch.field(url_col), pa.field("_rank", pa.string())])
    # num_partitions: cores by default (right at cluster scale); on one
    # box payload-heavy exchanges peak at fewer partitions (1M-url bench:
    # 23.5 s @8 vs 31.8 s @32 — see BASELINE.md)
    out = semi_join(ranked, winners, on=[url_col, "_rank"],
                    num_partitions=num_partitions, right_schema=w_schema)
    return out.map_batches(lambda t: t.drop_columns(["_rank"]), batch_format="pyarrow")


def latest_by_url_parquet(
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    columns: List[str] = None,
    **read_kwargs,
) -> "rd.Dataset":
    """Parquet-backed two-pass ``latest_by_url`` (round-2 verdict item
    #5): the payload never enters ANY exchange.

    Pass 1 scans ONLY (url, ts) plus the source file path and computes
    each url's winning ``ts|path`` with one narrow grouped max — at
    100 TB the payload bytes never leave storage for this pass
    (``read_parquet(columns=[url, ts])`` prunes at the row-group
    level). Pass 2 hash-partitions the winner MANIFEST by file path
    (still narrow: url + int64 + path string per row) and each group
    task re-reads just its own file with a predicate-pushed
    ``url ∈ winners`` filter, keeping rows whose (url, ts) match the
    manifest and collapsing same-file ties to the first occurrence.
    So the payload is read exactly once, only where it already lives —
    the shape a multi-node cluster wants, since pass-2 tasks can be
    scheduled next to the shards they re-read.

    Output equals the one-pass strategies whenever (url, max ts) is
    unique — the overwhelmingly common case. On exact same-timestamp
    ties the winner is broken by (file path, first occurrence) instead
    of (payload size, md5): equally deterministic, and consistent with
    the documented "byte-identical same-ts captures are
    interchangeable" semantics (asserted in tests on a tie fixture).
    """
    import pyarrow.dataset as pads

    narrow = rd.read_parquet(path, columns=[url_col, ts_col],
                             include_paths=True, **read_kwargs)

    # bias to unsigned before zero-padding: f"{ts:020d}" inverts the
    # lexicographic order for NEGATIVE (pre-epoch / corrupt) timestamps
    # ('-…500' > '-…100'), which would silently crown the OLDEST capture
    ts_bias = 1 << 63

    def add_rank(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        keys = [f"{int(ts) + ts_bias:020d}|{p}"
                for ts, p in zip(ts_us, t["path"].to_pylist())]
        return pa.table({url_col: t[url_col],
                         "_rank": pa.array(keys, pa.string())})

    winners = (
        narrow.map_batches(add_rank, batch_format="pyarrow")
        .groupby(url_col)
        .aggregate(Max("_rank", alias_name="_rank"))
    )

    def split_rank(t: pa.Table) -> pa.Table:
        ranks = t["_rank"].to_pylist()
        return pa.table({
            url_col: t[url_col],
            "_win_ts": pa.array([int(r[:20]) - ts_bias for r in ranks],
                                pa.int64()),
            "_path": pa.array([r[21:] for r in ranks], pa.string()),
        })

    manifest = winners.map_batches(split_rank, batch_format="pyarrow")

    # the winner match needs url+ts regardless of the caller's
    # projection — union them into the re-read, trim afterwards
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys(list(columns) + [url_col, ts_col]))

    def fetch_file(g: pa.Table) -> pa.Table:
        fpath = g["_path"][0].as_py()
        urls = g[url_col].to_pylist()
        want = set(zip(urls, g["_win_ts"].to_pylist()))
        tbl = pads.dataset(fpath).to_table(
            columns=read_cols,
            filter=pads.field(url_col).isin(urls),
        )
        ts_us = pc.cast(tbl[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep, seen = [], set()
        for i, (u, ts) in enumerate(zip(tbl[url_col].to_pylist(), ts_us)):
            if (u, int(ts)) in want and u not in seen:
                keep.append(i)
                seen.add(u)
        out = tbl.take(keep)
        return out.select(columns) if columns is not None else out

    return manifest.groupby("_path").map_groups(
        fetch_file, batch_format="pyarrow")


def exact_dedup(ds: "rd.Dataset", id_col: str, text_col: str) -> "rd.Dataset":
    """(h, keep_id, dup_count) per distinct content hash."""

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t[text_col].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()), id_col: t[id_col]})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name="keep_id"), Count(alias_name="dup_count"))
    )


_PACK_PRIME = np.uint64(0x9E3779B97F4A7C15)


def _packed_keys(t: pa.Table, key_cols: List[str]) -> np.ndarray:
    """Multi-column key → one uint64 (wrapping polynomial hash). Used only
    for MEMBERSHIP tests: a collision can merge two keys in the test set
    (keeps a few extra rows for the verified pair stage — harmless), never
    drop a true member."""
    with np.errstate(over="ignore"):
        acc = np.zeros(len(t), dtype=np.uint64)
        for c in key_cols:
            acc = acc * _PACK_PRIME + t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
    return acc


def _bucket_pairs_grouped(
    banded: "rd.Dataset",
    key_cols: List[str],
    id_col: str,
    payload_cols: List[str],
    n_rows: int,
    max_bucket: int = 0,
) -> "rd.Dataset":
    """Within-bucket unordered pairs in ONE exchange: hash-partition by a
    packed bucket key, then process each partition-group vectorized.

    Evolution of the pair stage (each step measured on the sf0.1
    battery): per-bucket pandas ``map_groups`` (~1 ms × tens of
    thousands of tiny buckets, 17 s) → occupancy prune + armored hash
    SELF-JOIN (3 all-to-alls: count groupby, join, pair dedupe; ~7 s)
    → THIS: the occupancy prune, saturation cap and cross-product all
    happen inside one partition-group function, so the only exchanges
    left are the partition groupby here and the cross-band pair dedupe
    downstream — no Acero join, no armor, no hot-key broadcast.

    Partition key = packed bucket hash mod P (P sized to the data): a
    bucket lands wholly in one group, groups are hash-balanced, and a
    pack collision merely co-locates two buckets (runs are re-split on
    the TRUE key columns, so no false pairs and no lost buckets).
    Within a group: one lexsort, run-length bucket detection, then
    ``np.triu_indices`` per multi-member run — single-member buckets
    (the overwhelming majority) cost one vectorized comparison, and
    runs longer than ``max_bucket`` (template-family candidate storms,
    see minhash_pairs_exact_verified) are dropped wholesale. Output:
    ``id_a < id_b`` plus ``<payload>_a`` / ``<payload>_b`` columns.
    """
    npart = adaptive_partitions(n_rows)

    def add_pkey(t: pa.Table) -> pa.Table:
        pk = (_packed_keys(t, key_cols) % np.uint64(npart)).astype(np.int64)
        return t.append_column("_pkey", pa.array(pk, pa.int64()))

    def emit_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
        order = np.lexsort(tuple(reversed(keys))) if n else np.array([], np.int64)
        ts = t.take(pa.array(order, pa.int64()))
        ii = np.array([], np.int64)
        jj = np.array([], np.int64)
        if n:
            change = np.zeros(n, bool)
            change[0] = True
            for c in key_cols:
                k = ts[c].to_numpy(zero_copy_only=False)
                change[1:] |= k[1:] != k[:-1]
            starts = np.flatnonzero(change)
            lens = np.append(starts[1:], n) - starts
            sel = lens >= 2
            if max_bucket:
                sel &= lens <= max_bucket
            if sel.any():
                part_i, part_j = [], []
                for s, ln in zip(starts[sel], lens[sel]):
                    i, j = np.triu_indices(int(ln), 1)
                    part_i.append(s + i)
                    part_j.append(s + j)
                ii = np.concatenate(part_i)
                jj = np.concatenate(part_j)
        ia = pa.array(ii, pa.int64())
        ja = pa.array(jj, pa.int64())
        id_i, id_j = ts[id_col].take(ia), ts[id_col].take(ja)
        keep = pc.not_equal(id_i, id_j)  # duplicate input ids: no self-pairs
        swap = pc.greater(id_i, id_j)
        cols = {
            "id_a": pc.if_else(swap, id_j, id_i).filter(keep),
            "id_b": pc.if_else(swap, id_i, id_j).filter(keep),
        }
        for c in payload_cols:
            p_i, p_j = ts[c].take(ia), ts[c].take(ja)
            cols[f"{c}_a"] = pc.if_else(swap, p_j, p_i).filter(keep)
            cols[f"{c}_b"] = pc.if_else(swap, p_i, p_j).filter(keep)
        return pa.table(cols)

    return (
        banded.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )


def _dedupe_pairs(pairs: "rd.Dataset", value_col: str, keep: str = "min") -> "rd.Dataset":
    """One row per (id_a, id_b): a pair can surface in several bands/tables.

    Distributed grouped aggregate (round-1 verdict finding #2 replaced the
    driver-side pandas concat) — the exchange carries only id pairs."""
    agg = Min(value_col, alias_name=value_col) if keep == "min" else Max(value_col, alias_name=value_col)
    return pairs.groupby(["id_a", "id_b"]).aggregate(agg)


def minhash_lsh_pairs(
    ds: "rd.Dataset",
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> "rd.Dataset":
    """Near-duplicate pairs (id_a < id_b, est_jaccard ≥ threshold).

    Stage 1 (map): shingle → MinHash sig → band hashes; emit one row per
    (band_id, band_hash) carrying the signature bytes.
    Stage 2 (shuffle): groupby band bucket; within-bucket pairwise
    signature-estimated Jaccard (buckets are tiny for honest data).
    Stage 3 (shuffle): grouped min-aggregate dedupes pairs discovered in
    multiple bands — fully distributed.
    """

    def sig_rows(t: pa.Table) -> pa.Table:
        ids, bands_id, bands_hash, sigs = [], [], [], []
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            sig = minhash_signature(shingles(text or "", shingle_k), num_perm)
            for b, bh in enumerate(lsh_bands(sig, num_bands)):
                ids.append(did)
                bands_id.append(b)
                bands_hash.append(bh)
                sigs.append(sig.tobytes())
        return pa.table(
            {
                "band_id": pa.array(bands_id, pa.int64()),
                "band_hash": pa.array(bands_hash, pa.int64()),
                id_col: pa.array(ids),
                "sig": pa.array(sigs, pa.binary()),
            }
        )

    # Signatures are ~1% of document size → materializing them is the
    # documented small-intermediate exception: it lets the occupancy
    # pre-pass and the pair stage share one computation instead of
    # re-shingling the corpus twice.
    banded = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()
    n_banded = banded.count()
    cand = _bucket_pairs_grouped(banded, ["band_id", "band_hash"], id_col,
                                 ["sig"], n_rows=n_banded)

    def est(t: pa.Table) -> pa.Table:
        sa = np.frombuffer(b"".join(t["sig_a"].to_pylist()), dtype=np.uint64)
        sb = np.frombuffer(b"".join(t["sig_b"].to_pylist()), dtype=np.uint64)
        eq = (sa.reshape(-1, num_perm) == sb.reshape(-1, num_perm)).mean(axis=1)
        out = pa.table({
            "id_a": t["id_a"], "id_b": t["id_b"],
            "est_jaccard": pa.array(eq, pa.float64()),
        })
        return out.filter(pc.greater_equal(out["est_jaccard"], threshold))

    pairs = cand.map_batches(est, batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        return _empty_pairs("est_jaccard")
    return _dedupe_pairs(pairs, "est_jaccard", keep="min")


def _shingle_set_batch(t: pa.Table, id_col: str, text_col: str,
                       shingle_k: int) -> pa.Table:
    """(doc_id, ws) rows: each document's word-shingle set as sorted
    uint64 hashes serialized to binary — Acero joins don't carry
    list-typed payload columns, bytes round-trip zero-copy. Empty /
    whitespace-only docs drop (they'd all collide into one catastrophic
    LSH bucket; they're exact-dedup's job)."""
    ids, sets = [], []
    for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
        ws = shingles(text or "", shingle_k)
        if not ws:
            continue
        ids.append(did)
        sets.append(np.sort(
            np.fromiter(ws, dtype=np.uint64, count=len(ws))).tobytes())
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "ws": pa.array(sets, pa.binary()),
    })


def _band_batch(t: pa.Table, num_perm: int, num_bands: int) -> pa.Table:
    """(doc_id, ws) → one (band_id, band_hash, doc_id) row per LSH band."""
    ids, bands_id, bands_hash = [], [], []
    for did, ws in zip(t["doc_id"].to_pylist(), t["ws"].to_pylist()):
        sig = minhash_signature(np.frombuffer(ws, dtype=np.uint64), num_perm)
        for b, bh in enumerate(lsh_bands(sig, num_bands)):
            ids.append(did)
            bands_id.append(b)
            bands_hash.append(bh)
    return pa.table({
        "band_id": pa.array(bands_id, pa.int64()),
        "band_hash": pa.array(bands_hash, pa.int64()),
        "doc_id": pa.array(ids, pa.int64()),
    })


def minhash_pairs_exact_verified(
    ds: "rd.Dataset",
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    max_bucket: int = 1024,
    verify_driver_bound: int = 100_000,
) -> "rd.Dataset":
    """(id_a, id_b, jaccard): LSH candidates verified with EXACT
    word-shingle-set Jaccard — the oracle-checkable near-dup operator.

    Word k-shingles (k=3 default) make the verified measure expressible
    in SQL (list_intersect over a list_transform of the split words)
    while keeping cross-document similarity low — unigram sets saturate
    on shared vocabulary (measured ~0.65 median pairwise on the fixture
    corpus, which makes "near-dup" degenerate and candidate sets
    quadratic); order-sensitive shingles don't. Band config r=4/b=32
    (128 perms) puts pair recall at 1-(1-j⁴)^32 ≈ 1-5e-8 for j=0.8
    while keeping template-universal shingle minima from saturating
    buckets (r=2 produced C(1800,2) candidate storms on the fixture's
    template families — see ``max_bucket``); the oracle gate confirms
    zero misses on the fixture corpus.

    Fully distributed beyond ``verify_driver_bound`` candidate rows: the
    hashed word-set table (id → sorted uint64 hashes, ~15-20% of corpus
    bytes, spills to the object store at scale) is materialized ONCE and
    shared by the banding pass and both sides of the verification joins;
    candidate pairs fetch their sets via two hash joins, never via a
    driver-side text map. Empty/whitespace-only docs are excluded up
    front (they all collide into one catastrophic LSH bucket, and empty
    docs are exact-dedup's job, not near-dup's). WITHIN the bound, the
    round-5 driver tier applies: candidates dedupe via one np.unique on
    packed pairs, the needed shingle sets stream back through ONE
    ``is_in``-filtered map (a bounded collect — candidate ids ≤
    2·bound), and verification runs vectorized on the driver — the
    dedupe aggregate and both joins (three exchange spin-ups) vanish.
    Both tiers asserted identical in tests at a forced-zero bound.
    """

    sets = ds.map_batches(
        lambda t: _shingle_set_batch(t, id_col, text_col, shingle_k),
        batch_format="pyarrow").materialize()
    banded = sets.map_batches(
        lambda t: _band_batch(t, num_perm, num_bands),
        batch_format="pyarrow").materialize()
    n_banded = banded.count()
    cand = _bucket_pairs_grouped(banded, ["band_id", "band_hash"], "doc_id",
                                 [], n_rows=n_banded, max_bucket=max_bucket)
    cand = cand.map_batches(
        lambda t: t.append_column("_one", pa.array([1] * len(t), pa.int8())),
        batch_format="pyarrow",
    ).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return _empty_pairs("jaccard")

    if n_cand <= verify_driver_bound:
        a_l, b_l = [], []
        for t in cand.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
            a_l.append(np.asarray(t["id_a"], np.int64))
            b_l.append(np.asarray(t["id_b"], np.int64))
        aa = np.concatenate(a_l)
        bb = np.concatenate(b_l)
        # dedupe via packed unique (ids are int64; pack through a
        # stable factorize so arbitrary id ranges stay exact)
        both = np.concatenate([aa, bb])
        uids, codes = np.unique(both, return_inverse=True)
        ca, cb = codes[: len(aa)], codes[len(aa):]
        upk = np.unique(ca.astype(np.int64) * len(uids) + cb)
        ca, cb = upk // len(uids), upk % len(uids)
        need = pa.array(uids, pa.int64())
        lut: dict = {}
        fetched = sets.map_batches(
            lambda t: t.filter(pc.is_in(t["doc_id"], value_set=need)),
            batch_format="pyarrow")
        for t in fetched.iter_batches(batch_size=4096,
                                      batch_format="pyarrow"):
            for did, ws in zip(t["doc_id"].to_pylist(),
                               t["ws"].to_pylist()):
                lut[did] = np.frombuffer(ws, dtype=np.uint64)
        out_a, out_b, out_j = [], [], []
        for i, j in zip(uids[ca], uids[cb]):
            wa, wb = lut.get(int(i)), lut.get(int(j))
            if wa is None or wb is None:
                continue
            inter = len(np.intersect1d(wa, wb, assume_unique=True))
            jac = inter / (len(wa) + len(wb) - inter)
            if jac >= threshold:
                out_a.append(int(i))
                out_b.append(int(j))
                out_j.append(round(jac, 6))
        return rd.from_arrow(pa.table({
            "id_a": pa.array(out_a, pa.int64()),
            "id_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }))

    cand = _dedupe_pairs(cand, "_one").map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )

    sets_a = sets.map_batches(
        lambda t: pa.table({"id_a": t["doc_id"], "ws_a": t["ws"]}), batch_format="pyarrow"
    )
    sets_b = sets.map_batches(
        lambda t: pa.table({"id_b": t["doc_id"], "ws_b": t["ws"]}), batch_format="pyarrow"
    )
    npart = adaptive_partitions(sets.count())
    # explicit schemas: cand's lineage holds sort-aggregates — letting the
    # join armor probe schema() would execute that chain a second time
    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    j1 = hash_join(cand, sets_a, on="id_a", num_partitions=npart,
                   left_schema=pair_schema,
                   right_schema=pa.schema([("id_a", pa.int64()), ("ws_a", pa.binary())]))
    joined = hash_join(j1, sets_b, on="id_b", num_partitions=npart,
                       left_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                                              ("ws_a", pa.binary())]),
                       right_schema=pa.schema([("id_b", pa.int64()), ("ws_b", pa.binary())]))

    def verify(t: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b, wa, wb in zip(
            t["id_a"].to_pylist(), t["id_b"].to_pylist(),
            t["ws_a"].to_pylist(), t["ws_b"].to_pylist(),
        ):
            aa = np.frombuffer(wa, dtype=np.uint64)
            bb = np.frombuffer(wb, dtype=np.uint64)
            inter = len(np.intersect1d(aa, bb, assume_unique=True))
            j = inter / (len(aa) + len(bb) - inter)
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 6))
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64()),
             "jaccard": pa.array(out_j, pa.float64())}
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def _rot64(h: int, r: int) -> int:
    u = h & ((1 << 64) - 1)
    return ((u << r) | (u >> (64 - r))) & ((1 << 64) - 1) if r else u


def simhash_pairs(
    ds: "rd.Dataset",
    id_col: str,
    text_col: str,
    prefix_bits: int = 16,
    max_hamming: int = 3,
    n_tables: int = 1,
    verify_multiset: bool = False,
) -> "rd.Dataset":
    """Near-duplicate pairs by SimHash: bucket on the top prefix bits,
    verify full 64-bit Hamming distance within buckets.

    ``n_tables`` rotated tables (each rotates the fingerprint by
    ``64/n_tables`` bits before taking the prefix) recover pairs whose
    differing bits fall inside one table's prefix — the standard recall
    fix for prefix bucketing; pairs found in several tables are deduped
    by a distributed grouped min (never on the driver). ``n_tables=1``
    keeps the round-1 single-table behavior (documented recall caveat).

    ``verify_multiset=True`` additionally requires the two docs' word
    MULTISETS to be identical (a 64-bit fingerprint of the sorted word
    list rides the shuffle): simhash-accelerated exact order-insensitive
    dedup — the oracle-checkable variant, since SimHash itself cannot
    distinguish count-±1 multisets (sign sums may not flip any bit).
    """
    rot_step = 64 // max(1, n_tables)

    def sh_rows(t: pa.Table) -> pa.Table:
        from ..functions.quality import fnv1a64

        ids, hs, buckets, tables, mkeys = [], [], [], [], []
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            h = simhash64(text or "")
            mk = fnv1a64("\n".join(sorted((text or "").lower().split())).encode("utf-8"))
            for tab in range(n_tables):
                r = _rot64(h, tab * rot_step)
                ids.append(did)
                hs.append(h)
                tables.append(tab)
                buckets.append((r >> (64 - prefix_bits)) & ((1 << prefix_bits) - 1))
                mkeys.append(mk & ((1 << 62) - 1))
        return pa.table(
            {
                "table_id": pa.array(tables, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                id_col: pa.array(ids),
                "simhash": pa.array(hs, pa.int64()),
                "mkey": pa.array(mkeys, pa.int64()),
            }
        )

    bucketed = ds.map_batches(sh_rows, batch_format="pyarrow").materialize()
    n_bucketed = bucketed.count()
    cand = _bucket_pairs_grouped(
        bucketed, ["table_id", "bucket"], id_col,
        ["simhash", "mkey"], n_rows=n_bucketed)

    def verify(t: pa.Table) -> pa.Table:
        ha = t["simhash_a"].to_numpy(zero_copy_only=False).view(np.uint64)
        hb = t["simhash_b"].to_numpy(zero_copy_only=False).view(np.uint64)
        x = np.bitwise_xor(ha, hb)
        # vectorized 64-bit popcount: unpack each xor word's bytes to bits
        ham = (np.unpackbits(x.view(np.uint8)).reshape(-1, 64).sum(axis=1)
               if len(t) else np.array([], dtype=np.int64))
        mask = ham <= max_hamming
        if verify_multiset:
            mka = t["mkey_a"].to_numpy(zero_copy_only=False)
            mkb = t["mkey_b"].to_numpy(zero_copy_only=False)
            mask &= mka == mkb
        out = pa.table({
            "id_a": t["id_a"], "id_b": t["id_b"],
            "hamming": pa.array(ham.astype(np.int64), pa.int64()),
        })
        return out.filter(pa.array(mask))

    pairs = cand.map_batches(verify, batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        return _empty_pairs("hamming", pa.int64())
    return _dedupe_pairs(pairs, "hamming", keep="min")


def cluster_pairs(
    pairs: "rd.Dataset",
    max_rounds: int = 10,
    driver_threshold: int = 100_000,
) -> "rd.Dataset":
    """Near-dup pairs → connected components: (doc_id, cluster_id).

    cluster_id = min doc_id reachable through the pair graph. Small pair
    sets (the common case after LSH pruning — ≤ ``driver_threshold``
    edges) use driver-side union-find; larger sets run distributed
    min-label propagation (guide §agg), join-free: each round is one
    message-passing groupby (per node, forward the min label to all
    neighbors) plus a tiny min-aggregate, stopping when the label sum is
    unchanged (labels decrease monotonically) or after ``max_rounds``
    (≥ graph diameter in practice).
    """

    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
        )
    if n_pairs <= driver_threshold:
        # union-find on the driver — candidate sets are provably pruned
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra

        nodes = set()
        for batch in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
                nodes.add(a)
                nodes.add(b)
                union(a, b)
        ids = sorted(nodes)
        # infer the id type (int64 ids stay int64; STRING entities —
        # e.g. fuzzy_pairs names — cluster unchanged: union-find and
        # min-label are pure comparisons)
        arr = pa.array(ids)
        return rd.from_arrow(
            pa.table({"doc_id": arr,
                      "cluster_id": pa.array([find(i) for i in ids],
                                             arr.type)})
        )

    # distributed min-label propagation, join-free: each round is a
    # message-passing groupby — label rows and edge rows union into one
    # keyed stream; per node, the group's min label is forwarded to every
    # neighbor; a second tiny groupby keeps the per-node min.
    edges = pairs.map_batches(
        lambda t: pa.concat_tables([
            pa.table({"node": t["id_a"], "dst": t["id_b"]}),
            pa.table({"node": t["id_b"], "dst": t["id_a"]}),
        ]),
        batch_format="pyarrow",
    ).materialize()
    labels = edges.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["node"]}),
        batch_format="pyarrow",
    ).groupby("doc_id").aggregate(Min("cluster_id", alias_name="cluster_id")).materialize()
    prev_sum = labels.sum("cluster_id")
    NULL = -1
    for _ in range(max_rounds):
        label_rows = labels.map_batches(
            lambda t: pa.table({"node": t["doc_id"],
                                "dst": pa.array([NULL] * len(t), pa.int64()),
                                "lbl": t["cluster_id"]}),
            batch_format="pyarrow",
        )
        edge_rows = edges.map_batches(
            lambda t: pa.table({"node": t["node"], "dst": t["dst"],
                                "lbl": pa.array([NULL] * len(t), pa.int64())}),
            batch_format="pyarrow",
        )

        def propagate(group: pd.DataFrame) -> pd.DataFrame:
            # partition-grouped (ops/grouping.py): one sort, then a
            # vectorized node-RUN walk — label rows (dst == NULL < any
            # node id) sort first in their run, so each run's label is
            # its first row; per-node pandas groups would pay ~1 ms ×
            # |nodes| per round
            g = group.sort_values(["node", "dst"], kind="mergesort")
            node = g["node"].to_numpy()
            dst = g["dst"].to_numpy()
            lbl = g["lbl"].to_numpy()
            change = np.zeros(len(g), bool)
            change[0] = True
            change[1:] = node[1:] != node[:-1]
            starts = np.flatnonzero(change)
            lens = np.append(starts[1:], len(g)) - starts
            run_lbl = np.where(dst[starts] == NULL, lbl[starts], node[starts])
            return pd.DataFrame({
                "doc_id": np.where(dst == NULL, node, dst),
                "cluster_id": np.repeat(run_lbl, lens),
            }).astype({"doc_id": "int64", "cluster_id": "int64"})

        from ..ops.grouping import partition_grouped

        u, pkey_cols = partition_grouped(label_rows.union(edge_rows), ["node"])
        msgs = u.groupby(pkey_cols).map_groups(propagate, batch_format="pandas")
        labels = msgs.groupby("doc_id").aggregate(
            Min("cluster_id", alias_name="cluster_id")
        ).materialize()
        # labels decrease monotonically → converged iff the sum is unchanged
        cur_sum = labels.sum("cluster_id")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def keep_list(clusters: "rd.Dataset") -> "rd.Dataset":
    """(cluster_id, keep_id, n_members): survivor = min doc_id per cluster."""
    return clusters.groupby("cluster_id").aggregate(
        Min("doc_id", alias_name="keep_id"),
        Count(alias_name="n_members"),
    )


def loser_ids(clusters: "rd.Dataset", keeps: "rd.Dataset") -> "rd.Dataset":
    """Cluster members that are NOT their cluster's survivor, as a Dataset.

    Distributed: clusters ⋈ keep-list on cluster_id, filter
    doc_id ≠ keep_id. At 100 TB the loser set is O(duplicated docs) —
    billions of ids — so it must stay a Dataset (round-1 verdict finding
    #3 replaced the driver-side Python set); drop losers from a corpus
    with ``ops.joins.anti_join(corpus, loser_ids(...), on=id_col)``.
    """
    n_members = clusters.count()
    if n_members == 0:
        # no clusters → no losers; an aggregate over an empty Dataset has
        # no derivable schema, which the join armor can't protect
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    agg_schema = pa.schema([("cluster_id", pa.int64()), ("keep_id", pa.int64()),
                            ("n_members", pa.int64())])
    joined = hash_join(clusters, keeps, on="cluster_id",
                       num_partitions=adaptive_partitions(n_members),
                       left_schema=pa.schema([("doc_id", pa.int64()),
                                              ("cluster_id", pa.int64())]),
                       right_schema=agg_schema)
    return joined.map_batches(
        lambda t: t.filter(pc.not_equal(t["doc_id"], t["keep_id"])).select(["doc_id"]),
        batch_format="pyarrow",
    )


def verify_pairs_ngram_jaccard(
    ds: "rd.Dataset",
    pairs: List[tuple],
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
) -> pa.Table:
    """Exact char-n-gram Jaccard for candidate pairs.

    The candidate id set is broadcast; texts are fetched by a semi-join
    filter (streaming), n-gram sets built once per needed doc, pairs
    verified on the driver (candidate lists are small by construction —
    LSH already pruned the corpus).
    """
    need = sorted({i for p in pairs for i in p[:2]})
    need_arr = pa.array(need)

    texts: dict = {}
    filtered = ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=need_arr)).select([id_col, text_col]),
        batch_format="pyarrow",
    )
    for batch in filtered.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            texts[did] = ngram_set(text or "", n)
    out_a, out_b, out_j = [], [], []
    for a, b, *_ in pairs:
        j = jaccard(texts.get(a, set()), texts.get(b, set()))
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(j, 6))
    return pa.table(
        {
            "id_a": pa.array(out_a, pa.int64()),
            "id_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


def build_minhash_index(
    ds: "rd.Dataset",
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    band_partitions: int = 32,
) -> str:
    """Persist a corpus's MinHash-LSH signature index as parquet — the
    artifact that makes near-dedup INCREMENTAL: once the existing
    corpus's index is on storage, each new crawl batch dedups against
    it via ``match_against_index`` without ever re-reading or
    re-shingling the old corpus (the near-dup analog of
    ``ops/bloom.incremental_new``'s exact-hash path).

    Layout (both tables narrow — ids, band keys and shingle-hash sets;
    never document payloads):

    - ``{index_dir}/sets``  — (doc_id, ws): sorted uint64 shingle
      hashes as binary, ~15-20% of corpus bytes (the verification side).
    - ``{index_dir}/bands`` — (band_id, band_hash, doc_id, bk): one row
      per LSH band, range-partitioned and SORTED by the packed bucket
      key ``bk`` via ``ops/rangesort.range_sorted_export`` (round-4
      verdict #6) — equal buckets are co-located in ONE file, so a
      probe routes its new band rows by the driver-held manifest and
      opens only the files holding probed buckets; the stored side is
      never re-grouped. Edges are cut ANALYTICALLY (``bk`` is a mixed
      62-bit hash, so uniform splits of [0, 2⁶²) balance without a
      quantile pass).
    - ``{index_dir}/bands_manifest.parquet`` — the range manifest
      (range_id, n_rows, key_min, key_max, path).

    The same (num_perm, num_bands, shingle_k) must be passed at match
    time; they are deliberately explicit rather than hidden in a
    sidecar so a cluster job's config is the single source of truth.
    """
    import os
    import shutil

    import pyarrow.parquet as pqt

    from ..ops.rangesort import range_sorted_export

    # idempotent (re)build: a killed prior attempt leaves partial
    # parquet dirs, and write_parquet APPENDS — rebuilding into the
    # same path would silently double the sets/bands rows. Callers
    # gate completed builds with their own marker (_minhash_index_dir's
    # _SUCCESS), so anything present here is partial by definition.
    for sub in ("sets", "bands", "bands_manifest.parquet"):
        p = os.path.join(index_dir, sub)
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)

    sets = ds.map_batches(
        lambda t: _shingle_set_batch(t, id_col, text_col, shingle_k),
        batch_format="pyarrow").materialize()
    sets.write_parquet(f"{index_dir}/sets")
    bands = sets.map_batches(
        lambda t: _band_batch(t, num_perm, num_bands),
        batch_format="pyarrow").map_batches(
        lambda t: _with_bucket_key(t, num_bands), batch_format="pyarrow")
    edges = [(i << 62) // band_partitions
             for i in range(1, band_partitions)]
    manifest = range_sorted_export(
        bands, "bk", f"{index_dir}/bands",
        partitions=band_partitions, edges=edges).take_all()
    cols = ["range_id", "n_rows", "key_min", "key_max", "path"]
    manifest.sort(key=lambda r: r["range_id"])
    pqt.write_table(
        pa.table({c: [r[c] for r in manifest] for c in cols}),
        f"{index_dir}/bands_manifest.parquet")
    return index_dir


def _with_bucket_key(t: pa.Table, num_bands: int) -> pa.Table:
    """Packed routing key for a band row: a deterministic 62-bit mix of
    (band_hash, band_id). Used ONLY to co-locate and route buckets —
    bucket equality is always re-tested on the exact columns, so a key
    collision merely puts two buckets in the same file."""
    with np.errstate(over="ignore"):
        bk = (t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
              * np.uint64(num_bands)
              + t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
              ) & np.uint64((1 << 62) - 1)
    return t.append_column("bk", pa.array(bk.astype(np.int64), pa.int64()))


def _empty_match() -> "rd.Dataset":
    return rd.from_arrow(pa.table({
        "new_id": pa.array([], pa.int64()),
        "old_id": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    }))


def match_against_index(
    new_ds: "rd.Dataset",
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    max_bucket: int = 1024,
    verify_driver_bound: int = 100_000,
) -> "rd.Dataset":
    """(new_id, old_id, jaccard): incoming documents that near-duplicate
    a corpus INDEXED by ``build_minhash_index`` — exact word-shingle
    Jaccard ≥ ``threshold``, candidates from banded LSH with the same
    recall bound as ``minhash_pairs_exact_verified``.

    The incremental production shape: only the NEW batch is shingled;
    the old corpus contributes its stored band rows (candidate join
    side) and stored shingle sets (verification side), both read pruned
    from parquet. Candidates come from the SORTED band layout (round-4
    verdict #6): new band rows route by the driver-held range manifest
    (rows whose bucket key falls between stored ranges are dropped —
    no stored bucket can match), ONE increment-sized grouped exchange
    co-locates them per range, and each range task opens exactly its
    one stored file, prunes it to the probed bucket keys, and emits
    new×old cross pairs with the same ``max_bucket`` storm cap as the
    in-session path (both sides count). The stored side is never
    re-grouped and never rides an exchange. Then one narrow pair
    dedupe and two verification joins fetching shingle sets by id.
    Payloads never shuffle; the old corpus text is never re-read.
    (Indexes written before the sorted layout existed fall back to the
    tagged-union exchange over the flat band table.)
    """
    import os

    new_sets = new_ds.map_batches(
        lambda t: _shingle_set_batch(t, id_col, text_col, shingle_k),
        batch_format="pyarrow").materialize()
    new_bands = new_sets.map_batches(
        lambda t: _band_batch(t, num_perm, num_bands),
        batch_format="pyarrow")
    n_new = new_sets.count()

    man_path = f"{index_dir}/bands_manifest.parquet"
    if os.path.exists(man_path):
        cand = _probe_sorted_bands(
            new_bands.map_batches(
                lambda t: _with_bucket_key(t, num_bands),
                batch_format="pyarrow"),
            man_path, max_bucket).materialize()
    else:  # legacy flat layout: tagged-union exchange
        def tag(side: int):
            def f(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "_side", pa.array(np.full(t.num_rows, side, np.int8)))
            return f

        old_bands = rd.read_parquet(
            f"{index_dir}/bands",
            columns=["band_id", "band_hash", "doc_id"],
        ).map_batches(tag(0), batch_format="pyarrow")
        old_rows = rd.read_parquet(f"{index_dir}/bands").count()
        union = old_bands.union(
            new_bands.map_batches(tag(1), batch_format="pyarrow"))
        cand = _cross_bucket_pairs_grouped(
            union, ["band_id", "band_hash"], "doc_id", "_side",
            n_rows=old_rows + n_new * num_bands, max_bucket=max_bucket,
        ).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return _empty_match()

    if n_cand <= verify_driver_bound:
        # bounded driver-verify tier (the minhash_pairs_exact_verified
        # rule): dedupe via np.unique on factorized packed pairs, fetch
        # the two bounded set groups through is_in-filtered streaming
        # maps, verify vectorized — the dedupe aggregate and both
        # verification joins (three exchange spin-ups) vanish. The join
        # path below is unchanged beyond the bound; tiers asserted
        # identical in tests.
        nn_l, oo_l = [], []
        for t in cand.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
            nn_l.append(np.asarray(t["new_id"], np.int64))
            oo_l.append(np.asarray(t["old_id"], np.int64))
        nn = np.concatenate(nn_l)
        oo = np.concatenate(oo_l)
        un, cn = np.unique(nn, return_inverse=True)
        uo, co = np.unique(oo, return_inverse=True)
        upk = np.unique(cn.astype(np.int64) * len(uo) + co)
        cn, co = upk // len(uo), upk % len(uo)

        def fetch(src: "rd.Dataset", ids: np.ndarray) -> dict:
            need = pa.array(ids, pa.int64())
            lut: dict = {}
            filt = src.map_batches(
                lambda t: t.filter(pc.is_in(t["doc_id"], value_set=need)),
                batch_format="pyarrow")
            for t in filt.iter_batches(batch_size=4096,
                                       batch_format="pyarrow"):
                for did, ws in zip(t["doc_id"].to_pylist(),
                                   t["ws"].to_pylist()):
                    lut[did] = np.frombuffer(ws, dtype=np.uint64)
            return lut

        lut_n = fetch(new_sets, un)
        lut_o = fetch(
            rd.read_parquet(f"{index_dir}/sets", columns=["doc_id", "ws"]),
            uo)
        out_n, out_o, out_j = [], [], []
        for nid, oid in zip(un[cn], uo[co]):
            wn, wo = lut_n.get(int(nid)), lut_o.get(int(oid))
            if wn is None or wo is None:
                continue
            inter = len(np.intersect1d(wn, wo, assume_unique=True))
            j = inter / (len(wn) + len(wo) - inter)
            if j >= threshold:
                out_n.append(int(nid))
                out_o.append(int(oid))
                out_j.append(round(j, 6))
        return rd.from_arrow(pa.table({
            "new_id": pa.array(out_n, pa.int64()),
            "old_id": pa.array(out_o, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }))

    cand = cand.map_batches(
        lambda t: t.append_column("_one", pa.array([1] * len(t), pa.int8())),
        batch_format="pyarrow")
    cand = (cand.groupby(["new_id", "old_id"])
            .aggregate(Min("_one", alias_name="_one"))
            .map_batches(lambda t: t.select(["new_id", "old_id"]),
                         batch_format="pyarrow"))

    sets_n = new_sets.map_batches(
        lambda t: pa.table({"new_id": t["doc_id"], "ws_n": t["ws"]}),
        batch_format="pyarrow")
    sets_o = rd.read_parquet(f"{index_dir}/sets",
                             columns=["doc_id", "ws"]).map_batches(
        lambda t: pa.table({"old_id": t["doc_id"], "ws_o": t["ws"]}),
        batch_format="pyarrow")
    npart = adaptive_partitions(n_new)
    pair_schema = pa.schema([("new_id", pa.int64()), ("old_id", pa.int64())])
    j1 = hash_join(cand, sets_n, on="new_id", num_partitions=npart,
                   left_schema=pair_schema,
                   right_schema=pa.schema([("new_id", pa.int64()),
                                           ("ws_n", pa.binary())]))
    joined = hash_join(
        j1, sets_o, on="old_id", num_partitions=npart,
        left_schema=pa.schema([("new_id", pa.int64()),
                               ("old_id", pa.int64()),
                               ("ws_n", pa.binary())]),
        right_schema=pa.schema([("old_id", pa.int64()),
                                ("ws_o", pa.binary())]))

    def verify(t: pa.Table) -> pa.Table:
        out_n, out_o, out_j = [], [], []
        for nid, oid, wn, wo in zip(
            t["new_id"].to_pylist(), t["old_id"].to_pylist(),
            t["ws_n"].to_pylist(), t["ws_o"].to_pylist(),
        ):
            aa = np.frombuffer(wn, dtype=np.uint64)
            bb = np.frombuffer(wo, dtype=np.uint64)
            inter = len(np.intersect1d(aa, bb, assume_unique=True))
            j = inter / (len(aa) + len(bb) - inter)
            if j >= threshold:
                out_n.append(nid)
                out_o.append(oid)
                out_j.append(round(j, 6))
        return pa.table({
            "new_id": pa.array(out_n, pa.int64()),
            "old_id": pa.array(out_o, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow")


def _probe_sorted_bands(
    new_bands: "rd.Dataset",
    man_path: str,
    max_bucket: int,
) -> "rd.Dataset":
    """Candidate pairs against a SORTED stored band layout: route new
    band rows to their manifest range (driver-held p-row manifest,
    searchsorted on key_min — rows falling between stored ranges have
    no stored bucket and drop immediately), group the increment-sized
    routed rows per range, and let each range task open exactly ITS
    stored file, prune it with ``is_in`` on the probed bucket keys, and
    emit exact-bucket cross pairs. Exchange volume = routed new rows;
    the stored side streams from parquet pruned by file."""
    import pyarrow.parquet as pqt

    man = pqt.read_table(man_path)
    mins = np.array(man["key_min"].to_pylist(), np.int64)
    maxs = np.array(man["key_max"].to_pylist(), np.int64)
    paths = man["path"].to_pylist()

    def route(t: pa.Table) -> pa.Table:
        bk = t["bk"].to_numpy(zero_copy_only=False)
        rid = np.searchsorted(mins, bk, side="right") - 1
        ok = rid >= 0
        ok[ok] = bk[ok] <= maxs[rid[ok]]
        t = t.filter(pa.array(ok))
        return t.append_column("_rid", pa.array(rid[ok], pa.int64()))

    routed = new_bands.map_batches(route, batch_format="pyarrow")

    def probe(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"new_id": pa.array([], pa.int64()),
                             "old_id": pa.array([], pa.int64())})
        rid = int(g["_rid"][0].as_py())
        old = pqt.read_table(
            paths[rid], columns=["band_id", "band_hash", "doc_id", "bk"])
        keys = g["bk"].combine_chunks().unique() \
            if isinstance(g["bk"], pa.ChunkedArray) else g["bk"].unique()
        old = old.filter(pc.is_in(old["bk"], value_set=keys))
        both = pa.concat_tables([
            pa.table({
                "band_id": old["band_id"], "band_hash": old["band_hash"],
                "doc_id": old["doc_id"],
                "_side": pa.array(np.zeros(old.num_rows, np.int8)),
            }),
            pa.table({
                "band_id": g["band_id"], "band_hash": g["band_hash"],
                "doc_id": g["doc_id"],
                "_side": pa.array(np.ones(g.num_rows, np.int8)),
            }),
        ])
        return _cross_pairs_table(both, ["band_id", "band_hash"],
                                  "doc_id", "_side", max_bucket)

    return routed.groupby("_rid").map_groups(probe, batch_format="pyarrow")


def _cross_bucket_pairs_grouped(
    banded: "rd.Dataset",
    key_cols: List[str],
    id_col: str,
    side_col: str,
    n_rows: int,
    max_bucket: int = 0,
) -> "rd.Dataset":
    """Two-sided sibling of ``_bucket_pairs_grouped``: within each
    bucket run, emit the CROSS product of side-1 ids × side-0 ids as
    (new_id, old_id) — one partition-grouped exchange, runs longer than
    ``max_bucket`` dropped wholesale (the storm cap; both sides count
    toward the run length, so worst-case pair fan-out per run is
    bounded by max_bucket²/4)."""
    npart = adaptive_partitions(n_rows)

    def add_pkey(t: pa.Table) -> pa.Table:
        pk = (_packed_keys(t, key_cols) % np.uint64(npart)).astype(np.int64)
        return t.append_column("_pkey", pa.array(pk, pa.int64()))

    def emit_pairs(t: pa.Table) -> pa.Table:
        return _cross_pairs_table(t, key_cols, id_col, side_col, max_bucket)

    return (
        banded.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )


def _cross_pairs_table(
    t: pa.Table,
    key_cols: List[str],
    id_col: str,
    side_col: str,
    max_bucket: int,
) -> pa.Table:
    """Pure kernel shared by the union exchange and the sorted-layout
    probe: sort the tagged rows by bucket key, emit side-1 × side-0
    cross pairs per run, drop runs longer than ``max_bucket`` (the
    storm cap counts BOTH sides, so the two call paths keep the exact
    same candidate set)."""
    n = t.num_rows
    out_n, out_o = [], []
    if n:
        keys = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
        order = np.lexsort(tuple(reversed(keys)))
        ts = t.take(pa.array(order, pa.int64()))
        change = np.zeros(n, bool)
        change[0] = True
        for c in key_cols:
            k = ts[c].to_numpy(zero_copy_only=False)
            change[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        ids = ts[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sides = ts[side_col].to_numpy(zero_copy_only=False)
        for s, e in zip(starts, ends):
            if max_bucket and e - s > max_bucket:
                continue
            run_new = ids[s:e][sides[s:e] == 1]
            run_old = ids[s:e][sides[s:e] == 0]
            if not len(run_new) or not len(run_old):
                continue
            gn, go = np.meshgrid(run_new, run_old, indexing="ij")
            out_n.append(gn.ravel())
            out_o.append(go.ravel())
    if out_n:
        nn, oo = np.concatenate(out_n), np.concatenate(out_o)
    else:
        nn = oo = np.array([], np.int64)
    return pa.table({"new_id": pa.array(nn, pa.int64()),
                     "old_id": pa.array(oo, pa.int64())})
