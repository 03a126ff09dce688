"""Corpus-level deduplication operators (beyond-reference, driver brief).

All follow the shuffle-frugal shape from the Ray guide: per-batch vectorized
signature computation → narrow exchange on (band, hash) or bucket keys →
per-group pair emission → pair-level verification. Document payloads never
ride through the shuffle — only ids + signatures.

- exact:        md5(content) hash-partition, keep min id (D1 corpus analog)
- MinHash+LSH:  word-shingle MinHash, banded LSH buckets, signature-estimated
                Jaccard verify (Broder 1997 / MMDS ch.3)
- SimHash:      64-bit SimHash, prefix-bucketed, Hamming-distance verify
                (Charikar 2002)
- n-gram Jaccard: exact character-n-gram Jaccard verification for a
                candidate pair list (broadcast small side)
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..functions.dedupfn import (
    hamming64,
    jaccard,
    lsh_bands,
    minhash_signature,
    ngram_set,
    shingles,
    simhash64,
)


def latest_by_url(pages: "rd.Dataset", url_col: str = "url", ts_col: str = "warc_ts") -> "rd.Dataset":
    """Crawl-ingest dedup: one row per url, the LATEST capture wins
    (ties break deterministically on the larger payload, then row order).

    Re-crawled Common-Crawl-style corpora carry the same url many times;
    this is the canonical first shuffle before extraction — hash-partition
    on url, keep max ts per group. Enable when the input may contain
    re-crawls; skip for single-snapshot inputs (it is a full exchange).
    """

    def take_latest(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col, kind="mergesort")
        return g.tail(1)

    return pages.groupby(url_col).map_groups(take_latest, batch_format="pandas")


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


def _keep_multi_member_buckets(ds: "rd.Dataset", key_cols: List[str]):
    """Drop rows in single-member buckets before a per-bucket pair stage.

    Almost every LSH bucket has exactly one member; running map_groups over
    all of them pays per-group overhead N×bands times. One narrow groupby
    counts occupancy; buckets with ≥2 members (the candidate set — tiny for
    honest corpora) are broadcast and the rows filtered. Returns None when
    no bucket has ≥2 members.
    """
    counts = ds.groupby(key_cols).aggregate(Count(alias_name="n"))
    hot = counts.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["n"], 2)).select(key_cols),
        batch_format="pyarrow",
    )
    hot_keys = {tuple(r[c] for c in key_cols) for r in hot.take_all()}
    if not hot_keys:
        return None
    hot_ref = ray.put(hot_keys)

    def keep_hot(t: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        cols = [t[c].to_pylist() for c in key_cols]
        mask = [tup in keys for tup in zip(*cols)]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep_hot, batch_format="pyarrow")


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
    Stage 3 (shuffle): dedupe pairs discovered in multiple bands.
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
                "band_id": pa.array(bands_id, pa.int32()),
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
    banded = _keep_multi_member_buckets(banded, ["band_id", "band_hash"])
    if banded is None:
        return rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                      "est_jaccard": pa.array([], pa.float64())})
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []}).astype(
                {"id_a": "int64", "id_b": "int64", "est_jaccard": "float64"}
            )
        rows = group.sort_values(id_col, kind="mergesort")
        ids = rows[id_col].to_numpy()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in rows["sig"]])
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for off in np.nonzero(eq >= threshold)[0]:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + off]))
                out_j.append(float(eq[off]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": out_j})

    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(bucket_pairs, batch_format="pandas")
    # a pair can surface in several bands → keep one row per pair. The
    # candidate pair set is LSH-pruned (≪ corpus), so this dedup runs on
    # the driver instead of paying a third shuffle; if a pathological
    # corpus ever made pairs huge, swap back to
    # pairs.groupby(["id_a","id_b"]).aggregate(Min(...)).
    dfs = [b for b in pairs.iter_batches(batch_size=65536, batch_format="pandas")]
    if not dfs:
        return rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                      "est_jaccard": pa.array([], pa.float64())})
        )
    allp = pd.concat(dfs, ignore_index=True)
    dedup = allp.groupby(["id_a", "id_b"], as_index=False)["est_jaccard"].min()
    return rd.from_pandas(dedup)


def simhash_pairs(
    ds: "rd.Dataset",
    id_col: str,
    text_col: str,
    prefix_bits: int = 16,
    max_hamming: int = 3,
) -> "rd.Dataset":
    """Near-duplicate pairs by SimHash: bucket on the top prefix bits, verify
    full 64-bit Hamming distance within buckets.

    NOTE the standard recall caveat: a single prefix table misses pairs
    that differ inside the prefix; production uses 4 rotated tables. One
    table keeps the shuffle small and is documented engine behavior.
    """

    def sh_rows(t: pa.Table) -> pa.Table:
        ids, hs, buckets = [], [], []
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            h = simhash64(text or "")
            ids.append(did)
            hs.append(h)
            buckets.append((h >> (64 - prefix_bits)) & ((1 << prefix_bits) - 1))
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.int64()),
                id_col: pa.array(ids),
                "simhash": pa.array(hs, pa.int64()),
            }
        )

    bucketed = ds.map_batches(sh_rows, batch_format="pyarrow").materialize()
    bucketed = _keep_multi_member_buckets(bucketed, ["bucket"])
    if bucketed is None:
        return rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        rows = group.sort_values(id_col, kind="mergesort")
        ids = rows[id_col].to_numpy()
        hs = rows["simhash"].to_numpy()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = hamming64(int(hs[i]), int(hs[j]))
                if d <= max_hamming:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_d.append(d)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_d}).astype(
            {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
        )

    return bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")


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
        return rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "cluster_id": pa.array([find(i) for i in ids], pa.int64())})
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
            lbls = group.loc[group["dst"] == NULL, "lbl"]
            lbl = int(lbls.min()) if len(lbls) else int(group["node"].iloc[0])
            dsts = group.loc[group["dst"] != NULL, "dst"].tolist()
            nodes = [int(group["node"].iloc[0])] + [int(d) for d in dsts]
            return pd.DataFrame({"doc_id": nodes, "cluster_id": [lbl] * len(nodes)}).astype(
                {"doc_id": "int64", "cluster_id": "int64"}
            )

        msgs = label_rows.union(edge_rows).groupby("node").map_groups(
            propagate, batch_format="pandas"
        )
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
    import pyarrow.compute as pc

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
