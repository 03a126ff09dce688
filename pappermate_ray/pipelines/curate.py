"""Training-corpus curation: the composed quality + dedup filter chain.

extract → quality/lang analysis → drop error rows → drop low-quality →
drop near-duplicate losers (MinHash-LSH → connected components →
keep-list) → clean keep set. The pipeline a 100 TB pretraining-corpus
run would submit; composed entirely from the engine's own operators.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.quality import fnv1a64
from ..stages.dedup import cluster_pairs, keep_list, minhash_lsh_pairs
from ..stages.quality import analyze_text_batch


def clean_corpus(
    docs: "rd.Dataset",
    quality_min: float = 0.4,
    dup_threshold: float = 0.8,
) -> "rd.Dataset":
    """docs (extraction output) → (url, quality, n_tokens) survivors."""
    scored = docs.map_batches(analyze_text_batch, batch_format="pyarrow")

    def good(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t["status"], "converted"),
            pc.greater_equal(t["quality"], quality_min),
        )
        return t.filter(mask).select(["url", "text", "quality", "n_tokens"])

    clean = scored.map_batches(good, batch_format="pyarrow")

    def add_id(t: pa.Table) -> pa.Table:
        ids = [fnv1a64(u.encode()) & ((1 << 62) - 1) for u in t["url"].to_pylist()]
        return t.append_column("doc_id", pa.array(ids, pa.int64()))

    with_ids = clean.map_batches(add_id, batch_format="pyarrow")
    pairs = minhash_lsh_pairs(with_ids, "doc_id", "text", threshold=dup_threshold)
    clusters = cluster_pairs(pairs)
    keeps = keep_list(clusters)
    # losers = cluster members that are not the keeper (candidate sets are
    # LSH-pruned → small; broadcast-filtered out of the stream)
    losers = {r["doc_id"] for r in clusters.take_all()} - {
        r["keep_id"] for r in keeps.take_all()
    }
    loser_arr = pa.array(sorted(losers), pa.int64())

    def drop_losers(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(t["doc_id"], value_set=loser_arr))
        return t.filter(keep).select(["url", "quality", "n_tokens"])

    return with_ids.map_batches(drop_losers, batch_format="pyarrow")
