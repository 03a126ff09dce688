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
from ..ops.joins import anti_join
from ..stages.dedup import cluster_pairs, keep_list, loser_ids, minhash_lsh_pairs
from ..stages.quality import analyze_text_batch


def clean_corpus(
    docs: "rd.Dataset",
    quality_min: float = 0.4,
    dup_threshold: float = 0.8,
    strip_boilerplate: bool = False,
    boilerplate_min_docs: int = 2,
) -> "rd.Dataset":
    """docs (extraction output) → (url, quality, n_tokens) survivors.

    The loser set (near-dup cluster members that are not their cluster's
    survivor) is O(duplicated docs) — at 100 TB with 30–50% dup rates
    that is billions of ids, so it stays a Dataset end-to-end: clusters ⋈
    keep-list → loser ids → distributed ANTI-JOIN against the corpus
    (round-1 verdict finding #3; no driver-side id set anywhere).

    ``strip_boilerplate=True`` prepends the corpus-level
    repeated-paragraph removal pass (stages/webclean.paragraph_dedup):
    paragraphs shared by ≥ ``boilerplate_min_docs`` docs (nav/footer
    furniture that survived per-page extraction) are dropped BEFORE
    quality scoring and near-dup detection — the RefinedWeb ordering,
    since boilerplate both inflates quality-token counts and creates
    false near-dup pairs. Default off (the extraction-output chain the
    driver row-checks is unchanged).
    """
    if strip_boilerplate:
        from ..stages.webclean import paragraph_dedup

        def keyed(t: pa.Table) -> pa.Table:
            ids = [fnv1a64(u.encode()) & ((1 << 62) - 1) for u in t["url"].to_pylist()]
            return pa.table({"pid": pa.array(ids, pa.int64()),
                             "url": t["url"], "status": t["status"],
                             "text": t["text"]})

        base = docs.map_batches(keyed, batch_format="pyarrow")
        stripped = paragraph_dedup(base, "pid", "text", sep="\n",
                                   min_docs=boilerplate_min_docs)
        meta = base.map_batches(lambda t: t.select(["pid", "url", "status"]),
                                batch_format="pyarrow")
        from ..ops.joins import hash_join

        docs = hash_join(
            meta, stripped, on="pid",
            left_schema=pa.schema([("pid", pa.int64()), ("url", pa.string()),
                                   ("status", pa.string())]),
            right_schema=pa.schema([("pid", pa.int64()), ("n_paras", pa.int64()),
                                    ("n_removed", pa.int64()),
                                    ("clean_text", pa.string())]),
        ).map_batches(
            lambda t: pa.table({"url": t["url"], "status": t["status"],
                                "text": t["clean_text"]}),
            batch_format="pyarrow",
        )
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
    losers = loser_ids(clusters, keep_list(clusters))
    survivors = anti_join(with_ids, losers, on="doc_id",
                          right_schema=pa.schema([("doc_id", pa.int64())]))
    return survivors.map_batches(
        lambda t: t.select(["url", "quality", "n_tokens"]), batch_format="pyarrow"
    )
