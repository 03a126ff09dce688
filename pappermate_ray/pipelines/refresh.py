"""Composed incremental-refresh job — the DAILY operating mode of a
100 TB corpus (curate_full is the initial build; this is every run
after it).

Chain: crawl snapshot diff (`ops/snapshot.snapshot_diff` — one tagged
union exchange, unchanged urls never leave their partition) → the
added/changed work-list joins back to the NEW crawl's payloads (the
payload's single exchange traversal, same accepted shape as
curate_full's ingest) → per-row token counts (vectorized, zero
exchange) → near-dup match of ONLY the refreshed docs against the base
corpus's PERSISTED MinHash-LSH index (`stages/dedup.
match_against_index` — the base corpus is never re-read or
re-shingled) → a left-outer flag join producing the refresh manifest
``(url, status, n_tokens, base_dup)``.

Scale shape: every exchange is work-list-sized (the day's increment),
not corpus-sized; the only corpus-scale artifacts touched are the
stored band/set parquets, read pruned. A removed url costs one diff
row; an unchanged url costs nothing beyond its digest partial.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _digest_view(ds: "rd.Dataset", url_col: str, text_col: str):
    """(url, digest) — md5 of the payload, the narrow diff input."""

    def dig(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        return pa.table({
            "url": pc.cast(t[url_col], pa.string()),
            "digest": pa.array(
                [hashlib.md5((x or "").encode()).hexdigest() for x in texts],
                pa.string()),
        })

    return ds.map_batches(dig, batch_format="pyarrow")


def incremental_refresh(
    old_pages: "rd.Dataset",
    new_pages: "rd.Dataset",
    index_dir: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> "rd.Dataset":
    """Refresh manifest for one crawl increment: one row per added or
    changed url in ``new_pages`` vs ``old_pages``, with its whitespace
    token count and ``base_dup`` = does the refreshed text near-dup
    (exact word-shingle Jaccard ≥ ``threshold``) ANY document in the
    corpus indexed at ``index_dir`` (`stages/dedup.build_minhash_index`
    artifact).

    ``n_tokens`` is pinned as ``1 + |\\s+ runs|`` of the space-trimmed
    text (0 when empty) — exactly DuckDB's
    ``len(regexp_split_to_array(trim(t), '\\s+'))`` — so the manifest
    is SQL-value-checkable end to end.
    """
    from ..ops.joins import hash_join
    from ..ops.snapshot import snapshot_diff
    from ..stages.dedup import match_against_index

    diff = snapshot_diff(_digest_view(old_pages, url_col, text_col),
                         _digest_view(new_pages, url_col, text_col))

    work = diff.map_batches(
        lambda t: t.filter(
            pc.is_in(t["status"], value_set=pa.array(["added", "changed"]))
        ).select(["url", "status"]),
        batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(t[url_col], pa.string()),
            id_col: t[id_col],
            text_col: t[text_col],
        })

    refreshed = hash_join(
        new_pages.map_batches(project, batch_format="pyarrow"),
        work, on="url",
        left_schema=pa.schema([("url", pa.string()),
                               (id_col, pa.int64()),
                               (text_col, pa.string())]),
        right_schema=pa.schema([("url", pa.string()),
                                ("status", pa.string())]),
    ).materialize()  # two consumers below (match input + manifest base)

    def tokens(t: pa.Table) -> pa.Table:
        # computed AFTER the work-list join, so the regex pass touches
        # only the increment, never the unchanged crawl majority. Trim
        # SPACES only — DuckDB's trim(s) semantics, so the token count
        # replays exactly (a trailing \n counts as a run edge in both
        # engines).
        txt = pc.utf8_trim(pc.cast(t[text_col], pa.string()), " ")
        runs = pc.count_substring_regex(txt, r"\s+")
        n = pc.if_else(pc.equal(txt, ""), pa.scalar(0, pa.int64()),
                       pc.cast(pc.add(runs, 1), pa.int64()))
        return t.append_column("n_tokens", n)

    pairs = match_against_index(
        refreshed.map_batches(
            lambda t: t.select([id_col, text_col]), batch_format="pyarrow"),
        index_dir, id_col=id_col, text_col=text_col, threshold=threshold)

    dup_ids = (pairs.map_batches(
        lambda t: pa.table({
            id_col: t["new_id"],
            "_hit": pa.array(np.ones(len(t), np.int64)),
        }), batch_format="pyarrow")
        .groupby(id_col).max("_hit"))

    out = hash_join(
        refreshed.map_batches(tokens, batch_format="pyarrow").map_batches(
            lambda t: t.select(["url", id_col, "status", "n_tokens"]),
            batch_format="pyarrow"),
        dup_ids, on=id_col, join_type="left_outer",
        left_schema=pa.schema([("url", pa.string()),
                               (id_col, pa.int64()),
                               ("status", pa.string()),
                               ("n_tokens", pa.int64())]),
        right_schema=pa.schema([(id_col, pa.int64()),
                                ("max(_hit)", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"],
            "status": t["status"],
            "n_tokens": t["n_tokens"],
            "base_dup": pc.fill_null(
                pc.cast(t["max(_hit)"], pa.bool_()), False),
        })

    return out.map_batches(finish, batch_format="pyarrow")
