"""Web-corpus curation operators beyond the reference's surface: the
standard LLM-training-data cleaning passes over Common-Crawl-style text.

- ``paragraph_dedup``: corpus-level repeated-paragraph removal (the
  RefinedWeb/C4 "exact substring at paragraph granularity" pass) — a
  paragraph occurring in ≥ ``min_docs`` distinct documents is boilerplate
  (nav bars, cookie banners, share footers) and is dropped from every
  document; each doc's surviving paragraphs are rejoined in order.
- ``host_boilerplate_removal``: the HOST-scoped sibling of
  ``paragraph_dedup`` (per-site template furniture, trafilatura/jusText
  semantics at corpus scale) — a paragraph is boilerplate for host h
  when it appears in ≥ ``min_host_permille``‰ of h's documents, so a
  small site's nav bar drops even when it is a vanishing fraction of
  the corpus; identical output contract and hybrid apply path.
- ``repetition_stats``: Gopher-style within-document repetition counters
  (Rae et al. 2021 §A1.1 quality rules) — duplicate-word, duplicate-line
  and top-word mass, emitted as exact integers so thresholds stay
  oracle-checkable without float-rounding hazards.
- ``decontaminate``: benchmark n-gram contamination scan — the held-out
  suite's n-grams are broadcast once (``ray.put``) and every document is
  substring-scanned against them; docs that contain any contaminating
  n-gram are flagged with their hit count.

Scale notes (100 TB design point):
- paragraph_dedup shuffles ONLY 8-byte paragraph keys (md5/64 prefix),
  never paragraph text; the hot-key set is applied by the same hybrid the
  LSH bucket prune uses (bounded broadcast + np.isin fast path, fully
  distributed semi-join + rebuild-join fallback beyond the bound).
  A 64-bit key collision could mark a cold paragraph hot (removing a
  unique paragraph); at 2^-64 per pair this is negligible, and the
  production escape hatch is widening the key to the full 16-byte digest
  in the distributed path.
- decontaminate's small side is an external, fixed-size artifact (eval
  suites), so broadcasting it is the correct join shape — the corpus
  side streams and is never shuffled.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count

from ..ops.joins import adaptive_partitions, anti_join, hash_join, semi_join


def _collect_runs(removals: "rd.Dataset", id_col: str, pos_col: str,
                  out_col: str) -> "rd.Dataset":
    """(id, comma-joined sorted positions) — one row per doc.

    Partition-grouped (ops/grouping.py): grouping by the raw doc id
    would make one pandas group per affected document (billions at
    scale, ~1 ms dispatch overhead each); instead hash(doc) mod P
    groups, one sort per partition, and a run walk builds every doc's
    position string. Comma-packed string, not list<int>: Acero rejects
    list-typed non-key columns in a join.
    """
    import pandas as pd

    from ..ops.grouping import partition_grouped

    grouped, pkey_cols = partition_grouped(removals, [id_col])

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([id_col, pos_col], kind="mergesort")
        ids = g[id_col].to_numpy()
        pos = g[pos_col].to_numpy()
        change = np.zeros(len(g), bool)
        change[0] = True
        change[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(g))
        pos_str = pos.astype(str)
        return pd.DataFrame({
            id_col: ids[starts],
            out_col: [",".join(pos_str[s:e]) for s, e in zip(starts, ends)],
        })

    return grouped.groupby(pkey_cols).map_groups(collect, batch_format="pandas")


def _para_keys(paras: List[str]) -> np.ndarray:
    """64-bit content keys (md5 prefix, SIGNED view) — membership
    currency; text never enters a shuffle. int64 rather than uint64
    because Ray's groupby shuffle round-trips key values through Python
    ints and re-encodes as int64 (uint64 > 2^63 would fall back to
    pickled-object columns)."""
    return np.array(
        [int.from_bytes(hashlib.md5(p.encode("utf-8")).digest()[:8], "little", signed=True)
         for p in paras],
        dtype=np.int64,
    )


def paragraph_dedup(
    ds: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 2,
    broadcast_limit: int = 2_000_000,
) -> "rd.Dataset":
    """Remove paragraphs that occur in ≥ ``min_docs`` distinct documents.

    Output: one row per input doc — (id_col, n_paras, n_removed,
    clean_text) with clean_text = surviving paragraphs joined by ``sep``
    in original order ('' when everything was boilerplate).

    Two passes over the corpus (the narrow key pass, then the rebuild
    pass); the exchange between them carries 8-byte keys only:

      pass 1: per-batch explode → per-doc-DISTINCT (key) rows
              → groupby(key).count()  ≡ distinct-doc frequency
              → hot keys (n ≥ min_docs)
      pass 2: hot-set application — broadcast sorted int64 + np.isin
              when the hot count fits ``broadcast_limit`` (boilerplate
              vocabularies are small even on big corpora), else a fully
              distributed (id, idx, key) semi-join + per-doc removal
              lists + armored rebuild join (no driver materialization).
    """

    def distinct_key_rows(t: pa.Table) -> pa.Table:
        out = []
        for text in t[text_col].to_pylist():
            ks = _para_keys((text or "").split(sep))
            out.append(np.unique(ks))  # distinct-within-doc → count ≡ doc freq
        keys = np.concatenate(out) if out else np.array([], dtype=np.int64)
        return pa.table({"para_key": pa.array(keys, pa.int64())})

    hot = (
        ds.map_batches(distinct_key_rows, batch_format="pyarrow")
        .groupby("para_key")
        .aggregate(Count(alias_name="n_docs"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["n_docs"], min_docs)).select(["para_key"]),
            batch_format="pyarrow",
        )
        .materialize()  # narrow: one int64 key per boilerplate paragraph
    )
    n_hot = hot.count()

    def rebuild_with(membership):
        """Second scan: drop member paragraphs, rejoin the rest."""

        def rebuild(t: pa.Table) -> pa.Table:
            ids, n_paras, n_removed, cleans = [], [], [], []
            for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
                paras = (text or "").split(sep)
                mask = membership(_para_keys(paras))
                ids.append(did)
                n_paras.append(len(paras))
                n_removed.append(int(mask.sum()))
                cleans.append(sep.join(p for p, m in zip(paras, mask) if not m))
            return pa.table({
                id_col: pa.array(ids, t[id_col].type),
                "n_paras": pa.array(n_paras, pa.int64()),
                "n_removed": pa.array(n_removed, pa.int64()),
                "clean_text": pa.array(cleans, pa.string()),
            })

        return rebuild

    if n_hot == 0:
        return ds.map_batches(rebuild_with(lambda ks: np.zeros(len(ks), bool)),
                              batch_format="pyarrow")

    if n_hot <= broadcast_limit:
        packed = np.sort(
            np.concatenate([
                b["para_key"].to_numpy(zero_copy_only=False)
                for b in hot.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            ]).astype(np.int64)
        )
        ref = ray.put(packed)
        return ds.map_batches(
            rebuild_with(lambda ks: np.isin(ks, ray.get(ref))),
            batch_format="pyarrow",
        )

    # ---- fully distributed fallback (hot set too big to broadcast) ----
    def indexed_key_rows(t: pa.Table) -> pa.Table:
        ids, idxs, keys = [], [], []
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            ks = _para_keys((text or "").split(sep))
            ids.extend([did] * len(ks))
            idxs.extend(range(len(ks)))
            keys.append(ks)
        allk = np.concatenate(keys) if keys else np.array([], dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "para_idx": pa.array(idxs, pa.int32()),
            "para_key": pa.array(allk, pa.int64()),
        })

    exploded = ds.map_batches(indexed_key_rows, batch_format="pyarrow")
    exp_schema = pa.schema([
        pa.field(id_col, ds.schema().base_schema.field(id_col).type),
        pa.field("para_idx", pa.int32()),
        pa.field("para_key", pa.int64()),
    ])
    hot_schema = pa.schema([pa.field("para_key", pa.int64())])
    removals = semi_join(
        exploded, hot, on="para_key",
        num_partitions=adaptive_partitions(max(n_hot, 1) * 4),
        left_schema=exp_schema, right_schema=hot_schema,
    )

    # consumed by BOTH the rebuild join and the passthrough anti-join —
    # one shared object-store materialization (bounded: one row per doc
    # that contains boilerplate, no text) instead of re-running the
    # explode+semi-join lineage twice
    removal_lists = _collect_runs(
        removals, id_col, "para_idx", "removed_idx").materialize()

    doc_schema = pa.schema([
        pa.field(id_col, exp_schema.field(id_col).type),
        pa.field(text_col, pa.string()),
    ])
    docs = ds.map_batches(lambda t: t.select([id_col, text_col]), batch_format="pyarrow")
    rem_schema = pa.schema([
        pa.field(id_col, exp_schema.field(id_col).type),
        pa.field("removed_idx", pa.string()),
    ])
    touched = hash_join(docs, removal_lists, on=id_col,
                        left_schema=doc_schema, right_schema=rem_schema)

    def rebuild_joined(t: pa.Table) -> pa.Table:
        ids, n_paras, n_removed, cleans = [], [], [], []
        for did, text, rem in zip(
            t[id_col].to_pylist(), t[text_col].to_pylist(), t["removed_idx"].to_pylist()
        ):
            paras = (text or "").split(sep)
            drop = set(int(x) for x in rem.split(",")) if rem else set()
            ids.append(did)
            n_paras.append(len(paras))
            n_removed.append(len(drop))
            cleans.append(sep.join(p for i, p in enumerate(paras) if i not in drop))
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "n_paras": pa.array(n_paras, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
            "clean_text": pa.array(cleans, pa.string()),
        })

    untouched = anti_join(docs, removal_lists, on=id_col,
                          left_schema=doc_schema, right_schema=rem_schema)
    passthrough = untouched.map_batches(
        rebuild_with(lambda ks: np.zeros(len(ks), bool)), batch_format="pyarrow"
    )
    return touched.map_batches(rebuild_joined, batch_format="pyarrow").union(passthrough)


def _host_para_keys(host: str, paras: List[str]) -> np.ndarray:
    """Host-scoped 64-bit paragraph keys: md5(host \\0 para) prefix,
    signed int64 (same currency rules as ``_para_keys``). Scoping the
    digest to the host means ONE key namespace carries the whole
    (host, paragraph) pair — membership, grouping and the distributed
    fallback all stay single-int64-column."""
    hb = (host or "").encode("utf-8") + b"\x00"
    return np.array(
        [int.from_bytes(hashlib.md5(hb + p.encode("utf-8")).digest()[:8],
                        "little", signed=True) for p in paras],
        dtype=np.int64,
    )


def _host_hash(hosts: List[str]) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.md5((h or "").encode("utf-8")).digest()[:8],
                        "little", signed=True) for h in hosts],
        dtype=np.int64,
    )


def host_boilerplate_removal(
    ds: "rd.Dataset",
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_host_permille: int = 400,
    min_docs: int = 2,
    broadcast_limit: int = 2_000_000,
) -> "rd.Dataset":
    """Site-template boilerplate removal — the HOST-scoped sibling of
    ``paragraph_dedup`` (trafilatura/jusText's per-site furniture rule
    at corpus scale): a paragraph is boilerplate for host h when it
    appears in ≥ ``min_host_permille``‰ of h's documents (and in
    ≥ ``min_docs`` of them absolutely), so a nav bar shared by 90% of
    one site's pages drops even when the site is a tiny fraction of the
    corpus — the case the global ``min_docs`` threshold cannot express
    without also nuking legitimately-popular cross-site paragraphs.

    Output contract = paragraph_dedup's: one row per input doc —
    (id_col, n_paras, n_removed, clean_text), survivors rejoined in
    original order.

    Scale shape, two corpus scans with only int64 keys in any exchange:

      pass 1: per-batch explode → per-doc-DISTINCT (host_key,
              host-scoped para_key) rows → ONE narrow groupby counts
              per-host doc frequency; per-host doc totals are a second
              narrow aggregate (n_hosts rows); an armored hash_join +
              integer-permille filter yields the hot key set.
      pass 2: hot-set application — broadcast sorted int64 keys when
              the boilerplate vocabulary fits ``broadcast_limit``
              (template furniture is small even on huge corpora), else
              the fully distributed semi-join / removal-list / rebuild
              path, identical in shape to paragraph_dedup's fallback.
    """

    def distinct_rows(t: pa.Table) -> pa.Table:
        hhs, cks = [], []
        for host, text in zip(t[host_col].to_pylist(), t[text_col].to_pylist()):
            ks = np.unique(_host_para_keys(host, (text or "").split(sep)))
            hhs.append(np.full(len(ks), _host_hash([host])[0], np.int64))
            cks.append(ks)
        hh = np.concatenate(hhs) if hhs else np.array([], dtype=np.int64)
        ck = np.concatenate(cks) if cks else np.array([], dtype=np.int64)
        return pa.table({"hh": pa.array(hh, pa.int64()),
                         "ck": pa.array(ck, pa.int64())})

    counts = (ds.map_batches(distinct_rows, batch_format="pyarrow")
              .groupby(["hh", "ck"]).aggregate(Count(alias_name="n_docs")))

    def host_rows(t: pa.Table) -> pa.Table:
        return pa.table({"hh": pa.array(
            _host_hash(t[host_col].to_pylist()), pa.int64())})

    totals = (ds.map_batches(host_rows, batch_format="pyarrow")
              .groupby("hh").aggregate(Count(alias_name="host_docs")))

    counts_schema = pa.schema([("hh", pa.int64()), ("ck", pa.int64()),
                               ("n_docs", pa.int64())])
    totals_schema = pa.schema([("hh", pa.int64()), ("host_docs", pa.int64())])
    joined = hash_join(counts, totals, on="hh",
                       left_schema=counts_schema, right_schema=totals_schema)

    def hot_filter(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = t["host_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (1000 * n >= min_host_permille * tot) & (n >= min_docs)
        return t.filter(pa.array(keep)).select(["ck"])

    hot = joined.map_batches(hot_filter, batch_format="pyarrow").materialize()
    n_hot = hot.count()

    def rebuild_with(membership):
        def rebuild(t: pa.Table) -> pa.Table:
            ids, n_paras, n_removed, cleans = [], [], [], []
            for did, host, text in zip(t[id_col].to_pylist(),
                                       t[host_col].to_pylist(),
                                       t[text_col].to_pylist()):
                paras = (text or "").split(sep)
                mask = membership(_host_para_keys(host, paras))
                ids.append(did)
                n_paras.append(len(paras))
                n_removed.append(int(mask.sum()))
                cleans.append(sep.join(
                    p for p, m in zip(paras, mask) if not m))
            return pa.table({
                id_col: pa.array(ids, t[id_col].type),
                "n_paras": pa.array(n_paras, pa.int64()),
                "n_removed": pa.array(n_removed, pa.int64()),
                "clean_text": pa.array(cleans, pa.string()),
            })
        return rebuild

    if n_hot == 0:
        return ds.map_batches(
            rebuild_with(lambda ks: np.zeros(len(ks), bool)),
            batch_format="pyarrow")

    if n_hot <= broadcast_limit:
        packed = np.sort(np.concatenate([
            b["ck"].to_numpy(zero_copy_only=False)
            for b in hot.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow")
        ]).astype(np.int64))
        ref = ray.put(packed)
        return ds.map_batches(
            rebuild_with(lambda ks: np.isin(ks, ray.get(ref))),
            batch_format="pyarrow")

    # ---- fully distributed fallback (hot vocabulary beyond broadcast):
    # paragraph_dedup's shape on the host-scoped key column ----
    def indexed_key_rows(t: pa.Table) -> pa.Table:
        ids, idxs, keys = [], [], []
        for did, host, text in zip(t[id_col].to_pylist(),
                                   t[host_col].to_pylist(),
                                   t[text_col].to_pylist()):
            ks = _host_para_keys(host, (text or "").split(sep))
            ids.extend([did] * len(ks))
            idxs.extend(range(len(ks)))
            keys.append(ks)
        allk = np.concatenate(keys) if keys else np.array([], dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "para_idx": pa.array(idxs, pa.int32()),
            "ck": pa.array(allk, pa.int64()),
        })

    id_type = ds.schema().base_schema.field(id_col).type
    exploded = ds.map_batches(indexed_key_rows, batch_format="pyarrow")
    exp_schema = pa.schema([(id_col, id_type), ("para_idx", pa.int32()),
                            ("ck", pa.int64())])
    removals = semi_join(
        exploded, hot, on="ck",
        num_partitions=adaptive_partitions(max(n_hot, 1) * 4),
        left_schema=exp_schema,
        right_schema=pa.schema([("ck", pa.int64())]),
    )
    removal_lists = _collect_runs(
        removals, id_col, "para_idx", "removed_idx").materialize()

    doc_schema = pa.schema([(id_col, id_type), (host_col, pa.string()),
                            (text_col, pa.string())])
    docs = ds.map_batches(
        lambda t: t.select([id_col, host_col, text_col]),
        batch_format="pyarrow")
    rem_schema = pa.schema([(id_col, id_type), ("removed_idx", pa.string())])
    touched = hash_join(docs, removal_lists, on=id_col,
                        left_schema=doc_schema, right_schema=rem_schema)

    def rebuild_joined(t: pa.Table) -> pa.Table:
        ids, n_paras, n_removed, cleans = [], [], [], []
        for did, text, rem in zip(t[id_col].to_pylist(),
                                  t[text_col].to_pylist(),
                                  t["removed_idx"].to_pylist()):
            paras = (text or "").split(sep)
            drop = set(int(x) for x in rem.split(",")) if rem else set()
            ids.append(did)
            n_paras.append(len(paras))
            n_removed.append(len(drop))
            cleans.append(sep.join(
                p for i, p in enumerate(paras) if i not in drop))
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "n_paras": pa.array(n_paras, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
            "clean_text": pa.array(cleans, pa.string()),
        })

    untouched = anti_join(docs, removal_lists, on=id_col,
                          left_schema=doc_schema, right_schema=rem_schema)
    passthrough = untouched.map_batches(
        rebuild_with(lambda ks: np.zeros(len(ks), bool)),
        batch_format="pyarrow")
    return touched.map_batches(
        rebuild_joined, batch_format="pyarrow").union(passthrough)


def repetition_stats_batch(batch: pa.Table, id_col: str = "doc_id",
                           text_col: str = "text", line_words: int = 8) -> pa.Table:
    """Gopher-repetition counters per doc, as exact integers.

    Words are whitespace tokens; "lines" are fixed ``line_words``-word
    chunks (web text arrives pre-flattened here; the production splitter
    would use '\\n'). Integer outputs (counts, not fractions) keep the
    operator exactly comparable against a SQL oracle — the caller
    thresholds e.g. ``1 - n_distinct_lines/n_lines > 0.3`` downstream.
    """
    from collections import Counter

    ids = batch[id_col].to_pylist()
    nw, ndw, nl, ndl, topn = [], [], [], [], []
    for text in batch[text_col].to_pylist():
        words = (text or "").split(" ")
        lines = [" ".join(words[i:i + line_words]) for i in range(0, len(words), line_words)]
        counts = Counter(words)
        nw.append(len(words))
        ndw.append(len(counts))
        nl.append(len(lines))
        ndl.append(len(set(lines)))
        topn.append(max(counts.values()) if counts else 0)
    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(nw, pa.int64()),
        "n_distinct_words": pa.array(ndw, pa.int64()),
        "n_lines": pa.array(nl, pa.int64()),
        "n_distinct_lines": pa.array(ndl, pa.int64()),
        "top_word_n": pa.array(topn, pa.int64()),
    })


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub_batch(batch: pa.Table, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """PII redaction pass: emails → [EMAIL], phones → [PHONE], dotted-quad
    IPs → [IP], with per-doc match counts (counted on the ORIGINAL text,
    before any replacement, in fixed email→phone→ip order).

    Fully vectorized — Arrow RE2 kernels (count_substring_regex /
    replace_substring_regex) over the whole column, no Python loop.
    DuckDB's regexp functions are RE2 too, so the oracle reproduces the
    semantics exactly.
    """
    col = pc.fill_null(batch[text_col], "")
    n_emails = pc.count_substring_regex(col, PII_EMAIL)
    n_phones = pc.count_substring_regex(col, PII_PHONE)
    n_ips = pc.count_substring_regex(col, PII_IP)
    clean = pc.replace_substring_regex(col, PII_EMAIL, "[EMAIL]")
    clean = pc.replace_substring_regex(clean, PII_PHONE, "[PHONE]")
    clean = pc.replace_substring_regex(clean, PII_IP, "[IP]")
    return pa.table({
        id_col: batch[id_col],
        "n_emails": pc.cast(n_emails, pa.int64()),
        "n_phones": pc.cast(n_phones, pa.int64()),
        "n_ips": pc.cast(n_ips, pa.int64()),
        "clean_text": clean,
    })


_NGRAM_PRIME = np.uint64(1099511628211)  # FNV prime, reused as poly base


def _token_hashes(tokens: List[str]) -> np.ndarray:
    from ..functions.quality import fnv1a64

    return np.array([fnv1a64(t.encode("utf-8")) for t in tokens], dtype=np.uint64)


def _token_hashes_bulk(token_lists: List[List[str]]) -> List[np.ndarray]:
    """Hash many docs' tokens at once: np.unique dictionary-encodes the
    batch's token stream so FNV runs once per DISTINCT token (natural
    text repeats its vocabulary heavily), then the inverse index fans the
    hashes back out. Identical values to per-token ``_token_hashes``."""
    from ..functions.quality import fnv1a64

    lens = [len(tl) for tl in token_lists]
    if sum(lens) == 0:
        return [np.array([], dtype=np.uint64) for _ in token_lists]
    flat = np.array([t for tl in token_lists for t in tl], dtype=object)
    uniq, inv = np.unique(flat, return_inverse=True)
    uh = np.array([fnv1a64(u.encode("utf-8")) for u in uniq], dtype=np.uint64)
    flat_h = uh[inv]
    out, pos = [], 0
    for ln in lens:
        out.append(flat_h[pos:pos + ln])
        pos += ln
    return out


def _window_hashes(tok_h: np.ndarray, n: int) -> np.ndarray:
    """Polynomial hash of every n-token window, vectorized: n shifted
    views of the token-hash array combined with precomputed powers
    (wrapping uint64 arithmetic)."""
    if len(tok_h) < n:
        return np.array([], dtype=np.uint64)
    with np.errstate(over="ignore"):
        pows = np.empty(n, dtype=np.uint64)
        pows[n - 1] = np.uint64(1)
        for j in range(n - 2, -1, -1):
            pows[j] = pows[j + 1] * _NGRAM_PRIME
        out = np.zeros(len(tok_h) - n + 1, dtype=np.uint64)
        for j in range(n):
            out += tok_h[j: len(tok_h) - n + 1 + j] * pows[j]
    return out


def decontaminate_ngrams(
    ds: "rd.Dataset",
    grams: List[str],
    n: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Token-aligned contamination scan — the scale path for large
    benchmark suites.

    Unlike ``decontaminate`` (raw substring semantics, O(|grams|) C-level
    scans per doc), this matches whole-token n-gram WINDOWS: each doc's
    whitespace tokens are hashed once, every n-window gets a vectorized
    polynomial rolling hash, and membership is a single ``np.isin``
    against the broadcast sorted gram-hash array — per-doc cost is
    O(tokens), independent of benchmark size (10^5+ eval grams cost the
    same as 10). Stricter than substring: a gram can't match across a
    token boundary ("he fast key" never matches "the fast key"). 64-bit
    hash collisions can only ADD a false hit at ~2^-64 per window-gram
    pair — negligible; widen to two independent hashes if that ever
    matters.

    Emits (id_col, n_hits): docs containing ≥1 of the distinct grams,
    with the count of DISTINCT grams matched (same output contract as
    ``decontaminate``).
    """
    gram_hashes = np.sort(np.unique(np.array(
        [_window_hashes(_token_hashes(g.split()), n)[0]
         for g in set(grams) if len(g.split()) == n],
        dtype=np.uint64,
    )))
    ref = ray.put(gram_hashes)

    def scan(t: pa.Table) -> pa.Table:
        gh = ray.get(ref)
        texts = t[text_col].to_pylist()
        tok_hashes = _token_hashes_bulk([(x or "").split() for x in texts])
        ids, hits = [], []
        for did, th in zip(t[id_col].to_pylist(), tok_hashes):
            wh = np.unique(_window_hashes(th, n))
            if len(wh) == 0 or len(gh) == 0:
                continue
            # binary-search the doc's DISTINCT window hashes into the sorted
            # gram array — O(windows·log|grams|) per doc; np.isin over the
            # gram array would be O(|grams|) per doc and dominates at 10^5+
            idx = np.minimum(np.searchsorted(gh, wh), len(gh) - 1)
            k = int((gh[idx] == wh).sum())  # distinct grams present
            if k:
                ids.append(did)
                hits.append(k)
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "n_hits": pa.array(hits, pa.int64()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def substring_dedup(
    ds: "rd.Dataset",
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 2_000_000,
    max_pos: int = 1 << 23,
) -> "rd.Dataset":
    """Exact duplicated-substring removal at token-window granularity —
    the Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499) pass, re-expressed window-wise so
    it distributes: any ``n``-token window whose exact content occurs
    anywhere else in the corpus (another document, or EARLIER in the same
    document) is removed from every occurrence except the globally first
    one (smallest ``(doc_id, pos)``). Overlapping removed windows merge
    into spans; each doc's surviving tokens are rejoined in order.

    Output: one row per input doc — (id_col, n_tokens, n_removed_tokens,
    clean_text).

    Scale shape (the suffix-array of the paper is a single-machine
    artifact; this is the distributed equivalent used in practice):

      pass 1: per-batch tokenize → vectorized polynomial rolling hash of
              every n-window → (win_key int64, packed int64) rows, where
              packed = doc_id·max_pos + pos encodes the global occurrence
              order. ONE narrow groupby carries 16 bytes/window:
              ``groupby(win_key).aggregate(Count, Min(packed))`` → the
              duplicated-window table (count ≥ 2) with its first-
              occurrence id.
      pass 2: hot-table application — broadcast two sorted arrays
              (win_key, min_packed) + per-batch searchsorted when the
              duplicated-window count fits ``broadcast_limit``; else a
              fully distributed explode → hash_join on win_key →
              per-doc removal-interval strings → armored rebuild join
              (+ anti-join passthrough), mirroring ``paragraph_dedup``'s
              fallback — no driver materialization on that path.

    Window hashes are 64-bit; a collision merges two distinct windows at
    ~2^-64 per pair (could remove a unique window). The SQL oracle keys
    on exact window TEXT, so any fixture-scale collision would surface as
    a mismatch; production widens to 128-bit keys in the same shape.
    Docs longer than ``max_pos`` tokens (8M default) would break the
    packed encoding and raise.
    """

    def window_rows(t: pa.Table) -> pa.Table:
        tok_hashes = _token_hashes_bulk(
            [(x or "").split(" ") for x in t[text_col].to_pylist()])
        keys, packed = [], []
        for did, th in zip(t[id_col].to_pylist(), tok_hashes):
            wh = _window_hashes(th, n)
            if len(wh) == 0:
                continue
            if len(wh) > max_pos:
                raise ValueError(f"doc {did}: {len(wh)} windows > max_pos={max_pos}")
            keys.append(wh.view(np.int64))
            packed.append(np.int64(did) * np.int64(max_pos)
                          + np.arange(len(wh), dtype=np.int64))
        if not keys:
            return pa.table({"win_key": pa.array([], pa.int64()),
                             "packed": pa.array([], pa.int64())})
        return pa.table({"win_key": pa.array(np.concatenate(keys), pa.int64()),
                         "packed": pa.array(np.concatenate(packed), pa.int64())})

    from ray.data.aggregate import Min

    hot = (
        ds.map_batches(window_rows, batch_format="pyarrow")
        .groupby("win_key")
        .aggregate(Count(alias_name="n_occ"), Min("packed", alias_name="first_packed"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["n_occ"], 2))
                       .select(["win_key", "first_packed"]),
            batch_format="pyarrow",
        )
        .materialize()  # narrow: 16 bytes per DISTINCT duplicated window
    )
    n_hot = hot.count()

    def rebuild_batch(t: pa.Table, removed_for) -> pa.Table:
        """removed_for(did, win_hashes) -> bool mask of removed window starts."""
        ids, n_toks, n_rem, cleans = [], [], [], []
        tok_lists = [(x or "").split(" ") for x in t[text_col].to_pylist()]
        tok_hashes = _token_hashes_bulk(tok_lists)
        for did, toks, th in zip(t[id_col].to_pylist(), tok_lists, tok_hashes):
            wh = _window_hashes(th, n)
            starts = np.flatnonzero(removed_for(did, wh)) if len(wh) else np.array([], np.int64)
            # interval painting: +1 at each removed start, -1 past its end
            diff = np.zeros(len(toks) + 1, dtype=np.int64)
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + n, -1)
            covered = np.cumsum(diff[:-1]) > 0
            ids.append(did)
            n_toks.append(len(toks))
            n_rem.append(int(covered.sum()))
            cleans.append(" ".join(tk for tk, c in zip(toks, covered) if not c))
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "n_removed_tokens": pa.array(n_rem, pa.int64()),
            "clean_text": pa.array(cleans, pa.string()),
        })

    if n_hot == 0:
        return ds.map_batches(
            lambda t: rebuild_batch(t, lambda d, wh: np.zeros(len(wh), bool)),
            batch_format="pyarrow")

    if n_hot <= broadcast_limit:
        tbl = pa.concat_tables(
            hot.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        keys = tbl["win_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        firsts = tbl["first_packed"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys)
        ref = ray.put((keys[order], firsts[order]))

        def removed_for(did, wh):
            keys_s, firsts_s = ray.get(ref)
            wk = wh.view(np.int64)
            idx = np.minimum(np.searchsorted(keys_s, wk), len(keys_s) - 1)
            member = keys_s[idx] == wk
            packed = np.int64(did) * np.int64(max_pos) + np.arange(len(wk), dtype=np.int64)
            return member & (firsts_s[idx] != packed)

        return ds.map_batches(lambda t: rebuild_batch(t, removed_for),
                              batch_format="pyarrow")

    # ---- fully distributed fallback (duplicated-window table too big) ----
    def indexed_window_rows(t: pa.Table) -> pa.Table:
        tok_hashes = _token_hashes_bulk(
            [(x or "").split(" ") for x in t[text_col].to_pylist()])
        ids, poss, keys = [], [], []
        for did, th in zip(t[id_col].to_pylist(), tok_hashes):
            wh = _window_hashes(th, n)
            ids.extend([did] * len(wh))
            poss.extend(range(len(wh)))
            keys.append(wh.view(np.int64))
        allk = (np.concatenate(keys) if keys else np.array([], dtype=np.int64))
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "pos": pa.array(poss, pa.int64()),
            "win_key": pa.array(allk, pa.int64()),
        })

    id_type = ds.schema().base_schema.field(id_col).type
    exp_schema = pa.schema([pa.field(id_col, id_type), pa.field("pos", pa.int64()),
                            pa.field("win_key", pa.int64())])
    hot_schema = pa.schema([pa.field("win_key", pa.int64()),
                            pa.field("first_packed", pa.int64())])
    exploded = ds.map_batches(indexed_window_rows, batch_format="pyarrow")
    marked = hash_join(exploded, hot, on="win_key",
                       num_partitions=adaptive_partitions(max(n_hot, 1) * 4),
                       left_schema=exp_schema, right_schema=hot_schema)

    def non_first(t: pa.Table) -> pa.Table:
        packed = pc.add(pc.multiply(pc.cast(t[id_col], pa.int64()),
                                    pa.scalar(max_pos, pa.int64())), t["pos"])
        return t.filter(pc.not_equal(packed, t["first_packed"])).select([id_col, "pos"])

    removals = marked.map_batches(non_first, batch_format="pyarrow")

    removal_lists = _collect_runs(
        removals, id_col, "pos", "removed_pos").materialize()

    doc_schema = pa.schema([pa.field(id_col, id_type), pa.field(text_col, pa.string())])
    rem_schema = pa.schema([pa.field(id_col, id_type), pa.field("removed_pos", pa.string())])
    docs = ds.map_batches(lambda t: t.select([id_col, text_col]), batch_format="pyarrow")
    touched = hash_join(docs, removal_lists, on=id_col,
                        left_schema=doc_schema, right_schema=rem_schema)

    def rebuild_joined(t: pa.Table) -> pa.Table:
        ids, n_toks, n_rem, cleans = [], [], [], []
        for did, text, rem in zip(t[id_col].to_pylist(), t[text_col].to_pylist(),
                                  t["removed_pos"].to_pylist()):
            toks = (text or "").split(" ")
            starts = (np.array([int(x) for x in rem.split(",")], dtype=np.int64)
                      if rem else np.array([], dtype=np.int64))
            diff = np.zeros(len(toks) + 1, dtype=np.int64)
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + n, -1)
            covered = np.cumsum(diff[:-1]) > 0
            ids.append(did)
            n_toks.append(len(toks))
            n_rem.append(int(covered.sum()))
            cleans.append(" ".join(tk for tk, c in zip(toks, covered) if not c))
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "n_removed_tokens": pa.array(n_rem, pa.int64()),
            "clean_text": pa.array(cleans, pa.string()),
        })

    untouched = anti_join(docs, removal_lists, on=id_col,
                          left_schema=doc_schema, right_schema=rem_schema)
    passthrough = untouched.map_batches(
        lambda t: rebuild_batch(t, lambda d, wh: np.zeros(len(wh), bool)),
        batch_format="pyarrow")
    return touched.map_batches(rebuild_joined, batch_format="pyarrow").union(passthrough)


def decontaminate(
    ds: "rd.Dataset",
    grams: List[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Benchmark-contamination scan: count how many of the broadcast
    ``grams`` (distinct benchmark n-grams, e.g. every eval question's
    leading 6-gram) appear as substrings of each document; emit only
    contaminated docs (n_hits ≥ 1).

    The gram list is an external fixed-size artifact (eval suites don't
    grow with the corpus), so it is ``ray.put`` ONCE and read per task —
    the correct broadcast-join shape; the corpus streams unshuffled.
    Python's substring scan is C-level (two-way/Crochemore-Perrin); a
    production variant with 10^5+ grams would swap in Aho-Corasick
    inside the same batch function.
    """
    gram_list = sorted(set(grams))
    ref = ray.put(gram_list)

    def scan(t: pa.Table) -> pa.Table:
        gs = ray.get(ref)
        ids, hits = [], []
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            text = text or ""
            n = sum(1 for g in gs if g in text)
            if n:
                ids.append(did)
                hits.append(n)
        return pa.table({
            id_col: pa.array(ids, t[id_col].type),
            "n_hits": pa.array(hits, pa.int64()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def decontaminate_filter(
    ds: "rd.Dataset",
    grams: List[str],
    text_col: str = "text",
) -> "rd.Dataset":
    """Complement of ``decontaminate``: KEEP only rows containing none
    of the broadcast benchmark ``grams`` as substrings — the drop step a
    curation chain applies after the contamination scan. Same broadcast
    shape (grams ship once via ``ray.put``, the corpus streams with no
    shuffle or join); all input columns pass through."""
    gram_list = sorted(set(grams))
    ref = ray.put(gram_list)

    def keep_clean(t: pa.Table) -> pa.Table:
        gs = ray.get(ref)
        mask = [not any(g in (x or "") for g in gs)
                for x in t[text_col].to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep_clean, batch_format="pyarrow")


def c4_line_filter(
    ds: "rd.Dataset",
    text_col: str = "text",
    min_line_words: int = 5,
    min_lines: int = 3,
) -> "rd.Dataset":
    """C4's line-level cleaning pass (Raffel et al. 2020 §2.2), the one
    canonical web-text rule set this engine didn't yet expose as an
    operator. Page rules: drop any page containing "lorem ipsum"
    (case-insensitive) or a curly brace. Line rules: keep a line only if
    it ends in terminal punctuation (``. ! ? "``), has ≥
    ``min_line_words`` whitespace tokens, and does not contain the word
    "javascript" (case-insensitive). Pages with < ``min_lines``
    surviving lines drop. Output: the input row (text replaced by the
    rejoined surviving lines as ``clean_text``) + ``n_lines_kept``.

    Scale shape: one streaming TaskPool map, zero exchanges. The hot
    path is vectorized end-to-end: page/line predicates are single
    Arrow RE2 kernel calls over the flattened line column
    (``split_pattern`` → ``list_flatten`` → three ``match_substring``
    masks), doc regrouping is ``np.repeat``/``np.bincount`` index
    arithmetic, and only the SURVIVING lines touch Python (one
    ``"\\n".join`` per kept doc).
    """

    def clean(t: pa.Table) -> pa.Table:
        t = t.set_column(t.schema.get_field_index(text_col), text_col,
                         pc.fill_null(t[text_col], ""))
        page_bad = pc.or_(
            pc.match_substring(t[text_col], "lorem ipsum", ignore_case=True),
            pc.match_substring(t[text_col], "{"))
        t = t.filter(pc.invert(page_bad))
        out_schema = t.schema.remove(t.schema.get_field_index(text_col)) \
            .append(pa.field("n_lines_kept", pa.int64())) \
            .append(pa.field("clean_text", pa.string()))
        if t.num_rows == 0:
            return out_schema.empty_table()
        lines = pc.split_pattern(t[text_col], "\n").combine_chunks()
        nlines = pc.list_value_length(lines).to_numpy()
        flat = pc.list_flatten(lines)
        doc_idx = np.repeat(np.arange(t.num_rows), nlines)
        keep = pc.and_(
            pc.and_(
                pc.match_substring_regex(flat, r'[.!?"]\s*$'),
                pc.match_substring_regex(
                    flat, r"^\s*(?:\S+\s+){%d}\S+" % (min_line_words - 1))),
            pc.invert(pc.match_substring(flat, "javascript",
                                         ignore_case=True)),
        ).to_numpy(zero_copy_only=False)
        kept_idx = doc_idx[keep]
        n_kept = np.bincount(kept_idx, minlength=t.num_rows)
        doc_ok = n_kept >= min_lines
        kept_lines = flat.filter(pa.array(keep)).to_pylist()
        joined: List[str] = []
        pos = 0
        for i in range(t.num_rows):
            k = int(n_kept[i])
            if doc_ok[i]:
                joined.append("\n".join(kept_lines[pos:pos + k]))
            pos += k
        t = t.drop_columns([text_col]) \
            .append_column("n_lines_kept", pa.array(n_kept, pa.int64())) \
            .filter(pa.array(doc_ok))
        return t.append_column("clean_text", pa.array(joined, pa.string()))

    return ds.map_batches(clean, batch_format="pyarrow")


def gopher_quality_filter(
    ds: "rd.Dataset",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    stopwords: tuple = ("the", "a", "to", "of"),
    min_stopwords: int = 2,
    max_hashtag_permille: int = 100,
) -> "rd.Dataset":
    """Gopher/MassiveText word-level quality rules (Rae et al. 2021
    §A1.1) as one streaming filter: keep a doc iff
    ``min_words ≤ n_words ≤ max_words``, the mean word length is in
    [min, max] (held as the exact-integer inequality
    ``min·n_words ≤ n_word_chars ≤ max·n_words`` so the SQL mirror
    cannot drift on float division), it contains ≥ ``min_stopwords``
    DISTINCT stopwords, and hashtag-words stay under
    ``max_hashtag_permille`` (1000·n_hash ≤ permille·n_words). The
    line-level C4 rules live in ``c4_line_filter``; Gopher's full
    stopword list is the ``stopwords`` parameter. Survivors carry their
    stats columns so downstream stages can re-bucket without a rescan.

    Scale shape: one TaskPool map, zero exchanges. Tokenization is ONE
    ``split_pattern`` + ``list_flatten`` per batch; every per-doc stat
    is segment arithmetic over the flat token column (``np.bincount``
    on the repeat-index — token lengths, hashtag starts, per-stopword
    presence), no Python row loop.
    """

    def gate(t: pa.Table) -> pa.Table:
        t = t.set_column(t.schema.get_field_index(text_col), text_col,
                         pc.fill_null(t[text_col], ""))
        n = t.num_rows
        if n == 0:
            return t.append_column("n_words", pa.array([], pa.int64())) \
                .append_column("n_word_chars", pa.array([], pa.int64())) \
                .append_column("n_stopwords", pa.array([], pa.int64())) \
                .append_column("n_hashtag_words", pa.array([], pa.int64()))
        toks = pc.split_pattern(t[text_col], " ").combine_chunks()
        ntok = pc.list_value_length(toks).to_numpy()
        flat = pc.list_flatten(toks)
        doc_idx = np.repeat(np.arange(n), ntok)
        # '' tokens (empty text splits to ['']) contribute 0 chars and
        # count as words only when the text is non-empty — mirror SQL's
        # string_split semantics exactly by keeping them.
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        n_words = ntok.astype(np.int64)
        n_chars = np.bincount(doc_idx, weights=tok_len,
                              minlength=n).astype(np.int64)
        is_hash = pc.starts_with(flat, "#").to_numpy(zero_copy_only=False)
        n_hash = np.bincount(doc_idx, weights=is_hash,
                             minlength=n).astype(np.int64)
        # distinct-stopword presence in ONE token scan: index_in maps
        # each token to its stopword index (null = not a stopword),
        # then a single bincount over doc·S+idx cells
        n_s = len(stopwords)
        si = pc.index_in(flat, value_set=pa.array(list(stopwords)))
        valid = si.is_valid().to_numpy(zero_copy_only=False)
        cells = (doc_idx[valid] * n_s
                 + si.fill_null(0).to_numpy(zero_copy_only=False)[valid])
        present = np.bincount(cells, minlength=n * n_s) > 0
        n_stop = present.reshape(n, n_s).sum(axis=1).astype(np.int64)
        keep = ((n_words >= min_words) & (n_words <= max_words)
                & (min_mean_word_len * n_words <= n_chars)
                & (n_chars <= max_mean_word_len * n_words)
                & (n_stop >= min_stopwords)
                & (1000 * n_hash <= max_hashtag_permille * n_words))
        return (t.append_column("n_words", pa.array(n_words, pa.int64()))
                .append_column("n_word_chars", pa.array(n_chars, pa.int64()))
                .append_column("n_stopwords", pa.array(n_stop, pa.int64()))
                .append_column("n_hashtag_words", pa.array(n_hash, pa.int64()))
                .filter(pa.array(keep)))

    return ds.map_batches(gate, batch_format="pyarrow")


def badwords_filter(
    ds: "rd.Dataset",
    terms: List[str],
    text_col: str = "text",
) -> "rd.Dataset":
    """C4-style blocklist-term document filter (Raffel et al. 2020 §2.2:
    drop any page containing a word from a blocklist): KEEP only rows
    whose text contains none of ``terms`` as a whole word,
    case-insensitively. Distinct from ``decontaminate_filter`` (raw
    substring containment) — word boundaries stop ``class`` from
    matching inside ``classify``, and case folding catches shouted
    variants.

    Scale shape: the blocklist compiles into ONE RE2 alternation applied
    as a single vectorized Arrow kernel call per batch
    (``match_substring_regex`` — C regex over the column buffer, no
    Python row loop); the corpus streams through a TaskPool map with no
    exchange. Blocklists are external fixed-size artifacts (hundreds to
    low thousands of terms), far under RE2's alternation limits; for a
    pathological list, split into a few patterns and OR the masks.

    Boundary semantics: a term edge that is a word character anchors
    with ``\\b``; an edge that is NOT a word character (real C4
    blocklists contain such terms) anchors on whitespace-or-string-edge
    instead — RE2 has no lookarounds, and a bare ``\\b`` next to a
    non-word character silently never matches (the term would be
    inert). So ``a$$`` matches the standalone word in ``pay a$$ now``
    but not ``class``-style substrings.
    """
    import re as _re

    # real blocklist files carry blank lines; an empty term would crash
    # the anchoring (w[0]) — and, anchored, would match EVERY row
    terms = [w for w in terms if w]
    if not terms:
        return ds

    def _anchored(w: str) -> str:
        left = r"\b" if _re.match(r"\w", w[0]) else r"(?:^|\s)"
        right = r"\b" if _re.match(r"\w", w[-1]) else r"(?:$|\s)"
        return left + _re.escape(w) + right

    pattern = "|".join(_anchored(w) for w in sorted(set(terms)))

    def keep(t: pa.Table) -> pa.Table:
        bad = pc.match_substring_regex(t[text_col], pattern,
                                       ignore_case=True)
        # null text never matches → kernel yields null → keep (C4 drops
        # on evidence, not absence)
        return t.filter(pc.fill_null(pc.invert(bad), True))

    return ds.map_batches(keep, batch_format="pyarrow")


def compression_ratio_batch(batch: pa.Table, text_col: str = "text",
                            level: int = 6) -> pa.Table:
    """+ ``compression_ratio`` (zlib deflate bytes / utf-8 bytes) — the
    repetition proxy modern curation stacks (RedPajama-v2 / Dolma
    signals) compute per doc: boilerplate storms, keyword stuffing and
    template farms compress far below natural prose. Deterministic for
    a fixed zlib (same guarantee class as the engine's "for a fixed Ray
    version" seeds); level pinned. Null/empty text gets ratio 1.0
    (no evidence of repetition — mirrors c4's drop-on-evidence rule).

    Scale: zlib is C-speed (~100 MB/s/core) and per-row independent —
    a pure streaming map, zero exchange; the ratio column is 8 bytes/doc.
    """
    import zlib

    ratios = []
    for x in batch[text_col].to_pylist():
        if not x:
            ratios.append(1.0)
            continue
        raw = x.encode("utf-8")
        ratios.append(len(zlib.compress(raw, level)) / len(raw))
    return batch.append_column("compression_ratio",
                               pa.array(ratios, pa.float64()))


def compression_quality_filter(
    ds, text_col: str = "text", min_ratio: float = 0.25, level: int = 6,
):
    """Drop docs whose deflate ratio falls BELOW ``min_ratio`` (too
    repetitive to be natural text). Composes with gopher/c4: those
    catch rule-expressible degeneracy, this catches long-range
    repetition they cannot see (a 50-line template repeated 40× passes
    every per-line rule)."""

    def gate(t: pa.Table) -> pa.Table:
        t = compression_ratio_batch(t, text_col, level)
        keep = pc.greater_equal(t["compression_ratio"], min_ratio)
        return t.filter(keep)

    return ds.map_batches(gate, batch_format="pyarrow")
