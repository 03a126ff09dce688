"""The composed 100-TB-shape pretraining-corpus job — every stage a
real operator from this engine, chained end-to-end over one streaming
Dataset (round-2 verdict item #1):

    ingest (re-crawled captures + near-dup copy pages + planted PII)
    → latest_by_url            (crawl-ingest dedup, stages/dedup.py)
    → blocklist_filter         (domain curation, stages/urls.py)
    → badwords_filter          (C4 term blocklist, stages/webclean.py)
    → quality gate             (Gopher-style integer stats, inline map)
    → paragraph_dedup          (RefinedWeb boilerplate strip, webclean)
    → MinHash keep-list        (exact-verified pairs → components →
                                losers → distributed anti-join)
    → decontaminate_filter     (benchmark n-gram substring drop)
    → pii_scrub_batch          (RE2 redaction + counts)
    → sequence packing         (distributed prefix scan, ops/prefix.py)
    → shard_shuffle            (md5 shard manifest, ops/shard.py)

Output is the training-shard manifest: one all-integer/string row per
surviving document. Every stage's semantics are mirrored in the single
DuckDB `curate_full` oracle (queries.py), so the WHOLE composition is
value-hash-gated, not just the pieces.

Scale notes: the only corpus-payload exchanges are latest_by_url's
semi-join, paragraph_dedup's rebuild, the loser anti-join and the
shard-rank exchange — everything else is broadcast or narrow-key
(8/16-byte) shuffles; nothing materializes the corpus driver-side.
The planted fixtures (re-crawls, ' extra' copy pages, PII suffixes,
boilerplate paragraphs, benchmark grams) are deterministic doc_id
arithmetic so the oracle reconstructs them in SQL; they stand in for
the organic phenomena each stage exists to handle.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# 2024-01-01T00:00:00Z in microseconds (the latest_by_url fixture epoch)
_EPOCH_US = 1_704_067_200_000_000
_COPY_BASE = 1_000_000
_BP1 = "subscribe to our newsletter accept cookies to continue all rights reserved"
_BP2 = "share this story follow us on social media terms of service apply"
_BLOCKED_SOURCES = ("src7", "src13")


def _pii_suffix(d: int) -> str:
    """Deterministic planted PII (mirrors the pii_scrub oracle plants),
    plus the blocklist-term plant for the badwords stage: every 17th
    base doc carries ' darn17', so it — and every capture/copy of it —
    must fall to ``badwords_filter``; nothing downstream ever sees the
    term, keeping the rest of the oracle chain untouched."""
    s = ""
    if d % 5 == 0:
        s += f" contact user{d}@example.com now"
    if d % 9 == 0:
        s += f" call 555-{d % 900 + 100:03d}-4567 today"
    if d % 11 == 0:
        s += f" from 10.0.{d % 256}.{d % 200 + 1} logged"
    if d % 17 == 0:
        s += " darn17"
    return s


def _url_of(doc_id: int) -> str:
    base = doc_id % _COPY_BASE
    u = f"http://src{base % 20}/doc/{base}"
    return u + "-copy" if doc_id >= _COPY_BASE else u


def synth_captures(sf_dir: str) -> "rd.Dataset":
    """Common-Crawl-shape capture stream from the documents table:
    every url captured once at epoch+37·doc_id s; every 3rd url
    re-crawled 1000 s later with revised text (' rev2'), every 7th also
    500 s earlier (' old'); every 10th url has a near-duplicate COPY
    page (own url/doc_id, text + ' extra'). PII suffixes ride the base
    text so they traverse the whole chain."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def captures(t: pa.Table) -> pa.Table:
        ids, urls, tss, texts = [], [], [], []

        def emit(did, url, ts, text):
            ids.append(did)
            urls.append(url)
            tss.append(ts)
            texts.append(text)

        for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ptext = (text or "") + _pii_suffix(d)
            url = _url_of(d)
            ts = _EPOCH_US + 37_000_000 * d
            emit(d, url, ts, ptext)
            if d % 3 == 0:
                emit(d, url, ts + 1_000_000_000, ptext + " rev2")
            if d % 7 == 0:
                emit(d, url, ts - 500_000_000, ptext + " old")
            if d % 10 == 0:
                emit(_COPY_BASE + d, url + "-copy", ts + 7_000_000,
                     ptext + " extra")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(captures, batch_format="pyarrow")


def _quality_gate(ds: "rd.Dataset", min_words: int,
                  min_distinct_permille: int) -> "rd.Dataset":
    """Gopher-style integer quality filter: n_words ≥ min_words and
    1000·n_distinct ≥ min_distinct_permille·n_words (exact-integer so
    the SQL mirror cannot drift)."""

    import pandas as pd

    def gate(t: pa.Table) -> pa.Table:
        # stages/webclean.py's flat-token idiom (split_pattern →
        # list_flatten → segment bincounts), plus a factorize +
        # unique-(doc, code) pass for the distinct count — no Python
        # row loop. Separator " " mirrors .split() exactly on this
        # corpus (single-space, no leading/trailing whitespace) EXCEPT
        # the empty string, where split_pattern yields one '' token but
        # .split() yields none — force nw=0 there so empty docs drop at
        # any min_words >= 1 exactly as the scalar gate did.
        n = t.num_rows
        if n == 0:
            return t
        filled = pc.fill_null(t["text"], "")
        toks = pc.split_pattern(filled, " ").combine_chunks()
        raw_nw = pc.list_value_length(toks).to_numpy().astype(np.int64)
        nw = np.where(
            pc.equal(filled, "").to_numpy(zero_copy_only=False), 0, raw_nw)
        flat = pc.list_flatten(toks)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), raw_nw)
        codes = pd.factorize(flat.to_pandas())[0].astype(np.int64)
        ncodes = int(codes.max()) + 1 if len(codes) else 1
        uniq = np.unique(doc_idx * ncodes + codes)
        ndist = np.bincount(uniq // ncodes, minlength=n)
        keep = (nw >= min_words) & (1000 * ndist >= min_distinct_permille * nw)
        return t.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow")


def _paragraph_prep(ds: "rd.Dataset") -> "rd.Dataset":
    """12-word pseudo-paragraph chunking (the corpus has no newlines)
    plus planted boilerplate: BP1 prepended on doc_id%7, BP2 appended
    on doc_id%13 — the nav/footer furniture paragraph_dedup removes."""

    def prep(t: pa.Table) -> pa.Table:
        # vectorized 12-word chunking: on single-space text, "chunk
        # into 12-word paragraphs" ≡ "replace every 12th space with a
        # newline" — ONE RE2 GlobalReplace (non-overlapping matches
        # advance 12 words at a time). Texts here are non-empty (the
        # quality gate precedes), so the BP plants concatenate with an
        # unconditional '\n' seam, element-wise.
        chunked = pc.replace_substring_regex(
            pc.fill_null(t["text"], ""),
            r"((?:[^ ]+ ){11}[^ ]+) ", "\\1\n")
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pre = np.where(ids % 7 == 0, _BP1 + "\n", "").astype(object)
        post = np.where(ids % 13 == 0, "\n" + _BP2, "").astype(object)
        paras = pc.binary_join_element_wise(
            pa.array(pre, pa.string()), chunked,
            pa.array(post, pa.string()), "")
        return pa.table({"doc_id": t["doc_id"], "text": paras})

    return ds.map_batches(prep, batch_format="pyarrow")


def bench_grams(sf_dir: str) -> List[str]:
    """Benchmark 6-grams: first 6 words of every 97th document's
    ORIGINAL text, ordered by doc_id (the decontamination eval set)."""
    bench = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 97 == 0))
        # slice to the 6-gram BEFORE the driver collect: only a few
        # bytes per bench doc transit, never the full payloads
        grams = [" ".join((x or "").split()[:6])
                 for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "gram": pa.array(grams, pa.string())})

    rows = bench.map_batches(pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return [r["gram"] for r in rows]


def curate_full(
    sf_dir: str,
    min_words: int = 25,
    min_distinct_permille: int = 300,
    min_para_docs: int = 3,
    dup_threshold: float = 0.8,
    seq_len: int = 2048,
    num_shards: int = 8,
) -> "rd.Dataset":
    """The composed chain → training-shard manifest Dataset with columns
    (doc_id, url, n_paras, n_removed, n_emails, n_phones, n_ips,
    n_tokens, start_offset, first_seq, last_seq, shard_id, shard_pos)."""
    from ..ops.joins import anti_join
    from ..ops.prefix import prefix_sum_by_int_key
    from ..ops.shard import shard_positions
    from ..stages.dedup import (cluster_pairs, keep_list, latest_by_url,
                                loser_ids, minhash_pairs_exact_verified)
    from ..stages.urls import blocklist_filter
    from ..stages.webclean import (badwords_filter, decontaminate_filter,
                                   paragraph_dedup, pii_scrub_batch)

    # 1. ingest: latest capture per url wins ('html' payload col absent →
    #    rank on timestamp alone; each url's captures have distinct ts)
    winners = latest_by_url(synth_captures(sf_dir), payload_col="html")

    # 2. domain blocklist (source is recoverable from the url host)
    _hosts = np.array([f"src{i}" for i in range(20)], dtype=object)

    def add_host(t: pa.Table) -> pa.Table:
        base = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        host = _hosts[base % _COPY_BASE % 20]  # 20-entry gather, no row loop
        return t.append_column("host", pa.array(host, pa.string()))

    hosted = winners.map_batches(add_host, batch_format="pyarrow")
    unblocked = blocklist_filter(hosted, list(_BLOCKED_SOURCES),
                                 host_col="host")

    # 2b. C4-style term blocklist (whole-word, case-insensitive, one RE2
    #     alternation kernel) — the content-level sibling of the host
    #     blocklist; 'heck23' is inert (never occurs) so the alternation
    #     path is exercised.
    unbad = badwords_filter(unblocked, ["darn17", "heck23"],
                            text_col="text")

    # 3. quality gate, 4. boilerplate paragraph removal.
    # The paragraph_dedup output is the chain's first PHASE CHECKPOINT:
    # it is consumed three times (LSH shingling, the loser anti-join's
    # left side, and — via lineage — every later stage), so it pins to
    # the object store once (distributed blocks, spill-backed — NOT a
    # driver materialization; a production run would write this phase
    # to parquet, which is exactly what run_curate_full's resumable
    # sink does for the final phase). Without the pin the whole
    # ingest→extract prefix re-executes once per consumer.
    qual = _quality_gate(unbad, min_words, min_distinct_permille)
    pd_out = paragraph_dedup(_paragraph_prep(qual), "doc_id", "text",
                             sep="\n", min_docs=min_para_docs).materialize()
    pd_schema = pa.schema([("doc_id", pa.int64()), ("n_paras", pa.int64()),
                           ("n_removed", pa.int64()),
                           ("clean_text", pa.string())])

    # 5. near-dup keep-list: exact-verified MinHash pairs → components →
    #    losers stay a Dataset → distributed anti-join. The pair list is
    #    O(duplicated docs), tiny next to the corpus — pin it so
    #    cluster_pairs' count + union-find don't re-run the LSH. The
    #    anti-join's partition count scales to the MATERIALIZED left
    #    side's row count (free — pd_out is the phase checkpoint):
    #    aggregator spin-up tracks the data instead of paying 32 actor
    #    starts to shuffle a few thousand rows at test scale, while a
    #    100 TB run still fans out to cores.
    from ..ops.joins import adaptive_partitions

    pairs = minhash_pairs_exact_verified(pd_out, "doc_id", "clean_text",
                                         threshold=dup_threshold).materialize()
    clusters = cluster_pairs(pairs)
    losers = loser_ids(clusters, keep_list(clusters))
    unique_docs = anti_join(pd_out, losers, on="doc_id",
                            num_partitions=adaptive_partitions(pd_out.count()),
                            left_schema=pd_schema,
                            right_schema=pa.schema([("doc_id", pa.int64())]))

    # 6. decontamination: drop the benchmark docs themselves, plant
    #    contamination on every 31st doc, drop every doc containing any
    #    benchmark gram as a substring
    grams = bench_grams(sf_dir)
    nb = len(grams)

    def plant_and_drop_bench(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~((ids % 97 == 0) & (ids < _COPY_BASE))
        t = t.filter(pa.array(keep, pa.bool_()))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["clean_text"].to_pylist()
        planted = [
            (x or "") + (" " + grams[(int(d) // 31) % nb]
                         if nb and d % 31 == 0 else "")
            for d, x in zip(ids, texts)
        ]
        return t.set_column(t.schema.get_field_index("clean_text"),
                            "clean_text", pa.array(planted, pa.string()))

    contaminated_or_clean = unique_docs.map_batches(
        plant_and_drop_bench, batch_format="pyarrow")
    decon = decontaminate_filter(contaminated_or_clean, grams,
                                 text_col="clean_text")

    # 7. PII redaction (vectorized RE2 kernels)
    scrubbed = decon.map_batches(
        lambda t: pii_scrub_batch(t, "doc_id", "clean_text")
        .append_column("n_paras", t["n_paras"])
        .append_column("n_removed", t["n_removed"]),
        batch_format="pyarrow",
    )

    # 8. sequence packing: global token offsets via distributed prefix
    #    scan in doc_id order, then first/last training sequence
    def toklen(t: pa.Table) -> pa.Table:
        # len(x.split()) ≡ number of maximal non-whitespace runs — ONE
        # RE2 count kernel (text is ASCII ' '/'\n'-separated here)
        ns = pc.count_substring_regex(
            pc.fill_null(t["clean_text"], ""), r"\S+").cast(pa.int64())
        t = t.append_column("n_tokens", ns)
        return t.filter(pc.greater(t["n_tokens"], 0)).drop_columns(["clean_text"])

    # second phase checkpoint: the payload is GONE here (toklen drops
    # clean_text — the manifest precursor is a narrow all-integer
    # table), and the prefix scan + shard rank each consume it again;
    # pinning stops the dedup/decontaminate prefix re-executing.
    counts_only = scrubbed.map_batches(
        toklen, batch_format="pyarrow").materialize()
    with_off = prefix_sum_by_int_key(
        counts_only, "doc_id", "n_tokens", out_col="start_offset",
    )

    def seqs(t: pa.Table) -> pa.Table:
        start = np.asarray(t["start_offset"], np.int64)
        n = np.asarray(t["n_tokens"], np.int64)
        t = t.append_column("first_seq", pa.array(start // seq_len, pa.int64()))
        return t.append_column("last_seq",
                               pa.array((start + n - 1) // seq_len, pa.int64()))

    packed = with_off.map_batches(seqs, batch_format="pyarrow")

    # 9. shard manifest: md5 shard assign + within-shard rank
    manifest = shard_positions(packed, "doc_id", num_shards=num_shards)

    def emit(t: pa.Table) -> pa.Table:
        urls = [_url_of(int(d)) for d in t["doc_id"].to_pylist()]
        t = t.append_column("url", pa.array(urls, pa.string()))
        return t.select([
            "doc_id", "url", "n_paras", "n_removed", "n_emails", "n_phones",
            "n_ips", "n_tokens", "start_offset", "first_seq", "last_seq",
            "shard_id", "shard_pos",
        ])

    return manifest.map_batches(emit, batch_format="pyarrow")


def run_curate_full(
    sf_dir: str,
    out_dir: str,
    n_parts: int = 16,
    **kwargs,
) -> pa.Table:
    """Resumable execution: partition the manifest on url and write via
    the lineage sink (io/sink.py) — a killed run re-runs only incomplete
    partitions (see tests/test_curate_full.py kill-resume test)."""
    from ..io.sink import write_resumable

    return write_resumable(curate_full(sf_dir, **kwargs), out_dir,
                           n_parts=n_parts, key_col="url")
