"""Bloom-filter-accelerated incremental anti-join (crawl-delta dedup).

The recurring web-pipeline question: "which of this crawl's documents
are NEW relative to everything already ingested?" At 100 TB the seen
side is billions of keys, so a driver key set is out, and a full
anti-join shuffles the entire new crawl even though the typical delta
is mostly-new (or mostly-seen). The classic fix is a Bloom filter
(Bloom 1970; the Common-Crawl/Nutch "crawldb" shape):

1. BUILD distributed: one streaming pass over the seen side's keys;
   each block emits ONE row holding a packed partial bitmap
   (``m_bits/8`` bytes); the reduce ORs O(blocks) bounded rows — the
   same bounded-partials contract as ops/kmeans.py. The corpus is
   never shuffled and the driver holds only the final ``m_bits/8``
   bytes (default 1 MiB for ~1.7M keys at 1% FPR).
2. PRUNE broadcast: the bitmap ships once via ``ray.put``; one
   map_batches pass splits the new crawl into *definitely-new* rows
   (any probe bit clear — Bloom has no false negatives, so these skip
   the shuffle entirely) and *maybe-seen* rows.
3. VERIFY exact: only the maybe-seen slice (true positives + the
   ~FPR sliver of false positives) pays the armored hash anti-join
   against the seen keys.

Output = definitely-new ∪ verified-new: exactly the plain anti-join's
answer (oracle: ``WHERE NOT EXISTS``), with the all-to-all exchange
carrying only ~|seen ∩ new| + FPR·|new| rows instead of |new|.

Hashing is md5-based double hashing (Kirsch–Mitzenmacher 2006:
``h_i = h1 + i·h2 mod m``), deterministic across processes and block
orders — no Python ``hash()``, no RNG.
"""

from __future__ import annotations

import hashlib
import math
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .joins import adaptive_partitions, anti_join


def bloom_params(n_keys: int, fpr: float = 0.01) -> Tuple[int, int]:
    """Standard sizing: m = -n·ln(p)/ln(2)^2 bits, k = m/n·ln(2) probes."""
    n = max(1, n_keys)
    m = int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2)))
    m = max(64, (m + 7) // 8 * 8)  # byte-align
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _probe_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) int64 bit positions via md5 double hashing.

    Vectorized over the batch: one md5 per key (the only per-row Python
    work, same cost class as the exact-dedup digest), then the k probe
    positions come from two 64-bit lanes by vector arithmetic.
    """
    digests = b"".join(hashlib.md5(s).digest() for s in keys)
    h = np.frombuffer(digests, "<u8").reshape(-1, 2).copy()
    h[:, 1] |= 1  # odd stride => full cycle mod m
    ks = np.arange(k, dtype=np.uint64)
    return ((h[:, :1] + ks[None, :] * h[:, 1:2]) % np.uint64(m_bits)).astype(
        np.int64
    )


def _key_bytes(col: pa.ChunkedArray) -> np.ndarray:
    """Key column as an object array of bytes (md5 input)."""
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        return np.array(col.to_pylist(), dtype=object)
    return np.array(
        [str(v).encode("utf-8") for v in col.to_pylist()], dtype=object
    )


def build_bloom(
    seen: "ray.data.Dataset",
    key_col: str,
    n_keys_hint: int,
    fpr: float = 0.01,
) -> Tuple[bytes, int, int]:
    """One streaming pass over ``seen[key_col]`` → (bitmap, m_bits, k).

    Each block contributes a single packed-bitmap row; the driver ORs
    the O(blocks) partials (bounded: blocks × m/8 bytes transit, never
    the keys themselves).
    """
    m_bits, k = bloom_params(n_keys_hint, fpr)
    nbytes = m_bits // 8

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits, np.uint8)
        if t.num_rows:
            pos = _probe_positions(_key_bytes(t[key_col]), m_bits, k)
            bits[pos.ravel()] = 1
        return pa.table({"bm": pa.array([np.packbits(bits).tobytes()],
                                        pa.binary(nbytes))})

    acc = np.zeros(nbytes, np.uint8)
    parts = seen.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_size=256, batch_format="pyarrow"):
        for buf in b["bm"].to_pylist():
            acc |= np.frombuffer(buf, np.uint8)
    return acc.tobytes(), m_bits, k


def bloom_split(
    ds: "ray.data.Dataset",
    key_col: str,
    bitmap: bytes,
    m_bits: int,
    k: int,
) -> Tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """(definitely_new, maybe_seen): one broadcast pass per slice, no
    shuffle.

    The bitmap rides in the object store once (``ray.put``) and is
    probed PACKED — ``(bm[pos>>3] >> (7-(pos&7))) & 1`` against the
    zero-copy plasma buffer — so no task ever pays an O(m_bits)
    ``np.unpackbits`` (at GB-scale bitmaps that unpack would dominate
    the probe). Per-batch cost is O(rows·k) gathers + the md5 probes.
    Both returned datasets lazily rescan ``ds`` (the md5 probe runs
    once per slice); ``bloom_split_tagged`` is the single-pass sibling
    for increment-sized/payload-heavy inputs — at crawl scale the
    double scan here is cheaper than holding the corpus.
    """
    bm_ref = ray.put(bitmap)

    def _maybe_mask(t: pa.Table) -> np.ndarray:
        if not t.num_rows:
            return np.zeros(0, bool)
        # zero-copy view of the shared plasma buffer; packbits is
        # big-endian bit order, so bit j lives at byte j>>3, bit 7-(j&7)
        bm = np.frombuffer(ray.get(bm_ref), np.uint8)
        pos = _probe_positions(_key_bytes(t[key_col]), m_bits, k)
        bits = (bm[pos >> 3] >> (7 - (pos & 7)).astype(np.uint8)) & 1
        return bits.all(axis=1)

    def _new(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(~_maybe_mask(t)))

    def _maybe(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_maybe_mask(t)))

    return (ds.map_batches(_new, batch_format="pyarrow"),
            ds.map_batches(_maybe, batch_format="pyarrow"))


def bloom_split_tagged(
    ds: "ray.data.Dataset",
    key_col: str,
    bitmap: bytes,
    m_bits: int,
    k: int,
    tag_col: str = "_maybe_seen",
) -> Tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Single-pass ``bloom_split``: ONE md5-probe scan emits a boolean
    ``tag_col``, the tagged dataset materializes, and both slices
    filter from the materialized blocks — each row pays the hash probe
    exactly once. The right choice when the input is increment-sized
    or payload-heavy enough that re-scanning costs more than holding
    it (``bloom_split`` keeps the zero-materialization double-scan for
    crawl-scale inputs; see its docstring)."""
    bm_ref = ray.put(bitmap)

    def _tag(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column(tag_col, pa.array([], pa.bool_()))
        bm = np.frombuffer(ray.get(bm_ref), np.uint8)
        pos = _probe_positions(_key_bytes(t[key_col]), m_bits, k)
        bits = (bm[pos >> 3] >> (7 - (pos & 7)).astype(np.uint8)) & 1
        return t.append_column(tag_col, pa.array(bits.all(axis=1)))

    tagged = ds.map_batches(_tag, batch_format="pyarrow").materialize()

    def _slice(want: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = t[tag_col].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(mask == want)).drop_columns([tag_col])
        return f

    return (tagged.map_batches(_slice(False), batch_format="pyarrow"),
            tagged.map_batches(_slice(True), batch_format="pyarrow"))


def incremental_new(
    new: "ray.data.Dataset",
    seen: "ray.data.Dataset",
    key_col: str,
    n_seen_hint: int,
    fpr: float = 0.01,
    num_partitions: Optional[int] = None,
    new_schema: Optional[pa.Schema] = None,
    seen_schema: Optional[pa.Schema] = None,
    single_pass: bool = False,
) -> "ray.data.Dataset":
    """Rows of ``new`` whose key never occurs in ``seen`` (exact).

    Bloom prune (no false negatives) keeps definitely-new rows out of
    the exchange; only the maybe-seen slice pays the armored anti-join.

    ``single_pass=True`` routes through ``bloom_split_tagged`` (probe
    each row's md5 once, hold a tagged materialized copy). Measured at
    1M × 400-byte rows on 32 cpus: the double scan wins both with a
    materialized input (0.65 s vs 1.96 s) and with a regex-heavy
    unmaterialized lineage (2.46 s vs 2.92 s) — writing the tagged
    payload copy to the object store costs more than re-probing — so
    the double scan stays the default; opt in when the increment's
    lineage is extraction-grade expensive (tools/bench_bloom_split.py
    is the harness).
    """
    bitmap, m_bits, k = build_bloom(seen, key_col, n_seen_hint, fpr)
    split = bloom_split_tagged if single_pass else bloom_split
    definitely_new, maybe = split(new, key_col, bitmap, m_bits, k)
    npart = num_partitions or adaptive_partitions(n_seen_hint)
    verified = anti_join(
        maybe, seen.select_columns([key_col]), on=key_col,
        num_partitions=npart,
        left_schema=new_schema, right_schema=seen_schema,
    )
    return definitely_new.union(verified)
