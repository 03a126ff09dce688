"""Sketch operators (beyond-reference, driver brief "novel sketch"):
approximate distinct counting and heavy hitters at 100 TB scale, where
the exact versions (``ds.unique`` / full wordcount) are all-to-all
shuffles over every distinct value.

- ``hll_distinct``: HyperLogLog (Flajolet et al. 2007, with the standard
  small-range linear-counting correction). Each batch folds its values
  into ONE 2^p-register row; the per-block sketches (16 KiB at p=14) are
  merged by register-wise max. The merge input is O(blocks × 2^p) — a
  function of the block count, never the data — so collecting it is the
  sketch's whole point, not a driver materialization of the dataset.
- ``heavy_hitters``: Count-Min (Cormode & Muthukrishnan 2005) +
  per-batch candidate top lists. Frequencies come from the merged CM
  (never under-estimates truth by construction, overestimates bounded by
  εN); candidates from the union of per-batch local tops — a value
  missing from every batch's local top can't be a global heavy hitter at
  the chosen ratio (standard candidate-set argument; validated against
  the exact top-k in tests).

Both are deterministic: hashing is md5/FNV-derived, no RNG, no clock —
the same corpus always yields the same estimate.
"""

from __future__ import annotations

import hashlib
from collections import Counter
from typing import Iterable, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

_HLL_P = 14
_HLL_M = 1 << _HLL_P


def _hash64(values: Iterable[str]) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8], "little")
         for v in values],
        dtype=np.uint64,
    )


def hll_registers(values: List[str], p: int = _HLL_P) -> np.ndarray:
    """One HLL register array (uint8, 2^p) for a value list — vectorized:
    bucket = top p bits, rank = leading-zeros-in-remainder + 1 via log2."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not values:
        return regs
    h = _hash64(values)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # exact vectorized count-leading-zeros: unpack each value's bytes
    # big-endian and argmax the first set bit (float log2 would round
    # 2^k-1 up to 2^k for k > 53 and skew the rank)
    be = rest.view(np.uint8).reshape(-1, 8)[:, ::-1]
    bits = np.unpackbits(be, axis=1)
    lz = np.argmax(bits, axis=1)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_merge(sketches: Iterable[np.ndarray]) -> np.ndarray:
    out = np.zeros(_HLL_M, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for the small range
    return float(est)


def hll_distinct(ds: "rd.Dataset", values_fn, p: int = _HLL_P) -> Tuple[float, int]:
    """Approximate distinct count of ``values_fn(batch) -> list[str]``.

    Returns (estimate, n_block_sketches). One streaming pass; the shuffle
    is replaced by collecting O(blocks) fixed-size register rows.
    """

    def sketch_batch(t: pa.Table) -> pa.Table:
        regs = hll_registers(values_fn(t), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    merged = hll_merge(np.frombuffer(r["regs"], dtype=np.uint8) for r in rows)
    return hll_estimate(merged), len(rows)


def hll_distinct_by_group(
    ds: "rd.Dataset",
    group_col: str,
    values_fn,
    p: int = _HLL_P,
    est_col: str = "est_distinct",
) -> "rd.Dataset":
    """Per-group approximate distinct count — the scale path for
    ``COUNT(DISTINCT x) GROUP BY g``: the exact form shuffles every
    distinct (g, x) pair; this shuffles one fixed 2^p-byte register row
    per (group × block) and NEVER the values. Per batch the rows are
    run-partitioned by group and each run contributes one sketch of
    ``values_fn(sub_batch) -> list[str]``; one narrow groupby then
    max-merges registers (lossless w.r.t. the sketch, same property the
    persisted store pins) and estimates. Returns a Dataset of
    ``(group_col, est_col)`` with the standard ±1.04/sqrt(2^p) error
    (±0.8% at p=14). Skew-immune: a hot group still costs one register
    row per block, not its cardinality."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        garr = np.array(t[group_col].to_pylist(), dtype=object)
        order = np.argsort(garr, kind="stable")
        ts = t.take(pa.array(order, pa.int64()))
        gs = garr[order]
        n = len(gs)
        out_g: list = []
        out_r: list = []
        if n:
            change = np.ones(n, bool)
            change[1:] = gs[1:] != gs[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                sub = ts.slice(s, e - s)
                out_g.append(gs[s])
                out_r.append(hll_registers(values_fn(sub), p).tobytes())
        return pa.table({
            group_col: pa.array(out_g, t[group_col].type),
            "regs": pa.array(out_r, pa.binary()),
        })

    def merge(g: pa.Table) -> pa.Table:
        stack = np.stack([np.frombuffer(r, np.uint8)
                          for r in g["regs"].to_pylist()])
        est = hll_estimate(np.maximum.reduce(stack, axis=0))
        return pa.table({
            group_col: g[group_col].slice(0, 1),
            est_col: pa.array([est], pa.float64()),
        })

    return (ds.map_batches(sketch_batch, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(merge, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Count-Min heavy hitters
# ---------------------------------------------------------------------------

_CM_D = 4
_CM_W = 1 << 14
_CM_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)


def _cm_rows(values: np.ndarray) -> np.ndarray:
    """(d, n) row indices for hashed values (independent seeded mixes)."""
    idx = np.empty((_CM_D, len(values)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for d, seed in enumerate(_CM_SEEDS):
            mixed = (values ^ np.uint64(seed)) * np.uint64(0xFF51AFD7ED558CCD)
            mixed ^= mixed >> np.uint64(33)
            idx[d] = (mixed % np.uint64(_CM_W)).astype(np.int64)
    return idx


def heavy_hitters(
    ds: "rd.Dataset",
    values_fn,
    k: int = 20,
    candidates_per_block: int = 200,
) -> pa.Table:
    """Top-k values by frequency via Count-Min + per-block candidates.

    Per batch: local exact Counter → top ``candidates_per_block``
    candidates AND a (d × w) count matrix of ALL the batch's values.
    Merge: CM matrices sum (linearity), candidate sets union — both
    O(blocks × sketch), independent of corpus size. Estimates are
    ``min_d CM[d, h_d(v)]`` (classic CM upper-bound-of-truth estimate).
    Output: (value, est_count) top-k, count-desc then value-asc.
    """

    def sketch_batch(t: pa.Table) -> pa.Table:
        vals = values_fn(t)
        counts = Counter(vals)
        cm = np.zeros((_CM_D, _CM_W), dtype=np.int64)
        if counts:
            uniq = list(counts.keys())
            freq = np.array([counts[u] for u in uniq], dtype=np.int64)
            idx = _cm_rows(_hash64(uniq))
            for d in range(_CM_D):
                np.add.at(cm[d], idx[d], freq)
        cands = [v for v, _ in counts.most_common(candidates_per_block)]
        return pa.table({
            "cm": pa.array([cm.tobytes()], pa.binary()),
            "cands": pa.array(["\x00".join(cands)], pa.string()),
        })

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    cm = np.zeros((_CM_D, _CM_W), dtype=np.int64)
    cands: set = set()
    for r in rows:
        cm += np.frombuffer(r["cm"], dtype=np.int64).reshape(_CM_D, _CM_W)
        if r["cands"]:
            cands.update(r["cands"].split("\x00"))
    if not cands:
        return pa.table({"value": pa.array([], pa.string()),
                         "est_count": pa.array([], pa.int64())})
    cand_list = sorted(cands)
    idx = _cm_rows(_hash64(cand_list))
    ests = np.min(
        np.stack([cm[d, idx[d]] for d in range(_CM_D)]), axis=0
    )
    order = sorted(range(len(cand_list)), key=lambda i: (-int(ests[i]), cand_list[i]))[:k]
    return pa.table({
        "value": pa.array([cand_list[i] for i in order], pa.string()),
        "est_count": pa.array([int(ests[i]) for i in order], pa.int64()),
    })


# ---------------------------------------------------------------------------
# HDR-histogram approximate quantiles
# ---------------------------------------------------------------------------
#
# The mergeable scale path for quantiles when the exact operator's
# value-count compression (ops/quantiles.py) stops compressing — huge or
# continuous value domains. Buckets are HDR-style (Gray/Tene): values
# < 64 are exact; above that, a bucket is (msb, next-6-bits), giving
# ≤ 1/64 ≈ 1.6% relative width across the whole int64 range in a FIXED
# 4096-slot histogram. Per-block histograms are 32 KiB and merge by
# vector addition — O(blocks), order-independent, deterministic.
#
# The bucket map is integer-exact and monotone, so the sketch's answer
# is EXACTLY quantile_disc over bucket lower edges — which makes this
# approximate operator bit-for-bit SQL-oracle-checkable, and bounds its
# error against the true quantile by one bucket width by construction.

_HDR_SUB_BITS = 6
_HDR_SLOTS = 64 << _HDR_SUB_BITS  # msb < 64 → key < 4096


def hdr_keys(v: np.ndarray) -> np.ndarray:
    """Bucket keys for non-negative int64 values (< 2^53 — the float64
    mantissa bound frexp relies on; crawl-scale counters fit easily)."""
    v = v.astype(np.int64)
    keys = v.copy()
    big = v >= (1 << _HDR_SUB_BITS)
    if big.any():
        vb = v[big]
        _, exp = np.frexp(vb.astype(np.float64))  # exact: v < 2^53
        m = exp - 1
        sub = (vb >> (m - _HDR_SUB_BITS)) & ((1 << _HDR_SUB_BITS) - 1)
        keys[big] = (m << _HDR_SUB_BITS) | sub
    return keys


def hdr_edge(key: int) -> int:
    """Lower edge of a bucket key (the sketch's reported value)."""
    if key < (1 << _HDR_SUB_BITS):
        return key
    m, sub = key >> _HDR_SUB_BITS, key & ((1 << _HDR_SUB_BITS) - 1)
    return ((1 << _HDR_SUB_BITS) | sub) << (m - _HDR_SUB_BITS)


def approx_quantiles(
    ds: "rd.Dataset", value_col: str, qs: List[float]
) -> Tuple[List[int], int]:
    """Approximate discrete quantiles of an int column via merged HDR
    histograms. Returns (edges per q, n_block_sketches). Same ceil-rank
    rule as the exact operator: idx = max(0, ceil(q*n) - 1)."""
    import math

    def sketch_batch(t: pa.Table) -> pa.Table:
        keys = hdr_keys(np.asarray(t[value_col], np.int64))
        counts = np.bincount(keys, minlength=_HDR_SLOTS).astype(np.int64)
        return pa.table({"h": pa.array([counts.tobytes()], pa.binary())})

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    hist = np.zeros(_HDR_SLOTS, dtype=np.int64)
    for r in rows:
        hist += np.frombuffer(r["h"], dtype=np.int64)
    cum = np.cumsum(hist)
    n = int(cum[-1])
    out = []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)
        key = int(np.searchsorted(cum, idx + 1))
        out.append(hdr_edge(key))
    return out, len(rows)


def save_hdr_increment(
    ds: "rd.Dataset", value_col: str, store_dir: str,
) -> str:
    """Sketch ONE corpus increment's value distribution and append it to
    ``store_dir`` as a single 32 KiB histogram row — HDR histograms add,
    so the merge across increments is EXACT w.r.t. the sketch: quantiles
    over a growing stream never re-scan old increments (the quantile
    member of the persisted-store family: HLL=distinct, stats=sum/count,
    HDR=distribution)."""
    from .search import write_increment

    def sketch_batch(t: pa.Table) -> pa.Table:
        keys = hdr_keys(np.asarray(t[value_col], np.int64))
        counts = np.bincount(keys, minlength=_HDR_SLOTS).astype(np.int64)
        return pa.table({"h": pa.array([counts.tobytes()], pa.binary())})

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    hist = np.zeros(_HDR_SLOTS, dtype=np.int64)
    for r in rows:
        hist += np.frombuffer(r["h"], dtype=np.int64)
    write_increment(
        rd.from_arrow(pa.table({"h": pa.array([hist.tobytes()],
                                              pa.binary())})),
        store_dir, "hdr")
    return store_dir


def stored_quantiles(store_dir: str, qs: List[float]) -> List[int]:
    """Quantiles over the UNION of every stored increment — vector-add
    the histogram rows (O(increments) 32 KiB reads), then the same
    ceil-rank rule; bit-exact equal to ``approx_quantiles`` over the
    concatenated corpora."""
    import math

    import pyarrow.parquet as pqt

    t = pqt.read_table(f"{store_dir}/hdr")
    hist = np.zeros(_HDR_SLOTS, dtype=np.int64)
    for r in t["h"].to_pylist():
        hist += np.frombuffer(r, dtype=np.int64)
    cum = np.cumsum(hist)
    n = int(cum[-1])
    out = []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)
        key = int(np.searchsorted(cum, idx + 1))
        out.append(hdr_edge(key))
    return out


def grouped_approx_quantiles(
    ds: "rd.Dataset",
    group_col: str,
    value_col: str,
    qs: List[float],
    out_names: Optional[List[str]] = None,
) -> "rd.Dataset":
    """Per-group HDR quantiles — the skew-immune scale path for
    ``ops/quantiles.grouped_quantiles`` when value-count compression
    stops compressing (huge/continuous domains): ONE fixed 32 KiB
    histogram per (group × block) shuffles, never the values, and a hot
    group still costs one histogram row per block, not its cardinality.
    Per-group merge is vector addition; the answer uses the same
    ceil-rank rule over bucket lower edges, so it is BIT-EXACT equal to
    SQL ``quantile_disc`` over the hdr edge expression per group (the
    global ``approx_quantiles`` property, grouped)."""
    import math

    names = out_names or [f"p{int(round(q * 100)):02d}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("out_names must match qs length")

    def sketch_batch(t: pa.Table) -> pa.Table:
        garr = np.array(t[group_col].to_pylist(), dtype=object)
        vals = np.asarray(t[value_col], np.int64)
        order = np.argsort(garr, kind="stable")
        gs, vs = garr[order], vals[order]
        n = len(gs)
        out_g: list = []
        out_h: list = []
        if n:
            change = np.ones(n, bool)
            change[1:] = gs[1:] != gs[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                keys = hdr_keys(vs[s:e])
                out_g.append(gs[s])
                out_h.append(np.bincount(
                    keys, minlength=_HDR_SLOTS).astype(np.int64).tobytes())
        return pa.table({
            group_col: pa.array(out_g, t[group_col].type),
            "h": pa.array(out_h, pa.binary()),
        })

    def finish(g: pa.Table) -> pa.Table:
        hist = np.zeros(_HDR_SLOTS, dtype=np.int64)
        for r in g["h"].to_pylist():
            hist += np.frombuffer(r, dtype=np.int64)
        cum = np.cumsum(hist)
        n = int(cum[-1])
        cols = {group_col: g[group_col].slice(0, 1)}
        for q, name in zip(qs, names):
            idx = max(0, math.ceil(q * n) - 1)
            key = int(np.searchsorted(cum, idx + 1))
            cols[name] = pa.array([hdr_edge(key)], pa.int64())
        return pa.table(cols)

    return (ds.map_batches(sketch_batch, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(finish, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Persisted, mergeable sketch store — corpus statistics that survive
# across crawl increments. HLL registers merge by element-wise max and
# the merge is LOSSLESS: registers(A ∪ B) == max(registers(A),
# registers(B)) exactly, so distinct-counts over a growing corpus never
# re-scan old increments — the sibling of the minhash/PQ/BM25 persisted
# indexes for the statistics side of the pipeline.
# ---------------------------------------------------------------------------


def save_hll_increment(
    ds: "rd.Dataset",
    values_fn,
    store_dir: str,
    p: int = _HLL_P,
) -> str:
    """Sketch ONE corpus increment and append it to ``store_dir`` as a
    single (p, regs) parquet row (16 KiB at p=14). Per-block register
    partials merge driver-side — O(blocks·2^p), the hll_distinct
    contract — so the increment is one streaming pass over the new data
    only."""
    import os

    def sketch_batch(t: pa.Table) -> pa.Table:
        regs = hll_registers(values_fn(t), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    m = 1 << p
    merged = np.zeros(m, dtype=np.uint8)
    for r in rows:
        np.maximum(merged, np.frombuffer(r["regs"], dtype=np.uint8),
                   out=merged)
    from .search import write_increment

    write_increment(rd.from_arrow(pa.table({
        "p": pa.array([p], pa.int64()),
        "regs": pa.array([merged.tobytes()], pa.binary()),
    })), store_dir, "")
    return store_dir


def stored_hll_registers(store_dir: str) -> np.ndarray:
    """Max-merge every increment's registers (read-only; bytes read =
    16 KiB · #increments, independent of corpus size)."""
    import pyarrow.parquet as pqt

    t = pqt.read_table(store_dir, columns=["p", "regs"])
    ps = set(t["p"].to_pylist())
    if len(ps) > 1:
        raise ValueError(f"mixed precisions in sketch store: {sorted(ps)}")
    if not ps:
        return np.zeros(_HLL_M, dtype=np.uint8)
    merged = np.zeros(1 << ps.pop(), dtype=np.uint8)
    for r in t["regs"].to_pylist():
        np.maximum(merged, np.frombuffer(r, dtype=np.uint8), out=merged)
    return merged


def stored_hll_estimate(store_dir: str) -> Tuple[float, int]:
    """(distinct estimate over the UNION of all saved increments,
    number of increments)."""
    import os

    regs = stored_hll_registers(store_dir)
    n = len([x for x in os.listdir(store_dir)
             if x.startswith("add_") and not x.endswith(".tmp")])
    return hll_estimate(regs), n


def stored_hll_overlap(store_a: str, store_b: str) -> dict:
    """Corpus-overlap report from two sketch stores, WITHOUT touching
    either corpus: union registers are the element-wise max of the two
    stores' merged registers, and inclusion-exclusion gives
    ``|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)`` plus the Jaccard — the
    instant what-did-this-crawl-add / how-much-do-these-datasets-share
    answer (error compounds over three ±0.8% estimates at p=14, so the
    band is a few percent of the UNION; pinned in tests and the gate).
    Returns {est_a, est_b, est_union, est_intersection, jaccard}."""
    ra = stored_hll_registers(store_a)
    rb = stored_hll_registers(store_b)
    if len(ra) != len(rb):
        raise ValueError(
            f"stores use different precisions ({len(ra)} vs {len(rb)} registers)")
    est_a = hll_estimate(ra)
    est_b = hll_estimate(rb)
    est_u = hll_estimate(np.maximum(ra, rb))
    inter = max(0.0, est_a + est_b - est_u)
    return {
        "est_a": est_a,
        "est_b": est_b,
        "est_union": est_u,
        "est_intersection": inter,
        "jaccard": inter / est_u if est_u > 0 else 0.0,
    }
