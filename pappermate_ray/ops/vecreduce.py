"""Bounded reduction of per-block dense vectors — the partials contract
for the dense PageRank/HITS fast paths.

Problem shape: an iterative dense-id graph round asks every EDGE block
for an O(N) partial vector (``np.bincount`` / ``np.add.at`` over the
broadcast score vector) and needs the elementwise SUM of all partials.
Summing them on the driver is O(blocks × N) driver transit — bounded by
the node cap for N, but block count scales with EDGES, so a 2M-node
graph with billions of edges would push blocks × 16 MB through the
driver every round.

`dense_vector_sum` keeps the partials in the object store instead:

- each source block emits its partial CHUNKED into ``chunk_bytes``
  binary rows ``(chunk_id, bytes)``, skipping all-zero chunks (a sparse
  block ships only the regions it touched);
- the chunked partials are materialized once (same bytes the exchange
  below would hold anyway — never recomputed);
- **few partials** (small graphs / few edge blocks — the latency-bound
  regime): the driver sums them directly, bounded by
  ``driver_rows × chunk_bytes``;
- **many partials**: a ``groupby(chunk_id)`` with a vector-sum
  ``AggregateFn`` reduces them IN THE EXCHANGE — each aggregator
  receives only its chunk's rows (≤ blocks × chunk_bytes) and merges
  by addition, and the driver sees exactly ONE reduced row per chunk,
  i.e. O(N) total, independent of block count.

Float note: the grouped path's merge order is scheduler-dependent, so
float64 sums can differ in the last ulp between runs; callers that
oracle float outputs already round (``pagerank(round_to=...)``).
Integer vectors (HITS, degrees) are exact under any order.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import AggregateFn, Sum


def dense_vector_sum(
    src: "rd.Dataset",
    make_vec: Callable[[pa.Table], np.ndarray],
    n: int,
    dtype,
    chunk_bytes: int = 1 << 21,
    driver_rows: int = 128,
) -> np.ndarray:
    """Elementwise sum over per-block partial vectors.

    ``make_vec(table) -> np.ndarray`` of length ``n`` is evaluated once
    per source block; the summed length-``n`` vector comes back to the
    driver (callers broadcast it with ``ray.put`` next round, so O(N)
    driver transit is inherent to the dense representation — what this
    helper removes is the O(blocks × N) factor).
    """
    dtype = np.dtype(dtype)
    per_chunk = max(1, chunk_bytes // dtype.itemsize)
    nchunks = (n + per_chunk - 1) // per_chunk

    def part(t: pa.Table) -> pa.Table:
        v = np.ascontiguousarray(make_vec(t), dtype=dtype)
        ids, bufs = [], []
        for c in range(nchunks):
            seg = v[c * per_chunk:(c + 1) * per_chunk]
            if seg.any():
                ids.append(c)
                bufs.append(seg.tobytes())
        return pa.table({"c": pa.array(ids, pa.int32()),
                         "v": pa.array(bufs, pa.binary())})

    parts = src.map_batches(part, batch_format="pyarrow").materialize()
    out = np.zeros(n, dtype=dtype)

    if parts.count() <= driver_rows:
        # bounded driver fast path: ≤ driver_rows × chunk_bytes transit
        for b in parts.iter_batches(batch_size=driver_rows,
                                    batch_format="pyarrow"):
            for c, buf in zip(b["c"].to_pylist(), b["v"].to_pylist()):
                seg = np.frombuffer(buf, dtype=dtype)
                lo = c * per_chunk
                out[lo:lo + len(seg)] += seg
        return out

    def acc_block(a, blk: pa.Table):
        for buf in blk["v"].to_pylist():
            seg = np.frombuffer(buf, dtype=dtype)
            a = seg.copy() if a is None else a + seg
        return a

    agg = AggregateFn(
        init=lambda k: None,
        merge=lambda a, b: b if a is None else (a if b is None else a + b),
        accumulate_block=acc_block,
        finalize=lambda a: a.tobytes(),
        name="vsum",
    )
    for r in parts.groupby("c").aggregate(agg).take_all():
        seg = np.frombuffer(r["vsum"], dtype=dtype)
        lo = r["c"] * per_chunk
        out[lo:lo + len(seg)] = seg
    return out


def sparse_vector_sum(
    src: "rd.Dataset",
    make_vec: Callable[[pa.Table], np.ndarray],
    n: int,
    dtype,
    driver_rows: int = 100_000,
) -> np.ndarray:
    """Same contract as `dense_vector_sum`, but each block emits only
    its partial's NONZERO entries as narrow ``(index, value)`` rows —
    the per-block combiner for SPARSE graphs, where a block of E_b
    edges touches ≤ E_b of the N positions and a dense chunk emission
    would ship mostly zeros. One int-keyed ``groupby(index).Sum``
    reduces the entries in the exchange; ≤ N narrow rows return to the
    driver. Total exchange volume is 16·min(E, blocks·N) bytes vs the
    chunked path's 8·blocks·N — see `vector_sum` for the crossover
    rule."""
    dtype = np.dtype(dtype)
    pa_t = pa.from_numpy_dtype(dtype)

    def part(t: pa.Table) -> pa.Table:
        v = np.ascontiguousarray(make_vec(t), dtype=dtype)
        idx = np.flatnonzero(v)
        return pa.table({"i": pa.array(idx.astype(np.int64), pa.int64()),
                         "v": pa.array(v[idx], pa_t)})

    parts = src.map_batches(part, batch_format="pyarrow").materialize()
    out = np.zeros(n, dtype=dtype)
    if parts.count() <= driver_rows:
        for b in parts.iter_batches(batch_size=driver_rows,
                                    batch_format="pyarrow"):
            np.add.at(out, b["i"].to_numpy(zero_copy_only=False),
                      b["v"].to_numpy(zero_copy_only=False))
        return out
    summed = parts.groupby("i").aggregate(Sum("v", alias_name="s"))
    for b in summed.iter_batches(batch_size=65536, batch_format="pyarrow"):
        out[b["i"].to_numpy(zero_copy_only=False)] = \
            b["s"].to_numpy(zero_copy_only=False)
    return out


def vector_sum(
    src: "rd.Dataset",
    make_vec: Callable[[pa.Table], np.ndarray],
    n: int,
    dtype,
    n_src_rows: int = None,
) -> np.ndarray:
    """Auto-tier reduction over per-block dense partials. Crossover:
    chunked exchange volume is 8·blocks·N bytes, sparse is
    16·min(E, blocks·N) — sparse wins iff E < blocks·N/2 (derivation
    in the module docstring of each path). ``src`` should be
    materialized (iterative callers pin it anyway), so block and row
    counts are metadata-cheap."""
    try:
        blocks = max(1, src.num_blocks())  # metadata on materialized input
    except NotImplementedError:
        blocks = 1  # lazy input: assume few blocks → chunked path
    rows = n_src_rows if n_src_rows is not None else src.count()
    if rows < blocks * n / 2:
        return sparse_vector_sum(src, make_vec, n, dtype)
    return dense_vector_sum(src, make_vec, n, dtype)
