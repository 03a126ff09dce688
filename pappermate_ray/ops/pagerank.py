"""Distributed PageRank over an edge Dataset — the web-graph ranking op
(Page et al. 1999; Common-Crawl host ranking) a 100 TB crawl pipeline
uses to weight/prioritise documents.

Bulk-synchronous shape, one round per iteration:

- out-degrees are computed ONCE (groupby count) and joined onto the
  edge list up front — the weighted edge list is the loop invariant;
- each round is exactly one partitioned hash join (edges × ranks on the
  source key) and one groupby-sum on the destination key: rank mass
  ``r(u)/outdeg(u)`` flows along edges, then
  ``r'(v) = (1-d)/N + d * Σ inflow``;
- nodes with no in-links keep the teleport term via a zero-row union
  (no second join);
- ranks and the weighted edge list are **materialized per round** —
  object-store blocks, never the driver — because an iterative
  dataflow's lineage otherwise re-executes all previous rounds at every
  schema probe/consume. Memory is O(N + E) in the object store with
  spill, and both exchanges reuse the SAME key family (src/dst/node),
  the partitioning-reuse rule from SURVEY.md §4.

Deterministic given the graph; with a fixed iteration count the whole
computation unrolls into SQL joins, so it is oracle-checkable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from .joins import adaptive_partitions, hash_join


def pagerank(
    nodes: "rd.Dataset",
    edges: "rd.Dataset",
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
    round_to: Optional[int] = None,
    num_partitions: Optional[int] = None,
    dense_ids: bool = False,
    dense_bound: int = 2_000_000,
) -> "rd.Dataset":
    """Ranks after ``iters`` synchronous rounds: ``(node_col, pagerank)``.

    ``nodes`` must hold every vertex once; ``edges`` rows are directed
    src→dst (parallel edges count multiply, like repeated hyperlinks).

    ``dense_ids=True`` asserts node ids are contiguous ints 0..N-1; when
    N ≤ ``dense_bound`` that unlocks the broadcast fast path (same
    hybrid rule as webclean's bounded bucket prune): the rank vector is
    the ``ray.put`` small side, each round is ONE streaming pass over
    edges emitting a per-block dense inflow vector, and vectors merge
    by addition in the object store via the bounded partials contract
    (`ops/vecreduce.dense_vector_sum`: driver transit O(N), never
    O(edge blocks × N)). Beyond the
    bound (or with arbitrary ids) the join path below is the 100 TB
    shape. Both paths are asserted equal in tests.
    """
    n = nodes.count()
    if dense_ids and n <= dense_bound:
        return _pagerank_dense(
            nodes, edges, node_col, src_col, dst_col, damping, iters, round_to, n
        )
    # every round pays aggregator spin-up per join partition; size the
    # exchange to the graph (node count), not blindly to cluster cores
    num_partitions = num_partitions or adaptive_partitions(n)
    base = (1.0 - damping) / n
    sch = nodes.schema()  # Ray Schema wrapper: parallel names/types lists
    key_t = dict(zip(sch.names, sch.types))[node_col]

    outdeg = edges.groupby(src_col).aggregate(Count(alias_name="outdeg"))
    ew = hash_join(
        edges, outdeg, on=src_col, num_partitions=num_partitions,
        right_schema=pa.schema([(src_col, key_t), ("outdeg", pa.int64())]),
    ).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({
            node_col: t[node_col],
            "r": pa.array(np.full(len(t), 1.0 / n), pa.float64()),
        })

    rank_schema = pa.schema([(node_col, key_t), ("r", pa.float64())])
    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            node_col: t[node_col],
            "w": pa.array(np.zeros(len(t)), pa.float64()),
        })

    zeros = nodes.map_batches(zero_rows, batch_format="pyarrow").materialize()

    for _ in range(iters):
        joined = hash_join(
            ew, ranks, on=src_col, right_on=node_col,
            num_partitions=num_partitions, right_schema=rank_schema,
        )

        def flow(t: pa.Table) -> pa.Table:
            w = np.asarray(t["r"], np.float64) / np.asarray(t["outdeg"], np.float64)
            return pa.table({
                node_col: t[dst_col].cast(key_t),
                "w": pa.array(w, pa.float64()),
            })

        inflow = joined.map_batches(flow, batch_format="pyarrow")
        summed = inflow.union(zeros).groupby(node_col).aggregate(
            Sum("w", alias_name="w_sum")
        )

        def update(t: pa.Table) -> pa.Table:
            r = base + damping * np.asarray(t["w_sum"], np.float64)
            return pa.table({
                node_col: t[node_col],
                "r": pa.array(r, pa.float64()),
            })

        ranks = summed.map_batches(update, batch_format="pyarrow").materialize()

    def final(t: pa.Table) -> pa.Table:
        r = np.asarray(t["r"], np.float64)
        if round_to is not None:
            r = np.round(r, round_to)
        return pa.table({node_col: t[node_col], "pagerank": pa.array(r, pa.float64())})

    return ranks.map_batches(final, batch_format="pyarrow")


def _pagerank_dense(
    nodes, edges, node_col, src_col, dst_col, damping, iters, round_to, n
):
    import ray

    from .vecreduce import vector_sum

    # the edge list is the loop invariant — pin it once so the 1+iters
    # reductions below never re-execute upstream lineage
    edges = edges.materialize()
    n_edges = edges.count()

    # out-degree vector: per-block bincounts, reduced via the bounded
    # partials contract (ops/vecreduce.py auto tier: chunked grouped
    # vectors for dense blocks, narrow (index, value) rows for sparse
    # graphs) — driver transit is O(N), never O(edge blocks × N)
    od = vector_sum(
        edges,
        lambda t: np.bincount(np.asarray(t[src_col], np.int64), minlength=n),
        n, np.int64, n_src_rows=n_edges)

    base = (1.0 - damping) / n
    ranks = np.full(n, 1.0 / n)
    oref = ray.put(od)
    for _ in range(iters):
        rref = ray.put(ranks)

        def contrib(t: pa.Table) -> np.ndarray:
            r, o = ray.get(rref), ray.get(oref)
            src = np.asarray(t[src_col], np.int64)
            dst = np.asarray(t[dst_col], np.int64)
            vec = np.zeros(n)
            np.add.at(vec, dst, r[src] / o[src])
            return vec

        inflow = vector_sum(edges, contrib, n, np.float64,
                            n_src_rows=n_edges)
        ranks = base + damping * inflow

    fref = ray.put(np.round(ranks, round_to) if round_to is not None else ranks)

    def emit(t: pa.Table) -> pa.Table:
        r = ray.get(fref)[np.asarray(t[node_col], np.int64)]
        return pa.table({node_col: t[node_col], "pagerank": pa.array(r, pa.float64())})

    return nodes.map_batches(emit, batch_format="pyarrow")


def pagerank_auto(
    nodes: "rd.Dataset",
    edges: "rd.Dataset",
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
    round_to: Optional[int] = None,
    dense_bound: int = 2_000_000,
) -> "rd.Dataset":
    """PageRank for ARBITRARY node ids (urls, hashes) with the hybrid
    small-graph rule: when the node count is ≤ ``dense_bound``, ids are
    dictionary-encoded to dense ints — one vectorized ``pc.index_in``
    pass per side against the broadcast sorted-id table — and ranked by
    the zero-join dense path (per-round cost = one streaming edge pass
    + O(blocks·N) vector adds, instead of 2 exchanges × iters); beyond
    the bound the BSP join path runs on the original ids unchanged.
    Same contract as ``pagerank`` (``nodes`` holds every vertex once);
    both routes produce identical rankings (asserted in tests).

    Why this exists: iterative exchanges have a fixed per-round floor
    (~seconds at small scale), so a 3-round PageRank over a few thousand
    harvested urls was paying ~6 exchange spin-ups for microseconds of
    math. A web-scale host graph (~1e8 nodes) still takes the join
    path — the bound is on the NODE table (which must fit the object
    store broadcast), never the edge count.
    """
    import ray

    n = nodes.count()
    if n > dense_bound:
        return pagerank(nodes, edges, node_col, src_col, dst_col,
                        damping, iters, round_to)
    # deterministic dense encoding: sorted unique ids → 0..N-1
    id_rows = nodes.take_all()
    ids = pa.array(sorted(r[node_col] for r in id_rows))
    ref = ray.put(ids)

    def enc(cols):
        def f(t: pa.Table) -> pa.Table:
            vs = ray.get(ref)
            return pa.table({
                out: pc.index_in(t[c], value_set=vs).cast(pa.int64())
                for c, out in cols
            })
        return f

    nodes_enc = nodes.map_batches(enc([(node_col, node_col)]),
                                  batch_format="pyarrow")
    edges_enc = edges.map_batches(
        enc([(src_col, src_col), (dst_col, dst_col)]),
        batch_format="pyarrow").materialize()
    ranked = _pagerank_dense(nodes_enc, edges_enc, node_col, src_col,
                             dst_col, damping, iters, round_to, n)

    def dec(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        return pa.table({
            node_col: vs.take(t[node_col]),
            "pagerank": t["pagerank"],
        })

    return ranked.map_batches(dec, batch_format="pyarrow")


def trustrank(
    nodes: "rd.Dataset",
    edges: "rd.Dataset",
    seeds: "rd.Dataset",
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 3,
    round_to: Optional[int] = None,
    num_partitions: Optional[int] = None,
    dense_bound: int = 2_000_000,
) -> "rd.Dataset":
    """TrustRank (Gyöngyi et al. 2004): PageRank with the teleport mass
    concentrated on a trusted SEED set instead of spread uniformly —
    ``r'(v) = (1−d)·t(v) + d·Σ inflow`` with ``t(v) = 1/|S|`` for seed
    nodes and 0 elsewhere, initialized at ``r = t``. Trust decays along
    distance from the seeds, so spam clusters far from any trusted host
    score ≈ 0 even when raw PageRank inflates them — the ranking-side
    complement of the k-core / reciprocity hygiene signals.

    Same BSP discipline as :func:`pagerank` (one edges×ranks join + one
    narrow inflow groupby-sum per round, ranks re-materialized); the
    seed set — small by definition (hand-vetted hosts) — BROADCASTS
    once via ``ray.put``, so the teleport term costs a vectorized
    ``is_in`` inside the update map, never a join. Dangling-node mass
    is dropped, exactly as :func:`pagerank` does (pinned semantics both
    sides of the oracle). With fixed ``iters`` the computation unrolls
    into SQL (CASE WHEN seed teleport per round).

    Dense tier (round 5, the ``pagerank_auto`` pattern): node sets ≤
    ``dense_bound`` dictionary-encode and iterate via broadcast rank
    vectors + ``vector_sum`` bincount-style inflow partials — zero
    per-round joins/groupbys; beyond the bound the BSP path runs
    unchanged. Both tiers asserted equal (to the rounding grid) in
    tests."""
    import ray as _ray

    from .bfs import collect_key_array

    num_partitions = num_partitions or adaptive_partitions(nodes.count())
    sch = nodes.schema()
    key_t = dict(zip(sch.names, sch.types))[node_col]
    rank_schema = pa.schema([(node_col, key_t), ("r", pa.float64())])

    # |S| counts DISTINCT seeds — a duplicated seed row must not
    # shrink everyone's teleport share
    seed_arr = collect_key_array(
        seeds.groupby(node_col).aggregate(Count())
        .select_columns([node_col]), node_col, key_t)
    n_seeds = len(seed_arr)
    if n_seeds == 0:
        raise ValueError("trustrank needs a non-empty seed set")
    seed_ref = _ray.put(seed_arr)
    t_seed = 1.0 / n_seeds

    n_nodes = nodes.count()
    if n_nodes and n_nodes <= dense_bound:
        return _trustrank_dense(nodes, edges, seed_arr, node_col, src_col,
                                dst_col, damping, iters, round_to,
                                n_nodes, key_t, t_seed)

    def teleport(col: pa.ChunkedArray) -> np.ndarray:
        hit = pc.is_in(col, value_set=_ray.get(seed_ref))
        return np.where(hit.to_numpy(zero_copy_only=False), t_seed, 0.0)

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({
            node_col: t[node_col],
            "r": pa.array(teleport(t[node_col]), pa.float64()),
        })

    ranks = nodes.map_batches(init_ranks,
                              batch_format="pyarrow").materialize()

    outdeg = edges.groupby(src_col).aggregate(Count(alias_name="outdeg"))
    ew = hash_join(
        edges, outdeg, on=src_col, num_partitions=num_partitions,
        right_schema=pa.schema([(src_col, key_t), ("outdeg", pa.int64())]),
    ).materialize()

    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            node_col: t[node_col],
            "w": pa.array(np.zeros(len(t)), pa.float64()),
        })

    zeros = nodes.map_batches(zero_rows, batch_format="pyarrow").materialize()

    for _ in range(iters):
        joined = hash_join(
            ew, ranks, on=src_col, right_on=node_col,
            num_partitions=num_partitions, right_schema=rank_schema,
        )

        def flow(t: pa.Table) -> pa.Table:
            w = np.asarray(t["r"], np.float64) / np.asarray(t["outdeg"],
                                                            np.float64)
            return pa.table({
                node_col: t[dst_col].cast(key_t),
                "w": pa.array(w, pa.float64()),
            })

        inflow = joined.map_batches(flow, batch_format="pyarrow")
        summed = inflow.union(zeros).groupby(node_col).aggregate(
            Sum("w", alias_name="w_sum"))

        def update(t: pa.Table) -> pa.Table:
            r = ((1.0 - damping) * teleport(t[node_col])
                 + damping * np.asarray(t["w_sum"], np.float64))
            return pa.table({
                node_col: t[node_col],
                "r": pa.array(r, pa.float64()),
            })

        ranks = summed.map_batches(update,
                                   batch_format="pyarrow").materialize()

    def final(t: pa.Table) -> pa.Table:
        r = np.asarray(t["r"], np.float64)
        if round_to is not None:
            r = np.round(r, round_to)
        return pa.table({node_col: t[node_col],
                         "trustrank": pa.array(r, pa.float64())})

    return ranks.map_batches(final, batch_format="pyarrow")


def _trustrank_dense(
    nodes, edges, seed_arr, node_col, src_col, dst_col,
    damping, iters, round_to, n, key_t, t_seed,
):
    """Dense-encoded TrustRank rounds (the ``_pagerank_dense`` shape
    with the teleport vector in place of the uniform base): encode the
    edge table once, keep the rank vector on the driver, and reduce
    each round's inflow through ``vector_sum``."""
    import ray

    from .vecreduce import vector_sum

    ids = pa.array(sorted(r[node_col] for r in nodes.take_all()), key_t)
    idref = ray.put(ids)

    def enc(t: pa.Table) -> pa.Table:
        vs = ray.get(idref)
        return pa.table({
            "s": pc.index_in(t[src_col], value_set=vs).cast(pa.int64()),
            "d": pc.index_in(t[dst_col], value_set=vs).cast(pa.int64()),
        })

    enc_e = edges.map_batches(enc, batch_format="pyarrow").materialize()
    n_edges = enc_e.count()

    od = vector_sum(
        enc_e, lambda t: np.bincount(np.asarray(t["s"], np.int64),
                                     minlength=n),
        n, np.int64, n_src_rows=n_edges)

    tvec = np.zeros(n, np.float64)
    seed_idx = np.asarray(pc.index_in(seed_arr, value_set=ids), np.int64)
    tvec[seed_idx] = t_seed
    oref = ray.put(od)
    ranks = tvec.copy()
    for _ in range(iters):
        rref = ray.put(ranks)

        def contrib(t: pa.Table, _rref=rref) -> np.ndarray:
            r, o = ray.get(_rref), ray.get(oref)
            src = np.asarray(t["s"], np.int64)
            dst = np.asarray(t["d"], np.int64)
            vec = np.zeros(n)
            np.add.at(vec, dst, r[src] / o[src])
            return vec

        inflow = vector_sum(enc_e, contrib, n, np.float64,
                            n_src_rows=n_edges)
        ranks = (1.0 - damping) * tvec + damping * inflow

    fref = ray.put(np.round(ranks, round_to) if round_to is not None
                   else ranks)

    def emit(t: pa.Table) -> pa.Table:
        vs = ray.get(idref)
        r = ray.get(fref)[
            np.asarray(pc.index_in(t[node_col], value_set=vs), np.int64)]
        return pa.table({node_col: t[node_col],
                         "trustrank": pa.array(r, pa.float64())})

    return nodes.map_batches(emit, batch_format="pyarrow")
