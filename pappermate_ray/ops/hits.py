"""Distributed HITS (hubs & authorities) over an edge Dataset — the
second classic link-analysis signal (Kleinberg 1999, "Authoritative
sources in a hyperlinked environment") a crawl pipeline computes next
to PageRank: authorities = pages pointed at by good hubs, hubs = pages
pointing at good authorities.

Same BSP machinery as ops/pagerank.py, with one deliberate departure:
scores stay **int64 end-to-end**. Kleinberg's per-round L2
normalization only rescales — the ranking after k rounds is identical
without it — and dropping it makes every round a pure integer
sum-over-neighbors:

    a_i(v) = Σ_{u→v} h_{i-1}(u)      (one src-key join + dst groupby-sum)
    h_i(u) = Σ_{u→v} a_i(v)          (one dst-key join + src groupby-sum)

Integer sums are associative, so the result is bit-reproducible across
block order, partitioning AND vs the unrolled-CTE SQL oracle — no
float-summation-order hazard at all (the reason PageRank needs
``round_to``). Overflow bound: scores grow like ‖A‖^(2·iters); with
max degree d they stay ≤ d^(2·iters), e.g. d=1000 / iters=4 →
10^24 — beyond int64, so a **runtime guard** checks before every
propagation that ``max_score · max_degree ≤ 2^63−1`` and raises
``OverflowError`` instead of silently wrapping (the join path
piggybacks a ``Count`` on the per-round groupby to learn the exact
max in/out degree for free; the dense path takes one extra
degree-counting edge scan; round one bounds degree by |E|). Callers
wanting comparable magnitudes normalize AFTER the rounds (divide by
the max — an order-independent reduction).

Like PageRank: per-round materialize bounds the iterative lineage;
nodes with no in/out links keep score 0 via a zero-row union (no
second join); ``dense_ids=True`` unlocks the broadcast fast path for
contiguous-id graphs (per-block ``np.add.at`` partials merged by
addition — zero joins), asserted equal to the join path in tests.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from .joins import adaptive_partitions, hash_join

_INT64_MAX = 2**63 - 1


def _overflow_guard(max_score: int, max_degree: int, round_no: int) -> None:
    """Raise before a propagation whose per-node sum could wrap int64.

    Sound bound: the next score is a sum of ≤ ``max_degree`` values
    each ≤ ``max_score`` (scores are nonnegative), so it stays
    ≤ max_score·max_degree.
    """
    if max_score > _INT64_MAX // max(1, max_degree):
        raise OverflowError(
            f"hits(): round {round_no} would overflow int64 "
            f"(max score {max_score} x max degree {max_degree} > 2^63-1); "
            "reduce iters or rescale the graph"
        )


def hits(
    nodes: "rd.Dataset",
    edges: "rd.Dataset",
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
    num_partitions: Optional[int] = None,
    dense_ids: bool = False,
    dense_bound: int = 2_000_000,
) -> "rd.Dataset":
    """Integer hub/authority scores after ``iters`` alternating rounds:
    ``(node_col, auth, hub)``, both int64 (see module notes on the
    normalization-free formulation and the overflow bound).

    ``nodes`` must hold every vertex once; ``edges`` rows are directed
    src→dst (parallel edges count multiply, like repeated hyperlinks).
    """
    if iters < 1:
        raise ValueError("hits() needs at least one round")
    n = nodes.count()
    if dense_ids and n <= dense_bound:
        return _hits_dense(nodes, edges, node_col, src_col, dst_col, iters, n)
    num_partitions = num_partitions or adaptive_partitions(n)
    sch = nodes.schema()
    key_t = dict(zip(sch.names, sch.types))[node_col]

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({
            node_col: t[node_col],
            "s": pa.array(np.ones(len(t), np.int64), pa.int64()),
        })

    def zeros(t: pa.Table) -> pa.Table:
        return pa.table({
            node_col: t[node_col],
            "s": pa.array(np.zeros(len(t), np.int64), pa.int64()),
        })

    score_schema = pa.schema([(node_col, key_t), ("s", pa.int64())])
    hub = nodes.map_batches(ones, batch_format="pyarrow").materialize()
    zero = nodes.map_batches(zeros, batch_format="pyarrow").materialize()
    # both exchanges reuse the same key family (src/dst/node) — the
    # partitioning-reuse rule from SURVEY.md §4
    edges = edges.materialize()
    n_edges = edges.count()

    def _propagate(scores: "rd.Dataset", join_key: str, emit_key: str):
        """(scores ds, max score, max degree) — the Count rides the
        existing groupby exchange (zero union adds exactly one row per
        node, so degree = cnt − 1); the Max reduce runs over the
        already-materialized result, O(blocks), no new exchange."""
        joined = hash_join(
            edges, scores, on=join_key, right_on=node_col,
            num_partitions=num_partitions, right_schema=score_schema,
        )

        def flow(t: pa.Table) -> pa.Table:
            return pa.table({
                node_col: t[emit_key].cast(key_t),
                "s": t["s"],
            })

        summed = (
            joined.map_batches(flow, batch_format="pyarrow")
            .union(zero)
            .groupby(node_col)
            .aggregate(Sum("s", alias_name="s_sum"),
                       Count(alias_name="cnt"))
        ).materialize()
        mx = summed.aggregate(Max("s_sum", alias_name="max_s"),
                              Max("cnt", alias_name="max_cnt"))

        def rename(t: pa.Table) -> pa.Table:
            return pa.table({node_col: t[node_col], "s": t["s_sum"]})

        out = summed.map_batches(rename, batch_format="pyarrow")
        # empty node set: Max over an empty aggregate yields None
        ms, mc = mx["max_s"], mx["max_cnt"]
        return out, (0 if ms is None else int(ms)), (0 if mc is None else int(mc) - 1)

    auth = None
    max_hub, max_auth = 1, 0
    d_in = d_out = None  # exact max degrees, known after each side's 1st pass
    for rnd in range(1, iters + 1):
        _overflow_guard(max_hub, d_in if d_in is not None else n_edges, rnd)
        auth, max_auth, d_in = _propagate(hub, join_key=src_col, emit_key=dst_col)
        _overflow_guard(max_auth, d_out if d_out is not None else n_edges, rnd)
        hub, max_hub, d_out = _propagate(auth, join_key=dst_col, emit_key=src_col)

    final = hash_join(
        auth.map_batches(
            lambda t: pa.table({node_col: t[node_col], "auth": t["s"]}),
            batch_format="pyarrow",
        ),
        hub.map_batches(
            lambda t: pa.table({node_col: t[node_col], "hub": t["s"]}),
            batch_format="pyarrow",
        ),
        on=node_col,
        num_partitions=num_partitions,
        left_schema=pa.schema([(node_col, key_t), ("auth", pa.int64())]),
        right_schema=pa.schema([(node_col, key_t), ("hub", pa.int64())]),
    )
    return final.select_columns([node_col, "auth", "hub"])


def _hits_dense(nodes, edges, node_col, src_col, dst_col, iters, n):
    import ray

    from .vecreduce import vector_sum

    # the edge list is the loop invariant — pin it once so the 1+2·iters
    # reductions below never re-execute upstream lineage
    edges = edges.materialize()
    n_edges = edges.count()

    # one degree-counting edge scan up front feeds the overflow guard:
    # in/out bincounts packed into ONE 2n vector, reduced via the
    # bounded partials contract (ops/vecreduce.py auto tier) — driver
    # transit is O(N) per reduction, never O(edge blocks × N)
    def deg_vec(t: pa.Table) -> np.ndarray:
        din = np.bincount(np.asarray(t[dst_col], np.int64), minlength=n)
        dout = np.bincount(np.asarray(t[src_col], np.int64), minlength=n)
        return np.concatenate([din, dout])

    deg = vector_sum(edges, deg_vec, 2 * n, np.int64, n_src_rows=n_edges)
    d_in = int(deg[:n].max(initial=0))
    d_out = int(deg[n:].max(initial=0))

    hub = np.ones(n, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for rnd in range(1, iters + 1):
        _overflow_guard(int(hub.max(initial=0)), d_in, rnd)
        href = ray.put(hub)

        def a_part(t: pa.Table) -> np.ndarray:
            h = ray.get(href)
            vec = np.zeros(n, dtype=np.int64)
            np.add.at(vec, np.asarray(t[dst_col], np.int64),
                      h[np.asarray(t[src_col], np.int64)])
            return vec

        auth = vector_sum(edges, a_part, n, np.int64, n_src_rows=n_edges)
        _overflow_guard(int(auth.max(initial=0)), d_out, rnd)
        aref = ray.put(auth)

        def h_part(t: pa.Table) -> np.ndarray:
            a = ray.get(aref)
            vec = np.zeros(n, dtype=np.int64)
            np.add.at(vec, np.asarray(t[src_col], np.int64),
                      a[np.asarray(t[dst_col], np.int64)])
            return vec

        hub = vector_sum(edges, h_part, n, np.int64, n_src_rows=n_edges)

    fref = ray.put(np.stack([auth, hub]))

    def emit(t: pa.Table) -> pa.Table:
        f = ray.get(fref)
        ids = np.asarray(t[node_col], np.int64)
        return pa.table({
            node_col: t[node_col],
            "auth": pa.array(f[0][ids], pa.int64()),
            "hub": pa.array(f[1][ids], pa.int64()),
        })

    return nodes.map_batches(emit, batch_format="pyarrow")
