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

import ray.data as rd
from ray.data.aggregate import Count, Sum

from .joins import hash_join


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
) -> "rd.Dataset":
    """Ranks after ``iters`` synchronous rounds: ``(node_col, pagerank)``.

    ``nodes`` must hold every vertex once; ``edges`` rows are directed
    src→dst (parallel edges count multiply, like repeated hyperlinks).
    """
    n = nodes.count()
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
