"""Synchronous label-propagation community detection (Raghavan et al.
2007) — the community-structure member of the web-graph family
(``ops/pagerank.py`` ranks, ``ops/triangles.py`` measures cohesion,
``stages/dedup.cluster_pairs`` finds CONNECTIVITY components; LPA finds
DENSITY communities, which connectivity cannot: one bridge edge merges
two sites into one component but not into one community).

Crawl-side uses: grouping hosts into site families / link farms over
the ``stages/links.host_graph`` rollup, and collapsing template
clusters before boilerplate analysis.

Semantics (pinned by tests + the unrolled-CTE oracle):

- labels start as each node's own id;
- ``iters`` SYNCHRONOUS rounds (all updates from the previous round's
  labels — deterministic, unlike the classic sequential-random LPA):
  a node's new label is the most frequent label among its neighbors,
  ties → smallest label; nodes with no neighbors keep their label;
- ``undirected=True`` (default) symmetrizes the edge list first —
  community membership is an undirected notion; parallel edges count
  multiply (a repeated hyperlink is a stronger tie).

Scale shape, per round (the pagerank BSP discipline):

- ONE partitioned hash join (edges × labels on src) streams neighbor
  votes — the edge payload is two keys, nothing wider ever shuffles;
- vote counting is a narrow ``groupby(dst, label).count()``;
- the per-node argmax rides ``partition_grouped`` (hash-partitioned
  groups, vectorized sort + drop_duplicates per partition — never a
  per-key pandas group);
- nodes that received no votes keep their previous label via one
  armored anti-join against the winner table;
- labels re-materialize per round (bounded-lineage rule: an iterative
  dataflow otherwise re-executes every prior round at each consume).

With a fixed ``iters`` the computation unrolls into SQL (JOIN +
GROUP BY + QUALIFY per round), so it is oracle-checkable.

``label_propagation_auto`` adds the dense/broadcast tier (round-4
verdict #3, the ``pagerank_auto`` pattern): node sets ≤ ``dense_bound``
dictionary-encode to 0..N-1 and each round becomes a BROADCAST of the
N-label vector + ONE streaming edge pass emitting narrow packed
``(dst·(N+1)+label, count)`` vote partials + two chained narrow
groupbys (vote sum, per-dst max over an order-embedding priority) —
no join, no anti-join, no per-round label re-materialization; the
winner scatter happens on the driver's N-vector, which the bound makes
driver-sized by definition. Beyond the bound the BSP join path runs
unchanged on the original ids.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from .grouping import partition_grouped
from .joins import adaptive_partitions, anti_join, hash_join


def label_propagation(
    nodes: "rd.Dataset",
    edges: "rd.Dataset",
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    undirected: bool = True,
    num_partitions: Optional[int] = None,
) -> "rd.Dataset":
    """→ ``(node_col, label)`` after ``iters`` synchronous vote rounds."""
    n = nodes.count()
    num_partitions = num_partitions or adaptive_partitions(n)
    sch = nodes.schema()
    key_t = dict(zip(sch.names, sch.types))[node_col]
    label_schema = pa.schema([(node_col, key_t), ("label", key_t)])

    def to_edge(a, b):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({src_col: t[a], dst_col: t[b]})
        return f

    e = edges.map_batches(to_edge(src_col, dst_col), batch_format="pyarrow")
    if undirected:
        e = e.union(edges.map_batches(to_edge(dst_col, src_col),
                                      batch_format="pyarrow"))
    # the edge list is the loop invariant — pin it once
    e = e.materialize()

    labels = nodes.map_batches(
        lambda t: pa.table({node_col: t[node_col], "label": t[node_col]}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        votes = hash_join(
            e, labels, on=src_col, right_on=node_col,
            num_partitions=num_partitions, right_schema=label_schema,
        ).map_batches(
            lambda t: pa.table({node_col: t[dst_col], "label": t["label"]}),
            batch_format="pyarrow")
        counts = votes.groupby([node_col, "label"]).aggregate(
            Count(alias_name="c"))

        # per-node argmax (count desc, label asc) over partition-sized
        # groups — vectorized sort + first-per-run, never per-key groups
        part, gcols = partition_grouped(counts, [node_col], num_partitions)

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values([node_col, "c", "label"],
                                ascending=[True, False, True],
                                kind="mergesort")
            out = df.drop_duplicates(node_col, keep="first")
            return out[[node_col, "label"]]

        winners = part.groupby(gcols).map_groups(
            pick, batch_format="pandas").materialize()

        # isolated / vote-less nodes keep their previous label
        kept = anti_join(labels, winners, on=node_col,
                         num_partitions=num_partitions,
                         left_schema=label_schema,
                         right_schema=label_schema)
        labels = winners.union(kept).materialize()

    return labels


def _lpa_dense(
    edges: "rd.Dataset",
    src_col: str,
    dst_col: str,
    iters: int,
    undirected: bool,
    n: int,
) -> np.ndarray:
    """Dense-int rounds: broadcast labels, stream edges once, two
    narrow groupbys. Priority encoding ``c·(N+1) + (N − label)`` embeds
    (count desc, label asc) into a single int64 max — exact while
    ``c < 2⁶³/(N+1)``, asserted per batch (at the 2M-node bound that is
    ~4.6e12 votes on one (node, label) pair)."""
    import ray

    edges = edges.materialize()
    shift = n + 1
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        lref = ray.put(labels)

        def votes(t: pa.Table, _lref=lref) -> pa.Table:
            lab = ray.get(_lref)
            src = np.asarray(t[src_col], np.int64)
            dst = np.asarray(t[dst_col], np.int64)
            if undirected:
                d = np.concatenate([dst, src])
                s = np.concatenate([src, dst])
            else:
                d, s = dst, src
            key = d * shift + lab[s]
            uk, c = np.unique(key, return_counts=True)
            return pa.table({"k": pa.array(uk, pa.int64()),
                             "c": pa.array(c.astype(np.int64), pa.int64())})

        summed = (edges.map_batches(votes, batch_format="pyarrow")
                  .groupby("k").aggregate(Sum("c", alias_name="c")))

        def prio(t: pa.Table) -> pa.Table:
            k = np.asarray(t["k"], np.int64)
            c = np.asarray(t["c"], np.int64)
            assert c.size == 0 or int(c.max()) < (2**63 - 1) // shift, \
                "vote count overflows the dense priority encoding"
            return pa.table({
                "d": pa.array(k // shift, pa.int64()),
                "p": pa.array(c * shift + (n - k % shift), pa.int64()),
            })

        best = (summed.map_batches(prio, batch_format="pyarrow")
                .groupby("d").aggregate(Max("p", alias_name="b")))
        new = labels.copy()
        for b in best.iter_batches(batch_size=65536, batch_format="pyarrow"):
            d = np.asarray(b["d"], np.int64)
            p = np.asarray(b["b"], np.int64)
            new[d] = n - (p % shift)
        labels = new
    return labels


def label_propagation_auto(
    nodes: "rd.Dataset",
    edges: "rd.Dataset",
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    undirected: bool = True,
    num_partitions: Optional[int] = None,
    dense_bound: int = 2_000_000,
) -> "rd.Dataset":
    """LPA for arbitrary node ids with the hybrid small-graph rule
    (module docstring): ≤ ``dense_bound`` nodes dictionary-encode
    (sorted ids → 0..N-1, order-preserving, so the min-label tiebreak
    is id-order on both routes) and run the dense rounds; beyond the
    bound the join path runs unchanged. Same contract and identical
    output as ``label_propagation`` (asserted in tests)."""
    import ray

    n = nodes.count()
    if n > dense_bound:
        return label_propagation(nodes, edges, node_col, src_col, dst_col,
                                 iters, undirected, num_partitions)
    ids = pa.array(sorted(r[node_col] for r in nodes.take_all()))
    ref = ray.put(ids)

    def enc(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        return pa.table({
            src_col: pc.index_in(t[src_col], value_set=vs).cast(pa.int64()),
            dst_col: pc.index_in(t[dst_col], value_set=vs).cast(pa.int64()),
        })

    edges_enc = edges.map_batches(enc, batch_format="pyarrow")
    labels = _lpa_dense(edges_enc, src_col, dst_col, iters, undirected, n)
    lref = ray.put(labels)

    def emit(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        lab = ray.get(lref)
        idx = np.asarray(pc.index_in(t[node_col], value_set=vs), np.int64)
        return pa.table({
            node_col: t[node_col],
            "label": vs.take(pa.array(lab[idx], pa.int64())),
        })

    return nodes.map_batches(emit, batch_format="pyarrow")
