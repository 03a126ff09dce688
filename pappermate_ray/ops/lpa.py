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
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

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
