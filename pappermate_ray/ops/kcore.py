"""k-core peeling over the web graph — the density-floor member of the
graph family (``ops/pagerank.py`` ranks, ``ops/triangles.py`` counts
closed wedges, ``ops/lpa.py`` finds vote communities; the k-core finds
the maximal subgraph where EVERY node keeps ≥ k neighbors, the classic
link-farm / spam-cluster / "real site neighborhood" signal: low-core
hosts are leaves and chains, high-core hosts sit in densely
interlinked cliques).

Semantics (pinned by tests + the unrolled-CTE oracle ``kcore_hosts``):

- the edge set is canonicalized first: symmetrized (``undirected=True``,
  the default — coreness is an undirected notion), self-loops dropped,
  parallel edges collapsed (degree counts DISTINCT neighbors);
- ``rounds`` synchronous peel rounds: each round computes every node's
  surviving degree, drops nodes with degree < k, and drops their
  incident edges;
- output is ``(node, degree)`` over the FINAL edge set — nodes peeled
  away are absent. When ``rounds`` suffices to converge (the loop
  early-exits on a fixpoint), this IS the k-core and every emitted
  degree is ≥ k; with fewer rounds it is the documented bounded-round
  approximation from above.

Scale shape, per round (the pagerank/LPA BSP discipline):

- ONE narrow groupby counts surviving degrees (keys only — the edge
  payload is two keys, nothing wider ever shuffles);
- the round's LOSERS (degree < k) drive the edge filter, not the
  survivors: the loser set is the peel fringe and is usually tiny, so
  when it fits ``broadcast_limit`` it ships ONCE via ``ray.put`` and
  both endpoints filter in a zero-exchange streaming map — the degree
  groupby is then the round's ONLY exchange (the hybrid pattern of
  ``ops/triangles.py`` / ``stages/robots.py``); an oversized loser
  set falls back to TWO armored semi-joins against the survivors
  (src side, dst side);
- the edge set re-materializes per round (bounded-lineage rule), and
  the loop EXITS EARLY when a round finds no losers (the fixpoint),
  which is output-identical to the full unroll;
- driver transit per round is the loser-count check plus, in the
  broadcast tier, the bounded loser key set itself — never the node
  or edge tables.

With a fixed ``rounds`` the computation unrolls into SQL (GROUP BY +
two IN-filters per round), so it is oracle-checkable.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

from .joins import adaptive_partitions, hash_join


def k_core(
    edges: "rd.Dataset",
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 8,
    undirected: bool = True,
    num_partitions: Optional[int] = None,
    broadcast_limit: int = 2_000_000,
) -> "rd.Dataset":
    """→ ``(node, degree)`` over the edge set surviving ``rounds`` peel
    rounds at threshold ``k`` (the k-core once converged)."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def to_edge(a, b):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            out = pa.table({"src": t[a], "dst": t[b]})
            return out.filter(pc.invert(pc.equal(out["src"], out["dst"])))
        return f

    e = edges.map_batches(to_edge(src_col, dst_col), batch_format="pyarrow")
    if undirected:
        e = e.union(edges.map_batches(to_edge(dst_col, src_col),
                                      batch_format="pyarrow"))
    # canonical distinct edge set — degree counts distinct neighbors
    e = (e.groupby(["src", "dst"]).aggregate(Count())
         .select_columns(["src", "dst"]).materialize())

    sch = e.schema()
    key_t = dict(zip(sch.names, sch.types))["src"]
    edge_schema = pa.schema([("src", key_t), ("dst", key_t)])
    node_schema = pa.schema([("node", key_t)])
    num_partitions = num_partitions or adaptive_partitions(e.count())

    def deg_of(es: "rd.Dataset") -> "rd.Dataset":
        # symmetrized distinct edges: grouping src covers every endpoint
        return es.groupby("src").aggregate(Count(alias_name="degree")) \
            .map_batches(
                lambda t: pa.table({"node": t["src"], "degree": t["degree"]}),
                batch_format="pyarrow")

    import pyarrow.compute as pc
    import ray as _ray

    for _ in range(rounds):
        deg = deg_of(e).materialize()
        losers = deg.filter(lambda r: r["degree"] < k) \
            .select_columns(["node"]).materialize()
        n_lose = losers.count()
        if n_lose == 0:
            break  # fixpoint — later rounds are no-ops
        if n_lose <= broadcast_limit:
            from .bfs import collect_key_array
            lref = _ray.put(collect_key_array(losers, "node", key_t))

            def drop(t: pa.Table, _ref=lref) -> pa.Table:
                keys = _ray.get(_ref)
                keep = pc.and_(
                    pc.invert(pc.is_in(t["src"], value_set=keys)),
                    pc.invert(pc.is_in(t["dst"], value_set=keys)))
                return t.filter(keep)

            e = e.map_batches(drop, batch_format="pyarrow").materialize()
        else:
            surv = deg.filter(lambda r: r["degree"] >= k) \
                .select_columns(["node"]).materialize()
            e = hash_join(e, surv, on="src", right_on="node",
                          join_type="left_semi",
                          num_partitions=num_partitions,
                          left_schema=edge_schema, right_schema=node_schema)
            e = hash_join(e, surv, on="dst", right_on="node",
                          join_type="left_semi",
                          num_partitions=num_partitions,
                          left_schema=edge_schema, right_schema=node_schema) \
                .materialize()

    return deg_of(e)
