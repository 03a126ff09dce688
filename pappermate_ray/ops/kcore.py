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

Dense tier (round 5, the ``pagerank_auto``/``label_propagation_auto``
pattern): when the NODE set fits ``dense_bound``, ids dictionary-encode
once and every peel round becomes a BROADCAST of the alive bitmask +
one streaming bincount pass over the pinned encoded edge set reduced
through ``ops/vecreduce.vector_sum`` — zero per-round groupbys, zero
joins; the loser detection and the peel itself are driver vector ops
on the N-bounded degree array. Per-round cost is edge-scan-shaped
(the documented trade of every loop-state-broadcast tier). Beyond the
bound the loser-broadcast/semi-join loop runs unchanged. Both tiers
asserted identical in tests and in tools/bench_graph_iter.py's exact
numpy verify.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
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
    dense_bound: int = 2_000_000,
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

    deg0 = deg_of(e).materialize()
    n_nodes = deg0.count()
    if n_nodes and n_nodes <= dense_bound:
        return _k_core_dense(e, deg0, k, rounds, key_t)

    first = True
    for _ in range(rounds):
        deg = deg0 if first else deg_of(e).materialize()
        first = False
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


def _k_core_dense(
    e: "rd.Dataset",
    deg0: "rd.Dataset",
    k: int,
    rounds: int,
    key_t,
) -> "rd.Dataset":
    """Dense-encoded peel: ids (≤ dense_bound, from the canonical degree
    table) dictionary-encode the pinned edge set ONCE; each round
    broadcasts the alive bitmask and reduces one streaming bincount
    through ``vector_sum`` — the round's only distributed work. The
    degree array, loser detection and peel are driver vector ops."""
    import pyarrow.compute as pc
    import ray as _ray

    from .vecreduce import vector_sum

    rows = deg0.take_all()
    ids = pa.array(sorted(r["node"] for r in rows), key_t)
    n = len(ids)
    degv = np.zeros(n, np.int64)
    pos = {v: i for i, v in enumerate(ids.to_pylist())}
    for r in rows:
        degv[pos[r["node"]]] = r["degree"]
    idref = _ray.put(ids)

    def enc(t: pa.Table) -> pa.Table:
        vs = _ray.get(idref)
        return pa.table({
            "src": pc.index_in(t["src"], value_set=vs).cast(pa.int64()),
            "dst": pc.index_in(t["dst"], value_set=vs).cast(pa.int64()),
        })

    enc_e = e.map_batches(enc, batch_format="pyarrow").materialize()
    n_edges = enc_e.count()
    alive = np.ones(n, bool)

    for _ in range(rounds):
        losers = alive & (degv < k)
        if not losers.any():
            break
        alive = alive & (degv >= k)
        aref = _ray.put(alive)

        def contrib(t: pa.Table, _aref=aref) -> np.ndarray:
            a = _ray.get(_aref)
            src = np.asarray(t["src"], np.int64)
            dst = np.asarray(t["dst"], np.int64)
            m = a[src] & a[dst]
            return np.bincount(src[m], minlength=n)

        degv = vector_sum(enc_e, contrib, n, np.int64, n_src_rows=n_edges)

    keep = np.flatnonzero(degv > 0)
    return rd.from_arrow(pa.table({
        "node": ids.take(pa.array(keep, pa.int64())),
        "degree": pa.array(degv[keep], pa.int64()),
    }))
