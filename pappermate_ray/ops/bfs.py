"""Multi-source BFS depth over the link graph — "how many hops is this
page from the seed list?", the crawl-frontier member the planning family
still lacked (``pipelines/crawl_plan.py`` decides WHAT to fetch inside a
budget; depth says how far a discovered url sits from the trusted seed
set, the classic crawl-policy input: depth caps, seed-proximity quality
priors (TrustRank-style), and focused-crawl cutoffs all key on it).

Semantics (pinned by tests + the unrolled-CTE oracle ``crawl_depth``):

- ``seeds`` are depth 0 (duplicates collapse); rounds ``1..max_depth``
  expand one hop along DIRECTED edges (``undirected=True`` symmetrizes
  first);
- a node's depth is the FIRST round that reaches it (min-hop by
  construction — a node already visited never re-labels);
- only reached nodes are emitted: ``(node, depth)`` with depth ≤
  ``max_depth``. Unreached nodes are absent (the caller's anti-join
  decides their fate — usually "treat as infinite depth").

Scale shape, per round (the pagerank/LPA BSP discipline):

- the FRONTIER (nodes first reached last round) drives the round, not
  the full visited set. A bounded frontier (≤ ``broadcast_limit``,
  the common crawl-depth regime — seed lists and their k-hop
  neighborhoods are tiny next to the edge table) BROADCASTS once via
  ``ray.put`` and the expansion is a zero-exchange streaming filter
  over the edges; an unbounded frontier falls back to one partitioned
  hash join ``edges × frontier`` on src. Keys only either way,
  nothing wider ever shuffles, and the edge table never rides an
  exchange in the broadcast tier (the hybrid pattern of
  ``ops/triangles.py`` / ``stages/robots.py``);
- candidates collapse through a narrow distinct groupby, then one
  armored anti-join against the visited table keeps first-reachers
  only;
- visited / frontier re-materialize per round (bounded-lineage rule:
  an iterative dataflow otherwise re-executes every prior round at
  each consume), and the loop EXITS EARLY when a round reaches nothing
  new — identical output to running all rounds, since an empty
  frontier stays empty;
- driver transit per round is the emptiness check plus, in the
  broadcast tier, the bounded frontier key set itself — never the
  edge or visited tables.

With a fixed ``max_depth`` the computation unrolls into SQL (JOIN +
DISTINCT + NOT IN per round), so it is oracle-checkable.

Dense tier (round 5, the ``pagerank_auto``/``k_core`` pattern): when
the distinct endpoint∪seed set fits ``dense_bound``, ids dictionary
-encode once (one distinct exchange, paid once) and every hop becomes
a BROADCAST of the frontier bitmask + one streaming bincount pass over
the pinned encoded edges reduced through ``ops/vecreduce.vector_sum``
— no per-round distinct groupby, no anti-join; the visited/depth state
is an N-bounded driver vector. Beyond the bound the frontier
-broadcast/join loop runs unchanged. Both tiers asserted identical in
tests and exact-verified at 1M nodes in tools/bench_graph_iter.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

from .joins import adaptive_partitions, anti_join, hash_join


def collect_key_array(ds: "rd.Dataset", col: str, key_t) -> pa.Array:
    """Pull one bounded key column to the driver as a single flat Array
    (the broadcast-tier collect — callers gate on a count first)."""
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if not tables:
        return pa.array([], key_t)
    c = pa.concat_tables([pa.table({col: t[col]}) for t in tables])[col]
    out = c.combine_chunks()
    if isinstance(out, pa.ChunkedArray):
        out = (out.chunk(0) if out.num_chunks
               else pa.array([], key_t))
    return out


def bfs_depth(
    seeds: "rd.Dataset",
    edges: "rd.Dataset",
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_depth: int = 4,
    undirected: bool = False,
    num_partitions: Optional[int] = None,
    broadcast_limit: int = 2_000_000,
    dense_bound: int = 2_000_000,
) -> "rd.Dataset":
    """→ ``(node_col, depth)`` for every node within ``max_depth`` hops
    of the seed set (min-hop depth; seeds are depth 0)."""
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    num_partitions = num_partitions or adaptive_partitions(seeds.count())
    sch = seeds.schema()
    key_t = dict(zip(sch.names, sch.types))[node_col]
    visited_schema = pa.schema([(node_col, key_t), ("depth", pa.int64())])
    frontier_schema = pa.schema([(node_col, key_t)])

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

    # dense tier: one distinct exchange sizes the node universe; under
    # the bound the hop loop runs exchange-free on driver vectors
    ends = e.map_batches(
        lambda t: pa.table({node_col: pa.concat_arrays(
            [t[src_col].combine_chunks(), t[dst_col].combine_chunks()])}),
        batch_format="pyarrow",
    ).union(seeds.map_batches(
        lambda t: pa.table({node_col: t[node_col]}), batch_format="pyarrow"))
    universe = (ends.groupby(node_col).aggregate(Count())
                .select_columns([node_col]).materialize())
    if universe.count() <= dense_bound:
        return _bfs_dense(seeds, e, universe, node_col, src_col, dst_col,
                          max_depth, key_t)

    def at_depth(d: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                node_col: t[node_col],
                "depth": pa.array([d] * t.num_rows, pa.int64()),
            })
        return f

    # seed dedup through the same narrow distinct every round uses
    frontier = (seeds.groupby(node_col).aggregate(Count())
                .select_columns([node_col]).materialize())
    n_frontier = frontier.count()
    visited = frontier.map_batches(at_depth(0),
                                   batch_format="pyarrow").materialize()

    import pyarrow.compute as pc
    import ray as _ray

    if n_frontier == 0:
        return visited

    for d in range(1, max_depth + 1):
        if n_frontier <= broadcast_limit:
            # bounded frontier: ship it ONCE, stream-filter the edges —
            # the edge table (the big side) never rides an exchange
            fref = _ray.put(collect_key_array(frontier, node_col, key_t))

            def expand(t: pa.Table, _ref=fref) -> pa.Table:
                keys = _ray.get(_ref)
                hit = pc.is_in(t[src_col], value_set=keys)
                return pa.table({node_col: t[dst_col].filter(hit)})

            reached = e.map_batches(expand, batch_format="pyarrow")
        else:
            reached = hash_join(
                e, frontier, on=src_col, right_on=node_col,
                num_partitions=num_partitions, right_schema=frontier_schema,
            ).map_batches(
                lambda t: pa.table({node_col: t[dst_col]}),
                batch_format="pyarrow")
        cand = (reached.groupby(node_col).aggregate(Count())
                .select_columns([node_col]))
        new = anti_join(
            cand, visited, on=node_col, num_partitions=num_partitions,
            left_schema=frontier_schema, right_schema=visited_schema,
        ).materialize()
        n_frontier = new.count()
        if n_frontier == 0:
            break
        visited = visited.union(
            new.map_batches(at_depth(d), batch_format="pyarrow")
        ).materialize()
        frontier = new

    return visited


def _bfs_dense(
    seeds: "rd.Dataset",
    e: "rd.Dataset",
    universe: "rd.Dataset",
    node_col: str,
    src_col: str,
    dst_col: str,
    max_depth: int,
    key_t,
) -> "rd.Dataset":
    """Dense-encoded hops: the depth/frontier state is an N-bounded
    driver vector; each hop broadcasts the frontier bitmask and reduces
    one streaming ``bincount(dst[frontier[src]])`` pass through
    ``vector_sum`` — the hop's only distributed work."""
    import pyarrow.compute as pc
    import ray as _ray

    from .vecreduce import vector_sum

    ids = pa.array(sorted(r[node_col] for r in universe.take_all()), key_t)
    n = len(ids)
    idref = _ray.put(ids)

    def enc(t: pa.Table) -> pa.Table:
        vs = _ray.get(idref)
        return pa.table({
            "s": pc.index_in(t[src_col], value_set=vs).cast(pa.int64()),
            "d": pc.index_in(t[dst_col], value_set=vs).cast(pa.int64()),
        })

    enc_e = e.map_batches(enc, batch_format="pyarrow").materialize()
    n_edges = enc_e.count()

    depth = np.full(n, -1, np.int64)
    seed_idx = np.asarray(
        pc.index_in(pa.array([r[node_col] for r in seeds.take_all()], key_t),
                    value_set=ids), np.int64)
    depth[seed_idx] = 0
    frontier = np.zeros(n, bool)
    frontier[seed_idx] = True

    for d in range(1, max_depth + 1):
        if not frontier.any():
            break
        fref = _ray.put(frontier)

        def contrib(t: pa.Table, _fref=fref) -> np.ndarray:
            f = _ray.get(_fref)
            src = np.asarray(t["s"], np.int64)
            dst = np.asarray(t["d"], np.int64)
            return np.bincount(dst[f[src]], minlength=n)

        hits = vector_sum(enc_e, contrib, n, np.int64, n_src_rows=n_edges)
        new = (hits > 0) & (depth == -1)
        if not new.any():
            break
        depth[new] = d
        frontier = new

    keep = np.flatnonzero(depth >= 0)
    return rd.from_arrow(pa.table({
        node_col: ids.take(pa.array(keep, pa.int64())),
        "depth": pa.array(depth[keep], pa.int64()),
    }))
