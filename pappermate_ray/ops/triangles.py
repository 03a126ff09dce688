"""Distributed triangle counting over an edge Dataset — the classic
web/social-graph clustering signal (local clustering coefficient,
spam-farm detection on link graphs) and the canonical example of a
join-based graph pattern at scale.

Degree-ordered wedge algorithm (Cohen 2009 MapReduce formulation /
"node-iterator++"): orient every undirected edge from its lower-rank
endpoint to its higher-rank endpoint, where rank = (degree, id). Each
triangle {x,y,z} with rank x<y<z is then found EXACTLY once: the wedge
(y,z) generated at its lowest-rank corner x, closed by the oriented
edge y→z. Degree-ordering is what makes this scale: a vertex's
oriented out-degree is bounded by ~sqrt(2E) regardless of its raw
degree (a 10M-in-link hub generates no wedges at all if its neighbors
out-rank it), so total wedge volume is O(E^1.5) instead of Σ deg².

Ray-Data shape:
- canonicalize + dedup edges: one (a,b) groupby (16 bytes/row in the
  exchange);
- degrees: one narrow groupby on the vertex id;
- orientation: two hash joins attach each endpoint's packed rank
  (deg·2^32 + id, one int64) — same key family (vertex id) reused;
- wedge generation: ONE partition-grouped exchange on the low corner
  (ops/grouping.py), per-run sorted-neighbor triu pairs in numpy —
  never a per-vertex pandas group;
- closing: one hash join of wedges against oriented edges on (v,w);
- per-vertex counts: matched triangles explode to their 3 corners and
  a final narrow groupby-count unions with zeros so every node
  appears.

Integer counts end-to-end — bit-exact vs the SQL self-join oracle.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from .grouping import partition_grouped
from .joins import adaptive_partitions, hash_join

_RANK_SHIFT = np.int64(1) << np.int64(32)


def triangle_counts(
    nodes: "rd.Dataset",
    edges: "rd.Dataset",
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: Optional[int] = None,
    dense_ids: bool = False,
    dense_bound: int = 2_000_000,
    node_broadcast_bound: int = 5_000_000,
) -> "rd.Dataset":
    """Per-vertex triangle participation counts: ``(node_col,
    n_triangles)`` with a row for EVERY node (0 when in none).

    ``edges`` is directed input; direction, duplicates and self-loops
    are ignored (the undirected simple graph is what gets counted).
    Vertex ids must be non-negative ints < 2^31 (they pack into the
    rank key).

    ``dense_ids=True`` asserts ids are contiguous 0..N-1 and unlocks
    two bounded tiers (all three asserted equal in tests):

    - raw edges ≤ ``dense_bound``: full broadcast (pagerank/hits dense
      contract) — the oriented adjacency ships ONCE via ``ray.put``
      (≤32 MB at the bound), each node block counts its own vertices'
      wedges, bincount partials merge by addition; zero joins.
    - nodes ≤ ``node_broadcast_bound`` (host-level web graphs: nodes ≪
      edges): only the O(N) DEGREE vector broadcasts, orientation
      becomes a streaming map and both rank-attach joins disappear.
      One-box 2M-edge micro-bench (tools/bench_triangles.py): 46 s →
      41.5 s — modest here because the remaining wedge+closing
      exchanges dominate a single box, but at cluster scale it removes
      2 of the 5 all-to-alls.
    - else: the fully-distributed join path — the 100 TB shape.
    """
    n = nodes.count()
    num_partitions = num_partitions or adaptive_partitions(n)

    def canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t[src_col], np.int64)
        d = np.asarray(t[dst_col], np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "a": pa.array(np.minimum(s, d), pa.int64()),
            "b": pa.array(np.maximum(s, d), pa.int64()),
        })

    if dense_ids and edges.count() <= dense_bound:
        # bound holds for the RAW edge list, so the canonical pairs
        # collect directly and dedup driver-side — no exchange at all
        return _triangles_dense(nodes, edges.map_batches(
            canon, batch_format="pyarrow"), node_col, n)

    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["a", "b"])
        .materialize()
    )

    def both_ends(t: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(t["a"], np.int64),
                            np.asarray(t["b"], np.int64)])
        return pa.table({"v": pa.array(v, pa.int64())})

    deg = (
        und.map_batches(both_ends, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Count(alias_name="deg"))
    )

    if dense_ids and n <= node_broadcast_bound:
        # middle tier: node count bounded (host-level web graphs),
        # edge count NOT — the O(N) degree vector broadcasts and
        # orientation becomes a streaming map, eliminating both
        # rank-attach joins; wedge + closing exchanges stay distributed
        import ray

        deg_vec = np.zeros(n, dtype=np.int64)
        for t in deg.iter_batches(batch_size=65536, batch_format="pyarrow"):
            deg_vec[np.asarray(t["v"], np.int64)] = np.asarray(t["deg"], np.int64)
        dref = ray.put(deg_vec)

        def orient_bcast(t: pa.Table) -> pa.Table:
            dv = ray.get(dref)
            a = np.asarray(t["a"], np.int64)
            b = np.asarray(t["b"], np.int64)
            ra = dv[a] * _RANK_SHIFT + a
            rb = dv[b] * _RANK_SHIFT + b
            low_is_a = ra < rb
            return pa.table({
                "u": pa.array(np.where(low_is_a, a, b), pa.int64()),
                "w": pa.array(np.where(low_is_a, b, a), pa.int64()),
                "wrank": pa.array(np.where(low_is_a, rb, ra), pa.int64()),
            })

        oriented = und.map_batches(
            orient_bcast, batch_format="pyarrow").materialize()
    else:
        def pack(t: pa.Table) -> pa.Table:
            r = (np.asarray(t["deg"], np.int64) * _RANK_SHIFT
                 + np.asarray(t["v"], np.int64))
            return pa.table({"v": t["v"], "rank": pa.array(r, pa.int64())})

        ranks = deg.map_batches(pack, batch_format="pyarrow").materialize()
        rank_schema = pa.schema([("v", pa.int64()), ("rank", pa.int64())])
        ab_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

        with_ra = hash_join(
            und, ranks, on="a", right_on="v", num_partitions=num_partitions,
            left_schema=ab_schema, right_schema=rank_schema,
        ).map_batches(
            lambda t: pa.table({"a": t["a"], "b": t["b"], "ra": t["rank"]}),
            batch_format="pyarrow",
        )
        with_rb = hash_join(
            with_ra, ranks, on="b", right_on="v", num_partitions=num_partitions,
            left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                   ("ra", pa.int64())]),
            right_schema=rank_schema,
        )

        def orient(t: pa.Table) -> pa.Table:
            a = np.asarray(t["a"], np.int64)
            b = np.asarray(t["b"], np.int64)
            ra = np.asarray(t["ra"], np.int64)
            rb = np.asarray(t["rank"], np.int64)
            low_is_a = ra < rb  # ranks are unique (id is packed in)
            return pa.table({
                "u": pa.array(np.where(low_is_a, a, b), pa.int64()),
                "w": pa.array(np.where(low_is_a, b, a), pa.int64()),
                "wrank": pa.array(np.where(low_is_a, rb, ra), pa.int64()),
            })

        oriented = with_rb.map_batches(
            orient, batch_format="pyarrow").materialize()

    def wedges(group: pd.DataFrame) -> pd.DataFrame:
        # partition-grouped: all low-corner runs of this partition in
        # one frame; per-run triu pairs over rank-sorted neighbors
        g = group.sort_values(["u", "wrank"], kind="mergesort")
        u = g["u"].to_numpy()
        w = g["w"].to_numpy()
        change = np.zeros(len(g), bool)
        if len(g):
            change[0] = True
            change[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(g))
        out_u, out_v, out_w = [], [], []
        for s, e in zip(starts, ends):
            d = e - s
            if d < 2:
                continue
            ii, jj = np.triu_indices(d, k=1)
            out_u.append(np.full(len(ii), u[s]))
            out_v.append(w[s + ii])  # rank(v) < rank(w) by the sort
            out_w.append(w[s + jj])
        if not out_u:
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64"),
                                 "w2": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "x": np.concatenate(out_u),
            "v": np.concatenate(out_v),
            "w2": np.concatenate(out_w),
        })

    grouped, pkey = partition_grouped(oriented, ["u"], npart=num_partitions)
    wedge_ds = grouped.groupby(pkey).map_groups(wedges, batch_format="pandas")

    closing = oriented.map_batches(
        lambda t: pa.table({"v": t["u"], "w2": t["w"]}),
        batch_format="pyarrow",
    )
    tri = hash_join(
        wedge_ds, closing, on=("v", "w2"), num_partitions=num_partitions,
        left_schema=pa.schema([("x", pa.int64()), ("v", pa.int64()),
                               ("w2", pa.int64())]),
        right_schema=pa.schema([("v", pa.int64()), ("w2", pa.int64())]),
    )

    def corners(t: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(t["x"], np.int64),
                            np.asarray(t["v"], np.int64),
                            np.asarray(t["w2"], np.int64)])
        return pa.table({
            node_col: pa.array(v, pa.int64()),
            "c": pa.array(np.ones(len(v), np.int64), pa.int64()),
        })

    def zeros(t: pa.Table) -> pa.Table:
        return pa.table({
            node_col: pa.array(np.asarray(t[node_col], np.int64), pa.int64()),
            "c": pa.array(np.zeros(len(t), np.int64), pa.int64()),
        })

    counts = (
        tri.map_batches(corners, batch_format="pyarrow")
        .union(nodes.map_batches(zeros, batch_format="pyarrow"))
        .groupby(node_col)
        .aggregate(Sum("c", alias_name="n_triangles"))
    )
    return counts.select_columns([node_col, "n_triangles"])


def _triangles_dense(nodes, canon_edges, node_col, n):
    """Broadcast fast path: the edge list is bounded, so the canonical
    pairs collect once (O(E) driver memory by the dense_bound
    contract, deduped with one np.unique), the degree-ordered oriented
    adjacency ships via ray.put, and each node block counts its own
    vertices' wedges against it — the dense pagerank partials
    pattern."""
    import ray

    parts = canon_edges.map_batches(
        lambda t: pa.table({
            "k": pa.array(np.asarray(t["a"], np.int64) * _RANK_SHIFT
                          + np.asarray(t["b"], np.int64), pa.int64()),
        }),
        batch_format="pyarrow",
    ).take_all()
    packed = np.unique(np.array([r["k"] for r in parts], dtype=np.int64))
    a = (packed // _RANK_SHIFT).astype(np.int64)
    b = (packed % _RANK_SHIFT).astype(np.int64)
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    rank = deg.astype(np.int64) * _RANK_SHIFT + np.arange(n, dtype=np.int64)
    low_is_a = rank[a] < rank[b]
    u = np.where(low_is_a, a, b)
    w = np.where(low_is_a, b, a)
    order = np.lexsort((rank[w], u))
    u, w = u[order], w[order]
    # closure membership set: oriented (v, w2) pairs, rank(v) < rank(w2)
    closure = np.sort(u * _RANK_SHIFT + w)
    ustarts = np.searchsorted(u, np.arange(n, dtype=np.int64))
    uends = np.searchsorted(u, np.arange(n, dtype=np.int64), side="right")
    ref = ray.put((u, w, closure, ustarts, uends))

    def part(t: pa.Table) -> pa.Table:
        uu, ww, cl, st, en = ray.get(ref)
        counts = np.zeros(n, dtype=np.int64)
        for x in np.asarray(t[node_col], np.int64):
            s, e = st[x], en[x]
            d = e - s
            if d < 2:
                continue
            ii, jj = np.triu_indices(d, k=1)
            v, w2 = ww[s + ii], ww[s + jj]
            keys = v * _RANK_SHIFT + w2
            pos = np.searchsorted(cl, keys)
            pos_c = np.minimum(pos, len(cl) - 1)
            hit = (pos < len(cl)) & (cl[pos_c] == keys)
            nt = int(hit.sum())
            if nt:
                counts[x] += nt
                np.add.at(counts, v[hit], 1)
                np.add.at(counts, w2[hit], 1)
        return pa.table({"v": pa.array([counts.tobytes()], pa.binary())})

    total = np.zeros(n, dtype=np.int64)
    for r in nodes.map_batches(part, batch_format="pyarrow").take_all():
        total += np.frombuffer(r["v"], dtype=np.int64)
    fref = ray.put(total)

    def emit(t: pa.Table) -> pa.Table:
        f = ray.get(fref)
        ids = np.asarray(t[node_col], np.int64)
        return pa.table({
            node_col: pa.array(ids, pa.int64()),
            "n_triangles": pa.array(f[ids], pa.int64()),
        })

    return nodes.map_batches(emit, batch_format="pyarrow")
