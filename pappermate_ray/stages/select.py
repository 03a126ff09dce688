"""Greedy subset selection over an embedding column — the data-pruning /
diversity operators a training-data curation stack runs after dedup
(beyond-reference, driver brief: "similarity search" + data selection).

Two classic selectors over one mechanism:

- ``mmr_select``: Maximal Marginal Relevance (Carbonell & Goldstein
  1998) — pick ``k`` vectors maximizing
  ``lam * cos(d, q) - (1 - lam) * max_{s in S} cos(d, s)``,
  the standard diverse-top-k used to de-redundify retrieval results
  and to pick diverse exemplars per topic.
- ``kcenter_select``: greedy farthest-point traversal (Gonzalez 1985;
  the k-Center coreset rule used by active-learning / data-pruning
  stacks a la "coreset selection") — start from a seed, repeatedly
  take the vector whose cosine distance to the selected set is
  LARGEST.

Distributed shape (the part Ray Data lacks natively): both selectors
are sequential-greedy, so the loop state is the *selected set* — at
most ``k`` d-vectors, always driver/broadcast-sized. Everything else
streams:

- the working set ``(id, embedding, state)`` lives in the object
  store; ``state`` is the one float each greedy rule needs
  (``maxsim`` to S for MMR, ``mindist`` to S for k-center);
- each round broadcasts ONLY the last-picked embedding (``ray.put``,
  d floats) and runs ONE ``map_batches`` pass that folds it into the
  state column (``max``/``min`` against a single matvec) — O(d) per
  row, never O(|S| * d), because ``max(maxsim, cos(d, s_new))`` is
  associative over picks;
- the round's argmax is per-block top-1 partials (O(blocks) rows to
  the driver — the bounded-partials contract, same as
  ``ops/vecreduce``), never a sort exchange;
- there is NO shuffle anywhere: payload embeddings never ride an
  exchange, so the operator costs exactly ``k`` streaming scans.

At 100 TB the k-scans shape is the honest cost model for exact greedy
selection; for large ``k`` compose with ``ivf_knn``-style coarse
partitioning (select per cluster, then merge) — documented trade-off,
not silently approximated here.

Determinism: pure float64 numpy, ties broken by ascending id on both
the Ray and oracle sides; with a fixed ``k`` the greedy chain unrolls
into SQL CTE steps, so both selectors are DuckDB-oracle-checkable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _norm_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


def _emb64(t: pa.Table, col: str) -> np.ndarray:
    return _norm_rows(np.array(t[col].to_pylist(), dtype=np.float64))


def _greedy_rounds(
    work: "rd.Dataset",
    k: int,
    fold,
    id_col: str,
):
    """Shared greedy loop: ``k`` rounds of (fold last pick into state →
    per-block top-1 partials → driver reduce of O(blocks) rows).

    ``fold(t, sel_emb, sel_id) -> pa.Table`` updates the state columns
    of one block given the last selected embedding (``None`` on the
    first round) and must emit a float64 ``score`` column, a bool
    ``picked`` column and the normalized ``emb`` column. The top-1
    partials carry each block winner's embedding, so the next round's
    broadcast costs no extra scan.
    """
    picks = []  # (rank, id, score)
    sel_emb = None
    sel_id = None
    for r in range(1, k + 1):
        rref = ray.put(sel_emb)
        rid = sel_id

        def upd(t: pa.Table, _rref=rref, _rid=rid) -> pa.Table:
            return fold(t, ray.get(_rref), _rid)

        work = work.map_batches(upd, batch_format="pyarrow").materialize()

        def top1(t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
            sc = np.asarray(t["score"], dtype=np.float64)
            pk = np.asarray(t["picked"], dtype=bool)
            live = ~pk
            empty = pa.table({id_col: pa.array([], pa.int64()),
                              "score": pa.array([], pa.float64()),
                              "emb": pa.array([], pa.list_(pa.float64()))})
            if not live.any():
                return empty
            lids, lsc = ids[live], sc[live]
            # block-local argmax with ascending-id tie-break: among the
            # max-score rows take the smallest id
            best = lsc.max()
            wid = int(lids[lsc == best].min())
            wemb = t["emb"][int(np.nonzero(ids == wid)[0][0])]
            return pa.table({id_col: pa.array([wid], pa.int64()),
                             "score": pa.array([float(best)], pa.float64()),
                             "emb": pa.array([wemb.as_py()],
                                             pa.list_(pa.float64()))})

        parts = work.map_batches(top1, batch_format="pyarrow").take_all()
        if not parts:
            break
        best = max(parts, key=lambda p: (p["score"], -p[id_col]))
        sel_id = int(best[id_col])
        picks.append((r, sel_id, float(best["score"])))
        if r == k:
            break
        sel_emb = np.asarray(best["emb"], dtype=np.float64)
    return picks


def mmr_select(
    ds: "rd.Dataset",
    query_vec: np.ndarray,
    k: int = 8,
    lam: float = 0.7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_ids: Optional[list] = None,
) -> pa.Table:
    """→ ``(rank, vec_id, score)`` — the MMR-greedy pick sequence.

    ``score = lam * cos(d, q) - (1 - lam) * maxsim`` where ``maxsim``
    is the TRUE max cosine to the already-selected set — it can be
    negative, which must raise the score (a clamp-at-zero fold
    mis-picks; caught by the sf0.001 oracle). Round 1 (empty set) is
    the pure-relevance argmax with ``score = lam * rel``. Ties →
    smallest id. ``exclude_ids`` removes rows (e.g. the query's own
    vector) before selection.
    """
    q = _norm_rows(np.asarray(query_vec, dtype=np.float64).reshape(1, -1))[0]
    qref = ray.put(q)
    excl = set(int(x) for x in (exclude_ids or []))

    def prep(t: pa.Table) -> pa.Table:
        X = _emb64(t, emb_col)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        keep = ~np.isin(ids, np.fromiter(excl, np.int64)) if excl else \
            np.ones(len(ids), bool)
        rel = X @ ray.get(qref)
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "emb": pa.array(list(X[keep]),
                            pa.list_(pa.float64())),
            "rel": pa.array(rel[keep], pa.float64()),
            # -1 = cosine lower bound: the first real fold replaces it
            "maxsim": pa.array(np.full(keep.sum(), -1.0), pa.float64()),
            "picked": pa.array(np.zeros(keep.sum(), bool), pa.bool_()),
        })

    work = ds.map_batches(prep, batch_format="pyarrow")

    def fold(t: pa.Table, sel_emb, sel_id) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        rel = np.asarray(t["rel"], np.float64)
        ms = np.asarray(t["maxsim"], np.float64).copy()
        pk = np.asarray(t["picked"], bool).copy()
        if sel_emb is None:
            score = lam * rel  # empty selected set: pure relevance
        else:
            X = np.array(t["emb"].to_pylist(), dtype=np.float64)
            ms = np.maximum(ms, X @ sel_emb)
            pk |= ids == sel_id
            score = lam * rel - (1.0 - lam) * ms
        return pa.table({
            id_col: t[id_col], "emb": t["emb"],
            "rel": t["rel"],
            "maxsim": pa.array(ms, pa.float64()),
            "picked": pa.array(pk, pa.bool_()),
            "score": pa.array(score, pa.float64()),
        })

    picks = _greedy_rounds(work, k, fold, id_col)
    return pa.table({
        "rank": pa.array([p[0] for p in picks], pa.int64()),
        id_col: pa.array([p[1] for p in picks], pa.int64()),
        "score": pa.array([p[2] for p in picks], pa.float64()),
    })


def kcenter_select(
    ds: "rd.Dataset",
    k: int = 8,
    seed_id: Optional[int] = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """→ ``(rank, vec_id, dist)`` — greedy farthest-point traversal.

    Round 1 picks ``seed_id`` (default: smallest id; ``dist`` 0.0 by
    convention); each later round picks the row maximizing
    ``mindist = min_{s in S} (1 - cos(d, s))``, ties → smallest id.
    """

    def prep(t: pa.Table) -> pa.Table:
        X = _emb64(t, emb_col)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "emb": pa.array(list(X), pa.list_(pa.float64())),
            "mindist": pa.array(np.full(len(ids), np.inf), pa.float64()),
            "picked": pa.array(np.zeros(len(ids), bool), pa.bool_()),
        })

    work = ds.map_batches(prep, batch_format="pyarrow")

    def fold(t: pa.Table, sel_emb, sel_id) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        md = np.asarray(t["mindist"], np.float64).copy()
        pk = np.asarray(t["picked"], bool).copy()
        if sel_emb is None:
            # round 1: the seed wins the argmax — an explicit seed via an
            # indicator, the default (smallest id) via a -id score, so no
            # extra aggregate pass (and no lineage re-execution) is needed
            if seed_id is not None:
                score = np.where(ids == int(seed_id), np.inf, -np.inf)
            else:
                score = -ids.astype(np.float64)
        else:
            X = np.array(t["emb"].to_pylist(), dtype=np.float64)
            md = np.minimum(md, 1.0 - X @ sel_emb)
            pk |= ids == sel_id
            score = np.where(pk, -np.inf, md)
        return pa.table({
            id_col: t[id_col], "emb": t["emb"],
            "mindist": pa.array(md, pa.float64()),
            "picked": pa.array(pk, pa.bool_()),
            "score": pa.array(score, pa.float64()),
        })

    picks = _greedy_rounds(work, k, fold, id_col)
    dists = [0.0 if r == 1 else s for (r, _i, s) in picks]
    return pa.table({
        "rank": pa.array([p[0] for p in picks], pa.int64()),
        id_col: pa.array([p[1] for p in picks], pa.int64()),
        "dist": pa.array(dists, pa.float64()),
    })
