"""Ordered-sequence analytics over an event stream: funnels and
transition counts.

Both operators share one scale shape: a single hash exchange on the
entity id via ``ops/grouping.partition_grouped`` (never one pandas
group per entity — per-key dispatch at web-scale user counts is the
anti-pattern the repo's grouping module exists to kill), then a
partition-wide vectorized scan over all entities' sorted runs, then a
tiny count exchange. Nothing joins, nothing materializes; a hot entity
skews only its own partition. Beyond-reference scope (the reference
has no event analytics); the events table is the driver-brief fixture
for it.

Tie rules are pinned so the operators stay SQL-oracle-checkable:
funnel steps advance on STRICTLY later timestamps (an event sharing
its timestamp with the previous step's match does not count), and
transition order breaks timestamp ties by ``tiebreak_col`` — the same
ORDER BY the oracle's ``lag()`` window uses.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum


def funnel_counts(
    ds: "rd.Dataset",
    id_col: str,
    ts_col: str,
    type_col: str,
    steps: List[str],
) -> "rd.Dataset":
    """(step, n_users) for each funnel step, where an entity reaches
    step k iff its history contains ``steps[:k]`` in order under the
    first-occurrence cascade: t1 = min ts of step1, t2 = min ts of
    step2 with ts > t1, … (strict). Counts are cumulative-by-
    construction: reaching step k implies steps 1..k-1."""
    if not steps:
        raise ValueError("steps must be non-empty")

    from .grouping import partition_grouped

    def depth(g: pd.DataFrame) -> pd.DataFrame:
        # ALL entities of the partition at once: sorted (id, ts) runs,
        # then one minimum.reduceat per funnel step finds every
        # entity's first qualifying hit — len(steps) vectorized passes,
        # zero per-entity dispatch. The cascade uses only the HIT's
        # timestamp VALUE, so equal-ts ties cannot change the depth.
        g = g.sort_values([id_col, ts_col], kind="mergesort")
        ids = g[id_col].to_numpy()
        types = g[type_col].to_numpy()
        ts = g[ts_col].to_numpy()
        first = np.r_[True, ids[1:] != ids[:-1]]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(g)]
        uidx = np.cumsum(first) - 1  # entity index per row
        nuser = len(starts)
        d = np.zeros(nuser, np.int64)
        alive = np.ones(nuser, bool)
        t_prev = np.empty(nuser, dtype=ts.dtype)  # valid where depth ≥ 1
        have_prev = False
        for s in steps:
            cand = (types == s) & alive[uidx]
            if have_prev:
                cand &= ts > t_prev[uidx]
            rowid = np.where(cand, np.arange(len(g)), len(g))
            firsts = np.minimum.reduceat(rowid, starts) if len(g) else \
                np.zeros(0, np.int64)
            hit = firsts < ends
            alive &= hit
            if not alive.any():
                break
            t_prev[alive] = ts[firsts[alive]]
            d[alive] += 1
            have_prev = True
        return pd.DataFrame({"_depth": d})

    pds, pcols = partition_grouped(ds, [id_col])
    depths = (pds.groupby(pcols)
              .map_groups(depth, batch_format="pandas")
              .groupby("_depth")
              .aggregate(Count(alias_name="n"))
              .take_all())  # tiny: at most len(steps)+1 depth buckets
    by_depth = {int(r["_depth"]): int(r["n"]) for r in depths}
    n_ge = []
    total = 0
    for k in range(len(steps), 0, -1):
        total += by_depth.get(k, 0)
        n_ge.append(total)
    n_ge.reverse()
    return rd.from_arrow(pa.table({
        "step": pa.array(list(steps), pa.string()),
        "n_users": pa.array(n_ge, pa.int64()),
    }))


def event_transitions(
    ds: "rd.Dataset",
    id_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
) -> "rd.Dataset":
    """(prev_type, next_type, n): adjacent-event transition counts per
    entity (the Markov-chain edge table behind journey analysis) —
    exactly SQL's ``lag(type) OVER (PARTITION BY id ORDER BY ts,
    tiebreak)`` aggregated. Per-entity sorted scan emits its own
    transition PARTIALS (local value counts), so the final exchange
    carries (prev, next, n) triples, not one row per event."""

    from .grouping import partition_grouped

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one partition-wide sorted scan: adjacent rows of the SAME
        # entity are the transitions; per-entity boundaries mask out
        # cross-entity pairs. Local value_counts is the combiner.
        g = g.sort_values([id_col, ts_col, tiebreak_col],
                          kind="mergesort")
        ids = g[id_col].to_numpy()
        t = g[type_col].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({
                "prev_type": pd.Series([], dtype=object),
                "next_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            })
        same = ids[1:] == ids[:-1]
        df = pd.DataFrame({"prev_type": t[:-1][same],
                           "next_type": t[1:][same]})
        out = df.value_counts().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    pds, pcols = partition_grouped(ds, [id_col])
    return (pds.groupby(pcols)
            .map_groups(pairs, batch_format="pandas")
            .groupby(["prev_type", "next_type"])
            .aggregate(Sum("n", alias_name="n")))
