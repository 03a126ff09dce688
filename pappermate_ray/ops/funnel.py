"""Ordered-sequence analytics over an event stream: funnels and
transition counts.

Both operators share one scale shape: a single hash exchange on the
entity id, then a per-entity sorted scan (an entity's history is the
unit of work — thousands of events, never the corpus), then a tiny
count exchange. Nothing joins, nothing materializes; a hot entity skews
only its own group. Beyond-reference scope (the reference has no event
analytics); the events table is the driver-brief fixture for it.

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

    def depth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        types = g[type_col].to_numpy()
        ts = g[ts_col].to_numpy()
        d = 0
        t_prev = None
        for s in steps:
            mask = types == s
            if t_prev is not None:
                mask &= ts > t_prev
            hit = np.flatnonzero(mask)
            if not len(hit):
                break
            t_prev = ts[hit[0]]
            d += 1
        return pd.DataFrame([{"_depth": d}])

    depths = (ds.groupby(id_col)
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

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tiebreak_col], kind="mergesort")
        t = g[type_col].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({
                "prev_type": pd.Series([], dtype=object),
                "next_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            })
        df = pd.DataFrame({"prev_type": t[:-1], "next_type": t[1:]})
        out = df.value_counts().reset_index(name="n")
        return out

    return (ds.groupby(id_col)
            .map_groups(pairs, batch_format="pandas")
            .groupby(["prev_type", "next_type"])
            .aggregate(Sum("n", alias_name="n")))
