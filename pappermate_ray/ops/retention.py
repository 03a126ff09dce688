"""Cohort retention over an event stream — join-free.

"Of the users active in window w, how many came back in w+1?" is the
canonical engagement report; the textbook formulation is a self-join of
the distinct (user, window) activity table against itself shifted one
window — an all-to-all join whose build side is the whole activity
table. This implementation restates it as presence detection under ONE
hash exchange: every locally-distinct activity (u, w) emits two tagged
rows, ``(u, w, side=0)`` ("active at w") and ``(u, w-1, side=1)``
("active at the window after w-1"); grouping by (u, w) makes a user
retained at w exactly when both sides are present in the group. A
second, tiny exchange (one row per user-window) counts per window.

No join armor, no build side, skew-safe (the hot key is a single
user's windows), and the payload is (id, window, int8) throughout.
Beyond-reference scope (the reference has no event analytics); the
events table is the driver-brief fixture for it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

_UNIT_US = {"hour": 3_600_000_000, "day": 86_400_000_000}


def cohort_retention(
    ds: "rd.Dataset",
    id_col: str,
    ts_col: str,
    unit: str = "hour",
    out_col: str = "window_start",
) -> "rd.Dataset":
    """(window_start, n_active, n_retained): distinct ``id_col`` actives
    per ``unit`` window of ``ts_col``, and how many of them are also
    active in the NEXT window. Exact integers (SQL-oracle-able against
    the LEFT-JOIN formulation); the last window's n_retained is 0 by
    construction."""
    if unit not in _UNIT_US:
        raise ValueError(f"unit must be one of {sorted(_UNIT_US)}")
    step = pa.scalar(_UNIT_US[unit], pa.duration("us"))

    def tag(t: pa.Table) -> pa.Table:
        # normalize to us so the duration arithmetic and the output
        # window type are input-resolution-independent
        w = pc.cast(pc.floor_temporal(t[ts_col], unit=unit),
                    pa.timestamp("us"))
        base = pa.table({id_col: t[id_col], "w": w})
        # local distinct: presence semantics make cross-block dups harmless
        base = base.group_by([id_col, "w"]).aggregate([])
        prev = pa.table({id_col: base[id_col],
                         "w": pc.subtract(base["w"], step)})
        n0, n1 = base.num_rows, prev.num_rows
        return pa.table({
            id_col: pa.concat_arrays(
                [base[id_col].combine_chunks(),
                 prev[id_col].combine_chunks()]),
            "w": pa.concat_arrays(
                [base["w"].combine_chunks(), prev["w"].combine_chunks()]),
            "_side": pa.array(np.concatenate(
                [np.zeros(n0, np.int8), np.ones(n1, np.int8)])),
        })

    # presence as Min/Max AGGREGATES, not per-group python: min(_side)==0
    # means active at w; max(_side)==1 on an active row means also active
    # at w+1. Vectorized end to end — at web scale the (user, window)
    # group count is rows-sized, and a python fn per group would be the
    # hot path.
    per_uw = (ds.map_batches(tag, batch_format="pyarrow")
              .groupby([id_col, "w"])
              .aggregate(Min("_side", alias_name="_smin"),
                         Max("_side", alias_name="_smax")))

    def presence(t: pa.Table) -> pa.Table:
        active = pc.equal(t["_smin"], 0)
        sel = t.filter(active)
        retained = pc.cast(pc.equal(sel["_smax"], 1), pa.int64())
        return pa.table({out_col: sel["w"],
                         "_act": pa.array(np.ones(sel.num_rows, np.int64)),
                         "_ret": retained})

    return (per_uw.map_batches(presence, batch_format="pyarrow")
            .groupby(out_col).aggregate(
                Sum("_act", alias_name="n_active"),
                Sum("_ret", alias_name="n_retained")))
