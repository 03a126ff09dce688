"""Range (interval) join — custom operator the Dataset API lacks.

For every left row (key, ts), match right rows (key, start, end) whose
interval contains the timestamp: ``start ≤ ts < end``. Same single-shuffle
shape as the as-of join (ops/asof.py): tag → union → groupby(key) →
per-group vectorized interval matching with numpy ``searchsorted`` over
the sorted interval starts (valid when a key's intervals are
non-overlapping — the common validity-window case; overlapping intervals
fall back to a per-row scan).

Skew: ``hot_key_threshold`` enables the same auto-salting as the as-of
join (left rows of hot keys spread over salts, right intervals
replicated per salt — identical output, no straggler group).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .asof import _salted_union


def range_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    left_key: str,
    right_key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    left_id: str,
    right_id: str,
    hot_key_threshold: Optional[int] = None,
    n_salts: int = 8,
) -> "rd.Dataset":
    """→ Dataset[(left_id, right_id)] interval-containment matches (inner)."""

    def tag_left(t: pa.Table) -> pa.Table:
        n = len(t)
        # null end column typed like the left ts (ts and end must be
        # comparable), so non-us timestamp inputs union cleanly
        return pa.table(
            {"key": t[left_key], "ts": t[left_ts], "end": pa.nulls(n, t[left_ts].type),
             "rid": t[left_id], "side": pa.array(["L"] * n, pa.string())}
        )

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {"key": t[right_key], "ts": t[right_start], "end": t[right_end],
             "rid": t[right_id], "side": pa.array(["R"] * n, pa.string())}
        )

    u, group_keys = _salted_union(
        left, right, tag_left, tag_right, left_key, hot_key_threshold, n_salts
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == "L"]
        r = group[group["side"] == "R"].sort_values(["ts", "rid"], kind="mergesort")
        empty = pd.DataFrame({"left_id": [], "right_id": []}).astype(
            {"left_id": "int64", "right_id": "int64"}
        )
        if l.empty or r.empty:
            return empty
        starts = r["ts"].to_numpy()
        ends = r["end"].to_numpy()
        rids = r["rid"].to_numpy()
        non_overlapping = bool((ends[:-1] <= starts[1:]).all()) if len(r) > 1 else True
        out_l, out_r = [], []
        ts_arr = l["ts"].to_numpy()
        lids = l["rid"].to_numpy()
        if non_overlapping:
            idx = np.searchsorted(starts, ts_arr, side="right") - 1
            ok = (idx >= 0) & (ts_arr < ends[np.clip(idx, 0, None)])
            out_l = lids[ok].tolist()
            out_r = rids[idx[ok]].tolist()
        else:  # rare: overlapping intervals → per-row scan, all matches
            for ts, lid in zip(ts_arr, lids):
                hits = np.nonzero((starts <= ts) & (ts < ends))[0]
                out_l.extend([lid] * len(hits))
                out_r.extend(rids[hits].tolist())
        return pd.DataFrame({"left_id": out_l, "right_id": out_r}).astype(
            {"left_id": "int64", "right_id": "int64"}
        )

    return u.groupby(group_keys).map_groups(merge, batch_format="pandas")
