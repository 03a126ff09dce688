"""As-of join (custom operator the Dataset API lacks; driver brief).

Semantics: for every left row, the single right row with the greatest
``right_ts`` ≤ ``left_ts`` within the same key (backward as-of), inner —
left rows with no match are dropped. Tie-break on equal ``right_ts`` is
the greatest ``right_id`` (deterministic; matches a
``ROW_NUMBER() OVER (ORDER BY ts DESC, id DESC)`` SQL oracle and DuckDB
ASOF JOIN up to ties).

Shape (Ray guide §joins): both sides are tagged into a common narrow
schema, unioned, hash-shuffled ONCE on the key, and merged per key group
with ``pd.merge_asof`` over sorted frames (merge_asof picks the last
matching position, so sorting the right side by (ts, id) yields the
max-id tie-break). Partitioning assumption: one key's rows fit in one
group (true for per-entity event streams; salt hot keys otherwise).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd


def asof_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
) -> "rd.Dataset":
    """→ Dataset[(left_id, right_id)] backward-as-of matches."""

    def tag_left(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t[left_key], "ts": t[left_ts], "rid": t[left_id],
             "side": pa.array(["L"] * len(t), pa.string())}
        )

    def tag_right(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t[right_key], "ts": t[right_ts], "rid": t[right_id],
             "side": pa.array(["R"] * len(t), pa.string())}
        )

    u = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == "L"][["ts", "rid"]].rename(columns={"rid": "left_id"})
        r = group[group["side"] == "R"][["ts", "rid"]].rename(columns={"rid": "right_id"})
        if l.empty or r.empty:
            return pd.DataFrame({"left_id": [], "right_id": []}).astype(
                {"left_id": "int64", "right_id": "int64"}
            )
        l = l.sort_values("ts", kind="mergesort")
        r = r.sort_values(["ts", "right_id"], kind="mergesort")
        m = pd.merge_asof(l, r, on="ts", direction="backward")
        m = m.dropna(subset=["right_id"])
        return m[["left_id", "right_id"]].astype({"left_id": "int64", "right_id": "int64"})

    return u.groupby("key").map_groups(merge, batch_format="pandas")
