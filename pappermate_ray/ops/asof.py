"""As-of join (custom operator the Dataset API lacks; driver brief).

Semantics: for every left row, the single right row with the greatest
``right_ts`` ≤ ``left_ts`` within the same key (backward as-of), inner —
left rows with no match are dropped. Tie-break on equal ``right_ts`` is
the greatest ``right_id`` (deterministic; matches a
``ROW_NUMBER() OVER (ORDER BY ts DESC, id DESC)`` SQL oracle and DuckDB
ASOF JOIN up to ties).

Shape (Ray guide §joins): both sides are tagged into a common narrow
schema, unioned, hash-shuffled ONCE on ``hash(key) mod P`` (partition
groups, not per-key groups — see ``partition_grouped``), and each
partition merges ALL its keys in one vectorized
``pd.merge_asof(by=key)`` over sorted frames (merge_asof picks the last
matching position per by-group, so sorting the right side by (ts, id)
yields the max-id tie-break). Partitioning assumption: one key's rows
fit in one partition (true for per-entity event streams).

Skew (SURVEY.md §4): pass ``hot_key_threshold`` to auto-salt — keys whose
LEFT row count meets the threshold have their left rows spread over
``n_salts`` sub-groups while their right history is replicated into each,
so one hot entity no longer serializes on a single reducer. Output is
IDENTICAL to the unsalted join (asserted in tests); the hot-key set is
bounded by rows/threshold (ops/salt.py detect_hot_keys).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .grouping import partition_grouped


def _salted_union(
    left: "rd.Dataset",
    right: "rd.Dataset",
    tag_left,
    tag_right,
    left_key: str,
    hot_key_threshold: Optional[int],
    n_salts: int,
):
    """Tag, optionally salt, and union the two sides; returns (union, keys).

    Salting spreads a hot key's LEFT rows across ``n_salts`` groups and
    replicates that key's RIGHT rows into every group — semantics of the
    per-key merge are unchanged. Non-hot keys keep salt 0.
    """
    l_tagged = left.map_batches(tag_left, batch_format="pyarrow")
    r_tagged = right.map_batches(tag_right, batch_format="pyarrow")
    if not hot_key_threshold:
        return l_tagged.union(r_tagged), ["key"]

    from .salt import detect_hot_keys

    hot = detect_hot_keys(left, left_key, hot_key_threshold)
    if not hot:
        return l_tagged.union(r_tagged), ["key"]
    hot_ref = ray.put(pa.array(sorted(hot)))

    def salt_left(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["key"], value_set=ray.get(hot_ref)).to_numpy(
            zero_copy_only=False
        )
        salt = np.where(mask, np.arange(len(t), dtype=np.int64) % n_salts, 0)
        return t.append_column("salt", pa.array(salt, pa.int64()))

    def salt_right(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["key"], value_set=ray.get(hot_ref))
        cold = t.filter(pc.invert(mask))
        cold = cold.append_column("salt", pa.array([0] * len(cold), pa.int64()))
        hot_part = t.filter(mask)
        parts = [cold] + [
            hot_part.append_column("salt", pa.array([s] * len(hot_part), pa.int64()))
            for s in range(n_salts)
        ]
        return pa.concat_tables(parts)

    return (
        l_tagged.map_batches(salt_left, batch_format="pyarrow").union(
            r_tagged.map_batches(salt_right, batch_format="pyarrow")
        ),
        ["key", "salt"],
    )


def asof_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
    hot_key_threshold: Optional[int] = None,
    n_salts: int = 8,
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

    u, group_keys = _salted_union(
        left, right, tag_left, tag_right, left_key, hot_key_threshold, n_salts
    )

    u, pkey_cols = partition_grouped(u, group_keys)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # one VECTORIZED merge_asof across every key in the partition
        # (by=group_keys) instead of one pandas group per key
        cols = group_keys + ["ts", "rid"]
        l = group.loc[group["side"] == "L", cols].rename(columns={"rid": "left_id"})
        r = group.loc[group["side"] == "R", cols].rename(columns={"rid": "right_id"})
        if l.empty or r.empty:
            return pd.DataFrame({"left_id": [], "right_id": []}).astype(
                {"left_id": "int64", "right_id": "int64"}
            )
        l = l.sort_values("ts", kind="mergesort")
        # per-by-group order (ts, right_id): merge_asof takes the LAST
        # matching position in the group = max-ts then max-id tie-break
        r = r.sort_values(["ts", "right_id"], kind="mergesort")
        m = pd.merge_asof(l, r, on="ts", by=group_keys, direction="backward")
        m = m.dropna(subset=["right_id"])
        return m[["left_id", "right_id"]].astype({"left_id": "int64", "right_id": "int64"})

    return u.groupby(pkey_cols).map_groups(merge, batch_format="pandas")
