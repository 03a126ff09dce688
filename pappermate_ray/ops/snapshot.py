"""Crawl snapshot diff — which urls were added, removed, or changed
between two crawl snapshots (the CDX-index maintenance step that feeds
incremental recrawl queues and delta-dedup, next to ops/bloom.py's
incremental ingest).

ONE exchange total: both snapshots tag themselves (old=0 / new=1) in a
streaming pass, the tagged union hash-partitions by url
(ops/grouping.py — partition-sized groups, never a per-url pandas
group), and each partition classifies its url runs vectorized:

    run of 1, side 1  → added
    run of 1, side 0  → removed
    run of 2, digests differ → changed
    run of 2, digests equal  → unchanged (dropped — at crawl scale the
                               overwhelming majority, so the output is
                               delta-sized)

Only (url, side, digest) enter the exchange — payloads never move.
Each side must be url-unique (run ``latest_by_url`` first; a duplicated
url inside one snapshot raises in the group fn rather than
misclassifying).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .grouping import partition_grouped


def snapshot_diff(
    old: "rd.Dataset",
    new: "rd.Dataset",
    key_col: str = "url",
    digest_col: str = "digest",
    num_partitions: Optional[int] = None,
) -> "rd.Dataset":
    """``(key_col, status, old_digest, new_digest)`` for every url that
    is not bit-identical across the snapshots; status ∈ {'added',
    'removed', 'changed'} (absent digests are '')."""

    def tag(side: int):
        def _t(t: pa.Table) -> pa.Table:
            return pa.table({
                key_col: pa.compute.cast(t[key_col], pa.string()),
                "digest": pa.compute.cast(t[digest_col], pa.string()),
                "side": pa.array(np.full(t.num_rows, side, np.int64), pa.int64()),
            })
        return _t

    tagged = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow"))

    def classify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, "side"], kind="mergesort")
        keys = g[key_col].to_numpy()
        side = g["side"].to_numpy()
        dig = g["digest"].to_numpy()
        change = np.ones(len(g), bool)
        change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        runlen = np.diff(np.append(starts, len(g)))
        if (runlen > 2).any():
            bad = keys[starts[runlen > 2][0]]
            raise ValueError(
                f"snapshot_diff: url {bad!r} appears multiple times inside "
                "one snapshot — run latest_by_url per side first")
        out_k, out_s, out_od, out_nd = [], [], [], []
        singles = starts[runlen == 1]
        if len(singles):
            added = side[singles] == 1
            out_k.append(keys[singles])
            out_s.append(np.where(added, "added", "removed"))
            out_od.append(np.where(added, "", dig[singles]))
            out_nd.append(np.where(added, dig[singles], ""))
        pairs = starts[runlen == 2]
        if len(pairs):
            # sorted by side within the run: [old, new]
            od, nd = dig[pairs], dig[pairs + 1]
            if (side[pairs] != 0).any() or (side[pairs + 1] != 1).any():
                raise ValueError("snapshot_diff: duplicated url within one side")
            diff = od != nd
            out_k.append(keys[pairs][diff])
            out_s.append(np.full(int(diff.sum()), "changed", dtype=object))
            out_od.append(od[diff])
            out_nd.append(nd[diff])
        if not out_k:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="str"),
                "status": pd.Series([], dtype="str"),
                "old_digest": pd.Series([], dtype="str"),
                "new_digest": pd.Series([], dtype="str"),
            })
        return pd.DataFrame({
            key_col: np.concatenate(out_k),
            "status": np.concatenate(out_s),
            "old_digest": np.concatenate(out_od),
            "new_digest": np.concatenate(out_nd),
        })

    grouped, pkey = partition_grouped(tagged, [key_col], npart=num_partitions)
    return grouped.groupby(pkey).map_groups(classify, batch_format="pandas")
