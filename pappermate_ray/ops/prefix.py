"""Distributed global prefix sum (exclusive running total in key order)
— the planning primitive behind token-stream sequence packing: "where
does each document start in the concatenated training stream?".

Classic two-level scan, no total sort and no single-threaded pass:

1. rows bucket by ``key // bucket_size`` (integer key, deterministic);
2. per-bucket totals come from one narrow ``groupby(bucket).Sum`` —
   the shuffle carries (bucket, partial) pairs only;
3. the O(#buckets) totals collect to the driver for an exclusive scan
   (at 100 TB pick ``bucket_size`` so #buckets stays ~10^5-10^6 — a
   few MB — and the scan is trivially cheap; this is the sketch-merge
   shape, not a data materialization), then broadcast;
4. one ``groupby(bucket).map_groups`` finishes: sort within bucket,
   local exclusive cumsum + the bucket's base offset.

Keys must be unique per row (they order the scan); ties would make the
offset assignment engine-dependent.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def prefix_sum_by_int_key(
    ds: "rd.Dataset",
    key_col: str,
    value_col: str,
    out_col: str = "offset",
    bucket_size: int = 4096,
) -> "rd.Dataset":
    """Adds ``out_col`` = sum of ``value_col`` over all rows with a
    smaller ``key_col`` (exclusive prefix sum in key order)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(t[key_col], np.int64) // bucket_size
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    totals = (
        bucketed.select_columns(["_bucket", value_col])
        .groupby("_bucket")
        .aggregate(Sum(value_col, alias_name="_tot"))
        .take_all()
    )
    totals.sort(key=lambda r: r["_bucket"])
    base_map, acc = {}, 0
    for r in totals:
        base_map[r["_bucket"]] = acc
        acc += r["_tot"]
    ref = ray.put(base_map)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(ref)[int(g["_bucket"].iloc[0])]
        g = g.sort_values(key_col, kind="mergesort")
        cum = g[value_col].cumsum().shift(fill_value=0)
        g[out_col] = (base + cum).astype("int64")
        return g.drop(columns=["_bucket"])

    return bucketed.groupby("_bucket").map_groups(finish, batch_format="pandas")
