"""Anchor-text aggregation — the classic web-graph ranking signal.

Search/curation pipelines describe every page by the text OTHER pages
use to link to it (anchor text beats on-page text for navigational
relevance — Brin & Page 1998 §2.2, and anchor corpora are a standard
LM pre-training side-table). Over a crawl-extracted edge table
(src, dst, anchor) this computes, per target page: the inlink count and
the concatenated anchor string (deterministically ordered by source).

Shape: ONE partition-grouped exchange on ``hash(dst) mod P``
(ops/grouping.py — per-target pandas groups would mean one group per
URL on the web graph), then a vectorized run walk per partition: sort
by (dst, src), run boundaries mark targets, counts are run lengths,
anchor strings come from one join per run. The shuffle carries only
(dst, src, anchor) — no page payloads.

Skew note: mega-targets (a site's homepage) make long runs, not hot
pandas groups; a run is processed with numpy slices inside its
partition. If one target's inlinks exceed a partition's memory, cap
upstream with a per-(dst, src-bucket) pre-aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .grouping import partition_grouped


def aggregate_anchors(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    sep: str = "|",
) -> "rd.Dataset":
    """→ Dataset[(dst, n_inlinks, anchors)]; anchors ordered by src."""
    grouped, pkey_cols = partition_grouped(edges, [dst_col])

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([dst_col, src_col], kind="mergesort")
        dst = g[dst_col].to_numpy()
        anchors = g[anchor_col].to_numpy()
        change = np.zeros(len(g), bool)
        change[0] = True
        change[1:] = dst[1:] != dst[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(g))
        return pd.DataFrame({
            dst_col: dst[starts],
            "n_inlinks": (ends - starts).astype("int64"),
            "anchors": [sep.join(anchors[s:e]) for s, e in zip(starts, ends)],
        })

    return grouped.groupby(pkey_cols).map_groups(collect, batch_format="pandas")
