"""Grouped exact quantiles over a numeric column (SURVEY.md §2.6 family).

The curation counterpart of the reference's per-corpus summary stats
(scripts/openai_contract_explorer.py report section): length/score
distributions per stratum drive filter thresholds ("drop the bottom
quartile of docs per language").

Scale shape — value-count compression, NOT a per-group sort of rows:

1. per-block partial: ``(group, value) -> n`` via an Arrow ``group_by``
   (vectorized, no Python loop);
2. one hash shuffle of the *distinct* (group, value) pairs with
   ``Sum(n)`` — at 100 TB a length column has ~10^5 distinct values per
   language, so the exchange is KBs per group no matter how many rows;
3. per-group finish: sort the tiny value-count list, cumulative-sum,
   and read each requested quantile off the CDF.

Quantile rule is DISCRETE (a value actually present in the data), with
index ``max(0, ceil(q*n) - 1)`` into the sorted multiset — verified
empirically to equal DuckDB's ``quantile_disc`` on int columns, which
is what makes the operator SQL-oracle-checkable.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data.aggregate import Sum


def value_count_partials(t: pa.Table, group_col: str,
                         val_col: str) -> pa.Table:
    """Per-block ``(group, value) -> n_part`` compressor — the shared
    front end of grouped_quantiles and ops/stats.grouped_mode. Null
    VALUES are dropped up front (both consumers' oracles —
    ``quantile_disc`` and the mode window with ``v IS NOT NULL`` —
    ignore them); surviving rows are counted with ``count_all`` so the
    partial is an exact row count, not a non-null-cell count."""
    sub = t.select([group_col, val_col])
    sub = sub.filter(pa.compute.is_valid(sub[val_col]))
    g = sub.group_by([group_col, val_col]).aggregate([([], "count_all")])
    return g.rename_columns([group_col, val_col, "n_part"])


def grouped_value_counts(
    ds: "ray.data.Dataset", group_col: str, value_col: str
) -> "ray.data.Dataset":
    """ONE narrow exchange summing the block partials → the exact
    distinct ``(group, value, n)`` table. Distinct-sized, so callers
    may materialize it and derive several statistics without
    re-scanning the corpus (ops/stats.mad_outliers does)."""
    return (
        ds.map_batches(lambda t: value_count_partials(t, group_col, value_col),
                       batch_format="pyarrow")
        .groupby([group_col, value_col])
        .aggregate(Sum("n_part", alias_name="n"))
    )


def grouped_quantiles_from_counts(
    counts: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    qs: Sequence[float],
    out_names: Optional[List[str]] = None,
) -> "ray.data.Dataset":
    """Per-group discrete quantiles read off an already-built
    ``(group, value, n)`` count table (``grouped_value_counts``
    output, or any weighted value multiset)."""
    names = out_names or [f"p{int(round(q * 100)):02d}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("out_names must match qs length")

    from .grouping import partition_grouped

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        # partition-grouped finisher: ALL groups in the partition at
        # once — lexsort, run boundaries, then ONE global searchsorted
        # per quantile (the global cumsum is strictly increasing, so a
        # group's target rank resolves inside its own run). No per-key
        # dispatch (ops/grouping.py contract).
        g = g.sort_values([group_col, value_col], kind="mergesort")
        keys = g[group_col].to_numpy()
        vals = g[value_col].to_numpy()
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        first = np.ones(len(g), bool)
        first[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(g))
        before = np.where(starts > 0, cum[starts - 1], 0)
        tot = cum[ends - 1] - before
        out = {group_col: keys[starts]}
        for q, name in zip(qs, names):
            idx = np.maximum(0, np.ceil(q * tot).astype(np.int64) - 1)
            pos = np.searchsorted(cum, before + idx + 1, side="left")
            out[name] = vals[pos]
        return pd.DataFrame(out)

    pds, pcols = partition_grouped(counts, [group_col])
    return pds.groupby(pcols).map_groups(_finish, batch_format="pandas")


def grouped_quantiles(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    qs: Sequence[float],
    out_names: Optional[List[str]] = None,
) -> "ray.data.Dataset":
    """Exact per-group discrete quantiles of ``value_col``.

    ``out_names`` names the output columns (default ``p25``-style from
    the q values); output has one row per group: ``group_col, *out_names``.
    """
    return grouped_quantiles_from_counts(
        grouped_value_counts(ds, group_col, value_col),
        group_col, value_col, qs, out_names)


def quantile_bucket(
    ds: "ray.data.Dataset",
    value_col: str,
    n_buckets: int,
    out_col: str = "bucket",
) -> "ray.data.Dataset":
    """Append a global quantile-bucket label (1..n_buckets) — the
    VALUE-edge ntile ("which length quartile is this doc in") used for
    threshold curation and balanced reporting. Edges are the exact
    discrete quantiles at i/n (the ``grouped_quantiles`` rule, which
    equals DuckDB ``quantile_disc``); a value equal to an edge stays in
    the LOWER bucket, so ``bucket = 1 + |{edges < value}|`` — a pinned,
    SQL-replicable tie rule, unlike row-count ``ntile`` whose boundary
    rows are engine-dependent.

    Scale shape: the edge pass rides grouped_quantiles' value-count
    compression (distinct (value, n) pairs shuffle, not rows) under a
    constant group; the tiny edge row broadcasts into a vectorized
    ``searchsorted`` map. Two passes over the input by necessity
    (edges must exist before labeling) — cache/checkpoint upstream
    lineage if it is expensive."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    names = [f"e{i}" for i in range(1, n_buckets)]

    def add_g(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(np.zeros(t.num_rows, np.int8)))

    edge_rows = grouped_quantiles(
        ds.select_columns([value_col]).map_batches(
            add_g, batch_format="pyarrow"),
        "_g", value_col, qs, names).take_all()
    edges = np.sort(np.array([edge_rows[0][n] for n in names]))

    def assign(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        b = 1 + np.searchsorted(edges, v, side="left")
        return t.append_column(out_col, pa.array(b, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")
