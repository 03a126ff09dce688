"""Persisted additive-stats store — materialized-view maintenance for
grouped SUM/COUNT aggregates.

The statistics sibling of the HLL sketch store: each corpus increment
appends its OWN grouped partials (``(group..., n, sum)`` rows) to a
parquet store; reading merges additively with one tiny groupby over
rows whose total is O(increments × distinct groups), never the events.
SUM and COUNT are associative-commutative, so the merge is EXACT —
stats over a growing stream never re-scan old increments, the same
grow-without-rescan contract as the MinHash/BM25/HLL/PQ stores.

The standard dashboarding shape ("hourly event counters maintained
across daily ingests") that would otherwise re-aggregate the full
history every refresh. AVG/stddev callers keep (sum, count[, sumsq])
partials and finish at read time — never store the ratio.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .search import write_increment


def save_stats_increment(
    ds: "rd.Dataset",
    store_dir: str,
    group_cols: List[str],
    value_col: str,
    count_alias: str = "n_events",
    sum_alias: str = "sum_value",
) -> str:
    """Aggregate ONE increment (grouped count + sum of ``value_col``)
    and append it to ``store_dir`` — one narrow exchange over the new
    rows only."""
    agg = ds.groupby(group_cols).aggregate(
        Count(alias_name=count_alias),
        Sum(value_col, alias_name=sum_alias))
    write_increment(agg, store_dir, "stats")
    return store_dir


build_stats_store = save_stats_increment


def stored_stats(
    store_dir: str,
    group_cols: List[str],
    count_alias: str = "n_events",
    sum_alias: str = "sum_value",
) -> "rd.Dataset":
    """Merged view over every increment: additive groupby over the
    stored partial rows (O(increments × groups), the events themselves
    are never re-read). Exactly equals the one-shot aggregate over the
    union of all increments."""
    rows = rd.read_parquet(f"{store_dir}/stats")
    return rows.groupby(group_cols).aggregate(
        Sum(count_alias, alias_name=count_alias),
        Sum(sum_alias, alias_name=sum_alias))
