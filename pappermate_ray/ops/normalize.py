"""Grouped z-score normalization — the per-domain/per-language feature
scaling pass a curation pipeline runs before thresholding quality
signals (scores comparable across languages only after normalization).

Scale shape: one NARROW aggregate (per-group count / sum / sum-of-
squares — the shuffle carries three ints per group, never rows), the
resulting O(groups) stats table broadcast once via ``ray.put``, then a
single streaming normalize pass. No row-level shuffle at all.

Determinism: integer sums are exact, mean/variance derive from them
with a fixed expression (``ss/n - (s/n)²``, NOT an engine-specific
Welford), and z is rounded — so a SQL re-derivation using the same
expression matches bit-for-bit. (At 100 TB the int64 sum-of-squares
could overflow for huge values; the scale variant sums compensated
float64 partials, which still agrees far below the rounding grid.)
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def grouped_zscore(
    ds: "rd.Dataset",
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> "rd.Dataset":
    """Append ``z`` = per-group z-score of ``value_col`` (population
    variance; all-equal groups get z=0.0), rounded to ``round_to``."""

    def narrow(t: pa.Table) -> pa.Table:
        v = np.asarray(t[value_col], np.int64)
        return pa.table({
            group_col: t[group_col],
            value_col: t[value_col],
            "_sq": pa.array(v * v, pa.int64()),
        })

    stats_rows = (
        ds.map_batches(narrow, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Count(alias_name="n"),
                   Sum(value_col, alias_name="s"),
                   Sum("_sq", alias_name="ss"))
        .take_all()  # O(groups), bounded — the broadcast small side
    )
    stats = {}
    for r in stats_rows:
        n, s, ss = r["n"], r["s"], r["ss"]
        mean = s / n
        var = ss / n - mean * mean
        stats[r[group_col]] = (mean, math.sqrt(var) if var > 0 else 0.0)
    ref = ray.put(stats)

    def normalize(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        x = np.asarray(t[value_col], np.float64)
        means = np.empty(len(t))
        stds = np.empty(len(t))
        for i, g in enumerate(t[group_col].to_pylist()):
            means[i], stds[i] = st[g]
        z = np.where(stds > 0, np.round((x - means) / np.where(stds > 0, stds, 1.0),
                                        round_to), 0.0)
        return t.append_column("z", pa.array(z, pa.float64()))

    return ds.map_batches(normalize, batch_format="pyarrow")
