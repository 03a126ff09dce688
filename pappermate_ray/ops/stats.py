"""Grouped statistics operators: robust (median/MAD) outlier detection
and closed-form per-group linear regression.

Both share the narrow-aggregate scale shape: the corpus rides NO
exchange — only per-group sums / distinct-value counts do — and the
resulting group-sized tables broadcast via ``ray.put``.

Exactness contracts (what makes these oracle-checkable):

- `mad_outliers` works on INTEGER values (callers derive cents/counts
  first): medians come from the exact discrete-quantile machinery
  (`ops/quantiles.grouped_quantiles`, value-count compression — rows
  never sort), deviations and the ``|v − med| > k·MAD`` comparison are
  pure int64, so the flagged set is bit-identical to SQL.
- `grouped_linreg` aggregates exact int64 (n, Σx, Σy, Σxy, Σx²), then
  computes slope/intercept with ONE pinned float64 expression — each
  sum cast to double first, identical operation tree both engines —
  so even the float outputs value-hash. Callers should rebase x to a
  small origin (hours since the corpus epoch, not since 1970) so the
  Σxy/Σx² products stay far from int64 range at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def mad_outliers(
    ds: "rd.Dataset",
    group_col: str,
    val_col: str,
    k: int = 5,
) -> "rd.Dataset":
    """Rows whose integer value deviates from its group MEDIAN by more
    than ``k`` × the group's median absolute deviation — the robust
    sibling of `ops/window.zscore_outliers` (one planted 1e9 row moves
    a mean/stddev gate; it cannot move a median/MAD gate).

    TWO corpus scans total: one builds the distinct ``(group, value,
    n)`` count table (ONE narrow exchange; materialized —
    distinct-sized, never row-sized), from which BOTH the median and
    the MAD derive (the deviation multiset is a weighted remap of the
    same counts, re-grouped in a second distinct-sized exchange); the
    second scan is the streaming flag filter. Integer math end to end.
    Null values never flag (dropped from the count table by the
    `ops/quantiles.value_count_partials` contract).
    """
    from .quantiles import grouped_quantiles_from_counts, grouped_value_counts

    counts = grouped_value_counts(ds, group_col, val_col).materialize()

    med_rows = grouped_quantiles_from_counts(
        counts, group_col, val_col, [0.5], ["med"]).to_pandas()
    med_map = dict(zip(med_rows[group_col], med_rows["med"].astype(np.int64)))
    med_ref = ray.put(med_map)

    def dev(t: pa.Table) -> pa.Table:
        # remap the COUNT table (not the corpus) to |v − med| weights
        m = ray.get(med_ref)
        ser = t[group_col].to_pandas()
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.abs(v - ser.map(m).to_numpy(dtype=np.int64))
        return pa.table({group_col: t[group_col],
                         "_dev": pa.array(d, pa.int64()),
                         "n_part": t["n"]})

    dev_counts = (counts.map_batches(dev, batch_format="pyarrow")
                  .groupby([group_col, "_dev"])
                  .aggregate(Sum("n_part", alias_name="n")))
    mad_rows = grouped_quantiles_from_counts(
        dev_counts, group_col, "_dev", [0.5], ["mad"]).to_pandas()
    mad_map = dict(zip(mad_rows[group_col], mad_rows["mad"].astype(np.int64)))
    mad_ref = ray.put(mad_map)

    def flag(t: pa.Table) -> pa.Table:
        med = ray.get(med_ref)
        mad = ray.get(mad_ref)
        ser = t[group_col].to_pandas()
        # null values never flag; groups absent from the count table
        # (all-null groups) never flag either — mask both before the
        # int64 casts (NaN→int64 is undefined / raises)
        valid = (pc.is_valid(t[val_col]).to_numpy(zero_copy_only=False)
                 & ser.isin(med.keys()).to_numpy())
        v = np.where(valid, t[val_col].to_numpy(zero_copy_only=False), 0).astype(np.int64)
        g_med = ser.map(med).fillna(0).to_numpy(dtype=np.int64)
        g_mad = ser.map(mad).fillna(0).to_numpy(dtype=np.int64)
        d = np.abs(v - g_med)
        keep = valid & (d > k * g_mad)
        return t.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow")


def grouped_linreg(
    ds: "rd.Dataset",
    group_col: str,
    x_col: str,
    y_col: str,
) -> "rd.Dataset":
    """(group, slope, intercept, n) — least-squares fit of integer
    ``y`` on integer ``x`` per group, from ONE narrow aggregate of
    exact int64 (n, Σx, Σy, Σxy, Σx²). The trend-detection primitive
    (is this host's quality drifting? is this event type's value
    rising per hour?). Groups with a degenerate x (all equal, or a
    single row) emit slope = intercept = 0.0 by contract.
    """

    def narrow(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            group_col: t[group_col],
            "_x": pa.array(x, pa.int64()),
            "_y": pa.array(y, pa.int64()),
            "_xy": pa.array(x * y, pa.int64()),
            "_xx": pa.array(x * x, pa.int64()),
        })

    agg = (ds.map_batches(narrow, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(Count(alias_name="n"),
                      Sum("_x", alias_name="sx"),
                      Sum("_y", alias_name="sy"),
                      Sum("_xy", alias_name="sxy"),
                      Sum("_xx", alias_name="sxx")))

    def fit(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom = n * sxx - sx * sx
        ok = denom != 0.0
        slope = np.where(ok, (n * sxy - sx * sy)
                         / np.where(ok, denom, 1.0), 0.0)
        intercept = np.where(ok, (sy - slope * sx) / n, 0.0)
        return pa.table({
            group_col: t[group_col],
            "slope": pa.array(slope, pa.float64()),
            "intercept": pa.array(intercept, pa.float64()),
            "n": pc.cast(t["n"], pa.int64()),
        })

    return agg.map_batches(fit, batch_format="pyarrow")


def grouped_mode(
    ds: "rd.Dataset",
    group_col: str,
    val_col: str,
) -> "rd.Dataset":
    """(group, mode_value, n): each group's most frequent value, ties
    broken by the SMALLEST value — SQL's ``row_number() OVER (PARTITION
    BY g ORDER BY n DESC, v) = 1`` over the value-count table.

    Scale shape IS the exact-quantile machinery's front end
    (`ops/quantiles.grouped_value_counts`): blocks pre-compress to
    (group, value, count) partials, ONE narrow exchange sums them, and
    the partition-grouped finisher takes each group's argmax vectorized
    (lexsort + first-of-run) — rows never shuffle, group count never
    drives Python dispatch. Null values are dropped by the shared
    partials contract (a null can never be the mode).
    """
    from .grouping import partition_grouped
    from .quantiles import grouped_value_counts

    counts = grouped_value_counts(ds, group_col, val_col)

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "n", val_col],
                          ascending=[True, False, True], kind="mergesort")
        keys = g[group_col].to_numpy()
        first = np.ones(len(g), bool)
        first[1:] = keys[1:] != keys[:-1]
        top = g[first]
        return pd.DataFrame({
            group_col: top[group_col].to_numpy(),
            "mode_value": top[val_col].to_numpy(),
            "n": top["n"].to_numpy().astype(np.int64),
        })

    pds, pcols = partition_grouped(counts, [group_col])
    return pds.groupby(pcols).map_groups(argmax, batch_format="pandas")
