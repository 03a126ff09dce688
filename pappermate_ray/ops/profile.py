"""Table profiler — the per-column data-quality summary every pipeline
run emits before trusting an input drop (row/null/distinct counts +
min/max), the engine-side analog of the reference's validation report
counters (reference/src/pappermate/validation/schema.py summaries).

One bounded job per column, each the narrow shape it needs:

- count/min/max: Ray's native aggregate (one streaming pass, scalar
  result; Min/Max skip nulls like SQL);
- null count: per-block ``Array.null_count`` partials summed (one
  pass, one int per block);
- distinct: a groupby on the column — the only exchange, and it
  carries each distinct value once (nulls dropped first: SQL's
  ``COUNT(DISTINCT …)`` excludes them).

min/max stringify for a uniform output schema (``CAST(x AS VARCHAR)``
parity: Python ``str(int)`` == DuckDB's cast; strings pass through).

``approx=True`` (round-2 verdict item #7) replaces the per-column
distinct exchanges — the profiler's only all-to-alls, ~1–3 s fixed
cost EACH on this box — with per-block HyperLogLog register partials
(stages/sketch.py): TWO streaming passes total for the whole table
(one multi-column native aggregate for count/nulls/min/max, one
map_batches emitting a 16 KiB sketch per block per column), zero
exchanges, distinct counts within HLL's ±1.04/√2^p ≈ ±0.8% band.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min


def profile_table(
    ds: "rd.Dataset",
    columns: Optional[List[str]] = None,
    approx: bool = False,
) -> "rd.Dataset":
    """``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``
    — one row per profiled column, ordered as given."""
    columns = columns or ds.schema().names
    if approx:
        return _profile_approx(ds, columns)
    rows = []
    for c in columns:
        one = ds.select_columns([c])
        # one streaming pass: min/max (null-skipping), row count, and
        # non-null count (nulls = difference)
        agg = one.aggregate(
            Min(c), Max(c), Count(),
            Count(c, ignore_nulls=True, alias_name="_nn"),
        )
        n_nulls = int(agg["count()"]) - int(agg["_nn"])

        def drop_nulls(t: pa.Table, _c=c) -> pa.Table:
            return t.filter(t[_c].is_valid())

        n_distinct = (
            one.map_batches(drop_nulls, batch_format="pyarrow")
            .groupby(c).aggregate(Count()).count()
        )
        mn, mx = agg[f"min({c})"], agg[f"max({c})"]
        rows.append({
            "col_name": c,
            "n_rows": int(agg["count()"]),
            "n_nulls": int(n_nulls),
            "n_distinct": int(n_distinct),
            "min_value": "" if mn is None else str(mn),
            "max_value": "" if mx is None else str(mx),
        })
    return rd.from_items(rows)


def _profile_approx(ds: "rd.Dataset", columns: List[str]) -> "rd.Dataset":
    """Exchange-free profile: native one-pass aggregate for
    count/nulls/min/max across ALL columns at once, HLL block partials
    for distinct. Driver transit is O(blocks × cols × 2^p) sketch
    bytes — a function of the block count, never the data."""
    from ..stages.sketch import _HLL_P, hll_estimate, hll_merge, hll_registers

    aggs = [Count()]
    for c in columns:
        aggs += [Min(c), Max(c), Count(c, ignore_nulls=True, alias_name=f"_nn_{c}")]
    agg = ds.aggregate(*aggs)

    def sketch_block(t: pa.Table) -> pa.Table:
        names, regs = [], []
        for c in columns:
            vals = [str(v) for v in t[c].drop_null().to_pylist()]
            names.append(c)
            regs.append(hll_registers(vals, _HLL_P).tobytes())
        return pa.table({"col_name": pa.array(names, pa.string()),
                         "regs": pa.array(regs, pa.binary())})

    by_col = {c: [] for c in columns}
    for r in ds.select_columns(list(columns)).map_batches(
            sketch_block, batch_format="pyarrow").take_all():
        by_col[r["col_name"]].append(np.frombuffer(r["regs"], dtype=np.uint8))

    rows = []
    for c in columns:
        mn, mx = agg[f"min({c})"], agg[f"max({c})"]
        est = hll_estimate(hll_merge(by_col[c])) if by_col[c] else 0.0
        rows.append({
            "col_name": c,
            "n_rows": int(agg["count()"]),
            "n_nulls": int(agg["count()"]) - int(agg[f"_nn_{c}"]),
            "n_distinct": int(round(est)),
            "min_value": "" if mn is None else str(mn),
            "max_value": "" if mx is None else str(mx),
        })
    return rd.from_items(rows)
