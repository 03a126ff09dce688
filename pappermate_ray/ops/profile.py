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
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min


def profile_table(
    ds: "rd.Dataset",
    columns: Optional[List[str]] = None,
) -> "rd.Dataset":
    """``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``
    — one row per profiled column, ordered as given."""
    columns = columns or ds.schema().names
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
