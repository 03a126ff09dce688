"""Grouping-sets aggregation: ROLLUP / CUBE over a Dataset.

The reference engine's report surface stops at single-level histograms
(scripts/openai_contract_explorer.py report counters); multi-level
subtotal reports (per-dimension + grand total in one result) are the
standard warehouse follow-on, so the engine grows them the scale-right
way: ONE corpus exchange at the finest grouping level, then every
coarser level re-aggregates the FINEST RESULT — sums are associative,
and the finest aggregate is (distinct key combos)-sized, orders of
magnitude smaller than the corpus. A naive per-level groupby would
re-scan and re-shuffle 100 TB once per level; this shape scans and
shuffles it exactly once regardless of how many levels roll up.

ANSI output shape: rolled-up dimensions are NULL in their subtotal
rows (exactly what ``GROUP BY ROLLUP/CUBE`` emits, which is what makes
the operator oracle-checkable against DuckDB verbatim).
"""

from __future__ import annotations

from itertools import combinations
from typing import List, Sequence, Tuple

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum


def grouping_sets_sum(
    ds: "rd.Dataset",
    dims: List[str],
    value_col: str,
    out_col: str,
    sets: Sequence[Tuple[str, ...]],
) -> "rd.Dataset":
    """Union of ``SUM(value_col) GROUP BY s`` for each ``s`` in
    ``sets`` (each a subset of ``dims``; the full ``dims`` tuple is
    always computed as the base). Missing dims are NULL-filled, column
    order is ``dims + [out_col]`` for every level so the union is
    schema-stable."""
    dim_types = {f.name: f.type
                 for f in ds.schema().base_schema}  # type: ignore[union-attr]
    finest = ds.groupby(dims).aggregate(
        Sum(value_col, alias_name=out_col)).materialize()
    out_type = finest.schema().base_schema.field(out_col).type

    def level_table(keep: Tuple[str, ...]) -> "rd.Dataset":
        if tuple(keep) == tuple(dims):
            lvl = finest
        elif keep:
            lvl = finest.groupby(list(keep)).aggregate(
                Sum(out_col, alias_name=out_col))
        else:
            total = finest.sum(out_col)
            return rd.from_arrow(pa.table(
                {**{d: pa.nulls(1, dim_types[d]) for d in dims},
                 out_col: pa.array([total if total is not None else 0],
                                   out_type)}))

        def addnulls(t: pa.Table, keep=tuple(keep)) -> pa.Table:
            cols = {}
            for d in dims:
                cols[d] = (t[d] if d in keep
                           else pa.nulls(t.num_rows, dim_types[d]))
            cols[out_col] = t[out_col]
            return pa.table(cols)

        return lvl.map_batches(addnulls, batch_format="pyarrow")

    seen = set()
    pieces = []
    for s in sets:
        key = tuple(s)
        if key in seen:
            continue
        seen.add(key)
        pieces.append(level_table(key))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def rollup_sum(ds: "rd.Dataset", dims: List[str], value_col: str,
               out_col: str) -> "rd.Dataset":
    """``GROUP BY ROLLUP(dims)``: the prefix hierarchy
    (d1..dn), (d1..dn-1), …, (d1), () — subtotals up a drill path."""
    sets = [tuple(dims[:k]) for k in range(len(dims), -1, -1)]
    return grouping_sets_sum(ds, dims, value_col, out_col, sets)


def cube_sum(ds: "rd.Dataset", dims: List[str], value_col: str,
             out_col: str) -> "rd.Dataset":
    """``GROUP BY CUBE(dims)``: every subset of ``dims`` — all 2^n
    cross-tab margins from the one finest exchange."""
    sets: List[Tuple[str, ...]] = []
    for k in range(len(dims), -1, -1):
        sets.extend(combinations(dims, k))
    return grouping_sets_sum(ds, dims, value_col, out_col, sets)
