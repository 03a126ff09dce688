"""Pivot / crosstab: long (row, category, value) → wide one-column-per-
category.

Distributed pivot needs a STATIC output schema, so the category list is
an explicit argument (discovery-then-pivot is two jobs by nature — run a
distinct pass first if the categories are unknown; categories outside
the list are dropped, which is also what keeps a poisoned category
column from exploding the schema). Scale shape: ONE finest
(row, category) aggregate exchange — the corpus never pivots, only the
(distinct row × category) counts do — then a per-row-group gather over
the fixed category list.

Beyond-reference scope: the reference's reports are long-format
histograms (scripts/openai_contract_explorer.py); the wide crosstab is
their standard presentation form.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum


def pivot_counts(
    ds: "rd.Dataset",
    row_col: str,
    cat_col: str,
    categories: List[str],
    out_prefix: str = "",
) -> "rd.Dataset":
    """Wide count crosstab: one row per distinct ``row_col``, one int64
    column ``<out_prefix><category>`` per entry of ``categories``
    (missing combinations are 0)."""
    finest = ds.groupby([row_col, cat_col]).aggregate(Count(alias_name="n"))
    return _widen(finest, row_col, cat_col, "n", categories, out_prefix,
                  pa.int64())


def pivot_sum(
    ds: "rd.Dataset",
    row_col: str,
    cat_col: str,
    value_col: str,
    categories: List[str],
    out_prefix: str = "",
) -> "rd.Dataset":
    """Wide SUM crosstab (float64 cells; absent combinations are 0.0)."""
    finest = ds.groupby([row_col, cat_col]).aggregate(
        Sum(value_col, alias_name="v"))
    return _widen(finest, row_col, cat_col, "v", categories, out_prefix,
                  pa.float64())


def _widen(finest, row_col, cat_col, val_col, categories, out_prefix,
           cell_type):
    import numpy as np
    import pandas as pd

    from .grouping import partition_grouped

    np_type = np.float64 if cell_type == pa.float64() else np.int64
    cat_pos = {c: j for j, c in enumerate(categories)}

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        # partition-grouped gather: ALL row keys of this partition in
        # one vectorized scatter (the finest aggregate guarantees
        # unique (row, category) pairs) — never one dispatch per
        # distinct row_col value (ops/grouping.py contract; a pivot
        # keyed on url would otherwise crawl). A direct int64 scatter,
        # NOT pandas pivot: pivot's NaN placeholder forces float64 and
        # silently rounds int64 cells above 2^53.
        rows, ridx = np.unique(g[row_col].to_numpy(), return_inverse=True)
        cidx = g[cat_col].map(cat_pos).to_numpy()
        valid = ~pd.isna(cidx)  # categories outside the list drop
        mat = np.zeros((len(rows), len(categories)), dtype=np_type)
        mat[ridx[valid], cidx[valid].astype(np.int64)] = (
            g[val_col].to_numpy()[valid].astype(np_type))
        out = {row_col: rows}
        for j, c in enumerate(categories):
            out[f"{out_prefix}{c}"] = mat[:, j]
        return pd.DataFrame(out)

    pds, pcols = partition_grouped(finest, [row_col])
    return pds.groupby(pcols).map_groups(widen, batch_format="pandas")
