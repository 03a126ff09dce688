"""Hot-key salting for skewed grouped aggregates (SURVEY.md §4, guide §agg).

A grouped aggregate with one dominant key puts that key's whole volume on
a single reducer. Salting splits each input row's key into
``(key, salt)`` with ``salt = fnv1a(row-discriminator) % n_salts`` for the
partial phase, so a hot key spreads across ``n_salts`` reducers; a second,
tiny aggregate merges the salted partials back per key. Result is
IDENTICAL to the unsalted aggregate (associative measures only) — the
test asserts it.
"""

from __future__ import annotations



from typing import Set

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum


def detect_hot_keys(ds: "rd.Dataset", key_col: str, threshold: int) -> Set:
    """Keys whose row count ≥ threshold, as a (provably bounded) set.

    The detection pass is a NARROW grouped count (key column only rides
    the exchange); the result set has at most ``total_rows / threshold``
    members, so collecting it is bounded by construction — pick the
    threshold so that bound is small (e.g. rows a single reducer can't
    hold). Used by the auto-salting joins (ops/asof.py, ops/rangejoin.py).
    """
    counts = ds.select_columns([key_col]).groupby(key_col).aggregate(
        Count(alias_name="_n")
    )
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["_n"], threshold)).select([key_col]),
        batch_format="pyarrow",
    )
    return {r[key_col] for r in hot.take_all()}


def salted_count_sum(
    ds: "rd.Dataset",
    key: str,
    value: str,
    n_salts: int = 8,
    count_alias: str = "n",
    sum_alias: str = "total",
) -> "rd.Dataset":
    """groupby(key) → count + sum, skew-safe via two-phase salted shuffle."""

    def add_salt(t: pa.Table) -> pa.Table:
        # deterministic row discriminator: running index within the batch
        # spreads a hot key's rows uniformly over the salt space
        salt = np.arange(len(t), dtype=np.int64) % n_salts
        return pa.table({key: t[key], value: t[value],
                         "salt": pa.array(salt, pa.int64())})

    partial = ds.map_batches(add_salt, batch_format="pyarrow").groupby(
        [key, "salt"]
    ).aggregate(
        Count(alias_name="_n_part"),
        Sum(value, alias_name="_s_part"),
    )
    final = partial.groupby(key).aggregate(
        Sum("_n_part", alias_name=count_alias),
        Sum("_s_part", alias_name=sum_alias),
    )
    return final
