"""Partition-grouped processing: the scale-safe replacement for
per-key ``groupby(key).map_groups`` when key cardinality is unbounded.

Grouping by the raw key hands the reducer one pandas/Arrow group per
key — at web scale that is billions of 1–50-row groups, each paying
~1 ms of dispatch + DataFrame overhead that dwarfs the actual work
(the latest_by_url anti-pattern, round-1 verdict #5). Grouping by
``hash(key) mod P`` instead yields P partition-sized groups; the
per-group function then handles ALL keys in its partition vectorized
(sort once, walk key runs / ``pd.merge_asof(by=...)`` / grouped numpy
sums). All rows of one key still co-locate, so per-key semantics are
unchanged. Used by ops/asof.py, ops/rangejoin.py, sessionization and
the webclean removal-list collectors; stages/dedup.py applies the same
idea with its own pair-emission group function.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray.data as rd

_MIX = np.uint64(0x9E3779B97F4A7C15)


def partition_grouped(
    u: "rd.Dataset", key_cols: List[str], npart: Optional[int] = None
) -> tuple:
    """(dataset with ``_pkey``, group column list): hash-partition rows
    by key so ONE grouped exchange yields partition-sized groups.

    Grouping by the raw key hands the reducer millions of 1–50-row
    pandas groups — per-group DataFrame overhead dwarfs the merge work
    (the latest_by_url anti-pattern, round-1 verdict #5). Grouping by
    ``hash(key) mod P`` gives P partition-sized groups; the per-group
    function then runs the merge VECTORIZED across all keys in the
    partition (``pd.merge_asof(by=...)`` / per-run searchsorted). All
    rows of one key (and one salt) still co-locate.
    """
    from .joins import default_num_partitions

    npart = npart or default_num_partitions()

    def add_pkey(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            acc = np.zeros(t.num_rows, np.uint64)
            for c in key_cols:
                col = t[c]
                if pa.types.is_integer(col.type):
                    v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
                else:  # strings: stable digest, never Python hash()
                    v = np.fromiter(
                        (int.from_bytes(
                            hashlib.md5(str(x).encode()).digest()[:8], "little")
                         for x in col.to_pylist()),
                        dtype=np.uint64, count=t.num_rows)
                acc = (acc + v) * _MIX
        pk = (acc % np.uint64(npart)).astype(np.int64)
        return t.append_column("_pkey", pa.array(pk, pa.int64()))

    return u.map_batches(add_pkey, batch_format="pyarrow"), ["_pkey"]


