"""Join strategies (SURVEY.md §2.4).

Three scale-appropriate shapes:

- ``broadcast_lookup``: small side pinned once in the object store via
  ``ray.put``, read per task — NO shuffle. For dimension tables, vocab,
  blocklists (J1/J4 analog). The big side streams.
- ``hash_join``: both sides large → Ray's partitioned hash join
  (``Dataset.join``), an explicit all-to-all exchange on the key.
- ``broadcast_semi`` / ``broadcast_anti``: key-set broadcast + vectorized
  ``pc.is_in`` filter inside map_batches (D5 resume anti-join shape).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray


def broadcast_lookup(
    ds: "ray.data.Dataset",
    small: Dict,
    key: str,
    out_col: str,
    default=None,
) -> "ray.data.Dataset":
    """Map ``key`` through a broadcast dict → append ``out_col``.

    ``small`` is put in the object store ONCE; every task reads the same
    immutable copy (zero re-shipping per batch).
    """
    ref = ray.put(small)

    def _lookup(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        keys = batch[key].to_pylist()
        vals = [table.get(k, default) for k in keys]
        return batch.append_column(out_col, pa.array(vals))

    return ds.map_batches(_lookup, batch_format="pyarrow")


def broadcast_semi(ds: "ray.data.Dataset", keys: List, key_col: str) -> "ray.data.Dataset":
    """Keep rows whose key is in the broadcast key set (semi-join)."""
    ref = ray.put(pa.array(sorted(set(keys))))

    def _semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[key_col], value_set=ray.get(ref)))

    return ds.map_batches(_semi, batch_format="pyarrow")


def broadcast_anti(ds: "ray.data.Dataset", keys: List, key_col: str) -> "ray.data.Dataset":
    """Drop rows whose key is in the broadcast key set (anti-join).

    This is the resume path (SURVEY.md §2.7 D5): input urls anti-joined
    against the completed-partition manifest.
    """
    ref = ray.put(pa.array(sorted(set(keys))))

    def _anti(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch[key_col], value_set=ray.get(ref))))

    return ds.map_batches(_anti, batch_format="pyarrow")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    num_partitions: int = 32,
    join_type: str = "inner",
) -> "ray.data.Dataset":
    """Partitioned hash join of two large Datasets (explicit shuffle on key).

    At cluster scale ``num_partitions`` should track total cores; skewed
    keys should be salted before calling (SURVEY.md §4).
    """
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )
