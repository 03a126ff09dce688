"""Deterministic global shuffle → training-shard assignment.

The last step of every training-data pipeline is a GLOBAL shuffle of the
curated corpus into fixed output shards. At 100 TB a true global sort is
the single most expensive exchange in the job — and unnecessary: a
pseudo-random permutation is the goal, and a keyed hash IS one.

Recipe (the scale path this module implements):

1. ``assign_shards`` — shard_id = md5(id:salt) mod num_shards. A pure
   streaming ``map_batches`` pass: ZERO shuffle, stable under retries
   and re-partitioning (the hash is the coin, same currency as
   ``ops/sample.weighted_mixture_sample``). Shards are balanced to
   multinomial noise (O(sqrt(n/shards)) skew) without any planning
   pass.
2. ``shard_positions`` — within-shard order = full md5 hex priority;
   one hash exchange on shard_id, per-shard work is a local sort of
   ~n/num_shards rows. Replaces a global sort with ``num_shards``
   independent small sorts — embarrassingly parallel, and each shard
   can be written as its own resumable Parquet partition.

Both halves are exactly reproducible in SQL (md5 + row_number window),
so the whole shuffle is oracle-checkable — engine-RNG ``random_shuffle``
never is. The reference has no training-shard writer (its corpus fits a
directory); this is a beyond-reference operator per the driver brief.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _md5_hex(ids) -> np.ndarray:
    return np.array(
        [hashlib.md5(str(i).encode()).hexdigest() for i in ids], dtype=object
    )


def assign_shards(
    ds: "ray.data.Dataset",
    id_col: str,
    num_shards: int,
    salt: str = "shard42",
) -> "ray.data.Dataset":
    """Append ``shard_id`` (int64 in [0, num_shards)) — deterministic
    pseudo-random shard assignment via the first 8 md5 hex digits of
    ``id:salt``. Streaming, shuffle-free."""

    def tag(t: pa.Table) -> pa.Table:
        keys = [f"{i}:{salt}" for i in t[id_col].to_pylist()]
        h = np.array(
            [int(hashlib.md5(k.encode()).hexdigest()[:8], 16) for k in keys],
            dtype=np.int64,
        )
        return t.append_column(
            "shard_id", pa.array(h % num_shards, pa.int64())
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def shard_positions(
    ds: "ray.data.Dataset",
    id_col: str,
    num_shards: int,
    salt: str = "shard42",
) -> "ray.data.Dataset":
    """Full shuffle manifest: ``shard_id`` + ``shard_pos`` (0-based rank
    of the row inside its shard, ordered by md5 priority, id ascending
    on the ties a collision would need).

    One hash exchange on shard_id; per-shard finish is a small local
    sort — n/num_shards rows each, independent, so the "global shuffle"
    parallelizes to the shard count instead of serializing into one
    all-to-all sort. Output rows carry everything a shard writer needs
    to emit resumable per-shard Parquet.
    """
    tagged = assign_shards(ds, id_col, num_shards, salt=salt)

    def prio(t: pa.Table) -> pa.Table:
        keys = [f"{i}:{salt}" for i in t[id_col].to_pylist()]
        return t.append_column(
            "_prio",
            pa.array([hashlib.md5(k.encode()).hexdigest() for k in keys],
                     pa.string()),
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_prio", id_col], kind="mergesort")
        g["shard_pos"] = np.arange(len(g), dtype=np.int64)
        return g.drop(columns=["_prio"])

    return (
        tagged.map_batches(prio, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(rank, batch_format="pandas")
    )
