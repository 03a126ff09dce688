"""Deterministic shuffle-shard assignment (ops/shard.py)."""

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.shard import assign_shards, shard_positions

N, SHARDS = 1000, 8


def _corpus():
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(N), pa.int64())})
    ).repartition(7)


def _expected():
    """Brute-force reference: md5 hash-assign + per-shard priority rank."""
    rows = []
    for i in range(N):
        h = hashlib.md5(f"{i}:shard42".encode()).hexdigest()
        rows.append((i, int(h[:8], 16) % SHARDS, h))
    by_shard = {}
    for doc_id, shard, prio in rows:
        by_shard.setdefault(shard, []).append((prio, doc_id))
    out = {}
    for shard, members in by_shard.items():
        for pos, (_, doc_id) in enumerate(sorted(members)):
            out[doc_id] = (shard, pos)
    return out


def test_assign_matches_bruteforce_and_is_balanced():
    got = assign_shards(_corpus(), "doc_id", SHARDS).to_pandas()
    exp = _expected()
    assert all(exp[r.doc_id][0] == r.shard_id for r in got.itertuples())
    counts = got["shard_id"].value_counts()
    assert len(counts) == SHARDS
    # multinomial balance: every shard within 4 sigma of N/SHARDS
    sigma = np.sqrt(N / SHARDS)
    assert (abs(counts - N / SHARDS) < 4 * sigma).all()


def test_positions_match_bruteforce():
    got = shard_positions(_corpus(), "doc_id", SHARDS).to_pandas()
    exp = _expected()
    assert len(got) == N
    for r in got.itertuples():
        assert exp[r.doc_id] == (r.shard_id, r.shard_pos)


def test_positions_deterministic_across_partitionings():
    a = shard_positions(_corpus(), "doc_id", SHARDS).to_pandas()
    b = shard_positions(
        rd.from_arrow(pa.table({"doc_id": pa.array(range(N), pa.int64())})),
        "doc_id", SHARDS,
    ).to_pandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert key(a).equals(key(b))


def test_positions_contiguous_per_shard():
    got = shard_positions(_corpus(), "doc_id", SHARDS).to_pandas()
    for _, g in got.groupby("shard_id"):
        assert sorted(g["shard_pos"]) == list(range(len(g)))
