"""ops/bloom.py — Bloom-pruned incremental anti-join (the SQL
equivalence is covered by the oracle gate's `incremental_new` row)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.bloom import (
    bloom_params,
    bloom_split,
    build_bloom,
    incremental_new,
)


def _keys_ds(keys, blocks=1, extra=None):
    cols = {"key": pa.array(keys, pa.string())}
    if extra:
        cols.update(extra)
    ds = rd.from_arrow(pa.table(cols))
    return ds.repartition(blocks) if blocks > 1 else ds


def test_params_sizing():
    m, k = bloom_params(1000, 0.01)
    # textbook: ~9.6 bits/key, ~7 probes at 1% FPR
    assert 9_000 <= m <= 10_300 and 6 <= k <= 8
    assert m % 8 == 0


def test_no_false_negatives(ray_session):
    seen_keys = [f"url-{i}" for i in range(500)]
    bm, m, k = build_bloom(_keys_ds(seen_keys, blocks=7), "key", 500)
    _, maybe = bloom_split(_keys_ds(seen_keys), "key", bm, m, k)
    # every inserted key must be flagged maybe-seen
    assert maybe.count() == 500


def test_prune_keeps_most_new_rows_out_of_the_join(ray_session):
    seen = [f"seen-{i}" for i in range(400)]
    new = [f"new-{i}" for i in range(2000)]
    bm, m, k = build_bloom(_keys_ds(seen, blocks=3), "key", 400, fpr=0.01)
    definitely_new, maybe = bloom_split(_keys_ds(new), "key", bm, m, k)
    # disjoint keys: only false positives reach the join; at 1% FPR the
    # sliver must be tiny (generous bound for hash luck)
    assert maybe.count() <= 80
    assert definitely_new.count() + maybe.count() == 2000


def test_incremental_new_matches_exact_anti_join(ray_session):
    rng = np.random.default_rng(7)
    seen_keys = [f"k-{i}" for i in rng.choice(3000, size=800, replace=False)]
    new_keys = [f"k-{i}" for i in range(1200)]
    new = _keys_ds(
        new_keys, blocks=5,
        extra={"v": pa.array(list(range(1200)), pa.int64())})
    out = incremental_new(
        new, _keys_ds(seen_keys, blocks=4), "key", n_seen_hint=800,
        new_schema=pa.schema([("key", pa.string()), ("v", pa.int64())]),
        seen_schema=pa.schema([("key", pa.string())]))
    got = sorted(r["key"] for r in out.take_all())
    want = sorted(set(new_keys) - set(seen_keys))
    assert got == want
    # payload column survives the split/union
    assert sorted(out.schema().names) == ["key", "v"]


def test_bitmap_is_block_order_invariant(ray_session):
    keys = [f"z-{i}" for i in range(300)]
    a, m, k = build_bloom(_keys_ds(keys, blocks=1), "key", 300)
    b, m2, k2 = build_bloom(_keys_ds(list(reversed(keys)), blocks=9),
                            "key", 300)
    assert (a, m, k) == (b, m2, k2)


def test_tagged_split_equals_double_scan(ray_session):
    from pappermate_ray.ops.bloom import bloom_split_tagged

    seen = _keys_ds([f"s{i}" for i in range(200)], blocks=3)
    mixed = _keys_ds([f"s{i}" for i in range(100)]
                     + [f"n{i}" for i in range(150)], blocks=4,
                     extra={"payload": pa.array(
                         [f"p{i}" for i in range(250)], pa.string())})
    bm, m, k = build_bloom(seen, "key", 200)
    a_new, a_maybe = bloom_split(mixed, "key", bm, m, k)
    b_new, b_maybe = bloom_split_tagged(mixed, "key", bm, m, k)

    def rows(ds):
        return sorted((r["key"], r["payload"]) for r in ds.take_all())

    assert rows(a_new) == rows(b_new)
    assert rows(a_maybe) == rows(b_maybe)
    # schema preserved: no tag column leaks
    assert b_new.schema().names == ["key", "payload"]
