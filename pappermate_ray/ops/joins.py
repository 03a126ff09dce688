"""Join strategies (SURVEY.md §2.4).

Scale-appropriate shapes:

- ``broadcast_lookup``: small side pinned once in the object store via
  ``ray.put``, read per task — NO shuffle. For dimension tables, vocab,
  blocklists (J1/J4 analog). The big side streams.
- ``hash_join`` / ``semi_join`` / ``anti_join``: both sides large → Ray's
  partitioned hash join (``Dataset.join``), an explicit all-to-all
  exchange on the key(s). Partition count defaults to cluster cores.
- ``broadcast_semi`` / ``broadcast_anti``: key-set broadcast + vectorized
  ``pc.is_in`` filter inside map_batches (D5 resume anti-join shape) —
  for when the key side is provably small (manifest, blocklist).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import pyarrow as pa
import pyarrow.compute as pc

import ray

OnCols = Union[str, Sequence[str]]

# ---------------------------------------------------------------------------
# Join-partition schema armor.
#
# Ray 2.49's hash join only learns a side's schema from the shards it
# receives. The shuffle drops 0-row blocks entirely and broadcasts the
# schema with the FIRST scheduled block only — so when a side's first
# block happens to be empty (grouped aggregates and filters emit those
# routinely) every join partition that draws no real row from that side
# hands Acero a column-less table and the join dies with "No match or
# multiple matches for key field reference". Sparse-key semi/anti joins
# (dedup losers, multi-member LSH buckets) hit this constantly.
#
# Fix at this layer: before joining, prepend to each side a tiny "armor"
# block of sentinel-keyed rows chosen (with Ray's own hash_partition,
# whose pa.Scalar hashing is process-stable) so that EVERY partition
# receives at least one schema-bearing row from each side. Sentinel key
# values are extreme (int64 min side, NUL-prefixed strings) and disjoint
# between the two sides, so they match nothing: inner/semi results are
# unchanged, and anti results are post-filtered to drop the surviving
# left sentinels. Unsupported key types degrade to no armor (original
# Ray behavior), never to an error.
# ---------------------------------------------------------------------------


class _UnsupportedSentinelType(Exception):
    pass


def _sentinel_value(typ: pa.DataType, k: int):
    """k-th sentinel of the given type; extreme values real data never uses."""
    if pa.types.is_signed_integer(typ):
        bits = typ.bit_width
        return -(1 << (bits - 1)) + 1 + k
    if pa.types.is_unsigned_integer(typ):
        bits = typ.bit_width
        return (1 << bits) - 2 - k
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return f"\x00\x00pappermate-join-armor-{k}"
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return f"\x00\x00pappermate-join-armor-{k}".encode("ascii")
    if pa.types.is_timestamp(typ) or pa.types.is_date(typ) or pa.types.is_time(typ):
        return -(1 << 61) + k
    if pa.types.is_floating(typ):
        return -1.0e308 + k * 1.0e292
    raise _UnsupportedSentinelType(str(typ))


def _sentinels_covering(key_fields: List[pa.Field], num_partitions: int, side: int):
    """Sentinel key tuples such that every hash partition receives one.

    Uses Ray's own ``hash_partition`` so the driver-side assignment is
    identical to the shuffle workers' (pa.Scalar hashing is
    process-stable, unlike Python's salted str hash). ``side`` parity
    keeps left/right sentinel spaces disjoint.
    """
    from ray.data._internal.arrow_ops.transform_pyarrow import hash_partition

    names = [f.name for f in key_fields]
    chosen: dict = {}
    k = side
    tries = 0
    while len(chosen) < num_partitions and tries < 256 * num_partitions:
        vals = tuple(
            _sentinel_value(f.type, k if ci == 0 else side)
            for ci, f in enumerate(key_fields)
        )
        tbl = pa.table({n: pa.array([v], f.type) for n, f, v in zip(names, key_fields, vals)})
        parts = hash_partition(tbl, hash_cols=names, num_partitions=num_partitions)
        pid = next(iter(parts))
        chosen.setdefault(pid, vals)
        k += 2
        tries += 1
    return list(chosen.values())


def _armored(
    ds: "ray.data.Dataset",
    on_cols: Sequence[str],
    num_partitions: int,
    side: int,
    schema: Optional[pa.Schema] = None,
):
    """Prepend the armor block; returns (dataset, first-key sentinel list).

    Falls back to the unarmored dataset when the schema is unknown or a
    key type has no sentinel representation. Callers that KNOW the
    schema should pass it: ``ds.schema()`` on an aggregate/sort lineage
    executes the whole upstream pipeline, and the join would then run it
    a second time (measured 3-4× re-execution in the dedup chain).
    """
    import ray.data as rd

    try:
        sch = schema if schema is not None else ds.schema()
        base = getattr(sch, "base_schema", sch)
        key_fields = [base.field(c) for c in on_cols]
        sents = _sentinels_covering(key_fields, num_partitions, side)
        if not sents:
            return ds, None
        cols = {}
        for field in base:
            if field.name in on_cols:
                i = list(on_cols).index(field.name)
                cols[field.name] = pa.array([v[i] for v in sents], field.type)
            else:
                cols[field.name] = pa.nulls(len(sents), field.type)
        armor = rd.from_arrow(pa.table(cols, schema=base))
        first = [v[0] for v in sents]
        return armor.union(ds), (first, key_fields[0].type)
    except Exception:
        return ds, None


def _on_tuple(on: OnCols) -> Tuple[str, ...]:
    return (on,) if isinstance(on, str) else tuple(on)


def default_num_partitions() -> int:
    """Partition count for hash exchanges: track total cluster cores
    (SURVEY.md §4 — at 100 TB the exchange should use every reducer)."""
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def adaptive_partitions(n_rows: int, rows_per_partition: int = 20_000) -> int:
    """Partition count scaled to a KNOWN row count, capped at cores.

    Ray's join spins up one aggregator actor per partition group — for a
    small known intermediate (pruned LSH buckets, candidate pairs) 32
    partitions cost ~20 s of pool spin-up to shuffle kilobytes (measured).
    Callers that hold a materialized side pass its count; unknown/large
    sides keep the cores-based default.
    """
    return max(2, min(default_num_partitions(), n_rows // rows_per_partition + 1))


def broadcast_lookup(
    ds: "ray.data.Dataset",
    small: Dict,
    key: str,
    out_col: str,
    default=None,
) -> "ray.data.Dataset":
    """Map ``key`` through a broadcast dict → append ``out_col``.

    ``small`` is put in the object store ONCE as a pair of Arrow arrays;
    every task reads the same immutable copy (zero re-shipping per
    batch). Per-batch work is vectorized ``pc.index_in`` + ``pc.take``
    (order-preserving, unlike an Acero join).
    """
    keys_arr = pa.array(list(small.keys()))
    vals_arr = pa.array(list(small.values()))
    ref = ray.put((keys_arr, vals_arr))

    def _lookup(batch: pa.Table) -> pa.Table:
        ks, vs = ray.get(ref)
        idx = pc.index_in(batch[key], value_set=ks)
        vals = pc.take(vs, idx)
        if default is not None:
            vals = pc.fill_null(vals, default)
        return batch.append_column(out_col, vals)

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
    on: OnCols,
    right_on: Optional[OnCols] = None,
    num_partitions: Optional[int] = None,
    join_type: str = "inner",
    armor: bool = True,
    left_schema: Optional[pa.Schema] = None,
    right_schema: Optional[pa.Schema] = None,
) -> "ray.data.Dataset":
    """Partitioned hash join of two large Datasets (explicit shuffle on
    key(s) — single- or multi-column).

    ``num_partitions`` defaults to the cluster's core count (the exchange
    should use every reducer); skewed keys should be salted before
    calling (SURVEY.md §4). ``armor`` (see module notes) hardens both
    sides against Ray's schema-less-empty-partition crash; supported for
    every join type this engine uses (inner / left_semi / left_anti /
    left_outer / right_outer / full_outer).
    Pass ``left_schema``/``right_schema`` when a side's lineage contains
    an aggregate/sort — otherwise the armor's schema probe executes that
    whole lineage once before the join executes it again.
    """
    np_ = num_partitions or default_num_partitions()
    on_t = _on_tuple(on)
    right_on_t = _on_tuple(right_on) if right_on else on_t
    left_sent = right_sent = None
    if armor and join_type in ("inner", "left_semi", "left_anti",
                               "left_outer", "right_outer", "full_outer"):
        left, left_sent = _armored(left, on_t, np_, side=0, schema=left_schema)
        right, right_sent = _armored(right, right_on_t, np_, side=1,
                                     schema=right_schema)
    out = left.join(
        right,
        join_type=join_type,
        num_partitions=np_,
        on=on_t,
        right_on=right_on_t if right_on else None,
    )

    def _strip(ds_out, col0, sent_lists):
        vals = [v for s in sent_lists if s is not None for v in s[0]]
        if not vals:
            return ds_out
        typ = next(s[1] for s in sent_lists if s is not None)
        sent_arr = pa.array(vals, typ)
        return ds_out.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t[col0], value_set=sent_arr))),
            batch_format="pyarrow",
        )

    # sentinels survive any join that keeps unmatched rows from their
    # side; full_outer coalesces both key sets into the LEFT key name,
    # right_outer keeps only the RIGHT key name (Ray 2.49 semantics,
    # probed in tests/test_join_equivalence.py)
    if join_type in ("left_anti", "left_outer"):
        out = _strip(out, on_t[0], [left_sent])
    elif join_type == "full_outer":
        out = _strip(out, on_t[0], [left_sent, right_sent])
    elif join_type == "right_outer":
        out = _strip(out, right_on_t[0], [right_sent])
    return out


def semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: OnCols,
    num_partitions: Optional[int] = None,
    left_schema: Optional[pa.Schema] = None,
    right_schema: Optional[pa.Schema] = None,
) -> "ray.data.Dataset":
    """Distributed semi-join: left rows whose key(s) appear in ``right``.

    The scale-safe replacement for a driver-built key set when the right
    side is NOT provably small (e.g. multi-member LSH buckets at 100 TB).
    One hash exchange on the key; no driver materialization.
    """
    return hash_join(left, right, on=on, num_partitions=num_partitions,
                     join_type="left_semi",
                     left_schema=left_schema, right_schema=right_schema)


def anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: OnCols,
    num_partitions: Optional[int] = None,
    left_schema: Optional[pa.Schema] = None,
    right_schema: Optional[pa.Schema] = None,
) -> "ray.data.Dataset":
    """Distributed anti-join: left rows whose key(s) do NOT appear in
    ``right``. The dedup-loser / resume filter shape at corpus scale."""
    return hash_join(left, right, on=on, num_partitions=num_partitions,
                     join_type="left_anti",
                     left_schema=left_schema, right_schema=right_schema)


def broadcast_join(
    left: "ray.data.Dataset",
    right_table: pa.Table,
    on: str,
    right_on: Optional[str] = None,
) -> "ray.data.Dataset":
    """INNER join against a driver-small BROADCAST right table: the
    table is put in the object store ONCE; per batch the unique-key
    fast path is fully vectorized (``pc.index_in`` + ``take``), and
    duplicate right keys fall back to a precomputed key→row-indices
    expansion (fan-out preserved). Zero exchanges — the streaming
    sibling of ``hash_join(join_type='inner')`` for small sides, with
    identical output rows (right key column dropped, as Acero does).
    Use ``auto_join`` to pick between the two by measured size."""
    import numpy as np

    rkey = right_on or on
    keys = right_table[rkey].combine_chunks()
    n_distinct = pc.count_distinct(keys).as_py()
    unique = n_distinct == right_table.num_rows
    payload = right_table.drop_columns([rkey])
    if unique:
        ref = ray.put((keys, payload))

        def join_batch(t: pa.Table) -> pa.Table:
            ks, rt = ray.get(ref)
            idx = pc.index_in(t[on], value_set=ks)
            mask = pc.is_valid(idx)
            lt = t.filter(mask)
            rsel = rt.take(idx.filter(mask))
            out = lt
            for name in rsel.schema.names:
                out = out.append_column(name, rsel[name])
            return out
    else:
        # key -> right row indices, built once and broadcast
        karr = np.array(keys.to_pylist(), dtype=object)
        order = np.argsort(karr, kind="stable")
        ks_sorted = karr[order]
        change = np.ones(len(ks_sorted), bool)
        if len(ks_sorted):
            change[1:] = ks_sorted[1:] != ks_sorted[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(ks_sorted))
        index_map = {ks_sorted[s]: order[s:e] for s, e in zip(starts, ends)}
        ref = ray.put((index_map, payload))

        def join_batch(t: pa.Table) -> pa.Table:
            imap, rt = ray.get(ref)
            li, ri = [], []
            for r, k in enumerate(t[on].to_pylist()):
                hit = imap.get(k)
                if hit is not None:
                    li.extend([r] * len(hit))
                    ri.extend(hit)
            lt = t.take(pa.array(li, pa.int64()))
            rsel = rt.take(pa.array(ri, pa.int64()))
            out = lt
            for name in rsel.schema.names:
                out = out.append_column(name, rsel[name])
            return out

    return left.map_batches(join_batch, batch_format="pyarrow")


def auto_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    broadcast_rows: int = 200_000,
    n_right_hint: Optional[int] = None,
    left_schema: Optional[pa.Schema] = None,
    right_schema: Optional[pa.Schema] = None,
) -> "ray.data.Dataset":
    """Adaptive INNER join: measure the right side (``count()`` —
    metadata-cheap for parquet reads; pass ``n_right_hint`` when the
    lineage is expensive) and pick the plan — ≤ ``broadcast_rows``
    collects the right side once (exact Arrow blocks, no row-dict
    conversion) and streams a zero-exchange ``broadcast_join``;
    above it, the armored partitioned ``hash_join``. The small-side
    join is THE 100 TB hot path (dimension tables, keep-lists,
    manifests), and paying an all-to-all for it is the classic planner
    mistake this removes."""
    n_right = n_right_hint if n_right_hint is not None else right.count()
    if n_right <= broadcast_rows:
        blocks = ray.get(right.to_arrow_refs())
        blocks = [b for b in blocks if b.num_rows] or blocks[:1]
        if not blocks:
            blocks = [pa.table({(right_on or on): pa.array([], pa.int64())})]
        return broadcast_join(left, pa.concat_tables(blocks), on,
                              right_on=right_on)
    return hash_join(left, right, on=on, right_on=right_on,
                     num_partitions=adaptive_partitions(n_right),
                     left_schema=left_schema, right_schema=right_schema)
