"""Range-partitioned sorted export — the TeraSort shape.

A globally-sorted corpus on disk (contracts by number, postings by
term, events by timestamp) is the precondition for merge joins, binary-
search lookups and time-range scans over cold storage. Ray's own
``Dataset.sort`` produces sorted BLOCKS but no durable layout contract;
this operator writes one Parquet file per key range plus a manifest
(``range_id, n_rows, key_min, key_max, path``) such that

  file i is internally sorted  AND  max(file i) <= min(file i+1)

so ``cat part-00000 .. part-NNNNN`` IS the global sort, any range scan
opens only the manifest-selected files, and a failed run resumes by
re-writing only the missing ``range_id``s (deterministic names).

Scale shape (the three costs, all bounded):

1. **Boundaries**: exact discrete quantiles at ``k/p`` via
   ``ops/quantiles`` value-count compression — the exchange carries
   distinct ``(value, n)`` pairs, not rows. For unbounded-distinct keys
   (urls, uuids) pass ``sample_mod``: ONE streaming pass emits the
   deterministic hash-sample (splitmix64 for ints, md5 for strings)
   and the driver cuts edges from the ~n/sample_mod sampled keys —
   TeraSort's split rule, zero exchanges (measured 50 s → ~2 s at 4M
   rows / 1M distinct). Edges follow the repo-pinned
   ``quantile_bucket`` rule (equals DuckDB ``quantile_disc``; a key
   EQUAL to an edge stays in the LOWER range), so the exact-path
   manifest is SQL-oracle-checkable. Feed a column-pruned dataset
   (``read_parquet(columns=[key])``) — Ray 2.49 does not push
   ``select_columns`` into the scan.
2. **Co-location**: ONE hash exchange on ``range_id`` — p partition-
   sized groups, never per-key groups. This is the irreducible
   all-to-all of any global sort; everything else streams.
3. **Per-range finish**: a local vectorized sort of ~n/p rows + one
   Parquet write per range. ``partitions`` must be sized so a range
   fits a worker's heap (the TeraSort reducer contract) — at 100 TB
   that means p in the tens of thousands, which this layout handles
   (the manifest is p rows; file names are zero-padded to sort).

The reference has no sorted-export path (its corpus fits a directory
listing); this is a beyond-reference operator per the driver brief.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def range_edges(
    ds: "rd.Dataset",
    key_col: str,
    partitions: int,
    sample_mod: Optional[int] = None,
) -> List:
    """The ``partitions - 1`` boundary values: exact discrete quantiles
    at ``k/p`` (``quantile_bucket``'s rule — index ``max(0, ceil(q*n)-1)``
    into the sorted multiset, == DuckDB ``quantile_disc``), computed
    over the full key column or, with ``sample_mod``, over the
    deterministic md5 hash-sample of it. Null keys never become edges
    (the value-count front end drops them)."""
    from .quantiles import grouped_quantiles

    if partitions < 2:
        raise ValueError("partitions must be >= 2")
    keys = ds.select_columns([key_col])
    qs = [k / partitions for k in range(1, partitions)]

    if sample_mod is not None and sample_mod > 1:
        # TeraSort's actual split rule: ONE streaming pass emits the
        # deterministic hash-sample (~n/sample_mod keys, 8 B each — the
        # caller sizes sample_mod so this fits the driver), edges are
        # cut on the driver with the same discrete-quantile index rule.
        # Zero exchanges vs the exact path's two; at 4M rows this is
        # ~2 s where the exact distinct-value aggregate is ~50 s.
        def sample(t: pa.Table) -> pa.Table:
            col = t[key_col]
            t = t.filter(pa.compute.is_valid(col))
            col = t[key_col]
            if pa.types.is_integer(col.type):
                # splitmix64 finalizer — vectorized, avalanche-quality
                with np.errstate(over="ignore"):
                    z = col.to_numpy(zero_copy_only=False).astype(np.uint64)
                    z = z + np.uint64(0x9E3779B97F4A7C15)
                    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                    h = z ^ (z >> np.uint64(31))
            else:  # strings: stable digest, never Python hash()
                h = np.fromiter(
                    (int.from_bytes(
                        hashlib.md5(str(x).encode()).digest()[:8], "little")
                     for x in col.to_pylist()),
                    dtype=np.uint64, count=t.num_rows)
            return t.filter(pa.array(h % np.uint64(sample_mod) == 0))

        batches = list(keys.map_batches(sample, batch_format="pyarrow")
                       .iter_batches(batch_size=65536,
                                     batch_format="pyarrow"))
        if not batches:
            raise ValueError("hash sample is empty; lower sample_mod")
        vals = np.sort(pa.concat_tables(batches)[key_col]
                       .to_numpy(zero_copy_only=False))
        idx = np.maximum(
            0, np.ceil(np.array(qs) * len(vals)).astype(np.int64) - 1)
        return sorted(vals[idx].tolist())

    def add_g(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(np.zeros(t.num_rows, np.int8)))

    names = [f"e{k}" for k in range(1, partitions)]
    rows = grouped_quantiles(
        keys.map_batches(add_g, batch_format="pyarrow"),
        "_g", key_col, qs, names).take_all()
    if not rows:
        raise ValueError(
            f"no non-null '{key_col}' values to cut edges from")
    return sorted(rows[0][n] for n in names)


def range_sorted_export(
    ds: "rd.Dataset",
    key_col: str,
    out_dir: str,
    partitions: int = 16,
    sample_mod: Optional[int] = None,
    edges: Optional[List] = None,
) -> "rd.Dataset":
    """Write ``ds`` as range-partitioned, internally-sorted Parquet
    under ``out_dir`` and return the manifest Dataset
    (``range_id, n_rows, key_min, key_max, path``), one row per
    non-empty range. Rows with a null key are dropped (a sort order is
    undefined for them; filter or impute upstream). Ties on the key
    keep block order (stable mergesort), so equal-key payload order is
    deterministic for a deterministic upstream lineage. Pass ``edges``
    (e.g. persisted from a prior export) to pin the range intervals;
    otherwise they are computed via ``range_edges``."""
    os.makedirs(out_dir, exist_ok=True)
    if edges is None:
        edges = range_edges(ds, key_col, partitions, sample_mod)
    edges = np.array(edges)

    def assign(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_valid(t[key_col]))
        k = t[key_col].to_numpy(zero_copy_only=False)
        # quantile_bucket's pinned tie rule: equal-to-edge stays LOWER,
        # so range_id = |{edges < key}| = searchsorted(side='left')
        rid = np.searchsorted(edges, k, side="left").astype(np.int64)
        return t.append_column("_range_id", pa.array(rid, pa.int64()))

    def write_range(g: pa.Table) -> pa.Table:
        rid = int(g["_range_id"][0].as_py())
        body = g.drop_columns(["_range_id"])
        order = np.argsort(body[key_col].to_numpy(zero_copy_only=False),
                           kind="stable")
        body = body.take(pa.array(order))
        path = os.path.join(out_dir, f"part-{rid:05d}.parquet")
        pq.write_table(body, path + ".tmp")
        os.replace(path + ".tmp", path)  # atomic: resume never sees partials
        keys = body[key_col]
        return pa.table({
            "range_id": pa.array([rid], pa.int64()),
            "n_rows": pa.array([body.num_rows], pa.int64()),
            "key_min": pa.array([keys[0].as_py()]),
            "key_max": pa.array([keys[-1].as_py()]),
            "path": pa.array([path], pa.string()),
        })

    tagged = ds.map_batches(assign, batch_format="pyarrow")
    return tagged.groupby("_range_id").map_groups(
        write_range, batch_format="pyarrow")


def read_sorted_range(
    manifest: List[dict],
    key_lo,
    key_hi,
    key_col: Optional[str] = None,
) -> "rd.Dataset":
    """Range scan over an exported layout: open ONLY the files whose
    ``[key_min, key_max]`` intersects ``[key_lo, key_hi]`` (the
    manifest-pruning read that justifies the sorted layout). With
    ``key_col`` given, a final streaming row filter trims the two
    boundary files to exactly ``[key_lo, key_hi]``; without it the
    whole content of every intersecting file is returned (the caller
    owns the trim)."""
    paths = [r["path"] for r in manifest
             if r["key_max"] >= key_lo and r["key_min"] <= key_hi]
    if not paths:
        return rd.from_arrow(pa.table({}))
    ds = rd.read_parquet(paths)
    if key_col is None:
        return ds

    def trim(t: pa.Table) -> pa.Table:
        k = t[key_col]
        keep = pa.compute.and_(pa.compute.greater_equal(k, key_lo),
                               pa.compute.less_equal(k, key_hi))
        return t.filter(keep)

    return ds.map_batches(trim, batch_format="pyarrow")


def merge_sorted_layout(
    base_manifest: List[dict],
    edges,
    increment: "rd.Dataset",
    key_col: str,
    out_dir: str,
) -> "rd.Dataset":
    """LSM-style incremental merge: fold a (small) increment into an
    existing sorted layout, touching ONLY the ranges the increment's
    keys land in. Returns the manifest of the merged layout — updated
    rows carry new files under ``out_dir``; untouched ranges keep their
    ORIGINAL paths (a delta layout: the 100 TB base is never rewritten,
    let alone re-sorted).

    Assignment uses the BASE edges (the export's pinned
    ``searchsorted(side='left')`` rule), so the merged layout has the
    same range intervals as the base and stays a valid sorted layout:
    per-file sortedness and cross-range ordering both survive (proved
    in tests). Ties between base and increment rows keep base-first
    order (stable sort over [base; increment]).

    Scale shape: ONE exchange over the INCREMENT only (range_id
    groupby); each touched range does a local
    read-base-file + concat + stable-sort + atomic write. Daily
    operating cost tracks the increment and the number of ranges it
    touches — the ``incremental_refresh`` contract applied to storage
    layout.
    """
    os.makedirs(out_dir, exist_ok=True)
    edges = np.array(edges)
    by_id = {int(r["range_id"]): r for r in base_manifest}

    def assign(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_valid(t[key_col]))
        k = t[key_col].to_numpy(zero_copy_only=False)
        rid = np.searchsorted(edges, k, side="left").astype(np.int64)
        return t.append_column("_range_id", pa.array(rid, pa.int64()))

    def merge_range(g: pa.Table) -> pa.Table:
        rid = int(g["_range_id"][0].as_py())
        inc = g.drop_columns(["_range_id"])
        base_row = by_id.get(rid)
        if base_row is not None:
            base = pq.read_table(base_row["path"])
            if set(base.schema.names) != set(inc.schema.names):
                # refuse rather than silently drop base columns the
                # increment lacks (or invent nulls the layout never had)
                raise ValueError(
                    "increment schema does not match base layout: "
                    f"base={sorted(base.schema.names)} "
                    f"increment={sorted(inc.schema.names)}")
            body = pa.concat_tables([base, inc.select(base.schema.names)])
        else:
            body = inc  # increment opened a previously-empty range
        order = np.argsort(body[key_col].to_numpy(zero_copy_only=False),
                           kind="stable")
        body = body.take(pa.array(order))
        path = os.path.join(out_dir, f"part-{rid:05d}.parquet")
        pq.write_table(body, path + ".tmp")
        os.replace(path + ".tmp", path)
        keys = body[key_col]
        return pa.table({
            "range_id": pa.array([rid], pa.int64()),
            "n_rows": pa.array([body.num_rows], pa.int64()),
            "key_min": pa.array([keys[0].as_py()]),
            "key_max": pa.array([keys[-1].as_py()]),
            "path": pa.array([path], pa.string()),
        })

    touched = increment.map_batches(assign, batch_format="pyarrow").groupby(
        "_range_id").map_groups(merge_range, batch_format="pyarrow")
    touched_rows = touched.take_all()  # O(ranges touched), manifest-sized
    touched_ids = {r["range_id"] for r in touched_rows}
    kept = [r for r in base_manifest if r["range_id"] not in touched_ids]
    merged = sorted(kept + touched_rows, key=lambda r: r["range_id"])
    return rd.from_arrow(pa.Table.from_pylist(merged))


def compact_layout(
    manifest: List[dict],
    out_dir: str,
    target_rows: int,
) -> "rd.Dataset":
    """Small-file compaction: coalesce adjacent ranges into files of
    ~``target_rows`` without re-sorting (adjacent runs are already
    ordered, so compaction is pure concatenation). Output file
    ``out_id = floor(cum_rows_before / target_rows)`` — a window-cumsum
    rule, deterministic from the manifest alone (and therefore
    SQL-mirrorable on top of the export oracle). The planning pass is
    O(ranges) on the driver; each output file is one task reading only
    its input runs."""
    os.makedirs(out_dir, exist_ok=True)
    rows = sorted(manifest, key=lambda r: r["range_id"])
    plan, cum = [], 0
    for r in rows:
        plan.append({"out_id": cum // target_rows, "path": r["path"],
                     "range_id": r["range_id"]})
        cum += r["n_rows"]
    plan_ds = rd.from_arrow(pa.Table.from_pylist(plan))

    def write_out(g: pa.Table) -> pa.Table:
        oid = int(g["out_id"][0].as_py())
        paths = sorted(zip(g["range_id"].to_pylist(), g["path"].to_pylist()))
        body = pa.concat_tables([pq.read_table(p) for _, p in paths])
        path = os.path.join(out_dir, f"compact-{oid:05d}.parquet")
        pq.write_table(body, path + ".tmp")
        os.replace(path + ".tmp", path)
        return pa.table({
            "out_id": pa.array([oid], pa.int64()),
            "n_rows": pa.array([body.num_rows], pa.int64()),
            "n_inputs": pa.array([len(paths)], pa.int64()),
            "path": pa.array([path], pa.string()),
        })

    return plan_ds.groupby("out_id").map_groups(
        write_out, batch_format="pyarrow")


def layout_merge_join(
    manifest_a: List[dict],
    manifest_b: List[dict],
    key_a: str,
    key_b: Optional[str] = None,
    how: str = "inner",
) -> "rd.Dataset":
    """Co-partitioned join over two sorted layouts that share EDGES —
    the bucketed merge join: because both exports assigned rows with
    the same boundary rule, all rows of one key value sit in the same
    ``range_id`` on both sides, so the join decomposes into
    per-range-id local joins with ZERO exchange. Each task reads two
    files and joins them; at 100 TB this replaces the all-to-all hash
    join with embarrassingly-parallel file pairs (the warehouse
    bucketed-join contract; ``ops/joins.py`` remains the path for
    un-layouted inputs).

    CONTRACT: both layouts must have been exported with the SAME
    ``edges`` list (pass ``edges=`` to ``range_sorted_export``);
    nothing in the manifests can verify that, so the caller owns it.
    ``how`` supports 'inner' and 'left outer' (pyarrow join semantics);
    for 'left outer', b-side ranges missing entirely still emit the
    a-side rows with nulls.
    """
    if how not in ("inner", "left outer"):
        raise ValueError("how must be 'inner' or 'left outer'")
    key_b = key_b or key_a
    a_by = {int(r["range_id"]): r["path"] for r in manifest_a}
    b_by = {int(r["range_id"]): r["path"] for r in manifest_b}
    ids = sorted(a_by) if how == "left outer" else sorted(
        set(a_by) & set(b_by))
    pairs = pa.Table.from_pylist([
        {"range_id": i, "path_a": a_by[i], "path_b": b_by.get(i, "")}
        for i in ids
    ])
    if pairs.num_rows == 0:
        return rd.from_arrow(pa.table({}))
    # one b-side schema so a-only ranges can emit null-padded rows
    b_schema = pq.read_schema(next(iter(b_by.values()))) if b_by else None

    def join_range(t: pa.Table) -> pa.Table:
        outs = []
        for pa_path, pb_path in zip(t["path_a"].to_pylist(),
                                    t["path_b"].to_pylist()):
            ta = pq.read_table(pa_path)
            if pb_path:
                tb = pq.read_table(pb_path)
            elif b_schema is not None:
                tb = b_schema.empty_table()  # left outer, b-range absent
            else:
                outs.append(ta)
                continue
            outs.append(ta.join(tb, keys=key_a, right_keys=key_b,
                                join_type=how))
        return pa.concat_tables(outs, promote_options="default")

    # from_arrow yields ONE block; without the repartition every range
    # pair would run serially inside a single task (batch_size only
    # splits within a block's task, it does not add parallelism)
    return rd.from_arrow(pairs).repartition(pairs.num_rows).map_batches(
        join_range, batch_size=1, batch_format="pyarrow")
