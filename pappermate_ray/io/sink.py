"""Resumable partitioned Parquet sink with per-partition lineage.

The engine's replacement for the reference's mutable operation log +
skip_existing (scripts/system_contract_organizer.py:425-442, MANUAL
--skip_existing; SURVEY.md §2.1 S12, §2.7 D5, §4 checkpoint/resume):

- rows are hash-partitioned on a stable key (fnv1a(url) % n_parts),
- each partition directory is written to a temp name and atomically
  renamed — the rename IS the completion marker; a killed run leaves no
  half-visible partition,
- each partition carries a ``_meta.json`` lineage record (partition id,
  row count, content hash over sorted urls, engine version) written under
  the same atomic rename,
- a resumed run lists completed partitions and anti-joins them out of the
  input BEFORE extraction, so finished work is never recomputed.

At cluster scale n_parts should be O(total cores × 4); the per-partition
writer is a ``groupby(part).map_groups`` task so partitions write in
parallel across the cluster.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional, Set

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..functions.quality import fnv1a64

PART_PREFIX = "part="
TMP_PREFIX = ".tmp_part="


def partition_of(url: str, n_parts: int) -> int:
    return fnv1a64(url.encode("utf-8")) % n_parts


def add_partition_column(ds: "rd.Dataset", n_parts: int, key_col: str = "url") -> "rd.Dataset":
    def _add(t: pa.Table) -> pa.Table:
        parts = [partition_of(u, n_parts) for u in t[key_col].to_pylist()]
        return t.append_column("part", pa.array(parts, pa.int32()))

    return ds.map_batches(_add, batch_format="pyarrow")


def completed_parts(out_dir: str) -> Set[int]:
    """Partition ids already durably written (atomic-rename markers)."""
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for name in os.listdir(out_dir):
        if name.startswith(PART_PREFIX) and os.path.isdir(os.path.join(out_dir, name)):
            try:
                done.add(int(name[len(PART_PREFIX):]))
            except ValueError:
                continue
    return done


def _write_partition(group: pa.Table, out_dir: str, key_col: str) -> pa.Table:
    """Write one partition dir atomically; return its lineage row."""
    part = group["part"][0].as_py()
    final = os.path.join(out_dir, f"{PART_PREFIX}{part:05d}")
    tmp = os.path.join(out_dir, f"{TMP_PREFIX}{part:05d}.{os.getpid()}")
    os.makedirs(tmp, exist_ok=True)
    data = group.drop_columns(["part"])
    pq.write_table(data, os.path.join(tmp, "data.parquet"))
    urls = sorted(group[key_col].to_pylist())
    content_hash = hashlib.md5("\n".join(urls).encode("utf-8")).hexdigest()
    meta = {
        "part": part,
        "n_rows": group.num_rows,
        "content_hash": content_hash,
        "engine": "pappermate_ray-0.1.0",
    }
    # per-partition counters (north-rule lineage metrics): error/truncated
    # tallies + byte volume, when the standard columns are present
    names = set(group.column_names)
    if "status" in names:
        statuses = group["status"].to_pylist()
        meta["n_error"] = sum(1 for s in statuses if s == "error")
    if "error" in names:
        errs = group["error"].to_pylist()
        meta["n_truncated"] = sum(1 for e in errs if e and e.startswith("truncated"))
    if "n_chars" in names:
        meta["sum_chars"] = int(sum(x or 0 for x in group["n_chars"].to_pylist()))
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump(meta, f)
    try:
        os.rename(tmp, final)  # atomic completion marker
    except OSError:
        # a retried/duplicate task lost the rename race — the partition is
        # already durably committed by the winner; discard our scratch
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "n_rows": pa.array([group.num_rows], pa.int64()),
            "content_hash": pa.array([content_hash], pa.string()),
        }
    )


def write_resumable(
    ds: "rd.Dataset",
    out_dir: str,
    n_parts: int = 64,
    key_col: str = "url",
    skip_parts: Optional[Set[int]] = None,
) -> pa.Table:
    """Partition ``ds`` on ``key_col`` and write, skipping completed parts.

    Returns the manifest (one lineage row per partition written THIS run).
    The caller is expected to have filtered input with
    ``filter_completed`` before the expensive stages; this function
    additionally drops completed partitions defensively (idempotent).
    """
    os.makedirs(out_dir, exist_ok=True)
    # clear scratch left by a killed previous run (never counted as done)
    for name in os.listdir(out_dir):
        if name.startswith(TMP_PREFIX):
            import shutil

            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    done = completed_parts(out_dir) if skip_parts is None else skip_parts
    parted = add_partition_column(ds, n_parts, key_col)
    if done:
        done_arr = pa.array(sorted(done), pa.int32())
        parted = parted.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["part"], value_set=done_arr))),
            batch_format="pyarrow",
        )
    manifest = parted.groupby("part").map_groups(
        lambda g: _write_partition(g, out_dir, key_col), batch_format="pyarrow"
    )
    batches = list(manifest.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not batches:
        return pa.table(
            {"part": pa.array([], pa.int32()), "n_rows": pa.array([], pa.int64()),
             "content_hash": pa.array([], pa.string())}
        )
    return pa.concat_tables(batches)


def filter_completed(
    pages: "rd.Dataset", out_dir: str, n_parts: int, key_col: str = "url"
) -> "rd.Dataset":
    """Resume anti-join (D5): drop input rows whose partition is done.

    Runs BEFORE extraction so completed documents never re-enter the
    expensive stages. The completed set is tiny (≤ n_parts ints) — a
    broadcast filter, not a shuffle.
    """
    done = completed_parts(out_dir)
    if not done:
        return pages
    done_set = frozenset(done)

    def _drop(t: pa.Table) -> pa.Table:
        mask = [partition_of(u, n_parts) not in done_set for u in t[key_col].to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    return pages.map_batches(_drop, batch_format="pyarrow")


def read_manifest(out_dir: str) -> pa.Table:
    """Lineage across all completed partitions (from _meta.json records)."""
    rows = []
    for part in sorted(completed_parts(out_dir)):
        with open(os.path.join(out_dir, f"{PART_PREFIX}{part:05d}", "_meta.json")) as f:
            rows.append(json.load(f))
    if not rows:
        return pa.table({"part": [], "n_rows": [], "content_hash": [], "engine": []})
    return pa.Table.from_pylist(rows)


def split_dead_letter(docs: "rd.Dataset"):
    """(ok_rows, error_rows) — the dead-letter flow replacing the
    reference's mutable retry queue (ST8, services/file_handler.py:504-561):
    failures become data, written to their own path; a retry is simply a
    rerun over the dead-letter partition after fixing the cause."""
    ok = docs.map_batches(
        lambda t: t.filter(pc.not_equal(t["status"], "error")), batch_format="pyarrow"
    )
    bad = docs.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "error")), batch_format="pyarrow"
    )
    return ok, bad


def read_output(out_dir: str) -> "rd.Dataset":
    """Read all completed partition data back as one Dataset."""
    paths = [
        os.path.join(out_dir, f"{PART_PREFIX}{p:05d}", "data.parquet")
        for p in sorted(completed_parts(out_dir))
    ]
    return rd.read_parquet(paths)
