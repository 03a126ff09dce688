"""WebDataset-style tar-shard sink and source — the sequential-read
training-shard format (one POSIX tar per shard; each sample is a group
of ``{key}.{column}.{txt|bin}`` members, read back by streaming the
tar, never by random access).

Scale/determinism shape:

- **Shard assignment is content-keyed** (``md5(key) mod num_shards``),
  not block-keyed — the same corpus produces the same shard membership
  regardless of upstream partitioning, retries or block order. One
  hash exchange groups each shard's samples; the group task writes its
  tar in one pass with samples sorted by key and all tar metadata
  pinned (mtime 0, uid/gid 0, USTAR format), so shard BYTES are
  deterministic and a re-run is md5-identical.
- **Resumable**: each shard lands via write-to-tmp + atomic rename and
  a re-run skips shards already on disk (their manifest row is
  recomputed from the existing bytes) — the io/sink.py lineage story
  at the shard grain.
- **The source streams**: ``read_webdataset`` maps shard files through
  ``tarfile`` sequentially (one task per shard), emitting one row per
  sample — no member index is materialized.
"""

from __future__ import annotations

import hashlib
import io as _io
import os
import tarfile
from typing import List, Sequence

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _shard_of(key: str, num_shards: int) -> int:
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8],
                          "little") % num_shards


def content_keyed_shard_sink(
    ds: "rd.Dataset",
    out_dir: str,
    key_col: str,
    num_shards: int,
    filename,
    encode,
    count_existing,
    count_name: str = "n_samples",
) -> "rd.Dataset":
    """Shared scaffolding for deterministic, resumable shard sinks
    (WebDataset tars, gzip JSONL): content-keyed membership
    (``md5(key) mod S`` — stable under repartitioning/retries), rows
    key-sorted into ``encode(group) -> bytes``, atomic tmp+rename
    landing, skip-if-exists resume. The manifest row for a skipped
    shard is derived ENTIRELY from the existing file
    (``count_existing(path)`` + its md5), never from the current run's
    group — so a stale shard can't produce an internally inconsistent
    manifest. Resume means "finish THIS corpus's interrupted write";
    pointing a CHANGED corpus at an existing out_dir serves the
    existing bytes — use a fresh directory per corpus version.
    """
    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        sh = pa.array([_shard_of(str(k), num_shards)
                       for k in t[key_col].to_pylist()], pa.int64())
        return t.append_column("_shard", sh)

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        sid = int(g["_shard"].iloc[0])
        path = os.path.join(out_dir, filename(sid))
        if not os.path.exists(path):
            g = g.sort_values(key_col, kind="mergesort")
            data = encode(g.drop(columns=["_shard"]))
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
            n = int(len(g))
        else:
            n = int(count_existing(path))
        with open(path, "rb") as f:
            data = f.read()
        return pd.DataFrame([{
            "shard": sid,
            "path": path,
            count_name: n,
            "md5": hashlib.md5(data).hexdigest(),
        }])

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(write_shard, batch_format="pandas"))


def write_webdataset(
    ds: "rd.Dataset",
    out_dir: str,
    key_col: str,
    text_cols: Sequence[str] = (),
    binary_cols: Sequence[str] = (),
    num_shards: int = 8,
) -> "rd.Dataset":
    """Write tar shards under ``out_dir``; returns the (lazy) manifest
    Dataset ``(shard, path, n_samples, md5)`` — consuming it performs
    the write. Keys must be unique strings (use a zero-padded id)."""
    cols = [key_col, *text_cols, *binary_cols]
    members_per_sample = len(text_cols) + len(binary_cols)

    def encode(g: pd.DataFrame) -> bytes:
        buf = _io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tf:
            for _, row in g.iterrows():
                key = str(row[key_col])
                for c in text_cols:
                    _add(tf, f"{key}.{c}.txt",
                         (row[c] or "").encode("utf-8"))
                for c in binary_cols:
                    _add(tf, f"{key}.{c}.bin", bytes(row[c] or b""))
        return buf.getvalue()

    def count_existing(path: str) -> int:
        with tarfile.open(path) as tf:
            return sum(1 for _ in tf) // max(1, members_per_sample)

    return content_keyed_shard_sink(
        ds.map_batches(lambda t: t.select(cols), batch_format="pyarrow"),
        out_dir, key_col, num_shards,
        filename=lambda sid: f"shard-{sid:05d}.tar",
        encode=encode, count_existing=count_existing)


def _add(tf: "tarfile.TarFile", name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tf.addfile(info, _io.BytesIO(payload))


def read_webdataset(
    paths: List[str],
    key_col: str,
    text_cols: Sequence[str] = (),
    binary_cols: Sequence[str] = (),
) -> "rd.Dataset":
    """Stream tar shards back into a Dataset — one row per sample, one
    task per shard, members consumed sequentially in tar order."""
    files = rd.read_binary_files(paths)

    def decode(t: pa.Table) -> pa.Table:
        rows: dict = {}
        for blob in t["bytes"].to_pylist():
            with tarfile.open(fileobj=_io.BytesIO(blob)) as tf:
                for m in tf:
                    base, col, ext = m.name.rsplit(".", 2)
                    payload = tf.extractfile(m).read()
                    rows.setdefault(base, {})[col] = (
                        payload.decode("utf-8") if ext == "txt" else payload)
        keys = sorted(rows)
        out = {key_col: pa.array(keys, pa.string())}
        for c in text_cols:
            out[c] = pa.array([rows[k].get(c, "") for k in keys],
                              pa.string())
        for c in binary_cols:
            out[c] = pa.array([rows[k].get(c, b"") for k in keys],
                              pa.binary())
        return pa.table(out)

    return files.map_batches(decode, batch_format="pyarrow")
