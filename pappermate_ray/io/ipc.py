"""Arrow IPC (Feather v2) and ORC shard sinks/sources — columnar
interchange formats beyond the reference's CSV/JSONL exporters
(scripts/openai_contract_explorer.py:411-496): IPC is the zero-copy
hand-off format for Arrow-native consumers (zstd-compressed record
batches, mmap-able), ORC the columnar format Hive/Trino warehouses
ingest.

Both ride ``io/webdataset.content_keyed_shard_sink``, so they inherit
the full determinism/resume contract: shard membership is content-keyed
(``md5(key) mod S`` — stable under repartitioning and retries), rows
are key-sorted, encoders are byte-deterministic (verified in
tests/test_ipc_orc.py across partitionings), shards land via atomic
rename, and re-runs skip existing shards with the manifest derived from
the on-disk bytes. Sources stream one task per shard through
``read_binary_files`` — no random access, no member index.
"""

from __future__ import annotations

import io as _io
from typing import List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.ipc as _ipc
import pyarrow.orc as _orc
import ray.data as rd

from .webdataset import content_keyed_shard_sink


def _group_schema(ds: "rd.Dataset") -> pa.Schema:
    sch = ds.schema()  # Ray Schema wrapper: parallel names/types lists
    return pa.schema(zip(sch.names, sch.types))


def _group_table(g: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    # pin the arrow schema explicitly: pandas round-tripping must not
    # drift dtypes (int64 -> float64 on NaN, object -> inferred) between
    # runs, or shard bytes stop being deterministic
    return pa.Table.from_pandas(g, schema=schema, preserve_index=False)


def write_ipc_shards(
    ds: "rd.Dataset",
    out_dir: str,
    key_col: str,
    num_shards: int = 8,
    compression: Optional[str] = "zstd",
) -> "rd.Dataset":
    """Write Arrow IPC file-format shards (``shard-NNNNN.arrow``);
    returns the (lazy) manifest ``(shard, path, n_rows, md5)`` —
    consuming it performs the write. Record batches are zstd-compressed
    by default (pyarrow's IPC body compression; byte-deterministic)."""
    schema = _group_schema(ds)

    def encode(g: pd.DataFrame) -> bytes:
        # IpcWriteOptions is not picklable — build it worker-side
        opts = _ipc.IpcWriteOptions(compression=compression)
        sink = pa.BufferOutputStream()
        with _ipc.new_file(sink, schema, options=opts) as w:
            w.write_table(_group_table(g, schema))
        return sink.getvalue().to_pybytes()

    def count_existing(path: str) -> int:
        with open(path, "rb") as f:
            return _ipc.open_file(f).read_all().num_rows

    return content_keyed_shard_sink(
        ds, out_dir, key_col, num_shards,
        filename=lambda sid: f"shard-{sid:05d}.arrow",
        encode=encode, count_existing=count_existing,
        count_name="n_rows")


def read_ipc(paths: List[str]) -> "rd.Dataset":
    """Stream IPC shards back: one task per shard, each file read as a
    whole table (shards are write-sized, not corpus-sized)."""
    files = rd.read_binary_files(paths)

    def decode(t: pa.Table) -> pa.Table:
        tabs = [_ipc.open_file(pa.BufferReader(b)).read_all()
                for b in t["bytes"].to_pylist()]
        return pa.concat_tables(tabs)

    return files.map_batches(decode, batch_format="pyarrow")


def write_orc_shards(
    ds: "rd.Dataset",
    out_dir: str,
    key_col: str,
    num_shards: int = 8,
) -> "rd.Dataset":
    """Write ORC shards (``shard-NNNNN.orc``); same manifest/resume
    contract as ``write_ipc_shards``."""
    schema = _group_schema(ds)

    def encode(g: pd.DataFrame) -> bytes:
        buf = _io.BytesIO()
        _orc.write_table(_group_table(g, schema), buf)
        return buf.getvalue()

    def count_existing(path: str) -> int:
        with open(path, "rb") as f:
            return _orc.ORCFile(f).nrows

    return content_keyed_shard_sink(
        ds, out_dir, key_col, num_shards,
        filename=lambda sid: f"shard-{sid:05d}.orc",
        encode=encode, count_existing=count_existing,
        count_name="n_rows")


def read_orc(paths: List[str]) -> "rd.Dataset":
    """Stream ORC shards back: one task per shard."""
    files = rd.read_binary_files(paths)

    def decode(t: pa.Table) -> pa.Table:
        tabs = [_orc.ORCFile(_io.BytesIO(b)).read()
                for b in t["bytes"].to_pylist()]
        return pa.concat_tables(tabs)

    return files.map_batches(decode, batch_format="pyarrow")
