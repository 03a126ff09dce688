"""Arrow IPC / ORC shard sinks+sources (io/ipc.py): byte-exact
unicode + binary roundtrip, deterministic shard bytes regardless of
upstream partitioning, shard-grain resume, and schema-pinned pandas
conversion (no dtype drift between runs)."""

import os

import pyarrow as pa
import ray.data as rd

from pappermate_ray.io.ipc import (
    read_ipc, read_orc, write_ipc_shards, write_orc_shards)

ROWS = [
    (0, "plain ascii", b"\x00\x01\xffbin", 1.5),
    (1, "中文 φράση é\nline2\ttab", b"", -0.25),
    (2, "", b"payload \x89PNG-ish", 0.0),
    (3, 'quotes " and \\slashes\\', b"\n\r\n", 7e-3),
]


def _ds(blocks=1):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "text": pa.array([r[1] for r in ROWS], pa.string()),
        "blob": pa.array([r[2] for r in ROWS], pa.binary()),
        "score": pa.array([r[3] for r in ROWS], pa.float64()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


WRITERS = {
    "ipc": (write_ipc_shards, read_ipc, ".arrow"),
    "orc": (write_orc_shards, read_orc, ".orc"),
}


def _write(fmt, ds, out):
    write, _, _ = WRITERS[fmt]
    m = write(ds, str(out), "doc_id", num_shards=3)
    return {r["shard"]: (r["n_rows"], r["md5"]) for r in m.take_all()}


def _roundtrip(fmt, ray_session, tmp_path):
    write, read, ext = WRITERS[fmt]
    _write(fmt, _ds(), tmp_path / "w")
    shards = sorted(str(p) for p in (tmp_path / "w").iterdir()
                    if p.suffix == ext)
    got = {r["doc_id"]: (r["text"], r["blob"], r["score"])
           for r in read(shards).take_all()}
    assert got == {i: (t, b, s) for i, t, b, s in ROWS}


def test_ipc_roundtrip(ray_session, tmp_path):
    _roundtrip("ipc", ray_session, tmp_path)


def test_orc_roundtrip(ray_session, tmp_path):
    _roundtrip("orc", ray_session, tmp_path)


def test_ipc_deterministic_across_partitionings(ray_session, tmp_path):
    assert (_write("ipc", _ds(1), tmp_path / "a")
            == _write("ipc", _ds(3), tmp_path / "b"))


def test_orc_deterministic_across_partitionings(ray_session, tmp_path):
    assert (_write("orc", _ds(1), tmp_path / "a")
            == _write("orc", _ds(3), tmp_path / "b"))


def test_ipc_uncompressed_variant(ray_session, tmp_path):
    m = write_ipc_shards(_ds(), str(tmp_path / "u"), "doc_id",
                         num_shards=2, compression=None)
    assert sum(r["n_rows"] for r in m.take_all()) == len(ROWS)
    shards = sorted(str(p) for p in (tmp_path / "u").iterdir()
                    if p.suffix == ".arrow")
    assert read_ipc(shards).count() == len(ROWS)


def test_resume_skips_existing_shards(ray_session, tmp_path):
    for fmt, ext in (("ipc", ".arrow"), ("orc", ".orc")):
        out = tmp_path / f"r_{fmt}"
        m1 = _write(fmt, _ds(), out)
        files = sorted(p for p in out.iterdir() if p.suffix == ext)
        mtimes = {p.name: os.stat(p).st_mtime_ns for p in files}
        assert _write(fmt, _ds(), out) == m1
        assert {p.name: os.stat(p).st_mtime_ns
                for p in files} == mtimes
