"""WebDataset tar-shard sink/source (io/webdataset.py): byte-exact
unicode + binary roundtrip, deterministic shard bytes regardless of
upstream partitioning, and shard-grain resume (existing shards are
not rewritten)."""

import hashlib
import os

import pyarrow as pa
import ray.data as rd

from pappermate_ray.io.webdataset import read_webdataset, write_webdataset

ROWS = [
    ("k000", "plain ascii", b"\x00\x01\xffbin"),
    ("k001", "中文 φράση é\nline2\ttab", b""),
    ("k002", "", b"payload \x89PNG-ish"),
    ("k003", 'quotes " and \\slashes\\', b"\n\r\n"),
]


def _ds(blocks=1):
    t = pa.table({
        "key": pa.array([r[0] for r in ROWS], pa.string()),
        "text": pa.array([r[1] for r in ROWS], pa.string()),
        "blob": pa.array([r[2] for r in ROWS], pa.binary()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _write(ds, out):
    m = write_webdataset(ds, str(out), "key", text_cols=("text",),
                         binary_cols=("blob",), num_shards=3)
    return {r["shard"]: r["md5"] for r in m.take_all()}


def test_roundtrip_unicode_and_binary(ray_session, tmp_path):
    _write(_ds(), tmp_path / "w")
    shards = sorted(str(p) for p in (tmp_path / "w").iterdir()
                    if p.suffix == ".tar")
    got = {r["key"]: (r["text"], r["blob"]) for r in
           read_webdataset(shards, "key", text_cols=("text",),
                           binary_cols=("blob",)).take_all()}
    assert got == {k: (t, b) for k, t, b in ROWS}


def test_shard_bytes_deterministic_across_partitionings(ray_session,
                                                        tmp_path):
    m1 = _write(_ds(blocks=1), tmp_path / "a")
    m3 = _write(_ds(blocks=3), tmp_path / "b")
    assert m1 == m3   # same shard membership AND identical bytes


def test_resume_skips_existing_shards(ray_session, tmp_path):
    out = tmp_path / "r"
    m1 = _write(_ds(), out)
    shard_files = sorted(p for p in out.iterdir() if p.suffix == ".tar")
    mtimes = {p.name: os.stat(p).st_mtime_ns for p in shard_files}
    m2 = _write(_ds(), out)   # re-run: must not rewrite
    assert m1 == m2
    assert {p.name: os.stat(p).st_mtime_ns for p in shard_files} == mtimes


class TestJsonlGz:
    def _ds(self, blocks=1):
        t = pa.table({
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "text": pa.array(["中文 φ\nnl", 'q"uote', "", "\\slash",
                              "tab\there", "plain", "é́ combining", "end"],
                             pa.string()),
        })
        ds = rd.from_arrow(t)
        return ds.repartition(blocks) if blocks > 1 else ds

    def _write(self, ds, out):
        from pappermate_ray.io.export import write_jsonl_gz
        m = write_jsonl_gz(ds, str(out), "doc_id", num_shards=3)
        return {r["shard"]: r["md5"] for r in m.take_all()}

    def test_roundtrip_and_determinism(self, ray_session, tmp_path):
        from pappermate_ray.io.export import read_jsonl
        m1 = self._write(self._ds(1), tmp_path / "a")
        m2 = self._write(self._ds(4), tmp_path / "b")
        assert m1 == m2   # byte-identical across partitionings
        files = sorted(str(p) for p in (tmp_path / "a").iterdir()
                       if p.name.endswith(".jsonl.gz"))
        got = {r["doc_id"]: r["text"] for r in read_jsonl(files).take_all()}
        want = {r["doc_id"]: r["text"]
                for r in self._ds(1).take_all()}
        assert got == want

    def test_resume_skips_existing(self, ray_session, tmp_path):
        out = tmp_path / "r"
        m1 = self._write(self._ds(), out)
        files = sorted(p for p in out.iterdir()
                       if p.name.endswith(".jsonl.gz"))
        mt = {p.name: os.stat(p).st_mtime_ns for p in files}
        assert self._write(self._ds(), out) == m1
        assert {p.name: os.stat(p).st_mtime_ns for p in files} == mt


def test_skip_manifest_reflects_existing_file(ray_session, tmp_path):
    """Resume with a CHANGED upstream: the skipped shard's manifest row
    must describe the file on disk (old n + old md5), never pair the
    new group's count with the old bytes."""
    out = tmp_path / "s"
    m1 = {r["shard"]: (r["n_samples"], r["md5"]) for r in
          write_webdataset(_ds(), str(out), "key", text_cols=("text",),
                           binary_cols=("blob",), num_shards=1).take_all()}
    t2 = pa.table({  # grown corpus, same out_dir
        "key": pa.array([r[0] for r in ROWS] + ["k999"], pa.string()),
        "text": pa.array([r[1] for r in ROWS] + ["extra"], pa.string()),
        "blob": pa.array([r[2] for r in ROWS] + [b"x"], pa.binary()),
    })
    m2 = {r["shard"]: (r["n_samples"], r["md5"]) for r in
          write_webdataset(rd.from_arrow(t2), str(out), "key",
                           text_cols=("text",), binary_cols=("blob",),
                           num_shards=1).take_all()}
    assert m2 == m1   # file untouched; manifest describes the FILE
