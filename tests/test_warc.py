"""WARC/WET source + sink (io/warc.py): record framing, HTTP envelope
stripping, gzip member handling, byte-deterministic writes."""

import gzip
import hashlib
import os
import shutil

import pandas as pd
import pyarrow as pa
import pytest


def _collect(ds):
    tbs = list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    return pa.concat_tables(tbs).to_pandas() if tbs else pd.DataFrame()


def _docs(n=50):
    return [{"url": f"http://ex{i % 3}.com/doc/{i}",
             "payload": (f"body {i} " * (i % 4 + 1)).strip().encode()}
            for i in range(n)]


@pytest.fixture
def warc_dir(tmp_path, ray_session):
    import ray.data as rd

    from pappermate_ray.io.warc import write_warc

    out = str(tmp_path / "warc")
    ds = rd.from_items(_docs()).repartition(4)
    manifest = _collect(write_warc(ds, out))
    assert manifest.n_records.sum() == 50 and len(manifest) == 4
    return out


def test_warc_roundtrip_payload_exact(warc_dir, ray_session):
    from pappermate_ray.io.warc import read_warc

    back = _collect(read_warc(warc_dir, records_per_block=7))
    orig = {d["url"]: d["payload"] for d in _docs()}
    assert len(back) == 50
    assert set(back.http_status) == {200}
    for _, r in back.iterrows():
        assert bytes(r.payload) == orig[r.url]
        assert r.payload_length == len(orig[r.url])


def test_warc_write_is_byte_deterministic(warc_dir, ray_session):
    import ray.data as rd

    from pappermate_ray.io.warc import write_warc

    def digest(d):
        return {os.path.basename(p): hashlib.md5(open(os.path.join(d, p), "rb").read()).hexdigest()
                for p in sorted(os.listdir(d))}

    first = digest(warc_dir)
    ds = rd.from_items(_docs()).repartition(4)
    _collect(write_warc(ds, warc_dir))  # rewrite in place
    assert digest(warc_dir) == first


def test_wet_conversion_records(tmp_path, ray_session):
    import ray.data as rd

    from pappermate_ray.io.warc import read_wet, write_warc

    out = str(tmp_path / "wet")
    ds = rd.from_items([{"url": f"http://w/{i}", "payload": f"wet text {i}"}
                        for i in range(20)])
    _collect(write_warc(ds, out, warc_type="conversion", compress=False))
    wet = _collect(read_wet(out))
    assert sorted(wet.columns) == ["text", "url", "warc_date"]
    assert sorted(wet.text) == sorted(f"wet text {i}" for i in range(20))


def test_warc_type_filter_skips_other_records(tmp_path, ray_session):
    """request records interleaved with responses must be skipped (their
    payload still consumed so framing stays aligned)."""
    from pappermate_ray.io.warc import format_warc_record, read_warc

    out = tmp_path / "mixed"
    out.mkdir()
    blob = b"".join([
        format_warc_record("http://a/1", b"req-bytes", warc_type="request"),
        format_warc_record("http://a/1", b"the body", warc_type="response"),
        format_warc_record("http://a/2", b"meta", warc_type="metadata"),
        format_warc_record("http://a/2", b"second body", warc_type="response"),
    ])
    (out / "f.warc").write_bytes(blob)
    got = _collect(read_warc(str(out)))
    assert sorted(got.url) == ["http://a/1", "http://a/2"]
    assert sorted(bytes(p) for p in got.payload) == [b"second body", b"the body"]


def test_warc_truncated_record_raises(tmp_path, ray_session):
    from pappermate_ray.io.warc import format_warc_record, read_warc

    out = tmp_path / "trunc"
    out.mkdir()
    rec = format_warc_record("http://a/1", b"x" * 100)
    (out / "f.warc").write_bytes(rec[:-60])
    with pytest.raises(Exception):
        _collect(read_warc(str(out)))


def test_warc_multimember_gzip_and_non_http_payload(tmp_path, ray_session):
    """Common-Crawl convention: each record its own gzip member. A
    response whose payload lacks an HTTP envelope passes through with
    null status."""
    from pappermate_ray.io.warc import format_warc_record, read_warc

    out = tmp_path / "mm"
    out.mkdir()
    r1 = format_warc_record("http://m/1", b"enveloped")
    raw = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "WARC-Target-URI: http://m/2\r\n"
           "WARC-Date: 2024-01-01T00:00:00Z\r\n"
           "Content-Length: 7\r\n\r\nno-http\r\n\r\n").encode()
    (out / "f.warc.gz").write_bytes(
        gzip.compress(r1, mtime=0) + gzip.compress(raw, mtime=0))
    got = _collect(read_warc(str(out))).sort_values("url").reset_index(drop=True)
    assert bytes(got.payload[0]) == b"enveloped" and got.http_status[0] == 200
    assert bytes(got.payload[1]) == b"no-http" and pd.isna(got.http_status[1])
