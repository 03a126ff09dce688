"""SURT keys (stages/urls.surt_key_batch) and the CDX sorted layout
(stages/cdx.py): contract pins for the key transform, manifest-pruned
prefix lookup equivalence, and global sortedness of the export."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _surt(urls):
    from pappermate_ray.stages.urls import surt_key_batch

    t = pa.table({"url": pa.array(urls, pa.string())})
    return surt_key_batch(t)["surt"].to_pylist()


def test_surt_host_reverse_and_www_strip():
    assert _surt(["https://WWW.News.Example.COM/A/b"]) == \
        ["com,example,news)/a/b"]
    # only ONE leading www label strips
    assert _surt(["http://www.www.example.com/"]) == \
        ["com,example,www)/"]


def test_surt_ports_paths_params_fragment():
    got = _surt([
        "https://example.com:443/x",        # default port drops
        "http://example.com:8080",          # non-default kept, empty path
        "https://a.co/p?y=2&x=1&utm_source=f#frag",  # sort+clean, no frag
        "not a url",
    ])
    assert got == [
        "com,example)/x",
        "com,example:8080)/",
        "co,a)/p?x=1&y=2",
        None,
    ]


def test_surt_lowercases_whole_key():
    assert _surt(["https://example.com/Dir/Page?Q=Val"]) == \
        ["com,example)/dir/page?q=val"]


def _captures():
    rows = []
    for i in range(60):
        host = ("example.com", "news.example.com", "other.org")[i % 3]
        rows.append({
            "doc_id": i,
            "url": f"https://{host}/p{i % 5}/page{i}",
            "warc_ts": pa.scalar(
                1767225600_000_000 + i * 61_000_000, pa.timestamp("us")),
        })
    return rows


def test_cdx_layout_sorted_and_lookup(ray_session, tmp_path):
    import ray.data as rd

    from pappermate_ray.stages.cdx import (build_cdx_index, cdx_prefix_lookup,
                                           cdx_records)

    rows = _captures()
    ds = rd.from_items(rows)
    out = str(tmp_path / "cdx")
    manifest = build_cdx_index(ds, out, partitions=4).take_all()
    manifest.sort(key=lambda r: r["range_id"])

    # global sort contract: files internally sorted, ranges disjoint
    prev_max = ""
    total = 0
    for m in manifest:
        t = pq.read_table(m["path"])
        keys = t["cdx_key"].to_pylist()
        assert keys == sorted(keys)
        assert keys[0] >= prev_max
        prev_max = keys[-1]
        total += len(keys)
    assert total == len(rows)

    # prefix lookup == brute-force starts_with over all records
    all_keys = cdx_records(rd.from_items(rows)).take_all()
    for prefix in ("com,example)", "com,example,news)", "org,other)/p3",
                   "com,"):
        want = sorted((r["cdx_key"], r["doc_id"]) for r in all_keys
                      if r["cdx_key"].startswith(prefix))
        got = cdx_prefix_lookup(manifest, prefix).take_all()
        assert sorted((r["cdx_key"], r["doc_id"]) for r in got) == want

    # manifest pruning: a single-site prefix must not open every file
    touched = [m for m in manifest
               if m["key_max"] >= "org,other)" and
               m["key_min"] <= "org,other)" + "\x7f"]
    assert len(touched) < len(manifest)


def test_cdx_null_url_rows_drop(ray_session, tmp_path):
    import ray.data as rd

    from pappermate_ray.stages.cdx import build_cdx_index

    rows = _captures()[:6]
    rows.append({"doc_id": 99, "url": "garbage",
                 "warc_ts": pa.scalar(1767225600_000_000,
                                      pa.timestamp("us"))})
    out = str(tmp_path / "cdx2")
    manifest = build_cdx_index(rd.from_items(rows), out,
                               partitions=2).take_all()
    assert sum(m["n_rows"] for m in manifest) == 6
