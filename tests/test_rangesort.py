"""Range-partitioned sorted export (ops/rangesort.py): the file-level
invariants the oracle gate can't see — internal sortedness, cross-file
range ordering, resume via deterministic atomic file names, string
keys, hash-sampled boundaries, and manifest-pruned range scans."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from pappermate_ray.ops.rangesort import (
    range_edges,
    range_sorted_export,
    read_sorted_range,
)


def _table(n=5000, seed=7):
    rng = np.random.RandomState(seed)
    keys = rng.randint(0, 900, size=n)  # heavy duplicates across edges
    return pa.table({
        "k": pa.array(keys, pa.int64()),
        "payload": pa.array(rng.randint(0, 10**9, size=n), pa.int64()),
    })


def _manifest_rows(ds):
    return sorted(ds.take_all(), key=lambda r: r["range_id"])


def _check_layout(rows, key_col="k"):
    """Internal sortedness + cross-file ordering + manifest accuracy."""
    prev_max = None
    for r in rows:
        t = pq.read_table(r["path"])
        k = t[key_col].to_numpy(zero_copy_only=False)
        assert len(k) == r["n_rows"]
        assert (k[:-1] <= k[1:]).all(), "file not internally sorted"
        assert k[0] == r["key_min"] and k[-1] == r["key_max"]
        if prev_max is not None:
            assert r["key_min"] >= prev_max, "ranges overlap"
        prev_max = r["key_max"]


def test_export_is_globally_sorted(ray_session, tmp_path):
    t = _table()
    ds = rd.from_arrow(t).repartition(8)
    rows = _manifest_rows(range_sorted_export(ds, "k", str(tmp_path), 6))
    assert sum(r["n_rows"] for r in rows) == t.num_rows
    _check_layout(rows)
    # concatenating files in range order IS the global sort
    cat = pa.concat_tables([pq.read_table(r["path"]) for r in rows])
    got = cat["k"].to_numpy(zero_copy_only=False)
    assert (got == np.sort(t["k"].to_numpy())).all()


def test_null_keys_dropped(ray_session, tmp_path):
    t = pa.table({"k": pa.array([3, None, 1, None, 2], pa.int64()),
                  "v": pa.array([0, 1, 2, 3, 4], pa.int64())})
    rows = _manifest_rows(range_sorted_export(rd.from_arrow(t),
                                              "k", str(tmp_path), 2))
    assert sum(r["n_rows"] for r in rows) == 3
    _check_layout(rows)


def test_string_keys(ray_session, tmp_path):
    words = [f"w{i:04d}" for i in range(400)] * 3
    t = pa.table({"k": pa.array(words, pa.string()),
                  "v": pa.array(range(len(words)), pa.int64())})
    rows = _manifest_rows(range_sorted_export(rd.from_arrow(t).repartition(4),
                                              "k", str(tmp_path), 4))
    _check_layout(rows)
    assert sum(r["n_rows"] for r in rows) == len(words)


def test_resume_rewrites_only_missing_ranges(ray_session, tmp_path):
    ds = rd.from_arrow(_table()).repartition(4)
    rows1 = _manifest_rows(range_sorted_export(ds, "k", str(tmp_path), 4))
    victim = rows1[2]["path"]
    keep_bytes = {r["path"]: os.path.getsize(r["path"]) for r in rows1}
    os.remove(victim)
    rows2 = _manifest_rows(range_sorted_export(ds, "k", str(tmp_path), 4))
    # deterministic: second run reproduces the identical layout
    assert [r["path"] for r in rows2] == [r["path"] for r in rows1]
    for r in rows2:
        assert os.path.getsize(r["path"]) == keep_bytes[r["path"]]
    _check_layout(rows2)


def test_sampled_edges_still_partition(ray_session, tmp_path):
    ds = rd.from_arrow(_table(n=8000)).repartition(8)
    exact = range_edges(ds, "k", 8)
    sampled = range_edges(ds, "k", 8, sample_mod=4)
    assert len(exact) == len(sampled) == 7
    # sampled edges are real key values and ordered
    assert sampled == sorted(sampled)
    rows = _manifest_rows(
        range_sorted_export(ds, "k", str(tmp_path), 8, sample_mod=4))
    _check_layout(rows)
    assert sum(r["n_rows"] for r in rows) == 8000


def test_range_scan_prunes_files(ray_session, tmp_path):
    t = _table()
    ds = rd.from_arrow(t).repartition(8)
    rows = _manifest_rows(range_sorted_export(ds, "k", str(tmp_path), 6))
    lo, hi = 300, 450
    scan = read_sorted_range(rows, lo, hi)
    opened = {r["path"] for r in rows
              if r["key_max"] >= lo and r["key_min"] <= hi}
    assert 0 < len(opened) < len(rows), "probe should prune some files"
    got = pa.concat_tables(
        scan.iter_batches(batch_size=65536, batch_format="pyarrow"))
    k = got["k"].to_numpy(zero_copy_only=False)
    inside = (k >= lo) & (k <= hi)
    want_n = int(((t["k"].to_numpy() >= lo) & (t["k"].to_numpy() <= hi)).sum())
    assert int(inside.sum()) == want_n, "pruned scan lost in-range rows"


def test_range_scan_trims_boundary_files(ray_session, tmp_path):
    t = _table()
    ds = rd.from_arrow(t).repartition(8)
    rows = _manifest_rows(range_sorted_export(ds, "k", str(tmp_path), 6))
    lo, hi = 300, 450
    got = pa.concat_tables(
        read_sorted_range(rows, lo, hi, key_col="k")
        .iter_batches(batch_size=65536, batch_format="pyarrow"))
    k = np.sort(got["k"].to_numpy(zero_copy_only=False))
    src = t["k"].to_numpy()
    want = np.sort(src[(src >= lo) & (src <= hi)])
    assert (k == want).all(), "trimmed scan != exact BETWEEN"


def test_partitions_validation():
    with pytest.raises(ValueError):
        range_edges(rd.from_arrow(_table(10)), "k", 1)


# ---- LSM merge + compaction (round-4 continuation) ----

from pappermate_ray.ops.rangesort import compact_layout, merge_sorted_layout


def test_lsm_merge_preserves_layout_and_rows(ray_session, tmp_path):
    base_t = _table(n=6000, seed=11)
    base_dir, merge_dir = str(tmp_path / "base"), str(tmp_path / "merged")
    ds = rd.from_arrow(base_t).repartition(8)
    edges = range_edges(ds, "k", 6)
    base_rows = _manifest_rows(
        range_sorted_export(ds, "k", base_dir, edges=edges))

    # increment hits a narrow key band -> only some ranges touched
    inc_t = pa.table({"k": pa.array([300, 301, 305, 310] * 50, pa.int64()),
                      "payload": pa.array(range(200), pa.int64())})
    merged = _manifest_rows(merge_sorted_layout(
        base_rows, edges, rd.from_arrow(inc_t), "k", merge_dir))

    assert sum(r["n_rows"] for r in merged) == base_t.num_rows + inc_t.num_rows
    _check_layout(merged)
    touched = {r["range_id"] for r in merged if r["path"].startswith(merge_dir)}
    untouched = {r["range_id"] for r in merged
                 if not r["path"].startswith(merge_dir)}
    assert touched and untouched, "a narrow increment must not rewrite all"
    # untouched ranges keep their ORIGINAL base files verbatim
    base_by_id = {r["range_id"]: r for r in base_rows}
    for r in merged:
        if r["range_id"] in untouched:
            assert r["path"] == base_by_id[r["range_id"]]["path"]

    # merged concatenation == sorted union
    cat = pa.concat_tables([pq.read_table(r["path"]) for r in merged])
    want = np.sort(np.concatenate([base_t["k"].to_numpy(),
                                   inc_t["k"].to_numpy()]))
    assert (cat["k"].to_numpy(zero_copy_only=False) == want).all()


def test_lsm_merge_ties_keep_base_first(ray_session, tmp_path):
    base_t = pa.table({"k": pa.array([5, 5, 9], pa.int64()),
                       "src": pa.array(["base"] * 3, pa.string())})
    inc_t = pa.table({"k": pa.array([5], pa.int64()),
                      "src": pa.array(["inc"], pa.string())})
    ds = rd.from_arrow(base_t)
    edges = range_edges(ds, "k", 2)
    rows = _manifest_rows(range_sorted_export(
        ds, "k", str(tmp_path / "b"), edges=edges))
    merged = _manifest_rows(merge_sorted_layout(
        rows, edges, rd.from_arrow(inc_t), "k", str(tmp_path / "m")))
    cat = pa.concat_tables([pq.read_table(r["path"]) for r in merged])
    srcs = [s for k, s in zip(cat["k"].to_pylist(), cat["src"].to_pylist())
            if k == 5]
    assert srcs == ["base", "base", "inc"]


def test_lsm_merge_opens_empty_range(ray_session, tmp_path):
    # all base keys equal -> every edge == that key -> only range 0 exists
    base_t = pa.table({"k": pa.array([7] * 40, pa.int64())})
    ds = rd.from_arrow(base_t)
    edges = range_edges(ds, "k", 4)
    rows = _manifest_rows(range_sorted_export(
        ds, "k", str(tmp_path / "b"), edges=edges))
    assert [r["range_id"] for r in rows] == [0]
    inc_t = pa.table({"k": pa.array([100, 200], pa.int64())})
    merged = _manifest_rows(merge_sorted_layout(
        rows, edges, rd.from_arrow(inc_t), "k", str(tmp_path / "m")))
    assert sum(r["n_rows"] for r in merged) == 42
    _check_layout(merged)


def test_lsm_merge_rejects_schema_mismatch(ray_session, tmp_path):
    # an increment missing a base column must raise, not silently drop
    # the column from every touched range
    base_t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                       "meta": pa.array(["a", "b", "c"], pa.string())})
    ds = rd.from_arrow(base_t)
    edges = range_edges(ds, "k", 2)
    rows = _manifest_rows(range_sorted_export(
        ds, "k", str(tmp_path / "b"), edges=edges))
    inc_t = pa.table({"k": pa.array([2], pa.int64())})
    with pytest.raises(Exception) as ei:
        _manifest_rows(merge_sorted_layout(
            rows, edges, rd.from_arrow(inc_t), "k", str(tmp_path / "m")))
    assert "schema" in str(ei.value).lower()


def test_compaction_concatenates_in_order(ray_session, tmp_path):
    t = _table(n=9000, seed=3)
    ds = rd.from_arrow(t).repartition(8)
    rows = _manifest_rows(range_sorted_export(ds, "k",
                                              str(tmp_path / "b"), 9))
    out = sorted(compact_layout(rows, str(tmp_path / "c"), 2500).take_all(),
                 key=lambda r: r["out_id"])
    assert sum(r["n_rows"] for r in out) == t.num_rows
    assert sum(r["n_inputs"] for r in out) == len(rows)
    assert len(out) < len(rows), "compaction must reduce file count"
    cat = pa.concat_tables([pq.read_table(r["path"]) for r in out])
    got = cat["k"].to_numpy(zero_copy_only=False)
    assert (got == np.sort(t["k"].to_numpy())).all(), \
        "compaction must preserve the global sort"


def test_empty_input_raises_cleanly(ray_session):
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    with pytest.raises(ValueError, match="no non-null"):
        range_edges(empty, "k", 4)
    with pytest.raises(ValueError, match="sample is empty"):
        range_edges(empty, "k", 4, sample_mod=2)


# ---- co-partitioned layout merge join ----

from pappermate_ray.ops.rangesort import layout_merge_join


def _two_layouts(tmp_path, n=3000):
    rng = np.random.RandomState(5)
    a = pa.table({"k": pa.array(rng.randint(0, 500, n), pa.int64()),
                  "va": pa.array(rng.randint(0, 10**6, n), pa.int64())})
    # b: unique keys 0..399 -> keys 400..499 of a are unmatched
    b = pa.table({"bk": pa.array(np.arange(400), pa.int64()),
                  "vb": pa.array(np.arange(400) * 7, pa.int64())})
    dsa, dsb = rd.from_arrow(a).repartition(4), rd.from_arrow(b)
    edges = range_edges(dsa, "k", 5)
    ma = _manifest_rows(range_sorted_export(dsa, "k", str(tmp_path / "a"),
                                            edges=edges))
    mb = _manifest_rows(range_sorted_export(dsb, "bk", str(tmp_path / "b"),
                                            edges=edges))
    return a, b, ma, mb


def test_layout_join_inner_equals_pandas(ray_session, tmp_path):
    import pandas as pd

    a, b, ma, mb = _two_layouts(tmp_path)
    got = pa.concat_tables(
        layout_merge_join(ma, mb, "k", "bk")
        .iter_batches(batch_size=65536, batch_format="pyarrow"),
        promote_options="default").to_pandas()
    want = a.to_pandas().merge(b.to_pandas(), left_on="k", right_on="bk")
    want = want[["k", "va", "vb"]]
    key = ["k", "va", "vb"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_layout_join_left_outer_pads_missing_ranges(ray_session, tmp_path):
    a, b, ma, mb = _two_layouts(tmp_path)
    # drop b's top range entirely: left outer must still emit a's rows
    mb_cut = [r for r in mb if r["range_id"] < max(x["range_id"] for x in mb)]
    got = pa.concat_tables(
        layout_merge_join(ma, mb_cut, "k", "bk", how="left outer")
        .iter_batches(batch_size=65536, batch_format="pyarrow"),
        promote_options="default")
    assert got.num_rows == a.num_rows  # b keys unique: no fan-out
    n_null = got["vb"].null_count
    want_null = int((a["k"].to_numpy() >= 400).sum())
    assert n_null >= want_null  # missing range + in-range misses


def test_layout_join_validates_how(ray_session, tmp_path):
    a, b, ma, mb = _two_layouts(tmp_path)
    with pytest.raises(ValueError, match="how"):
        layout_merge_join(ma, mb, "k", "bk", how="full outer")
