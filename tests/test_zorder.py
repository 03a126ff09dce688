"""ops/zorder.py — Morton layout (SQL bit-equivalence is the oracle
gate's `zorder_scan_check` row; here: scan ≡ brute force, the interval
containment that justifies pruning, actual file pruning, guards)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pappermate_ray.ops.zorder import (add_zkey, morton_key, zbox_files,
                                       zbox_interval, zorder_box_scan,
                                       zorder_export)


def test_morton_interval_containment():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 20, 5000)
    y = rng.integers(0, 1 << 20, 5000)
    z = morton_key(x, y)
    x0, x1, y0, y1 = 1000, 200_000, 5000, 900_000
    lo, hi = zbox_interval((x0, x1), (y0, y1))
    inside = (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)
    assert inside.any()
    assert (z[inside] >= lo).all() and (z[inside] <= hi).all()
    # distinct points -> distinct keys (bijective interleave)
    assert len(np.unique(z)) == len(np.unique(x * (1 << 32) + y))


def test_morton_guards():
    with pytest.raises(ValueError):
        morton_key(np.array([-1]), np.array([0]))
    with pytest.raises(ValueError):
        morton_key(np.array([0]), np.array([1 << 31]))


def _grid(n=4096):
    i = np.arange(n, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(i),
        "x": pa.array((i * 13) % 64),
        "y": pa.array((i * 29) % 64),
    })


def test_export_scan_equals_bruteforce_and_prunes(ray_session, tmp_path):
    t = _grid()
    manifest = zorder_export(rd.from_arrow(t).repartition(5), "x", "y",
                             str(tmp_path), partitions=16).take_all()
    assert len(manifest) == 16
    box = ((0, 15), (0, 15))  # the low corner: z interval is tight
    got = sorted(r["doc_id"]
                 for r in zorder_box_scan(manifest, *box, "x", "y")
                 .take_all())
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    want = sorted(t["doc_id"].to_numpy()[
        (x <= 15) & (y <= 15)].tolist())
    assert got == want and len(got) > 0
    # the corner box's z interval is [0, z(15,15)] = [0, 255] -> the
    # scan must open a strict minority of the 16 files
    opened = zbox_files(manifest, *box)
    assert 1 <= len(opened) <= 4


def test_null_coords_dropped(ray_session, tmp_path):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "x": pa.array([1, None, 3], pa.int64()),
        "y": pa.array([1, 2, None], pa.int64()),
    })
    keyed = add_zkey(rd.from_arrow(t), "x", "y").take_all()
    assert [r["zkey"] is None for r in keyed] == [False, True, True]
    manifest = zorder_export(rd.from_arrow(t), "x", "y",
                             str(tmp_path / "l2"), partitions=2).take_all()
    assert sum(r["n_rows"] for r in manifest) == 1


def test_incremental_merge_preserves_scan(ray_session, tmp_path):
    # base layout from even ids, increment = odd ids; after the fold a
    # box scan over the merged manifest equals brute force on the union
    from pappermate_ray.ops.zorder import zorder_edges, zorder_merge

    t = _grid(2048)
    even = t.filter(pa.compute.equal(
        pa.compute.bit_wise_and(t["doc_id"], 1), 0))
    odd = t.filter(pa.compute.equal(
        pa.compute.bit_wise_and(t["doc_id"], 1), 1))
    edges = zorder_edges(rd.from_arrow(t), "x", "y", partitions=8)
    base = zorder_export(rd.from_arrow(even), "x", "y",
                         str(tmp_path / "base"), edges=edges).take_all()
    merged = zorder_merge(base, edges, rd.from_arrow(odd), "x", "y",
                          str(tmp_path / "delta")).take_all()
    box = ((8, 39), (16, 55))
    got = sorted(r["doc_id"] for r in
                 zorder_box_scan(merged, *box, "x", "y").take_all())
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    want = sorted(t["doc_id"].to_numpy()[
        (x >= 8) & (x <= 39) & (y >= 16) & (y <= 55)].tolist())
    assert got == want and len(got) > 0
    # untouched base ranges keep their original files
    base_paths = {r["range_id"]: r["path"] for r in base}
    merged_paths = {r["range_id"]: r["path"] for r in merged}
    untouched = [rid for rid in base_paths
                 if merged_paths.get(rid) == base_paths[rid]]
    rewritten = [rid for rid in merged_paths
                 if "delta" in merged_paths[rid]]
    assert rewritten  # the increment touched some ranges
    assert len(untouched) + len(rewritten) >= len(merged_paths)
