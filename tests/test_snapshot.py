"""Crawl snapshot diff (ops/snapshot.py) — hand-built snapshots,
unchanged suppression, duplicate-url guard, partitioning invariance."""

import pytest


def _diff(old_rows, new_rows, blocks=2, **kw):
    import ray.data as rd

    from pappermate_ray.ops.snapshot import snapshot_diff

    old = rd.from_items(old_rows, override_num_blocks=blocks)
    new = rd.from_items(new_rows, override_num_blocks=blocks)
    return {r["url"]: (r["status"], r["old_digest"], r["new_digest"])
            for r in snapshot_diff(old, new).take_all()}


def test_added_removed_changed_unchanged(ray_session):
    out = _diff(
        [{"url": "a", "digest": "d1"}, {"url": "b", "digest": "d2"},
         {"url": "c", "digest": "d3"}],
        [{"url": "b", "digest": "d2"}, {"url": "c", "digest": "d3x"},
         {"url": "d", "digest": "d4"}],
    )
    # b unchanged -> suppressed
    assert out == {
        "a": ("removed", "d1", ""),
        "c": ("changed", "d3", "d3x"),
        "d": ("added", "", "d4"),
    }


def test_duplicate_url_within_side_raises(ray_session):
    with pytest.raises(Exception):
        _diff(
            [{"url": "a", "digest": "d1"}, {"url": "a", "digest": "d2"}],
            [{"url": "a", "digest": "d3"}],
            blocks=1,
        )


def test_partitioning_invariance(ray_session):
    old = [{"url": f"u{i}", "digest": f"h{i}"} for i in range(50)]
    new = ([{"url": f"u{i}", "digest": f"h{i}x" if i % 3 == 0 else f"h{i}"}
            for i in range(5, 50)]
           + [{"url": f"v{i}", "digest": f"g{i}"} for i in range(4)])
    a = _diff(old, new, blocks=1)
    b = _diff(old, new, blocks=8)
    assert a == b
    assert sum(1 for s, _, _ in a.values() if s == "removed") == 5
    assert sum(1 for s, _, _ in a.values() if s == "added") == 4
    assert all(s in ("added", "removed", "changed") for s, _, _ in a.values())
