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


# ---- recrawl_priority (K-snapshot change-rate scheduling) ----

from pappermate_ray.ops.snapshot import recrawl_priority


def _prio(rows, blocks=2, **kw):
    import ray.data as rd

    ds = rd.from_items(rows, override_num_blocks=blocks)
    return {r["url"]: (r["n_obs"], r["n_changes"], r["priority"])
            for r in recrawl_priority(ds, **kw).take_all()}


def test_recrawl_priority_buckets_and_gaps(ray_session):
    rows = []
    # 'hot': observed 5x, changes every step (4/4)
    rows += [{"url": "hot", "snap": s, "digest": f"d{s}"} for s in range(5)]
    # 'cold': observed 5x, never changes
    rows += [{"url": "cold", "snap": s, "digest": "same"} for s in range(5)]
    # 'warm': 5 obs, exactly 1 change (1/4 = 0.25 >= 0.2)
    rows += [{"url": "warm", "snap": s, "digest": "a" if s < 3 else "b"}
             for s in range(5)]
    # 'new': seen once
    rows += [{"url": "new", "snap": 3, "digest": "x"}]
    # gap semantics: observed at snaps 0 and 4 only; digests differ
    # across the gap -> 1 change over 1 consecutive-observed pair = hot
    rows += [{"url": "gap", "snap": 0, "digest": "p"},
             {"url": "gap", "snap": 4, "digest": "q"}]
    got = _prio(rows)
    assert got["hot"] == (5, 4, "hot")
    assert got["cold"] == (5, 0, "cold")
    assert got["warm"] == (5, 1, "warm")
    assert got["new"] == (1, 0, "new")
    assert got["gap"] == (2, 1, "hot")


def test_recrawl_priority_partitioning_invariance(ray_session):
    rows = [{"url": f"u{i % 17}", "snap": s,
             "digest": f"d{(i % 17) * 31 + s * ((i % 3) == 0)}"}
            for i in range(17) for s in range(4)]
    assert _prio(rows, blocks=1) == _prio(rows, blocks=8)


def test_recrawl_priority_duplicate_observation_raises(ray_session):
    rows = [{"url": "u", "snap": 1, "digest": "a"},
            {"url": "u", "snap": 1, "digest": "b"}]
    with pytest.raises(Exception) as ei:
        _prio(rows, blocks=1)
    assert "observed twice" in str(ei.value)


# ------------------------------------------------------- content change rate

def _ccr(rows):
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.ops.snapshot import content_change_rate

    ds = rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "snap": pa.array([r[1] for r in rows], pa.int64()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(3)
    out = content_change_rate(ds).take_all()
    return {(r["url"], r["snap_prev"]): (r["snap_next"], r["nw_prev"],
                                         r["nw_next"], r["n_inter"],
                                         r["change"]) for r in out}


def _ccr_brute(rows):
    import numpy as np
    by_url = {}
    for u, s, txt in rows:
        by_url.setdefault(u, []).append((s, set(txt.split())))
    out = {}
    for u, obs in by_url.items():
        obs.sort()
        for (sp, wp), (sn, wn) in zip(obs, obs[1:]):
            i = len(wp & wn)
            un = len(wp | wn)
            change = float(np.round(1.0 - i / un, 6)) if un else 0.0
            out[(u, sp)] = (sn, len(wp), len(wn), i, change)
    return out


def test_change_rate_matches_bruteforce(ray_session):
    import numpy as np
    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(25):
        for s in range(5):
            if (d + s) % 4 == 0:
                continue  # observation gaps
            words = [vocab[rng.randint(30)] for _ in range(rng.randint(12))]
            rows.append((f"u{d}", s, " ".join(words)))
    assert _ccr(rows) == _ccr_brute(rows)


def test_change_rate_edges(ray_session):
    rows = [
        ("a", 0, "x y z"), ("a", 2, "x y z"),      # identical -> 0.0
        ("a", 5, "p q"),                            # disjoint  -> 1.0
        ("b", 0, ""), ("b", 1, ""),                 # both empty -> 0.0
        ("c", 0, "only"),                           # single obs -> no pair
        ("d", 0, "m m m n"), ("d", 1, "n"),         # dups collapse
    ]
    got = _ccr(rows)
    assert got[("a", 0)] == (2, 3, 3, 3, 0.0)
    assert got[("a", 2)] == (5, 3, 2, 0, 1.0)
    assert got[("b", 0)] == (1, 0, 0, 0, 0.0)
    assert got[("d", 0)] == (1, 2, 1, 1, 0.5)
    assert ("c", 0) not in got and len(got) == 4


def test_change_rate_duplicate_observation_raises(ray_session):
    import pytest
    with pytest.raises(Exception, match="observed twice"):
        _ccr([("a", 0, "x"), ("a", 0, "y"), ("a", 1, "z")])


def test_change_rate_rewrite_matches_join_formulation(ray_session):
    """Round-5 single-exchange rewrite vs the join-cascade twin —
    identical on gaps, empty captures, unchanged/rewritten content and
    multi-url interleaving."""
    import numpy as np
    import ray.data as rd

    from pappermate_ray.ops.snapshot import (content_change_rate,
                                             content_change_rate_joins)

    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for u in range(12):
        snaps = sorted(rng.choice(10, size=rng.randint(1, 5),
                                  replace=False).tolist())
        for sn in snaps:
            k = rng.randint(0, 8)
            words = rng.choice(vocab, size=k, replace=False).tolist()
            rows.append({"url": f"u{u}", "snap": int(sn),
                         "text": " ".join(words)})
    ds = rd.from_items(rows, override_num_blocks=4)
    a = sorted(map(tuple, (r.values() for r in
                           content_change_rate(ds).take_all())))
    b = sorted(map(tuple, (r.values() for r in
                           content_change_rate_joins(ds).take_all())))
    assert a == b
    assert len(a) > 0


def test_change_rate_rewrite_duplicate_snap_raises(ray_session):
    import pytest
    import ray.data as rd

    from pappermate_ray.ops.snapshot import content_change_rate

    ds = rd.from_items([
        {"url": "u", "snap": 1, "text": "a b"},
        {"url": "u", "snap": 1, "text": "a c"},
    ])
    with pytest.raises(Exception):
        content_change_rate(ds).take_all()
