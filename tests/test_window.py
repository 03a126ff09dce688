"""Ordered-window operators (ops/window.py): sessionize, running
window sums, top-k per group, grouped z-score outliers.

Each test plants a fixture where the tricky rule is load-bearing:
strict-gt session gaps, groups shorter than the moving window, tie
ranks, a single-row group (sd undefined), and a many-block corpus so
topk's local-trim combiner actually trims.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pappermate_ray.ops.sample import grouped_topk
from pappermate_ray.ops.window import (
    running_window, sessionize, zscore_outliers)

E = dt.datetime(2024, 1, 1)


def _events(rows):
    """rows = [(event_id, user_id, minutes_offset, value)]"""
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([E + dt.timedelta(minutes=r[2]) for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    }))


def test_sessionize_strict_gap(ray_session):
    # user 1: gaps of exactly 30min (NOT a break — strict >), then 31min
    ds = _events([(0, 1, 0, 0.0), (1, 1, 30, 0.0), (2, 1, 61, 0.0),
                  (3, 2, 5, 0.0)])
    out = sessionize(ds, "user_id", "ts", 30 * 60, "event_id").to_pandas()
    out = out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    u1 = out[out.user_id == 1]
    assert list(u1.session_idx) == [1, 2]
    assert list(u1.n_events) == [2, 1]
    assert u1.iloc[0].session_start == E
    assert u1.iloc[0].session_end == E + dt.timedelta(minutes=30)
    u2 = out[out.user_id == 2]
    assert list(u2.n_events) == [1]


def test_sessionize_equal_ts_never_breaks(ray_session):
    ds = _events([(0, 1, 10, 0.0), (1, 1, 10, 0.0), (2, 1, 10, 0.0)])
    out = sessionize(ds, "user_id", "ts", 1, "event_id").to_pandas()
    assert len(out) == 1 and int(out.n_events.iloc[0]) == 3


def test_running_window_exact(ray_session):
    # user 1 values 1.00,2.00,3.00,4.00 with window 2
    ds = _events([(0, 1, 0, 1.0), (1, 1, 1, 2.0),
                  (2, 1, 2, 3.0), (3, 1, 3, 4.0)])
    out = (running_window(ds, "user_id", "ts", "value", 2, "event_id")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert list(out.running_cents) == [100, 300, 600, 1000]
    assert list(out.moving_cents) == [100, 300, 500, 700]


def test_running_window_group_shorter_than_window(ray_session):
    ds = _events([(0, 9, 0, 5.0), (1, 9, 1, 7.0)])
    out = (running_window(ds, "user_id", "ts", "value", 10, "event_id")
           .to_pandas().sort_values("event_id"))
    assert list(out.moving_cents) == list(out.running_cents) == [500, 1200]


def test_grouped_topk_ties_and_small_groups(ray_session):
    t = pa.table({
        "lang": pa.array(["en", "en", "en", "en", "pt"], pa.string()),
        "doc_id": pa.array([4, 2, 3, 1, 9], pa.int64()),
        "n_chars": pa.array([10, 10, 10, 5, 7], pa.int64()),
    })
    out = (grouped_topk(rd.from_arrow(t), "lang", "n_chars", "doc_id", 2)
           .to_pandas()
           .sort_values(["lang", "n_chars", "doc_id"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    en = out[out.lang == "en"]
    # ties at 10 break by doc_id asc: 2 then 3; doc 4 loses, doc 1 short
    assert list(en.doc_id) == [2, 3]
    pt = out[out.lang == "pt"]  # group smaller than k keeps all rows
    assert list(pt.doc_id) == [9]


def test_grouped_topk_local_trim_matches_bruteforce_many_blocks(ray_session):
    """The round-3 combiner push-down (per-block local trim) must not
    change output — compare against brute force over 23 blocks."""
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "lang": rng.choice(["a", "b", "c", "d"], n),
        "doc_id": np.arange(n, dtype=np.int64),
        "n_chars": rng.integers(0, 50, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(23)  # force many blocks
    out = (grouped_topk(ds, "lang", "n_chars", "doc_id", 5)
           .to_pandas()
           .sort_values(["lang", "n_chars", "doc_id"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    want = (df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
              .groupby("lang", sort=True).head(5)
              .sort_values(["lang", "n_chars", "doc_id"],
                           ascending=[True, False, True])
              .reset_index(drop=True))
    assert list(out.doc_id) == list(want.doc_id)


def test_zscore_outliers_planted(ray_session):
    # 40 values near 10, one planted at 100; singleton group -> never flagged
    rows = [(i, 1, i, 10.0 + (i % 5) * 0.1) for i in range(40)]
    rows.append((40, 1, 40, 100.0))
    rows.append((41, 2, 0, 999.0))  # its own event_type below
    t = _events(rows).to_pandas()
    t["event_type"] = np.where(t.event_id < 41, "page", "solo")
    ds = rd.from_pandas(t)
    out = zscore_outliers(ds, "event_type", "value", 2.0).to_pandas()
    assert list(out.event_id) == [40]  # solo group: sd=0 and |v-m|=0


def test_interval_union_touch_nest_disjoint(ray_session):
    from pappermate_ray.ops.window import interval_union
    t = pa.table({
        "uid": pa.array([1, 1, 1, 1, 2], pa.int64()),
        # [0,10) [10,20) touch-merge; [12,15) nested; [30,40) disjoint
        "s": pa.array([0, 10, 12, 30, 5], pa.int64()),
        "e": pa.array([10, 20, 15, 40, 6], pa.int64()),
    })
    out = {r["uid"]: r["covered_us"] for r in
           interval_union(rd.from_arrow(t), "uid", "s", "e").take_all()}
    assert out == {1: 30, 2: 1}   # 20 (merged) + 10; and 1


def test_scd2_history_compaction_and_open_end(ray_session):
    from pappermate_ray.ops.window import scd2_history
    rows = [
        # url X: d0, d0 (repeat compacts), d1, d1 -> two versions
        ("X", 0, 0, "d0"), ("X", 1, 1, "d0"),
        ("X", 2, 2, "d1"), ("X", 3, 3, "d1"),
        # url Y: flip back and forth -> three versions
        ("Y", 0, 4, "a"), ("Y", 1, 5, "b"), ("Y", 2, 6, "a"),
        # url Z: equal-ts captures ordered by cap_id: d0 then d1
        ("Z", 0, 7, "d0"), ("Z", 0, 8, "d1"),
    ]
    ds = rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([E + dt.timedelta(days=r[1]) for r in rows],
                       pa.timestamp("us")),
        "cap_id": pa.array([r[2] for r in rows], pa.int64()),
        "digest": pa.array([r[3] for r in rows], pa.string()),
    }))
    open_end = pd.Timestamp("2200-01-01")
    got = (scd2_history(ds, "url", "ts", "digest", "cap_id",
                        open_end=open_end)
           .to_pandas().sort_values(["url", "version"])
           .reset_index(drop=True))
    x = got[got.url == "X"]
    assert list(x.digest) == ["d0", "d1"]
    assert x.iloc[0].valid_to == x.iloc[1].valid_from == E + dt.timedelta(days=2)
    assert x.iloc[1].valid_to == open_end
    y = got[got.url == "Y"]
    assert list(y.digest) == ["a", "b", "a"]   # flip-back is a NEW version
    z = got[got.url == "Z"]
    assert list(z.digest) == ["d0", "d1"]      # tie broken by cap_id
    assert list(z.version) == [1, 2]


def test_window_ops_hot_key_skew(ray_session):
    """One user holds 50% of events (boilerplate-storm shape): the
    partition-grouped scans must complete and agree with a pandas
    brute force on both session counts and running sums."""
    from pappermate_ray.ops.window import running_window, sessionize
    n = 4000
    rows = [(i, 7 if i % 2 == 0 else 100 + (i % 50), i * 3, float(i % 9))
            for i in range(n)]
    ds = _events(rows).repartition(11)
    sess = sessionize(ds, "user_id", "ts", 60, "event_id").to_pandas()
    df = _events(rows).to_pandas().sort_values(["user_id", "ts", "event_id"])
    brk = (df.groupby("user_id")["ts"].diff()
           > pd.Timedelta(seconds=60)) | df.groupby("user_id")["ts"].diff().isna()
    df["_sid"] = brk.cumsum()
    want = (df.groupby(["user_id", "_sid"]).size()
            .groupby("user_id").size())     # sessions per user
    got = sess.groupby("user_id").session_idx.max()
    assert got.sort_index().to_dict() == want.sort_index().to_dict()

    run = (running_window(ds, "user_id", "ts", "value", 3, "event_id")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    df["_c"] = np.floor(df["value"].to_numpy() * 100).astype(np.int64)
    df["want_run"] = df.groupby("user_id")["_c"].cumsum()
    df["want_mov"] = (df.groupby("user_id")["_c"]
                      .rolling(3, min_periods=1).sum()
                      .reset_index(level=0, drop=True))
    w = df.sort_values("event_id").reset_index(drop=True)
    assert list(run.running_cents) == list(w.want_run)
    assert list(run.moving_cents) == [int(x) for x in w.want_mov]


def test_grouped_topk_keeps_null_group(ray_session):
    """Regression: the local-trim combiner must not drop null-keyed
    groups (pandas groupby defaults to dropna=True). Single block:
    Ray 2.49's own multi-block groupby sort crashes on null string
    keys ('<' between None and str), so multi-block null groups are
    out of the engine's contract for every groupby-based op."""
    t = pa.table({
        "lang": pa.array(["en", "en", None, None, None], pa.string()),
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "n_chars": pa.array([10, 20, 30, 40, 50], pa.int64()),
    })
    out = (grouped_topk(rd.from_arrow(t),
                        "lang", "n_chars", "doc_id", 2)
           .to_pandas())
    nulls = out[out.lang.isna()]
    assert sorted(nulls.doc_id) == [4, 5]
    assert sorted(out[out.lang == "en"].doc_id) == [1, 2]
