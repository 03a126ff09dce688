"""Randomized equivalence: asof_join / range_join vs brute-force
references over seeded random inputs (ties, duplicates, overlapping
intervals, many blocks). The DuckDB oracle pins ONE fixed dataset; these
pin the semantics over varied shapes."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.asof import asof_join
from pappermate_ray.ops.rangejoin import range_join


def _ds(df: pd.DataFrame, blocks: int) -> "rd.Dataset":
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(blocks) if blocks > 1 else ds


def _brute_asof(l: pd.DataFrame, r: pd.DataFrame):
    out = []
    for _, lr in l.iterrows():
        cand = r[(r["k"] == lr["k"]) & (r["ts"] <= lr["ts"])]
        if len(cand):
            best = cand.sort_values(["ts", "rid"]).iloc[-1]
            out.append((int(lr["lid"]), int(best["rid"])))
    return sorted(out)


def test_asof_matches_bruteforce_with_ties(ray_session):
    rng = np.random.default_rng(3)
    l = pd.DataFrame({
        "k": rng.integers(0, 12, 220),
        "ts": rng.integers(0, 40, 220),  # heavy tie density
        "lid": np.arange(220),
    })
    r = pd.DataFrame({
        "k": rng.integers(0, 12, 90),
        "ts": rng.integers(0, 40, 90),
        "rid": np.arange(90),
    })
    got = asof_join(_ds(l, 7), _ds(r, 4),
                    left_key="k", right_key="k", left_ts="ts", right_ts="ts",
                    left_id="lid", right_id="rid")
    got = sorted((row["left_id"], row["right_id"]) for row in got.take_all())
    assert got == _brute_asof(l, r)


def _brute_range(l: pd.DataFrame, r: pd.DataFrame):
    out = []
    for _, lr in l.iterrows():
        hits = r[(r["k"] == lr["k"]) & (r["s"] <= lr["ts"]) & (lr["ts"] < r["e"])]
        non_ov = True
        g = r[r["k"] == lr["k"]].sort_values(["s", "rid"])
        if len(g) > 1:
            non_ov = bool((g["e"].to_numpy()[:-1] <= g["s"].to_numpy()[1:]).all())
        if non_ov:
            if len(hits):
                best = hits.sort_values(["s", "rid"]).iloc[-1]
                out.append((int(lr["lid"]), int(best["rid"])))
        else:
            out.extend((int(lr["lid"]), int(h)) for h in hits["rid"])
    return sorted(out)


def test_range_matches_bruteforce_mixed_overlap(ray_session):
    # keys 0-3: non-overlapping validity windows; keys 4-5: overlapping
    # (forces the per-row scan fallback) — both semantics in one run
    rng = np.random.default_rng(9)
    rs = []
    rid = 0
    for k in range(6):
        if k < 4:
            edges = np.sort(rng.choice(100, size=8, replace=False))
            for s, e in zip(edges[:-1:2], edges[1::2]):
                rs.append((k, int(s), int(e), rid)); rid += 1
        else:
            for _ in range(4):
                s = int(rng.integers(0, 80)); e = s + int(rng.integers(5, 40))
                rs.append((k, s, e, rid)); rid += 1
    r = pd.DataFrame(rs, columns=["k", "s", "e", "rid"])
    l = pd.DataFrame({
        "k": rng.integers(0, 6, 150),
        "ts": rng.integers(0, 110, 150),
        "lid": np.arange(150),
    })
    got = range_join(_ds(l, 5), _ds(r, 3),
                     left_key="k", right_key="k", left_ts="ts",
                     right_start="s", right_end="e",
                     left_id="lid", right_id="rid")
    got = sorted((row["left_id"], row["right_id"]) for row in got.take_all())
    assert got == _brute_range(l, r)


def test_asof_block_count_invariant(ray_session):
    rng = np.random.default_rng(21)
    l = pd.DataFrame({"k": rng.integers(0, 5, 100),
                      "ts": rng.integers(0, 1000, 100), "lid": np.arange(100)})
    r = pd.DataFrame({"k": rng.integers(0, 5, 40),
                      "ts": rng.integers(0, 1000, 40), "rid": np.arange(40)})
    runs = []
    for bl, br in ((1, 1), (9, 6)):
        got = asof_join(_ds(l, bl), _ds(r, br),
                        left_key="k", right_key="k", left_ts="ts",
                        right_ts="ts", left_id="lid", right_id="rid")
        runs.append(sorted((x["left_id"], x["right_id"]) for x in got.take_all()))
    assert runs[0] == runs[1]


# --- outer joins (full_outer / right_outer armored paths) -----------

def _outer_frames(seed=11):
    rng = np.random.default_rng(seed)
    l = pd.DataFrame({
        "k": rng.integers(0, 30, 200),        # some keys only on left
        "a": np.arange(200, dtype=np.int64),
    })
    r = pd.DataFrame({
        "k2": rng.integers(15, 45, 120),      # some keys only on right
        "b": np.arange(120, dtype=np.int64),
    })
    return l, r


def test_full_outer_matches_pandas(ray_session):
    from pappermate_ray.ops.joins import hash_join

    l, r = _outer_frames()
    got = hash_join(_ds(l, 6), _ds(r, 5), on="k", right_on="k2",
                    join_type="full_outer", num_partitions=5).to_pandas()
    want = l.merge(r, left_on="k", right_on="k2", how="outer")
    want["k"] = want["k"].fillna(want["k2"])  # Ray coalesces into left key
    got_set = sorted(map(tuple, got[["k", "a", "b"]]
                         .fillna(-1).astype(np.int64).to_numpy()))
    want_set = sorted(map(tuple, want[["k", "a", "b"]]
                          .fillna(-1).astype(np.int64).to_numpy()))
    assert got_set == want_set


def test_right_outer_matches_pandas(ray_session):
    from pappermate_ray.ops.joins import hash_join

    l, r = _outer_frames(seed=5)
    got = hash_join(_ds(l, 4), _ds(r, 7), on="k", right_on="k2",
                    join_type="right_outer", num_partitions=4).to_pandas()
    want = l.merge(r, left_on="k", right_on="k2", how="right")
    got_set = sorted(map(tuple, got[["k2", "a", "b"]]
                         .fillna(-1).astype(np.int64).to_numpy()))
    want_set = sorted(map(tuple, want[["k2", "a", "b"]]
                          .fillna(-1).astype(np.int64).to_numpy()))
    assert got_set == want_set


def test_full_outer_one_side_empty(ray_session):
    """The armor's reason to exist: a side whose every block is empty
    (schema never broadcast) must not crash, and the other side must
    survive in full."""
    from pappermate_ray.ops.joins import hash_join

    l, r = _outer_frames(seed=7)
    empty_r = _ds(r, 3).filter(lambda row: False)
    got = hash_join(
        _ds(l, 3), empty_r, on="k", right_on="k2",
        join_type="full_outer", num_partitions=3,
        right_schema=pa.schema([("k2", pa.int64()), ("b", pa.int64())]),
    ).to_pandas()
    assert sorted(got["a"].astype(np.int64)) == list(range(200))
    assert got["b"].isna().all()
