"""Keyed incremental state (state/streaming.py): the raw-actor tier must
match the Dataset-API cumulative result on the same ordered log."""

import pyarrow.parquet as pq


def test_keyed_actors_match_dataset_cumulative(ray_session):
    from pappermate_ray.state.streaming import KeyedStreamState

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "ts", "value"])
    rows = sorted(t.to_pylist(), key=lambda r: r["ts"])  # event-time order

    state = KeyedStreamState(n_actors=3)
    # feed in ts-ordered micro-batches (the streaming-batch shape)
    for i in range(0, len(rows), 100):
        state.feed([(r["event_type"], r["value"]) for r in rows[i : i + 100]])
    snap = state.snapshot()
    state.shutdown()

    # ground truth: final per-key totals
    want = {}
    for r in rows:
        n, s = want.get(r["event_type"], (0, 0.0))
        want[r["event_type"]] = (n + 1, s + r["value"])
    assert set(snap) == set(want)
    for k, (n, s) in want.items():
        assert snap[k][0] == n
        assert abs(snap[k][1] - s) < 1e-6

    # and the Dataset-API cumulative query's last row per key agrees
    from pappermate_ray.queries import q_cumulative_hourly

    cum = q_cumulative_hourly(sf).take_all()
    last = {}
    for r in cum:
        cur = last.get(r["event_type"])
        if cur is None or r["window_start"] > cur["window_start"]:
            last[r["event_type"]] = r
    for k, (n, s) in want.items():
        assert last[k]["cum_events"] == n
        assert abs(last[k]["cum_value"] - round(s, 2)) < 0.02
