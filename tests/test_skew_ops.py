"""Skew handling (auto-salted asof/range joins) and IVF sampling bias.

Round-2 verdict items #2 and #10: salted joins must return IDENTICAL
output to unsalted on a corpus where one key holds 50% of rows; IVF
centroids must come from a uniform sample so recall holds on a corpus
SORTED by cluster (where first-blocks sampling is maximally biased).
"""

import datetime as dt

import numpy as np
import pyarrow as pa

import ray.data as rd


def _skewed_events(n=2000):
    """user 7 holds 50% of events; the rest spread over 100 users."""
    e = dt.datetime(2024, 1, 1)
    ids, users, ts = [], [], []
    for i in range(n):
        ids.append(i)
        users.append(7 if i % 2 == 0 else 100 + (i % 100))
        ts.append(e + dt.timedelta(seconds=13 * i))
    return rd.from_arrow(pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }))


def _orders():
    e = dt.datetime(2024, 1, 1)
    keys, users, ts = [], [], []
    for j in range(300):
        keys.append(j)
        users.append(7 if j % 3 == 0 else 100 + (j % 100))
        ts.append(e + dt.timedelta(seconds=91 * j))
    return rd.from_arrow(pa.table({
        "o_orderkey": pa.array(keys, pa.int64()),
        "o_custkey": pa.array(users, pa.int64()),
        "o_orderdate": pa.array(ts, pa.timestamp("us")),
    }))


class TestAutoSaltJoins:
    def test_asof_salted_identical(self, ray_session):
        from pappermate_ray.ops.asof import asof_join

        kw = dict(left_key="user_id", right_key="o_custkey", left_ts="ts",
                  right_ts="o_orderdate", left_id="event_id", right_id="o_orderkey")
        plain = asof_join(_skewed_events(), _orders(), **kw).take_all()
        salted = asof_join(_skewed_events(), _orders(), hot_key_threshold=500,
                           n_salts=8, **kw).take_all()
        key = lambda rs: sorted((r["left_id"], r["right_id"]) for r in rs)
        assert key(plain) == key(salted)
        assert len(plain) > 0

    def test_range_salted_identical(self, ray_session):
        from pappermate_ray.ops.rangejoin import range_join

        e = dt.datetime(2024, 1, 1)
        orders = _orders().map_batches(
            lambda t: pa.table({
                "o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
                "wstart": t["o_orderdate"],
                "wend": pa.array(
                    [v.as_py() + dt.timedelta(seconds=91) for v in t["o_orderdate"]],
                    pa.timestamp("us")),
            }), batch_format="pyarrow")
        kw = dict(left_key="user_id", right_key="o_custkey", left_ts="ts",
                  right_start="wstart", right_end="wend",
                  left_id="event_id", right_id="o_orderkey")
        plain = range_join(_skewed_events(), orders, **kw).take_all()
        salted = range_join(_skewed_events(), orders, hot_key_threshold=500,
                            n_salts=8, **kw).take_all()
        key = lambda rs: sorted((r["left_id"], r["right_id"]) for r in rs)
        assert key(plain) == key(salted)
        assert len(plain) > 0

    def test_detect_hot_keys_bounded(self, ray_session):
        from pappermate_ray.ops.salt import detect_hot_keys

        hot = detect_hot_keys(_skewed_events(), "user_id", 500)
        assert hot == {7}


class TestIvfSortedCorpus:
    def test_recall_on_cluster_sorted_embeddings(self, ray_session):
        """Corpus SORTED by cluster: first-blocks centroid sampling (the
        round-1 ds.limit bug) collapses recall for late clusters; seeded
        random_sample must keep it high."""
        from pappermate_ray.stages.similarity import ivf_knn, knn_scatter_gather

        rng = np.random.RandomState(0)
        dim, per = 16, 200
        centers = np.eye(3, dim) * 10.0
        vecs, ids = [], []
        vid = 0
        for c in range(3):  # sorted: all of cluster 0, then 1, then 2
            for _ in range(per):
                vecs.append(centers[c] + rng.normal(scale=0.5, size=dim))
                ids.append(vid)
                vid += 1
        emb = pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        })
        ds = rd.from_arrow(emb)
        # one query per cluster — the biased sampler fails on cluster 2
        q_ids = np.array([0, per, 2 * per], dtype=np.int64)
        Q = np.stack([vecs[0], vecs[per], vecs[2 * per]])
        exact = knn_scatter_gather(ds, Q, q_ids, k=5).take_all()
        approx = ivf_knn(ds, Q, q_ids, k=5, n_centroids=6, n_probe=2,
                         sample_size=250).take_all()
        ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
        ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.8
