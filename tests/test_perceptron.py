"""ops/perceptron.py unit semantics (the SQL-equivalence is covered by
the oracle gate's `perceptron_quality` row)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.perceptron import classify, train_perceptron


def _ds(x, y, blocks=1):
    x = np.asarray(x, np.int64)
    t = pa.table({
        "x1": pa.array(x[:, 0], pa.int64()),
        "x2": pa.array(x[:, 1], pa.int64()),
        "y": pa.array(np.asarray(y, np.int64), pa.int64()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_round1_miss_is_whole_corpus(ray_session):
    # w=0 ⇒ every score is 0 ⇒ y*score <= 0 for all rows: round-1 miss
    # must equal the corpus size (miss is counted PRE-update).
    x = [[1, 0], [2, 1], [-1, 3], [-2, -2]]
    hist, _ = train_perceptron(_ds(x, [1, 1, -1, -1]), ["x1", "x2"], "y", 1)
    assert hist["miss"].to_pylist() == [4]
    # the round-1 update is sum(y·[1,x]) over everything
    xs = np.column_stack([np.ones(4, np.int64), np.asarray(x, np.int64)])
    ys = np.array([1, 1, -1, -1])
    want = (ys[:, None] * xs).sum(axis=0)
    assert [hist["w0"][0].as_py(), hist["w1"][0].as_py(),
            hist["w2"][0].as_py()] == want.tolist()


def test_separable_converges_and_freezes(ray_session):
    # sign(x1) with the band -5..4 excluded is separable with a wide
    # margin; once a round has miss == 0 the update is zero and the
    # weights are frozen.
    x = [[v, v % 3] for v in list(range(-20, -4)) + list(range(5, 21))]
    y = [1 if v >= 0 else -1 for v, _ in x]
    hist, w = train_perceptron(_ds(x, y), ["x1", "x2"], "y", 6)
    miss = hist["miss"].to_pylist()
    assert miss[-1] == 0
    k = miss.index(0)
    tail = hist.slice(k - 1)  # from the last updating round onward
    for col in ("w0", "w1", "w2"):
        assert len(set(tail[col].to_pylist())) == 1
    # final weights classify everything correctly
    xs = np.column_stack([np.ones(len(x), np.int64), np.asarray(x, np.int64)])
    assert (np.asarray(y) * (xs @ np.asarray(w)) > 0).all()


def test_history_padded_after_convergence(ray_session):
    # convergence short-circuits the remaining corpus passes but the
    # history still reports one row per requested round (identity
    # updates), so the oracle's fixed-round CTE unroll stays aligned.
    x = [[v, 0] for v in (-9, -8, 8, 9)]
    y = [-1, -1, 1, 1]
    hist, _ = train_perceptron(_ds(x, y), ["x1", "x2"], "y", 8)
    assert hist.num_rows == 8
    miss = hist["miss"].to_pylist()
    k = miss.index(0)
    assert all(m == 0 for m in miss[k:])


def test_classify_scores_and_filter(ray_session):
    x = [[3, 1], [-2, 5], [0, 0]]
    scored = classify(_ds(x, [1, -1, 1]), ["x1", "x2"], [1, 2, -1])
    rows = {r["x1"]: r["score"] for r in scored.take_all()}
    # score = 1 + 2*x1 - x2
    assert rows == {3: 6, -2: -8, 0: 1}


def test_partitioning_invariant(ray_session):
    # batch updates sum over all misclassified rows ⇒ identical
    # trajectory regardless of block count or row order.
    rng = np.random.default_rng(11)
    x = rng.integers(-50, 50, size=(300, 2))
    y = np.where(x[:, 0] + 2 * x[:, 1] - 5 >= 0, 1, -1)
    a, wa = train_perceptron(_ds(x, y), ["x1", "x2"], "y", 6)
    perm = rng.permutation(300)
    b, wb = train_perceptron(_ds(x[perm], y[perm], blocks=13),
                             ["x1", "x2"], "y", 6)
    assert a.equals(b) and wa == wb
