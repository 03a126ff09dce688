"""ops/apportion.py — exact largest-remainder budget apportionment
(SQL equivalence is the oracle gate's `crawl_budget` row; here:
brute-force Hamilton equivalence, exact-total invariant, block-count
invariance, tie determinism, guard rails)."""

import pyarrow as pa
import pytest

import ray.data as rd

from pappermate_ray.ops.apportion import largest_remainder


def _hamilton(scores: dict, budget: int) -> dict:
    """Reference implementation: sort-based Hamilton apportionment."""
    S = sum(scores.values())
    base = {k: budget * s // S for k, s in scores.items()}
    rem = {k: (budget * s) % S for k, s in scores.items()}
    r = budget - sum(base.values())
    winners = sorted(scores, key=lambda k: (-rem[k], k))[:r]
    return {k: base[k] + (1 if k in winners else 0) for k in scores}


def _ds(scores: dict, blocks=1):
    t = pa.table({
        "host": pa.array(list(scores), pa.string()),
        "score": pa.array(list(scores.values()), pa.int64()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _run(scores, budget, blocks=1, **kw):
    out = largest_remainder(_ds(scores, blocks), budget, **kw).take_all()
    return {r["host"]: r["quota"] for r in out}


def test_matches_bruteforce_and_exact_total(ray_session):
    # skewed scores with heavy remainder ties (many equal scores);
    # BOTH selection paths (driver fast path / distributed histogram)
    scores = {f"h{i:03d}": (i % 7) + 1 for i in range(200)}
    scores["hot.example"] = 5000
    for budget in (1, 37, 997, 10_000):
        for bound in (1_000_000, 0):
            got = _run(scores, budget, driver_bound=bound)
            assert got == _hamilton(scores, budget)
            assert sum(got.values()) == budget


def test_block_count_invariant(ray_session):
    scores = {f"h{i:03d}": (i * 13) % 29 + 1 for i in range(500)}
    one = _run(scores, 1234, blocks=1)
    many = _run(scores, 1234, blocks=17, n_buckets=8, driver_bound=0)
    assert one == many == _hamilton(scores, 1234)


def test_zero_residual_and_zero_scores(ray_session):
    # budget a multiple of S -> r == 0 path; zero scores allowed
    scores = {"a": 3, "b": 0, "c": 7}
    got = _run(scores, 20)  # S=10, every base exact
    assert got == {"a": 6, "b": 0, "c": 14}


def test_null_scores_dropped_and_guards(ray_session):
    t = pa.table({
        "host": pa.array(["a", "b", "c"], pa.string()),
        "score": pa.array([5, None, 5], pa.int64()),
    })
    out = largest_remainder(rd.from_arrow(t), 7).take_all()
    got = {r["host"]: r["quota"] for r in out}
    assert got == {"a": 4, "c": 3} or got == {"a": 3, "c": 4}
    assert sum(got.values()) == 7
    # deterministic tie-break: equal scores, key ascending wins the +1
    assert got == {"a": 4, "c": 3}

    for bound in (1_000_000, 0):
        with pytest.raises(ValueError, match="non-negative"):
            largest_remainder(_ds({"a": -1, "b": 2}), 5,
                              driver_bound=bound).take_all()
        with pytest.raises(ValueError, match="total score"):
            largest_remainder(_ds({"a": 0, "b": 0}), 5,
                              driver_bound=bound).take_all()


def test_custom_columns(ray_session):
    t = pa.table({
        "domain": pa.array(["x", "y"], pa.string()),
        "pages": pa.array([1, 2], pa.int64()),
    })
    out = largest_remainder(rd.from_arrow(t), 10, key_col="domain",
                            score_col="pages", out_col="q").take_all()
    got = {r["domain"]: r["q"] for r in out}
    assert got == {"x": 3, "y": 7}  # 10/3=3.33->3, 20/3=6.67->7
