"""Grouped stats operators (ops/stats.py): median/MAD robust outliers
and closed-form per-group linear regression."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pappermate_ray.ops.stats import grouped_linreg, mad_outliers


def test_mad_outliers_robust_to_planted_extreme(ray_session):
    """One 1e9 row inflates a mean/stddev gate enough to mask a second,
    smaller outlier — the median/MAD gate flags both."""
    vals = [100 + (i % 7) for i in range(60)]          # tight cluster
    vals += [10_000, 1_000_000_000]                    # two outliers
    t = pa.table({
        "g": pa.array(["a"] * len(vals), pa.string()),
        "id": pa.array(range(len(vals)), pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })
    out = mad_outliers(rd.from_arrow(t), "g", "v", k=5).to_pandas()
    assert sorted(out.v) == [10_000, 1_000_000_000]


def test_mad_outliers_constant_group_flags_nothing_but_deviants(ray_session):
    # all-equal group: med=v, MAD=0 -> only rows with dev>0 flagged
    t = pa.table({
        "g": pa.array(["c"] * 9 + ["c"], pa.string()),
        "id": pa.array(range(10), pa.int64()),
        "v": pa.array([5] * 9 + [6], pa.int64()),
    })
    out = mad_outliers(rd.from_arrow(t), "g", "v", k=5).to_pandas()
    assert list(out.v) == [6]


def test_mad_outliers_null_values_and_all_null_group(ray_session):
    """Null values never flag; a group whose values are ALL null is
    absent from the med/mad maps and must not crash the flag pass."""
    t = pa.table({
        "g": pa.array(["a"] * 8 + ["z", "z"], pa.string()),
        "id": pa.array(range(10), pa.int64()),
        "v": pa.array([100, 101, 102, 100, 101, None, 10_000, 100,
                       None, None], pa.int64()),
    })
    out = mad_outliers(rd.from_arrow(t), "g", "v", k=5).to_pandas()
    assert list(out.v) == [10_000]
    assert list(out.g) == ["a"]


def test_grouped_linreg_exact_fit_and_degenerate(ray_session):
    # group 'a': y = 3x + 7 exactly; group 'b': single point -> zeros
    xs = np.arange(10, dtype=np.int64)
    t = pa.table({
        "g": pa.array(["a"] * 10 + ["b"], pa.string()),
        "x": pa.array(list(xs) + [4], pa.int64()),
        "y": pa.array(list(3 * xs + 7) + [99], pa.int64()),
    })
    out = {r["g"]: r for r in
           grouped_linreg(rd.from_arrow(t), "g", "x", "y").take_all()}
    assert out["a"]["slope"] == 3.0 and out["a"]["intercept"] == 7.0
    assert out["a"]["n"] == 10
    assert out["b"]["slope"] == 0.0 and out["b"]["intercept"] == 0.0


def test_grouped_mode_tie_smallest_and_multiblock(ray_session):
    from pappermate_ray.ops.stats import grouped_mode
    # group 'a': 3 and 5 both appear twice -> tie breaks to 3
    t = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 3, pa.string()),
        "v": pa.array([5, 3, 5, 3, 1, 9, 9, 2], pa.int64()),
    })
    out = {r["g"]: (r["mode_value"], r["n"]) for r in
           grouped_mode(rd.from_arrow(t).repartition(4), "g", "v")
           .take_all()}
    assert out == {"a": (3, 2), "b": (9, 2)}
