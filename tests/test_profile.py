"""Table profiler (ops/profile.py) — null handling and SQL-parity
semantics (COUNT DISTINCT excludes nulls; Min/Max skip nulls)."""

import pytest


def test_profile_with_nulls(ray_session):
    import ray.data as rd

    from pappermate_ray.ops.profile import profile_table

    ds = rd.from_items([
        {"a": 3, "b": "x"},
        {"a": None, "b": "y"},
        {"a": 1, "b": None},
        {"a": 3, "b": None},
    ], override_num_blocks=2)
    out = {r["col_name"]: r for r in profile_table(ds, ["a", "b"]).take_all()}
    assert out["a"] == {"col_name": "a", "n_rows": 4, "n_nulls": 1,
                        "n_distinct": 2, "min_value": "1", "max_value": "3"}
    assert out["b"] == {"col_name": "b", "n_rows": 4, "n_nulls": 2,
                        "n_distinct": 2, "min_value": "x", "max_value": "y"}


def test_profile_all_null_column(ray_session):
    import ray.data as rd

    from pappermate_ray.ops.profile import profile_table

    ds = rd.from_items([{"a": None}, {"a": None}])
    out = profile_table(ds, ["a"]).take_all()[0]
    assert out["n_nulls"] == 2 and out["n_distinct"] == 0
    assert out["min_value"] == "" and out["max_value"] == ""


def test_profile_approx_matches_exact_within_band(ray_session):
    """Round-2 verdict item #7: approx=True replaces the per-column
    distinct exchanges with HLL block partials — every non-distinct
    field identical to exact mode, distinct within ±2%."""
    import pyarrow as pa

    import ray.data as rd

    from pappermate_ray.ops.profile import profile_table

    n = 20_000
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),                    # all distinct
        "bucket": pa.array([i % 97 for i in range(n)], pa.int64()),
        "word": pa.array([f"w{i % 4831}" for i in range(n)], pa.string()),
        "sparse": pa.array([None if i % 3 else i for i in range(n)], pa.int64()),
    })).repartition(8)

    cols = ["id", "bucket", "word", "sparse"]
    exact = {r["col_name"]: r for r in profile_table(ds, cols).take_all()}
    approx = {r["col_name"]: r for r in profile_table(ds, cols, approx=True).take_all()}
    for c in cols:
        e, a = exact[c], approx[c]
        for f in ("n_rows", "n_nulls", "min_value", "max_value"):
            assert a[f] == e[f], (c, f)
        assert a["n_distinct"] == pytest.approx(e["n_distinct"], rel=0.02), c


def test_profile_approx_null_and_small_columns(ray_session):
    """Small-range linear counting keeps tiny cardinalities EXACT; the
    all-null column profiles to zero distinct."""
    import ray.data as rd

    from pappermate_ray.ops.profile import profile_table

    ds = rd.from_items(
        [{"a": None, "b": "x" if i % 2 else "y"} for i in range(100)],
        override_num_blocks=4)
    out = {r["col_name"]: r
           for r in profile_table(ds, ["a", "b"], approx=True).take_all()}
    assert out["a"]["n_nulls"] == 100 and out["a"]["n_distinct"] == 0
    assert out["b"]["n_distinct"] == 2
    assert out["b"]["min_value"] == "x" and out["b"]["max_value"] == "y"
