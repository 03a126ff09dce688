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
