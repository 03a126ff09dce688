"""Sketch operators (stages/sketch.py): HyperLogLog distinct counting and
Count-Min heavy hitters — accuracy vs exact, determinism, merge laws."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pappermate_ray.stages.sketch import (
    heavy_hitters,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _values(n, start=0):
    return [f"value-{i}" for i in range(start, start + n)]


class TestHLLPure:
    @pytest.mark.parametrize("n", [0, 1, 50, 1_000, 20_000, 200_000])
    def test_accuracy(self, n):
        est = hll_estimate(hll_registers(_values(n)))
        if n == 0:
            assert est == 0
        else:
            assert abs(est - n) / n < 0.02, (n, est)  # p=14 → σ ≈ 0.8%

    def test_duplicates_dont_inflate(self):
        once = hll_registers(_values(5_000))
        thrice = hll_registers(_values(5_000) * 3)
        assert np.array_equal(once, thrice)

    def test_merge_equals_union(self):
        a = hll_registers(_values(10_000, start=0))
        b = hll_registers(_values(10_000, start=5_000))  # 5k overlap
        est = hll_estimate(hll_merge([a, b]))
        assert abs(est - 15_000) / 15_000 < 0.02
        # merge is order-insensitive
        assert np.array_equal(hll_merge([a, b]), hll_merge([b, a]))


class TestHLLDataset:
    def test_distributed_matches_exact(self, ray_session):
        import ray.data as rd

        def make(t: pa.Table) -> pa.Table:
            ids = t["id"].to_pylist()
            # ~3 values per row, heavy overlap across rows → distinct = 3000
            vals = [f"tok-{(i * 7 + j) % 3000}" for i in ids for j in range(3)]
            return pa.table({"v": pa.array(vals, pa.string())})

        ds = rd.range(20_000, override_num_blocks=8).map_batches(make, batch_format="pyarrow")
        est, n_sketches = hll_distinct(ds, lambda t: t["v"].to_pylist())
        assert n_sketches >= 2  # actually merged across blocks
        assert abs(est - 3000) / 3000 < 0.03
        # deterministic across runs
        ds2 = rd.range(20_000, override_num_blocks=8).map_batches(make, batch_format="pyarrow")
        est2, _ = hll_distinct(ds2, lambda t: t["v"].to_pylist())
        assert est == est2


class TestHeavyHitters:
    def test_matches_exact_topk_on_skewed_data(self, ray_session):
        import ray.data as rd
        from collections import Counter

        def make(t: pa.Table) -> pa.Table:
            vals = []
            for i in t["id"].to_pylist():
                # zipf-ish: value-j appears ~ N/(j+1) times
                j = 0
                r = i
                while r % 2 == 1 and j < 12:
                    j += 1
                    r //= 2
                vals.append(f"hot-{j}")
            return pa.table({"v": pa.array(vals, pa.string())})

        ds = rd.range(40_000, override_num_blocks=8).map_batches(make, batch_format="pyarrow")
        got = heavy_hitters(ds, lambda t: t["v"].to_pylist(), k=5)

        exact = Counter()
        for b in rd.range(40_000, override_num_blocks=8).map_batches(
                make, batch_format="pyarrow").iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            exact.update(b["v"].to_pylist())
        want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert got["value"].to_pylist() == [v for v, _ in want]
        # CM never underestimates; with few distinct values it is exact here
        for v, est in zip(got["value"].to_pylist(), got["est_count"].to_pylist()):
            assert est >= exact[v]
            assert est <= exact[v] * 1.01 + 5

    def test_empty(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"v": pa.array([], pa.string())}))
        out = heavy_hitters(ds, lambda t: t["v"].to_pylist(), k=3)
        assert out.num_rows == 0


class TestHDRQuantiles:
    def test_bucket_math(self):
        import numpy as np

        from pappermate_ray.stages.sketch import hdr_edge, hdr_keys

        v = np.array([0, 1, 63, 64, 65, 127, 128, 1000, 2**40 + 12345], np.int64)
        keys = hdr_keys(v)
        # small values exact
        assert list(keys[:3]) == [0, 1, 63]
        # edges are lower bounds within 1/64 relative width, monotone
        edges = np.array([hdr_edge(int(k)) for k in keys], np.int64)
        assert (edges <= v).all()
        assert (v < edges + np.maximum(edges >> 6, 1)).all()
        assert (np.diff(edges) >= 0).all()
        assert hdr_edge(int(hdr_keys(np.array([64], np.int64))[0])) == 64

    def test_accuracy_vs_exact(self, ray_session):
        import numpy as np

        import ray.data as rd

        from pappermate_ray.stages.sketch import approx_quantiles

        # deterministic skewed values over several orders of magnitude
        vals = [(i * i * 7919) % 1_000_003 + 1 for i in range(20_000)]
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
        ds = ds.repartition(8)
        qs = [0.1, 0.5, 0.9, 0.99]
        est, n_sk = approx_quantiles(ds, "v", qs)
        assert n_sk >= 2  # merge path exercised
        s = np.sort(np.array(vals))
        for q, e in zip(qs, est):
            import math
            true = int(s[max(0, math.ceil(q * len(s)) - 1)])
            assert e <= true
            assert true - e <= max(true // 64, 1)  # one bucket width


# lambda on purpose: cloudpickle serializes it BY VALUE (a module-level
# def would pickle by reference to the test module, which Ray workers
# can't import)
_words = lambda t: [w for x in t["text"].to_pylist()  # noqa: E731
                    for w in (x or "").split()]


class TestSketchStore:
    """Persisted mergeable HLL store (stages/sketch.py): increments
    saved separately must merge to EXACTLY the single-pass registers of
    the union corpus (max-merge is lossless), read-only, and
    append-monotone."""

    def _docs(self, lo, hi):
        return rd.from_items(
            [{"doc_id": i, "text": f"word{i % 50} tok{i % 31} common"}
             for i in range(lo, hi)],
            override_num_blocks=3)

    def test_increments_merge_equals_union(self, ray_session, tmp_path):
        from pappermate_ray.stages.sketch import (hll_registers,
                                                  save_hll_increment,
                                                  stored_hll_estimate,
                                                  stored_hll_registers)

        store = str(tmp_path / "s")
        save_hll_increment(self._docs(0, 60), _words, store)
        save_hll_increment(self._docs(60, 120), _words, store)

        union_words = []
        for i in range(120):
            union_words.extend(f"word{i % 50} tok{i % 31} common".split())
        single = hll_registers(union_words)
        merged = stored_hll_registers(store)
        assert np.array_equal(merged, single)  # lossless merge, bit-exact

        est, n_inc = stored_hll_estimate(store)
        exact = len(set(union_words))
        assert n_inc == 2
        assert abs(est - exact) <= max(1.0, 0.05 * exact)

    def test_readonly_and_monotone(self, ray_session, tmp_path):
        import os

        from pappermate_ray.stages.sketch import (save_hll_increment,
                                                  stored_hll_estimate)

        store = str(tmp_path / "m")
        save_hll_increment(self._docs(0, 40), _words, store)
        e1, _ = stored_hll_estimate(store)
        files = sorted(os.path.join(d, f)
                       for d, _, fs in os.walk(store) for f in fs)
        e1b, _ = stored_hll_estimate(store)
        assert e1 == e1b
        assert files == sorted(os.path.join(d, f)
                               for d, _, fs in os.walk(store) for f in fs)
        # new DISJOINT values can only raise the estimate
        save_hll_increment(
            rd.from_items([{"doc_id": 0,
                            "text": " ".join(f"fresh{j}" for j in range(200))}]),
            _words, store)
        e2, n = stored_hll_estimate(store)
        assert n == 2 and e2 > e1

    def test_mixed_precision_raises(self, ray_session, tmp_path):
        import pytest as _pytest

        from pappermate_ray.stages.sketch import (save_hll_increment,
                                                  stored_hll_registers)

        store = str(tmp_path / "p")
        save_hll_increment(self._docs(0, 10), _words, store, p=14)
        save_hll_increment(self._docs(0, 10), _words, store, p=12)
        with _pytest.raises(ValueError, match="mixed precisions"):
            stored_hll_registers(store)


class TestStoredOverlap:
    """Inclusion-exclusion overlap between two sketch stores: accuracy
    band on known overlaps, disjoint/identical edge cases, precision
    mismatch."""

    def _store(self, tmp_path, name, lo, hi):
        from pappermate_ray.stages.sketch import save_hll_increment

        store = str(tmp_path / name)
        ds = rd.from_items(
            [{"doc_id": i, "text": " ".join(f"w{j}" for j in
                                            range(i * 20, i * 20 + 20))}
             for i in range(lo, hi)],
            override_num_blocks=2)
        save_hll_increment(ds, _words, store)
        return store

    def test_known_overlap_band(self, ray_session, tmp_path):
        from pappermate_ray.stages.sketch import stored_hll_overlap

        # A = docs 0..99 (words 0..1999), B = docs 50..149 (1000..2999)
        a = self._store(tmp_path, "a", 0, 100)
        b = self._store(tmp_path, "b", 50, 150)
        r = stored_hll_overlap(a, b)
        assert abs(r["est_union"] - 3000) <= 0.03 * 3000
        assert abs(r["est_intersection"] - 1000) <= 0.05 * 3000
        assert abs(r["jaccard"] - 1000 / 3000) <= 0.05

    def test_identical_and_disjoint(self, ray_session, tmp_path):
        from pappermate_ray.stages.sketch import stored_hll_overlap

        a = self._store(tmp_path, "ia", 0, 50)
        b = self._store(tmp_path, "ib", 0, 50)
        r = stored_hll_overlap(a, b)
        assert r["est_a"] == r["est_b"] == r["est_union"]
        assert r["jaccard"] == pytest.approx(1.0)
        c = self._store(tmp_path, "ic", 200, 250)
        r2 = stored_hll_overlap(a, c)
        assert r2["jaccard"] <= 0.05  # sketch noise only

    def test_precision_mismatch_raises(self, ray_session, tmp_path):
        from pappermate_ray.stages.sketch import (save_hll_increment,
                                                  stored_hll_overlap)

        a = self._store(tmp_path, "pa", 0, 10)
        b = str(tmp_path / "pb")
        save_hll_increment(
            rd.from_items([{"doc_id": 0, "text": "x y"}]), _words, b, p=12)
        with pytest.raises(ValueError, match="different precisions"):
            stored_hll_overlap(a, b)


class TestGroupedDistinct:
    """Per-group HLL distinct: band accuracy per group, group isolation,
    block-layout invariance of the merged estimate."""

    def _docs(self):
        rows = []
        # lang a: 1500 distinct words; lang b: 300; lang c: 40 (dups)
        for i in range(150):
            rows.append({"lang": "a",
                         "text": " ".join(f"a{j}" for j in
                                          range(i * 10, i * 10 + 10))})
        for i in range(60):
            rows.append({"lang": "b",
                         "text": " ".join(f"b{j}" for j in
                                          range(i * 5, i * 5 + 5))})
        for i in range(30):
            rows.append({"lang": "c",
                         "text": " ".join(f"c{j}" for j in range(40))})
        return rows

    def test_band_and_isolation(self, ray_session):
        from pappermate_ray.stages.sketch import hll_distinct_by_group

        ds = rd.from_items(self._docs(), override_num_blocks=4)
        out = {r["lang"]: r["est_distinct"]
               for r in hll_distinct_by_group(ds, "lang", _words).take_all()}
        assert set(out) == {"a", "b", "c"}
        for lang, exact in (("a", 1500), ("b", 300), ("c", 40)):
            assert abs(out[lang] - exact) <= max(2.0, 0.03 * exact), (
                lang, out[lang])

    def test_block_layout_invariance(self, ray_session):
        from pappermate_ray.stages.sketch import hll_distinct_by_group

        rows = self._docs()
        a = {r["lang"]: r["est_distinct"] for r in hll_distinct_by_group(
            rd.from_items(rows, override_num_blocks=1), "lang",
            _words).take_all()}
        b = {r["lang"]: r["est_distinct"] for r in hll_distinct_by_group(
            rd.from_items(rows, override_num_blocks=7), "lang",
            _words).take_all()}
        assert a == b  # register max-merge is layout-independent


class TestGroupedApproxQuantiles:
    def test_small_values_exact_and_grouped(self, ray_session):
        from pappermate_ray.stages.sketch import grouped_approx_quantiles

        # values < 64 are EXACT hdr buckets -> equals exact quantiles
        rows = [{"g": "a", "v": v} for v in [5, 1, 3, 3, 9]]
        rows += [{"g": "b", "v": v} for v in [10, 20, 30, 40]]
        ds = rd.from_items(rows, override_num_blocks=3)
        out = {r["g"]: (r["q1"], r["q2"], r["q3"])
               for r in grouped_approx_quantiles(
                   ds, "g", "v", [0.25, 0.5, 0.75],
                   ["q1", "q2", "q3"]).take_all()}
        assert out["a"] == (3, 3, 5)      # same hand CDF as the exact op
        assert out["b"] == (10, 20, 30)

    def test_relative_error_bound_large_values(self, ray_session):
        from pappermate_ray.stages.sketch import grouped_approx_quantiles

        rng = np.random.default_rng(11)
        vals = rng.integers(1, 1_000_000, 4000)
        ds = rd.from_items([{"g": "x", "v": int(v)} for v in vals],
                           override_num_blocks=5)
        out = grouped_approx_quantiles(ds, "g", "v", [0.5], ["p50"]).take_all()
        est = out[0]["p50"]
        true = int(np.sort(vals)[max(0, int(np.ceil(0.5 * len(vals))) - 1)])
        assert abs(est - true) <= true / 32  # one bucket width (1/64) + slack

    def test_layout_invariance(self, ray_session):
        from pappermate_ray.stages.sketch import grouped_approx_quantiles

        rows = [{"g": "a" if i % 3 else "b", "v": i * 37 % 100000}
                for i in range(500)]
        a = {r["g"]: r["p50"] for r in grouped_approx_quantiles(
            rd.from_items(rows, override_num_blocks=1), "g", "v",
            [0.5]).take_all()}
        b = {r["g"]: r["p50"] for r in grouped_approx_quantiles(
            rd.from_items(rows, override_num_blocks=9), "g", "v",
            [0.5]).take_all()}
        assert a == b


class TestStatsStore:
    """Additive-stats store: increment merge == one-shot aggregate,
    read-only merged view, append-only growth."""

    def test_two_increments_equal_oneshot(self, ray_session, tmp_path):
        from ray.data.aggregate import Count as _C, Sum as _S

        from pappermate_ray.stages.statstore import (save_stats_increment,
                                                     stored_stats)

        rows = [{"g": "a" if i % 3 else "b", "v": float(i % 7)}
                for i in range(300)]
        store = str(tmp_path / "stats")
        save_stats_increment(rd.from_items(rows[:180]), store, ["g"], "v")
        save_stats_increment(rd.from_items(rows[180:]), store, ["g"], "v")
        merged = {r["g"]: (r["n_events"], round(r["sum_value"], 6))
                  for r in stored_stats(store, ["g"]).take_all()}
        oneshot = {r["g"]: (r["n_events"], round(r["sum_value"], 6))
                   for r in rd.from_items(rows).groupby("g").aggregate(
                       _C(alias_name="n_events"),
                       _S("v", alias_name="sum_value")).take_all()}
        assert merged == oneshot

    def test_merge_is_read_only(self, ray_session, tmp_path):
        import os

        from pappermate_ray.stages.statstore import (save_stats_increment,
                                                     stored_stats)

        store = str(tmp_path / "ro")
        save_stats_increment(
            rd.from_items([{"g": "x", "v": 1.0}]), store, ["g"], "v")
        before = sorted(os.path.join(dp, f)
                        for dp, _, fs in os.walk(store) for f in fs)
        stored_stats(store, ["g"]).take_all()
        after = sorted(os.path.join(dp, f)
                       for dp, _, fs in os.walk(store) for f in fs)
        assert before == after


class TestHdrStore:
    """Persisted HDR store: increment merge == one-shot sketch,
    read-only reads, append-only growth."""

    def test_increments_equal_oneshot(self, ray_session, tmp_path):
        from pappermate_ray.stages.sketch import (approx_quantiles,
                                                  save_hdr_increment,
                                                  stored_quantiles)

        rng = np.random.default_rng(5)
        vals = [int(v) for v in rng.integers(1, 500_000, 3000)]
        store = str(tmp_path / "hdr")
        save_hdr_increment(
            rd.from_items([{"v": v} for v in vals[:1700]]), "v", store)
        save_hdr_increment(
            rd.from_items([{"v": v} for v in vals[1700:]]), "v", store)
        merged = stored_quantiles(store, [0.25, 0.5, 0.9])
        oneshot, _ = approx_quantiles(
            rd.from_items([{"v": v} for v in vals]), "v", [0.25, 0.5, 0.9])
        assert merged == oneshot  # histogram addition is exact

    def test_read_only(self, ray_session, tmp_path):
        import os

        from pappermate_ray.stages.sketch import (save_hdr_increment,
                                                  stored_quantiles)

        store = str(tmp_path / "ro")
        save_hdr_increment(rd.from_items([{"v": 7}]), "v", store)
        before = sorted(os.path.join(dp, f)
                        for dp, _, fs in os.walk(store) for f in fs)
        assert stored_quantiles(store, [0.5]) == [7]
        after = sorted(os.path.join(dp, f)
                       for dp, _, fs in os.walk(store) for f in fs)
        assert before == after
