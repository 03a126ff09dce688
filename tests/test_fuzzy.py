"""Edit-distance near-dup (stages/fuzzy): SymSpell deletion-neighbourhood
blocking recall, vectorized Levenshtein DP, pair multiplicities, the
spell-correction lookup join, and guards."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pappermate_ray.stages.fuzzy import (deletion_variants, fuzzy_match_lookup,
                                         fuzzy_pairs, levenshtein_batch)


def _ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


class TestLevenshteinBatch:
    def test_matches_reference_dp(self):
        rng = np.random.default_rng(7)
        alpha = "abcde"
        pairs = [("".join(rng.choice(list(alpha), rng.integers(0, 12))),
                  "".join(rng.choice(list(alpha), rng.integers(0, 12))))
                 for _ in range(200)]
        got = levenshtein_batch([a for a, _ in pairs], [b for _, b in pairs])
        want = [_ref_lev(a, b) for a, b in pairs]
        assert got.tolist() == want

    def test_edges(self):
        assert levenshtein_batch([], []).tolist() == []
        assert levenshtein_batch(["", "abc", "", "abc"],
                                 ["", "", "xy", "abc"]).tolist() == [0, 3, 2, 0]

    def test_unicode(self):
        assert levenshtein_batch(["café", "naïve"],
                                 ["cafe", "naive"]).tolist() == [1, 1]


class TestDeletionVariants:
    def test_counts_and_membership(self):
        vs = deletion_variants("abcd", 2)
        # C(4,0)+C(4,1)+C(4,2) = 1+4+6, all distinct for distinct chars
        assert len(vs) == 11
        assert "abcd" in vs and "cd" in vs and "abd" in vs

    def test_shared_variant_theorem_sampled(self):
        # exhaustive recall check: any pair within lev<=2 shares a variant
        rng = np.random.default_rng(3)
        words = ["".join(rng.choice(list("abc"), 6)) for _ in range(40)]
        for i in range(len(words)):
            for j in range(i + 1, len(words)):
                if _ref_lev(words[i], words[j]) <= 2:
                    vi = set(deletion_variants(words[i], 2))
                    vj = set(deletion_variants(words[j], 2))
                    assert vi & vj, (words[i], words[j])


class TestFuzzyPairs:
    def _corpus(self):
        rows = []
        # "alpha bolt" x3, "alpho bolt" x2 (dist 1), "alpha colt" (dist 1),
        # "zebra ring" (far), "zebru ring" (dist 1 from zebra ring)
        for name, c in [("alpha bolt", 3), ("alpho bolt", 2),
                        ("alpha colt", 1), ("zebra ring", 1),
                        ("zebru ring", 1), ("qq", 1), ("qx", 1)]:
            rows += [{"name": name}] * c
        return rd.from_items(rows, override_num_blocks=3)

    def test_pairs_exact_vs_bruteforce(self, ray_session):
        out = fuzzy_pairs(self._corpus(), "name", max_dist=2)
        got = {(r["name_a"], r["name_b"]): (r["dist"], r["cnt_a"], r["cnt_b"])
               for r in out.take_all()}
        names = {"alpha bolt": 3, "alpho bolt": 2, "alpha colt": 1,
                 "zebra ring": 1, "zebru ring": 1, "qq": 1, "qx": 1}
        want = {}
        ns = sorted(names)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                d = _ref_lev(ns[i], ns[j])
                if d <= 2:
                    want[(ns[i], ns[j])] = (d, names[ns[i]], names[ns[j]])
        assert got == want
        # the short-string pair rides the empty-variant bucket
        assert ("qq", "qx") in got

    def test_long_value_raises(self, ray_session):
        ds = rd.from_items([{"name": "x" * 80}])
        with pytest.raises(Exception, match="max_len"):
            fuzzy_pairs(ds, "name", max_len=64).take_all()

    def test_max_bucket_drops_storms(self, ray_session):
        # 60 strings all within dist<=1 of "aaaa" share its variants:
        # bucket cap drops the storm, far pair survives
        rows = [{"name": f"aaa{c}"} for c in "abcdefghijklmnopqrstuvwxyz"]
        rows += [{"name": "zzzz"}, {"name": "zzzy"}]
        ds = rd.from_items(rows, override_num_blocks=2)
        out = fuzzy_pairs(ds, "name", max_dist=1, max_bucket=5).take_all()
        got = {(r["name_a"], r["name_b"]) for r in out}
        assert ("zzzy", "zzzz") in got
        assert all(not (a.startswith("aaa") and b.startswith("aaa"))
                   for a, b in got)


class TestFuzzyLookup:
    def test_nearest_dictionary_entry(self, ray_session):
        ds = rd.from_items([{"w": "recieve"}, {"w": "receive"},
                            {"w": "xylophone"}, {"w": "retreive"},
                            {"w": ""}], override_num_blocks=2)
        out = fuzzy_match_lookup(ds, "w", ["receive", "believe", "retrieve"],
                                 max_dist=2)
        got = {r["w"]: (r["w_match"], r["w_match_dist"])
               for r in out.take_all()}
        # "recieve" is dist 2 from ALL THREE entries and "retreive" from
        # two — the lexicographic tie-break picks the smallest, pinning
        # the documented tie rule
        assert got["recieve"] == ("believe", 2)
        assert got["receive"] == ("receive", 0)
        assert got["retreive"] == ("receive", 2)
        assert got["xylophone"] == (None, -1)
        assert got[""] == (None, -1)

    def test_tie_breaks_lexicographic(self, ray_session):
        ds = rd.from_items([{"w": "cat"}])
        out = fuzzy_match_lookup(ds, "w", ["cab", "car"], max_dist=1)
        row = out.take_all()[0]
        assert (row["w_match"], row["w_match_dist"]) == ("cab", 1)

    def test_schema_types(self, ray_session):
        ds = rd.from_items([{"w": "abc", "k": 1}])
        t = fuzzy_match_lookup(ds, "w", ["abc"]).schema()
        assert t.base_schema.field("w_match").type == pa.string()
        assert t.base_schema.field("w_match_dist").type == pa.int64()


class TestFuzzyIndex:
    """Persisted SymSpell index: append-only increments, pruned probe,
    equivalence with the broadcast lookup, read-only probes."""

    def _build(self, tmp_path):
        from pappermate_ray.stages.fuzzy import build_fuzzy_index, fuzzy_index_add

        idx = str(tmp_path / "fidx")
        build_fuzzy_index(
            rd.from_items([{"word": "red"}, {"word": "blue"}]), idx)
        fuzzy_index_add(
            rd.from_items([{"word": "cold"}, {"word": "small"},
                           {"word": "new"}]), idx)
        return idx

    def test_match_equals_broadcast_lookup(self, ray_session, tmp_path):
        from pappermate_ray.stages.fuzzy import (fuzzy_match_index,
                                                 fuzzy_match_lookup)

        idx = self._build(tmp_path)
        probe = rd.from_items(
            [{"tok": t} for t in
             ["red", "rex", "old", "hot", "large", "blua", "new", "old"]],
            override_num_blocks=2)
        got = {r["value"]: (r["match"], r["match_dist"])
               for r in fuzzy_match_index(probe, "tok", idx,
                                          max_dist=1).take_all()}
        want_rows = fuzzy_match_lookup(
            probe, "tok", ["red", "blue", "cold", "small", "new"],
            max_dist=1).take_all()
        want = {r["tok"]: (r["tok_match"], r["tok_match_dist"])
                for r in want_rows if r["tok_match"] is not None}
        assert got == want
        assert got["old"] == ("cold", 1)      # cross-increment match
        assert "hot" not in got and "large" not in got

    def test_probe_is_read_only(self, ray_session, tmp_path):
        import os

        from pappermate_ray.stages.fuzzy import fuzzy_match_index

        idx = self._build(tmp_path)
        before = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(idx) for f in fs)
        fuzzy_match_index(rd.from_items([{"tok": "rad"}]), "tok", idx,
                          max_dist=1).take_all()
        after = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(idx) for f in fs)
        assert before == after

    def test_max_bucket_cap(self, ray_session, tmp_path):
        from pappermate_ray.stages.fuzzy import build_fuzzy_index, fuzzy_match_index

        idx = str(tmp_path / "storm")
        # 26 dictionary words all sharing variants of "aaa"
        build_fuzzy_index(
            rd.from_items([{"word": f"aa{c}"} for c in
                           "abcdefghijklmnopqrstuvwxyz"]), idx, max_dist=1)
        probe = rd.from_items([{"tok": "aax"}, {"tok": "zzz"}])
        out = fuzzy_match_index(probe, "tok", idx, max_dist=1,
                                max_bucket=5).take_all()
        # the storm buckets are dropped wholesale -> no aax match survives
        # every bucket it shares with the dictionary... the cap only
        # drops runs > 5; "aax" itself is a dictionary word variant hub
        assert all(r["value"] != "zzz" for r in out)


class TestFuzzyKeepList:
    def test_string_entity_resolution(self, ray_session):
        from pappermate_ray.stages.dedup import cluster_pairs, keep_list
        from pappermate_ray.stages.fuzzy import fuzzy_pairs

        rows = [{"name": n} for n in
                ["cold bolt", "old bolt", "gold bolt",   # one chain cluster
                 "zebra", "zebrb",                        # pair cluster
                 "unrelated thing"]]                      # singleton: absent
        pairs = fuzzy_pairs(rd.from_items(rows), "name", max_dist=1)
        pairs = pairs.map_batches(
            lambda t: pa.table({"id_a": t["name_a"], "id_b": t["name_b"]}),
            batch_format="pyarrow")
        out = {r["cluster_id"]: (r["keep_id"], r["n_members"])
               for r in keep_list(cluster_pairs(pairs)).take_all()}
        assert out == {"cold bolt": ("cold bolt", 3),
                       "zebra": ("zebra", 2)}
