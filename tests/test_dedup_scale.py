"""Round-2 scale-shape tests: the near-dup/curation path must run fully
distributed (no driver-side key sets) and stay correct on a corpus with an
inflated (≥30%) duplicate rate — the 100 TB failure mode the round-1
verdict flagged. Assertions use bounded takes on RESULTS only; the
operators themselves never take_all.
"""

import datetime as dt

import pyarrow as pa
import pytest

import ray.data as rd


def _dup_heavy_corpus(n=300, dup_every=2):
    """n base docs + a near-dup copy of every ``dup_every``-th → ≥33% dups.

    Texts are word-disjoint across docs so the ONLY near-dup structure is
    the planted (i, i + 1_000_000) pairs.
    """
    ids, texts = [], []
    for i in range(n):
        base = f"doc{i} " + " ".join(f"w{i}x{j}" for j in range(30))
        ids.append(i)
        texts.append(base)
        if i % dup_every == 0:
            ids.append(i + 1_000_000)
            texts.append(base + " extra")
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


class TestExactVerifiedMinhash:
    def test_planted_pairs_found_exactly(self, ray_session):
        from pappermate_ray.stages.dedup import minhash_pairs_exact_verified

        ds = _dup_heavy_corpus(n=120)
        pairs = minhash_pairs_exact_verified(ds, "doc_id", "text", threshold=0.8).take_all()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        want = {(i, i + 1_000_000) for i in range(0, 120, 2)}
        assert got == want
        # exact 3-shingle jaccard: 31-word doc → 29 shingles, copy → 30,
        # 29 shared → 29/30
        for r in pairs:  # output rounded to 6 places
            assert r["jaccard"] == pytest.approx(29 / 30, abs=1e-6)

    def test_empty_and_whitespace_docs_excluded(self, ray_session):
        from pappermate_ray.stages.dedup import minhash_pairs_exact_verified

        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "text": pa.array(["", "   ", "alpha beta gamma", "alpha beta gamma delta"],
                                        pa.string())})
        )
        pairs = minhash_pairs_exact_verified(ds, "doc_id", "text", threshold=0.5).take_all()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        # empties never pair; 3-word vs 4-word doc share 1 of 2 shingles
        assert got == {(3, 4)}


class TestCurateHighDupRate:
    def test_clean_corpus_at_33pct_dups(self, ray_session):
        """clean_corpus on a ≥33% dup-rate corpus: one survivor per planted
        cluster, no driver materialization anywhere in the operator chain."""
        from pappermate_ray.pipelines.curate import clean_corpus

        n = 240
        rows = []
        for i in range(n):
            base = (
                f"Document number {i}. " +
                " ".join(f"token{i}word{j} meaning{j}." for j in range(40))
            )
            rows.append({"url": f"https://h/{i}", "text": base, "status": "converted"})
            if i % 2 == 0:
                rows.append({"url": f"https://h/{i}-copy", "text": base + " extra",
                             "status": "converted"})
        docs = rd.from_items(rows)
        out = clean_corpus(docs, quality_min=0.0, dup_threshold=0.8)
        survivors = out.take(batch_size := n * 2)  # bounded take on the result
        urls = {r["url"] for r in survivors}
        assert len(survivors) == len(urls)
        # exactly one survivor per planted (i, i-copy) cluster
        for i in range(0, n, 2):
            assert (f"https://h/{i}" in urls) ^ (f"https://h/{i}-copy" in urls)
        # odd docs are singletons and all survive
        for i in range(1, n, 2):
            assert f"https://h/{i}" in urls
        assert len(urls) == n


class TestLatestByUrlFast:
    def _corpus(self):
        e = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(200):
            url = f"https://site/{i}"
            rows.append({"url": url, "warc_ts": e + dt.timedelta(seconds=i),
                         "html": f"v0-{i}".encode()})
            if i % 3 == 0:
                rows.append({"url": url, "warc_ts": e + dt.timedelta(seconds=i, hours=1),
                             "html": f"v1-{i}".encode()})
            if i % 7 == 0:
                rows.append({"url": url, "warc_ts": e + dt.timedelta(seconds=i) - dt.timedelta(minutes=5),
                             "html": f"old-{i}".encode()})
        return rows

    def test_aggregate_matches_groups_strategy(self, ray_session):
        from pappermate_ray.stages.dedup import latest_by_url

        rows = self._corpus()
        fast = latest_by_url(rd.from_items(rows)).take_all()
        slow = latest_by_url(rd.from_items(rows), strategy="groups").take_all()
        key = lambda rs: sorted((r["url"], r["warc_ts"], r["html"]) for r in rs)
        assert key(fast) == key(slow)
        assert len(fast) == 200

    def test_payload_tiebreak(self, ray_session):
        from pappermate_ray.stages.dedup import latest_by_url

        e = dt.datetime(2024, 1, 1)
        rows = [
            {"url": "u", "warc_ts": e, "html": b"short"},
            {"url": "u", "warc_ts": e, "html": b"the-longer-payload"},
        ]
        out = latest_by_url(rd.from_items(rows)).take_all()
        assert len(out) == 1 and out[0]["html"] == b"the-longer-payload"

    def test_two_pass_parquet_matches_aggregate(self, ray_session, tmp_path):
        """Round-2 verdict item #5: the parquet-backed two-pass variant
        (narrow winner scan → per-file predicate-pushed re-read; the
        payload rides NO exchange) is row-identical to the one-pass
        aggregate strategy whenever (url, max ts) is unique."""
        from pappermate_ray.stages.dedup import latest_by_url, latest_by_url_parquet

        rows = self._corpus()
        path = str(tmp_path / "captures")
        rd.from_items(rows).repartition(6).write_parquet(path)

        key = lambda rs: sorted((r["url"], r["warc_ts"], r["html"]) for r in rs)
        two = latest_by_url_parquet(path).select_columns(
            ["url", "warc_ts", "html"]).take_all()
        one = latest_by_url(rd.read_parquet(path)).select_columns(
            ["url", "warc_ts", "html"]).take_all()
        assert key(two) == key(one)
        assert len(two) == 200

    def test_two_pass_tie_is_deterministic(self, ray_session, tmp_path):
        """Same-timestamp ties break on (file path, first occurrence) —
        a different but equally deterministic rule than the one-pass
        payload tiebreak: two runs agree, exactly one row survives."""
        from pappermate_ray.stages.dedup import latest_by_url_parquet

        e = dt.datetime(2024, 1, 1)
        path = str(tmp_path / "ties")
        rows = [{"url": "u", "warc_ts": e, "html": f"cap-{i}".encode()}
                for i in range(6)] + [
            {"url": "v", "warc_ts": e + dt.timedelta(seconds=i),
             "html": f"v-{i}".encode()} for i in range(3)]
        rd.from_items(rows).repartition(3).write_parquet(path)

        a = sorted((r["url"], r["html"])
                   for r in latest_by_url_parquet(path).take_all())
        b = sorted((r["url"], r["html"])
                   for r in latest_by_url_parquet(path).take_all())
        assert a == b
        assert [u for u, _ in a] == ["u", "v"]
        assert dict(a)["v"] == b"v-2"  # latest ts still wins outright

    def test_two_pass_projection_excluding_keys(self, ray_session, tmp_path):
        """A caller projection WITHOUT url/ts must still work (the
        re-read unions the match keys in, then trims) and return only
        the requested columns."""
        from pappermate_ray.stages.dedup import latest_by_url_parquet

        rows = self._corpus()
        path = str(tmp_path / "proj")
        rd.from_items(rows).repartition(4).write_parquet(path)
        out = latest_by_url_parquet(path, columns=["html"]).take_all()
        assert len(out) == 200
        assert set(out[0]) == {"html"}

    def test_two_pass_negative_timestamps(self, ray_session, tmp_path):
        """Pre-epoch (negative int64) timestamps: the biased rank key
        keeps numeric order — the NEWEST capture wins, not the oldest
        (the unbiased '%020d' form inverts lexicographic order on
        negatives)."""
        from pappermate_ray.stages.dedup import latest_by_url_parquet

        path = str(tmp_path / "neg")
        rows = [
            {"url": "u", "warc_ts": dt.datetime(1969, 1, 1), "html": b"older"},
            {"url": "u", "warc_ts": dt.datetime(1969, 6, 1), "html": b"newer"},
            {"url": "w", "warc_ts": dt.datetime(1969, 6, 1), "html": b"pre"},
            {"url": "w", "warc_ts": dt.datetime(2024, 1, 1), "html": b"post"},
        ]
        rd.from_items(rows).repartition(2).write_parquet(path)
        got = {r["url"]: r["html"]
               for r in latest_by_url_parquet(path).take_all()}
        assert got == {"u": b"newer", "w": b"post"}


class TestBoilerplateStorm:
    """Round-2 verdict item #9: a single hot bucket key holding 30% of
    the corpus (boilerplate storm) must not create an O(n²) straggler
    task or poison the other buckets."""

    _STORM = "storm " + " ".join(f"bp{j} clause{j} footer{j}" for j in range(12))

    def _corpus(self, n=400, storm_frac=0.3):
        ids, texts = [], []
        n_storm = int(n * storm_frac)
        for i in range(n):
            if i < n_storm:  # 30%: byte-identical boilerplate
                ids.append(i)
                texts.append(self._STORM)
                continue
            base = f"doc{i} " + " ".join(f"w{i}x{j} y{i}z{j}" for j in range(15))
            ids.append(i)
            texts.append(base)
            if i % 4 == 0:  # planted near-dup outside the storm
                ids.append(i + 1_000_000)
                texts.append(base + " extra")
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })).repartition(8)

    def test_minhash_cap_drops_storm_keeps_rest(self, ray_session):
        """With max_bucket below the storm size the capped path drops the
        identical-template bucket WHOLESALE (those are exact-dedup's job)
        while every planted non-storm pair is still found exactly — the
        storm neither stalls the job nor bleeds into other buckets."""
        from pappermate_ray.stages.dedup import minhash_pairs_exact_verified

        ds = self._corpus()
        pairs = minhash_pairs_exact_verified(
            ds, "doc_id", "text", threshold=0.8, max_bucket=64).take_all()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        want = {(i, i + 1_000_000) for i in range(120, 400, 4)}
        assert got == want

    def test_minhash_uncapped_recovers_storm_pairs(self, ray_session):
        """max_bucket=0 disables the cap: the same corpus yields the storm
        clique too — the cap is a knob, not a semantics change."""
        from pappermate_ray.stages.dedup import minhash_pairs_exact_verified

        ds = self._corpus(n=160)  # 48 storm docs → C(48,2) = 1128 pairs
        pairs = minhash_pairs_exact_verified(
            ds, "doc_id", "text", threshold=0.8, max_bucket=0).take_all()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        storm = {(a, b) for a in range(48) for b in range(a + 1, 48)}
        planted = {(i, i + 1_000_000) for i in range(48, 160, 4)}
        assert got == storm | planted
        # identical docs: jaccard exactly 1.0 on every storm pair
        assert all(r["jaccard"] == 1.0 for r in pairs
                   if (r["id_a"], r["id_b"]) in storm)

    def test_paragraph_dedup_hot_para_30pct(self, ray_session):
        """paragraph_dedup with one paragraph present in 30% of docs:
        completes on the distributed path and matches brute force — the
        hot paragraph is a grouped count, never a pair explosion."""
        from pappermate_ray.stages.webclean import paragraph_dedup

        n = 1000
        hot = "subscribe to our newsletter and accept all cookies"

        def make(t: pa.Table) -> pa.Table:
            ids = t["id"].to_pylist()
            texts = []
            for i in ids:
                ps = [f"unique body {i} " + " ".join(f"u{i}q{j}" for j in range(5))]
                if i % 10 < 3:  # 30% carry the hot paragraph
                    ps.insert(0, hot)
                texts.append("\n".join(ps))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())})

        ds = rd.range(n, override_num_blocks=16).map_batches(
            make, batch_format="pyarrow")
        out = paragraph_dedup(ds, "doc_id", "text", sep="\n", min_docs=3,
                              broadcast_limit=0)
        got = dict(zip(*[
            pa.concat_tables(list(out.iter_batches(
                batch_size=65536, batch_format="pyarrow"))).column(c).to_pylist()
            for c in ("doc_id", "clean_text")]))
        assert len(got) == n
        for i in range(n):
            assert got[i].startswith("unique body ")
            assert hot not in got[i]


class TestSimhashTables:
    def test_rotated_tables_recall_not_worse(self, ray_session):
        from pappermate_ray.stages.dedup import simhash_pairs

        ds = _dup_heavy_corpus(n=100)
        planted = {(i, i + 1_000_000) for i in range(0, 100, 2)}
        one = {(r["id_a"], r["id_b"])
               for r in simhash_pairs(ds, "doc_id", "text", max_hamming=6).take_all()}
        four = {(r["id_a"], r["id_b"])
                for r in simhash_pairs(ds, "doc_id", "text", max_hamming=6,
                                       n_tables=4).take_all()}
        assert one <= four  # rotated tables only ADD recall
        assert len(four & planted) >= len(one & planted)

    def test_identical_docs_always_found(self, ray_session):
        from pappermate_ray.stages.dedup import simhash_pairs

        ids = list(range(40)) + [i + 1_000_000 for i in range(0, 40, 2)]
        texts = [f"t{i} " + " ".join(f"q{i}z{j}" for j in range(20)) for i in range(40)]
        texts += [texts[i] for i in range(0, 40, 2)]  # verbatim copies
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                     "text": pa.array(texts, pa.string())}))
        got = {(r["id_a"], r["id_b"])
               for r in simhash_pairs(ds, "doc_id", "text", max_hamming=0).take_all()}
        assert got == {(i, i + 1_000_000) for i in range(0, 40, 2)}


class TestArmoredJoins:
    """Ray 2.49 joins crash on sparse keys when a side's first block is
    empty (schema never broadcast). The armor layer in ops/joins.py must
    keep semi/anti/inner correct in exactly those shapes."""

    def _agg_side(self, ray_session):
        from ray.data.aggregate import Count

        t = pa.table({"k": pa.array(["a", "b"], pa.string()),
                      "v": pa.array([1, 2], pa.int64())})
        # grouped aggregate output: emits schema-less empty blocks
        return rd.from_arrow(t).groupby("k").aggregate(Count(alias_name="n"))

    def test_semi_sparse_partitions(self, ray_session):
        from pappermate_ray.ops.joins import semi_join

        left = rd.from_items([{"k": c, "x": i} for i, c in enumerate("abcdef")])
        out = semi_join(left, self._agg_side(ray_session).select_columns(["k"]),
                        on="k", num_partitions=13)
        assert sorted(r["k"] for r in out.take_all()) == ["a", "b"]

    def test_anti_empty_right(self, ray_session):
        import pyarrow.compute as pc

        from pappermate_ray.ops.joins import anti_join

        left = rd.from_items([{"k": c, "x": i} for i, c in enumerate("abc")])
        empty = self._agg_side(ray_session).map_batches(
            lambda t: t.filter(pc.equal(t["k"], "zzz")).select(["k"]),
            batch_format="pyarrow",
        )
        out = anti_join(left, empty, on="k", num_partitions=13)
        assert sorted(r["k"] for r in out.take_all()) == ["a", "b", "c"]

    def test_inner_sparse_partitions(self, ray_session):
        from pappermate_ray.ops.joins import hash_join

        left = self._agg_side(ray_session)
        right = rd.from_items([{"k": "a", "y": 10}, {"k": "z", "y": 99}])
        out = hash_join(left, right, on="k", num_partitions=13)
        rows = out.take_all()
        assert len(rows) == 1 and rows[0]["k"] == "a" and rows[0]["y"] == 10


class TestParagraphDedupScale:
    def test_distributed_path_multiblock_heavy_boilerplate(self, ray_session):
        """4k docs across many blocks, ~2 boilerplate paras per doc
        (~40% of paragraph mass shared): the forced-distributed path
        (broadcast_limit=0 → semi-join + removal-list join) must match a
        brute-force Python reference exactly."""
        from collections import Counter

        from pappermate_ray.stages.webclean import paragraph_dedup

        def make(t: pa.Table) -> pa.Table:
            ids = t["id"].to_pylist()
            texts = []
            for i in ids:
                paras = [f"shared nav bar variant {i % 7}",
                         f"unique body {i} " + " ".join(f"u{i}x{j}" for j in range(6)),
                         f"shared footer block {i % 11}"]
                if i % 3 == 0:
                    paras.insert(1, f"shared promo banner {i % 5}")
                texts.append("\n".join(paras))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())})

        ds = rd.range(4000, override_num_blocks=16).map_batches(
            make, batch_format="pyarrow")

        # brute-force reference
        ref_tb = pa.concat_tables(list(
            ds.iter_batches(batch_size=65536, batch_format="pyarrow")))
        freq = Counter()
        paras_by = {}
        for did, text in zip(ref_tb["doc_id"].to_pylist(), ref_tb["text"].to_pylist()):
            ps = text.split("\n")
            paras_by[did] = ps
            for p in set(ps):
                freq[p] += 1
        hot = {p for p, n in freq.items() if n >= 2}
        expect = {did: "\n".join(p for p in ps if p not in hot)
                  for did, ps in paras_by.items()}

        out = paragraph_dedup(ds, "doc_id", "text", sep="\n", min_docs=2,
                              broadcast_limit=0)
        got_tb = pa.concat_tables(list(
            out.iter_batches(batch_size=65536, batch_format="pyarrow")))
        assert got_tb.num_rows == 4000
        got = dict(zip(got_tb["doc_id"].to_pylist(), got_tb["clean_text"].to_pylist()))
        assert got == expect
        # every doc kept exactly its unique body line
        assert all(v.startswith("unique body ") for v in got.values())


class TestMatchAgainstIndex:
    """Cross-corpus incremental near-dedup: new batch vs a PERSISTED
    LSH signature index (stages/dedup.build_minhash_index +
    match_against_index)."""

    def _old(self, n=40):
        texts = [f"document number {i} about distributed data processing "
                 f"with ray datasets and arrow batches topic {i % 5}"
                 for i in range(n)]
        return rd.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
            override_num_blocks=4)

    def test_planted_recall_and_no_false_fresh(self, ray_session, tmp_path):
        from pappermate_ray.stages.dedup import (build_minhash_index,
                                                 match_against_index)

        idx = str(tmp_path / "idx")
        build_minhash_index(self._old(), idx)
        new_rows = []
        for i in range(0, 40, 4):  # light edits of every 4th old doc
            new_rows.append({
                "doc_id": 1000 + i,
                "text": f"document number {i} about distributed data "
                        f"processing with ray datasets and arrow batches "
                        f"topic {i % 5} updated"})
        for i in range(5):  # genuinely fresh docs
            new_rows.append({"doc_id": 2000 + i,
                             "text": f"completely unrelated recipe for "
                                     f"soup variant {i} with onions"})
        out = match_against_index(
            rd.from_items(new_rows, override_num_blocks=3), idx,
            threshold=0.8).take_all()
        got = {(r["new_id"], r["old_id"]) for r in out}
        # every edited doc matches its source...
        assert {(1000 + i, i) for i in range(0, 40, 4)} <= got
        # ...and no fresh doc matches anything
        assert not any(n >= 2000 for n, _ in got)
        # jaccard values are exact and above threshold
        assert all(r["jaccard"] >= 0.8 for r in out)

    def test_index_is_reusable_and_readonly(self, ray_session, tmp_path):
        import os

        from pappermate_ray.stages.dedup import (build_minhash_index,
                                                 match_against_index)

        idx = str(tmp_path / "idx2")
        build_minhash_index(self._old(), idx)
        files_before = sorted(
            os.path.join(d, f) for d, _, fs in os.walk(idx) for f in fs)
        new = rd.from_items([{
            "doc_id": 1000,
            "text": "document number 8 about distributed data processing "
                    "with ray datasets and arrow batches topic 3 updated"}])
        a = sorted((r["new_id"], r["old_id"])
                   for r in match_against_index(new, idx).take_all())
        b = sorted((r["new_id"], r["old_id"])
                   for r in match_against_index(new, idx).take_all())
        assert a == b and a  # deterministic, non-empty
        files_after = sorted(
            os.path.join(d, f) for d, _, fs in os.walk(idx) for f in fs)
        assert files_before == files_after  # matching never writes

    def test_storm_cap_drops_template_clique(self, ray_session, tmp_path):
        """An identical-template family larger than max_bucket is dropped
        wholesale (exact-dedup's job), while distinct pairs survive."""
        from pappermate_ray.stages.dedup import (build_minhash_index,
                                                 match_against_index)

        storm = ("boilerplate template page with the same exact words "
                 "everywhere in this corpus again and again")
        rows = [{"doc_id": i, "text": storm} for i in range(30)]
        rows.append({"doc_id": 99,
                     "text": "a genuinely unique document about marine "
                             "biology and deep sea exploration topics"})
        idx = str(tmp_path / "idx3")
        build_minhash_index(rd.from_items(rows, override_num_blocks=2), idx)
        new = rd.from_items([
            {"doc_id": 1000, "text": storm + " updated"},
            {"doc_id": 1001,
             "text": "a genuinely unique document about marine biology "
                     "and deep sea exploration topics updated"},
        ])
        capped = {(r["new_id"], r["old_id"]) for r in match_against_index(
            new, idx, max_bucket=8).take_all()}
        # the unique doc's pair survives; the storm clique is capped away
        assert (1001, 99) in capped
        assert not any(o < 30 for _, o in capped)
        # with the cap lifted the storm pairs reappear
        full = {(r["new_id"], r["old_id"]) for r in match_against_index(
            new, idx, max_bucket=0).take_all()}
        assert {(1000, i) for i in range(30)} <= full


class TestSortedBandLayout:
    """Round-5 sorted band layout: the manifest-routed probe must be
    candidate-identical to the legacy tagged-union exchange (same
    buckets, same storm cap), and indexes written BEFORE the layout
    existed (flat band dir, no manifest) must keep working."""

    def _old(self, n=40):
        texts = [f"document number {i} about distributed data processing "
                 f"with ray datasets and arrow batches topic {i % 5}"
                 for i in range(n)]
        return rd.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
            override_num_blocks=4)

    def _new(self):
        rows = []
        for i in range(0, 40, 4):
            rows.append({
                "doc_id": 1000 + i,
                "text": f"document number {i} about distributed data "
                        f"processing with ray datasets and arrow batches "
                        f"topic {i % 5} updated"})
        rows.append({"doc_id": 2000,
                     "text": "completely unrelated recipe for soup"})
        return rd.from_items(rows, override_num_blocks=3)

    def test_legacy_flat_layout_fallback(self, ray_session, tmp_path):
        import os

        from pappermate_ray.stages.dedup import (_band_batch,
                                                 _shingle_set_batch,
                                                 match_against_index)

        # write the ROUND-4 layout by hand: sets + flat bands, no manifest
        idx = str(tmp_path / "legacy")
        sets = self._old().map_batches(
            lambda t: _shingle_set_batch(t, "doc_id", "text", 3),
            batch_format="pyarrow").materialize()
        sets.write_parquet(f"{idx}/sets")
        sets.map_batches(
            lambda t: _band_batch(t, 128, 32),
            batch_format="pyarrow").write_parquet(f"{idx}/bands")
        assert not os.path.exists(f"{idx}/bands_manifest.parquet")
        legacy = {(r["new_id"], r["old_id"])
                  for r in match_against_index(self._new(), idx,
                                               threshold=0.8).take_all()}
        assert {(1000 + i, i) for i in range(0, 40, 4)} <= legacy
        assert not any(n == 2000 for n, _ in legacy)

    def test_sorted_and_legacy_paths_identical(self, ray_session, tmp_path):
        import os

        from pappermate_ray.stages.dedup import (build_minhash_index,
                                                 match_against_index)

        idx = str(tmp_path / "sorted")
        build_minhash_index(self._old(), idx, band_partitions=8)
        new = self._new()
        got_sorted = {(r["new_id"], r["old_id"], r["jaccard"])
                      for r in match_against_index(new, idx,
                                                   threshold=0.8).take_all()}
        # hide the manifest -> same index answers through the legacy
        # union path (the flat read globs the range files)
        man = f"{idx}/bands_manifest.parquet"
        os.rename(man, man + ".bak")
        got_legacy = {(r["new_id"], r["old_id"], r["jaccard"])
                      for r in match_against_index(new, idx,
                                                   threshold=0.8).take_all()}
        os.rename(man + ".bak", man)
        assert got_sorted == got_legacy


def test_exact_verified_driver_and_join_tiers_identical(ray_session):
    """Round-5 bounded driver-verify tier vs the dedupe-aggregate +
    two-join path — identical pair sets and jaccard values."""
    from pappermate_ray.stages.dedup import minhash_pairs_exact_verified

    texts = [f"document number {i} about distributed data processing "
             f"with ray datasets and arrow batches topic {i % 5}"
             for i in range(30)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    for i in range(0, 30, 5):  # light edits -> near-dups
        rows.append({"doc_id": 1000 + i, "text": texts[i] + " updated"})
    ds = rd.from_items(rows, override_num_blocks=4)
    drv = sorted((r["id_a"], r["id_b"], r["jaccard"])
                 for r in minhash_pairs_exact_verified(
                     ds, "doc_id", "text", threshold=0.8).take_all())
    dist = sorted((r["id_a"], r["id_b"], r["jaccard"])
                  for r in minhash_pairs_exact_verified(
                      ds, "doc_id", "text", threshold=0.8,
                      verify_driver_bound=0).take_all())
    assert drv == dist
    assert len(drv) >= 6
