"""Tests for joins, sampling, dedup, similarity, quality, multimodal ops."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    rows = []
    base = [
        "the quick brown fox jumps over the lazy dog again and again in the field",
        "completely different text about ray data pipelines and arrow batches here",
        "a third document that shares nothing with the others at all in any way",
    ]
    for i in range(30):
        rows.append({"doc_id": i, "text": base[i % 3] + f" tail {i}"})
    # planted near-dups: 100+i is doc i with one word appended
    for i in range(3):
        rows.append({"doc_id": 100 + i, "text": base[i] + f" tail {i}" + " extra"})
    # planted exact dup of doc 0
    rows.append({"doc_id": 200, "text": base[0] + " tail 0"})
    return rd.from_items(rows)


class TestJoins:
    def test_broadcast_lookup(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.joins import broadcast_lookup

        ds = rd.from_items([{"k": 1}, {"k": 2}, {"k": 9}])
        out = broadcast_lookup(ds, {1: "a", 2: "b"}, "k", "v").take_all()
        assert {(r["k"], r["v"]) for r in out} == {(1, "a"), (2, "b"), (9, None)}

    def test_broadcast_semi_anti(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.joins import broadcast_anti, broadcast_semi

        ds = rd.from_items([{"k": i} for i in range(10)])
        semi = sorted(r["k"] for r in broadcast_semi(ds, [2, 4, 99], "k").take_all())
        anti = sorted(r["k"] for r in broadcast_anti(ds, [2, 4, 99], "k").take_all())
        assert semi == [2, 4]
        assert anti == [0, 1, 3, 5, 6, 7, 8, 9]

    def test_hash_join(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.joins import hash_join

        left = rd.from_items([{"k": i, "a": i * 10} for i in range(6)])
        right = rd.from_items([{"rk": i, "b": i * 100} for i in range(3, 9)])
        out = hash_join(left, right, on="k", right_on="rk", num_partitions=4).take_all()
        got = sorted((r["k"], r["a"], r["b"]) for r in out)
        assert got == [(3, 30, 300), (4, 40, 400), (5, 50, 500)]


class TestSalting:
    def test_salted_equals_plain(self, ray_session):
        import ray.data as rd
        from ray.data.aggregate import Count, Sum

        from pappermate_ray.ops.salt import salted_count_sum

        # heavy skew: 90% of rows share one key
        rows = [{"k": "hot" if i % 10 else f"k{i}", "v": float(i % 7)} for i in range(2000)]
        ds = rd.from_items(rows)
        salted = {
            r["k"]: (r["n"], round(r["total"], 6))
            for r in salted_count_sum(ds, "k", "v", n_salts=8).take_all()
        }
        plain = {
            r["k"]: (r["n"], round(r["total"], 6))
            for r in ds.groupby("k").aggregate(
                Count(alias_name="n"), Sum("v", alias_name="total")
            ).take_all()
        }
        assert salted == plain
        assert salted["hot"][0] == 1800


class TestSample:
    def test_stratified_head(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.sample import stratified_head

        ds = rd.from_items(
            [{"g": g, "id": i} for g in ("x", "y") for i in range(10)]
        )
        out = stratified_head(ds, "g", "id", 3).take_all()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r["id"])
        assert sorted(by_g["x"]) == [0, 1, 2]
        assert sorted(by_g["y"]) == [0, 1, 2]

    def test_grouped_quantiles_discrete_rule(self, ray_session):
        """idx = max(0, ceil(q*n) - 1) into the sorted multiset, incl.
        ties and uneven group sizes — checked against a hand CDF."""
        import ray.data as rd

        from pappermate_ray.ops.quantiles import grouped_quantiles

        rows = [{"g": "a", "v": v} for v in [5, 1, 3, 3, 9]]  # sorted: 1,3,3,5,9
        rows += [{"g": "b", "v": v} for v in [10, 20, 30, 40]]
        # >1 block so the partial-count + shuffle path is exercised
        ds = rd.from_items(rows, override_num_blocks=3)
        out = {
            r["g"]: r
            for r in grouped_quantiles(
                ds, "g", "v", [0.25, 0.5, 0.75], ["q1", "q2", "q3"]
            ).take_all()
        }
        # n=5: idx(0.25)=ceil(1.25)-1=1 -> 3; idx(0.5)=2 -> 3; idx(0.75)=3 -> 5
        assert (out["a"]["q1"], out["a"]["q2"], out["a"]["q3"]) == (3, 3, 5)
        # n=4: idx(0.25)=0 -> 10; idx(0.5)=1 -> 20; idx(0.75)=2 -> 30
        assert (out["b"]["q1"], out["b"]["q2"], out["b"]["q3"]) == (10, 20, 30)

    def test_grouped_bottomk_exact_k_and_deterministic(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.sample import grouped_bottomk_sample

        rows = [{"g": g, "id": i} for g in ("x", "y") for i in range(20)]
        rows += [{"g": "tiny", "id": 99}]  # group smaller than k
        ds = rd.from_items(rows, override_num_blocks=4)
        out = grouped_bottomk_sample(ds, "g", "id", k=3).take_all()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], set()).add(r["id"])
        assert len(by_g["x"]) == 3 and len(by_g["y"]) == 3
        assert by_g["tiny"] == {99}
        # block layout must not change the selection
        out2 = grouped_bottomk_sample(
            rd.from_items(rows, override_num_blocks=1), "g", "id", k=3
        ).take_all()
        assert {(r["g"], r["id"]) for r in out2} == {(r["g"], r["id"]) for r in out}


class TestWeightedSample:
    @staticmethod
    def _prio(i, w, salt="ws42"):
        import hashlib

        return max(hashlib.md5(f"{i}:{salt}:{j}".encode()).hexdigest()
                   for j in range(w))

    def test_bruteforce_equivalence_and_block_invariance(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.sample import weighted_bottomk_sample

        rows = [{"id": i, "w": 1 + i % 4} for i in range(40)]
        want = {r["id"] for r in sorted(
            rows, key=lambda r: self._prio(r["id"], r["w"]), reverse=True)[:7]}
        for blocks in (1, 5):
            ds = rd.from_items(rows, override_num_blocks=blocks)
            out = weighted_bottomk_sample(ds, "id", "w", k=7).take_all()
            assert {r["id"] for r in out} == want

    def test_zero_weight_excluded_and_cap(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from pappermate_ray.ops.sample import weighted_bottomk_sample

        ds = rd.from_items([{"id": 0, "w": 0}, {"id": 1, "w": 2},
                            {"id": 2, "w": 0}])
        out = weighted_bottomk_sample(ds, "id", "w", k=3).take_all()
        assert [r["id"] for r in out] == [1]
        bad = rd.from_items([{"id": 0, "w": 1000}])
        with _pytest.raises(Exception, match="max_weight"):
            weighted_bottomk_sample(bad, "id", "w", k=1).take_all()

    def test_weight_proportional_bias(self):
        """Distribution property of the max-of-w-uniforms key (no Ray:
        the priority function IS the sampler): over many salts, a
        weight-8 row must beat a weight-1 row for the single slot far
        more often — and roughly 8:1."""
        wins = {1: 0, 8: 0}
        for s in range(300):
            p1 = self._prio("a", 1, salt=f"s{s}")
            p8 = self._prio("b", 8, salt=f"s{s}")
            wins[8 if p8 > p1 else 1] += 1
        frac8 = wins[8] / 300
        assert 0.80 <= frac8 <= 0.97  # expect 8/9 ≈ 0.889


class TestPrefixSum:
    def test_matches_serial_scan_across_buckets(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.prefix import prefix_sum_by_int_key

        # keys out of order across blocks, values vary; bucket_size=4
        # forces multiple buckets and exercises the base-offset scan
        vals = {k: (k * 13) % 7 + 1 for k in range(37)}
        items = [{"k": k, "v": v} for k, v in vals.items()]
        items = items[::2] + items[1::2]  # interleave so blocks aren't sorted
        ds = rd.from_items(items, override_num_blocks=5)
        out = prefix_sum_by_int_key(ds, "k", "v", bucket_size=4).take_all()
        expect, acc = {}, 0
        for k in sorted(vals):
            expect[k] = acc
            acc += vals[k]
        assert {r["k"]: r["offset"] for r in out} == expect


class TestDedup:
    def test_latest_by_url(self, ray_session):
        import datetime as dt

        import ray.data as rd

        from pappermate_ray.stages.dedup import latest_by_url

        e = dt.datetime(2024, 1, 1)
        rows = [
            {"url": "u1", "warc_ts": e, "html": b"old"},
            {"url": "u1", "warc_ts": e + dt.timedelta(days=2), "html": b"newest"},
            {"url": "u1", "warc_ts": e + dt.timedelta(days=1), "html": b"mid"},
            {"url": "u2", "warc_ts": e, "html": b"only"},
        ]
        out = {r["url"]: r["html"] for r in latest_by_url(rd.from_items(rows)).take_all()}
        assert out == {"u1": b"newest", "u2": b"only"}

    def test_exact(self, docs_ds):
        from pappermate_ray.stages.dedup import exact_dedup

        out = exact_dedup(docs_ds, "doc_id", "text").take_all()
        dups = [r for r in out if r["dup_count"] > 1]
        assert len(dups) == 1
        assert dups[0]["keep_id"] == 0  # min id wins
        assert dups[0]["dup_count"] == 2

    def test_minhash_lsh(self, docs_ds):
        from pappermate_ray.stages.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(docs_ds, "doc_id", "text", threshold=0.5).take_all()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        for i in range(3):
            assert (i, 100 + i) in got  # planted near-dups found
        assert (0, 200) in got  # exact dup is also a near-dup
        # no cross-template pairs
        assert not any(a % 3 != (b % 3 if b < 100 else b % 100 % 3) for a, b in got if a < 30 and b < 30)

    def test_minhash_estimate_tracks_exact_jaccard(self, docs_ds):
        """Signature-estimated Jaccard must track exact word-shingle
        Jaccard within MinHash error bounds (~1/sqrt(64) ≈ 0.125 std)."""
        from pappermate_ray.functions.dedupfn import jaccard, shingles
        from pappermate_ray.stages.dedup import minhash_lsh_pairs

        texts = {r["doc_id"]: r["text"] for r in docs_ds.take_all()}
        pairs = minhash_lsh_pairs(docs_ds, "doc_id", "text", threshold=0.4).take_all()
        assert pairs
        for r in pairs:
            exact = jaccard(shingles(texts[r["id_a"]]), shingles(texts[r["id_b"]]))
            assert abs(r["est_jaccard"] - exact) < 0.35, (r, exact)

    def test_simhash(self, docs_ds):
        from pappermate_ray.stages.dedup import simhash_pairs

        pairs = simhash_pairs(docs_ds, "doc_id", "text", max_hamming=10).take_all()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 200) in got  # exact dup → hamming 0
        assert all(r["hamming"] <= 10 for r in pairs)

    def test_cluster_pairs_and_keep_list(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.dedup import cluster_pairs, keep_list

        # chain 1-2-3, pair 10-11, singleton edge 20-21
        pairs = rd.from_items(
            [{"id_a": 1, "id_b": 2, "est_jaccard": 0.9},
             {"id_a": 2, "id_b": 3, "est_jaccard": 0.9},
             {"id_a": 10, "id_b": 11, "est_jaccard": 0.8},
             {"id_a": 20, "id_b": 21, "est_jaccard": 0.7}]
        )
        clusters = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(pairs).take_all()}
        assert clusters == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}
        keeps = {r["cluster_id"]: (r["keep_id"], r["n_members"])
                 for r in keep_list(cluster_pairs(pairs)).take_all()}
        assert keeps == {1: (1, 3), 10: (10, 2), 20: (20, 2)}

    def test_cluster_pairs_distributed_path(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.dedup import cluster_pairs

        # force the min-label-propagation path with a tiny threshold;
        # chain 0-1-2-...-9 must collapse to cluster 0
        pairs = rd.from_items(
            [{"id_a": i, "id_b": i + 1, "est_jaccard": 1.0} for i in range(9)]
        )
        out = {r["doc_id"]: r["cluster_id"]
               for r in cluster_pairs(pairs, max_rounds=12, driver_threshold=0).take_all()}
        assert out == {i: 0 for i in range(10)}

    def test_ngram_verify(self, docs_ds):
        from pappermate_ray.stages.dedup import verify_pairs_ngram_jaccard

        out = verify_pairs_ngram_jaccard(
            docs_ds, [(0, 100), (0, 1)], "doc_id", "text", threshold=0.6
        )
        rows = out.to_pylist()
        assert [(r["id_a"], r["id_b"]) for r in rows] == [(0, 100)]
        assert rows[0]["jaccard"] > 0.8


class TestSimilarity:
    def test_knn_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.similarity import knn_scatter_gather

        rng = np.random.RandomState(7)
        X = rng.normal(size=(50, 8))
        ds = rd.from_items(
            [{"vec_id": i, "embedding": X[i].tolist()} for i in range(50)]
        )
        q_ids = np.array([0, 1])
        out = knn_scatter_gather(ds, X[:2], q_ids, k=3).take_all()
        # numpy reference
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ Xn[:2].T
        for j, qid in enumerate(q_ids):
            col = sims[:, j].copy()
            col[qid] = -np.inf
            want = set(np.argsort(-col, kind="stable")[:3].tolist())
            got = {r["neighbor_id"] for r in out if r["query_id"] == qid}
            assert got == want

    def test_hard_negatives_match_bruteforce(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.similarity import hard_negative_topk

        rng = np.random.RandomState(11)
        X = rng.normal(size=(60, 8))
        labels = np.arange(60) % 4
        ds = rd.from_items(
            [{"vec_id": i, "embedding": X[i].tolist(), "label": int(labels[i])}
             for i in range(60)]
        )
        q_ids = np.array([0, 1])
        out = hard_negative_topk(ds, X[:2], q_ids, labels[:2], k=4).take_all()
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ Xn[:2].T
        for j, qid in enumerate(q_ids):
            col = sims[:, j].copy()
            col[labels == labels[qid]] = -np.inf  # same class (incl. self) out
            want = set(np.argsort(-col, kind="stable")[:4].tolist())
            got = {r["neighbor_id"] for r in out if r["query_id"] == qid}
            assert got == want
            # every mined negative really is cross-class
            assert all(labels[n] != labels[qid] for n in got)

    def test_hard_negatives_string_labels(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.similarity import hard_negative_topk

        # query is axis-aligned with its own class; the only other class
        # member must still win because same-label rows are masked.
        X = np.array([[1.0, 0.0], [0.99, 0.14], [0.0, 1.0]])
        ds = rd.from_items(
            [{"vec_id": i, "embedding": X[i].tolist(), "label": lab}
             for i, lab in enumerate(["en", "en", "de"])]
        )
        out = hard_negative_topk(ds, X[:1], np.array([0]),
                                 np.array(["en"]), k=2).take_all()
        assert [(r["query_id"], r["neighbor_id"]) for r in out] == [(0, 2)]

    def test_ivf_recall_vs_exact(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.similarity import ivf_knn, knn_scatter_gather

        rng = np.random.RandomState(3)
        X = rng.normal(size=(300, 16))
        ds = rd.from_items(
            [{"vec_id": i, "embedding": X[i].tolist()} for i in range(300)]
        )
        qids = np.array([0, 1, 2])
        exact = knn_scatter_gather(ds, X[:3], qids, k=5).take_all()
        approx = ivf_knn(ds, X[:3], qids, k=5, n_centroids=8, n_probe=4).take_all()
        recalls = []
        for qid in qids:
            e = {r["neighbor_id"] for r in exact if r["query_id"] == qid}
            a = {r["neighbor_id"] for r in approx if r["query_id"] == qid}
            recalls.append(len(e & a) / len(e))
        # probing half the lists on random data: recall is decent, not 1.0
        assert sum(recalls) / len(recalls) >= 0.5
        # deterministic across runs
        approx2 = ivf_knn(ds, X[:3], qids, k=5, n_centroids=8, n_probe=4).take_all()
        assert sorted((r["query_id"], r["neighbor_id"]) for r in approx) == sorted(
            (r["query_id"], r["neighbor_id"]) for r in approx2
        )

    def test_lsh_cosine_pairs(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.similarity import lsh_bucketed_cosine_pairs

        rng = np.random.RandomState(11)
        X = rng.normal(size=(40, 64))
        items = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(40)]
        # planted: vec 1000 ≈ vec 5
        v = X[5].copy()
        v[0] += 0.01
        items.append({"vec_id": 1000, "embedding": v.tolist()})
        ds = rd.from_items(items)
        pairs = lsh_bucketed_cosine_pairs(ds, threshold=0.95).take_all()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(5, 1000)}

    def test_lsh_rotated_tables_recall(self, ray_session):
        """n_tables=4: rotated tables only ADD recall (superset of the
        single table), find every planted pair on a fixture where one
        table provably misses some (the sf0.1 embeddings evidence), and
        dedup cross-table repeats to one row per pair."""
        import ray.data as rd

        from pappermate_ray.stages.similarity import lsh_bucketed_cosine_pairs

        rng = np.random.RandomState(3)
        X = rng.normal(size=(150, 64))
        items = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(150)]
        for i in range(150):  # a planted near-dup for EVERY vector
            v = X[i].copy()
            v[0] += 0.01
            items.append({"vec_id": 10_000 + i, "embedding": v.tolist()})
        ds = rd.from_items(items)
        one = {(r["id_a"], r["id_b"]) for r in lsh_bucketed_cosine_pairs(
            ds, threshold=0.95).take_all()}
        four_rows = lsh_bucketed_cosine_pairs(ds, threshold=0.95,
                                              n_tables=4).take_all()
        four = {(r["id_a"], r["id_b"]) for r in four_rows}
        assert len(four_rows) == len(four)  # cross-table dedup
        assert one <= four
        assert four == {(i, 10_000 + i) for i in range(150)}


class TestQualityStage:
    def test_columns(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.quality import analyze_text_batch

        ds = rd.from_items([{"doc_id": 0, "text": "the cat and the dog sat on the mat"}])
        row = ds.map_batches(analyze_text_batch, batch_format="pyarrow").take_all()[0]
        assert row["pred_lang"] == "en"
        assert row["n_tokens"] == 9
        assert 0 <= row["quality"] <= 1
        assert isinstance(row["fingerprint"], int)


class TestMultimodal:
    def test_fake_decode_deterministic(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.multimodal import MediaFeatureExtract, synth_media_table

        ds = rd.from_arrow(synth_media_table(20))
        out = ds.map_batches(
            MediaFeatureExtract, batch_format="pyarrow", batch_size=8,
            concurrency=(1, 2), fn_constructor_kwargs={"fake": True},
        ).take_all()
        assert len(out) == 20
        assert all(r["decode_status"] == "ok" for r in out)
        assert all(len(r["features"]) == 16 for r in out)
        # payload column dropped before any downstream shuffle
        assert "payload" not in out[0]

    def test_real_resize_and_frame_sample(self, ray_session):
        """REAL codec paths: BMP decode→resample→re-encode, and RVID
        seek-decoded frame sampling."""
        import ray.data as rd

        from pappermate_ray.functions.media import decode_bmp
        from pappermate_ray.stages.multimodal import FrameSample, MediaResize, synth_media_table

        media = rd.from_arrow(synth_media_table(30))
        resized = media.map_batches(
            MediaResize, batch_format="pyarrow", batch_size=16, concurrency=1,
            fn_constructor_kwargs={"max_side": 64},
        )
        rows = resized.take_all()
        imgs = [r for r in rows if r["media_type"] == "image"]
        assert imgs
        for r in imgs:
            assert max(r["meta_width"], r["meta_height"]) <= 64
            # payload was really re-encoded: decode and check the dims match
            out = decode_bmp(r["payload"])
            assert out.shape == (r["meta_height"], r["meta_width"], 3)

        frames = resized.map_batches(
            FrameSample, batch_format="pyarrow", batch_size=16, concurrency=1,
            fn_constructor_kwargs={"n_frames": 3},
        ).take_all()
        vids = [r for r in frames if r["media_type"] == "video"]
        n_videos = sum(1 for r in rows if r["media_type"] == "video")
        assert len(vids) == 3 * n_videos  # every synth video has ≥4 frames
        # frame indices are a uniform sample over the container
        by_media = {}
        for r in vids:
            by_media.setdefault(r["media_id"], {})[r["frame"]] = tuple(r["features"])
        for fs in by_media.values():
            assert len(fs) == 3
            assert 0 in fs  # first frame always sampled
            vals = list(fs.values())
            assert vals[0] != vals[1]  # distinct frames → distinct real features

    def test_real_decode_all_ok_and_soft_fail(self):
        import pyarrow as pa

        from pappermate_ray.stages.multimodal import (
            MEDIA_SCHEMA, MediaFeatureExtract, synth_media_table)

        stage = MediaFeatureExtract()
        out = stage(synth_media_table(9))
        assert out["decode_status"].to_pylist() == ["ok"] * 9
        feats = out["features"].to_pylist()
        assert all(any(abs(v) > 0 for v in f) for f in feats)  # real, nonzero

        # malformed payload soft-fails its row only
        bad = pa.Table.from_pylist(
            [{"media_id": 99, "media_type": "image", "payload": b"junkbytes",
              "meta_width": 8, "meta_height": 8, "meta_duration_ms": 0}],
            schema=MEDIA_SCHEMA)
        res = stage(bad)
        assert res["decode_status"].to_pylist() == ["error"]
        assert "BMP" in res["decode_error"][0].as_py()


class TestHivePartitionedWrite:
    def test_supplier_partitioned_layout(self, ray_session, tmp_path):
        """S15: organized output written Hive-partitioned by supplier
        (the reference's shutil.move-into-supplier-folders, as layout)."""
        import os

        import ray.data as rd

        from pappermate_ray.fixtures import build_pages_table
        from pappermate_ray.pipelines.extract_pipeline import build_extraction_pipeline
        from pappermate_ray.pipelines.organize import organize

        docs = build_extraction_pipeline(rd.from_arrow(build_pages_table(80)), batch_size=64)
        org = organize(docs).select_columns(["url", "canonical_filename", "supplier_dir"])
        out = str(tmp_path / "hive")
        org.write_parquet(out, partition_cols=["supplier_dir"])
        dirs = [d for d in os.listdir(out) if d.startswith("supplier_dir=")]
        assert len(dirs) > 1  # multiple supplier partitions
        back = rd.read_parquet(out)
        assert back.count() == 80


class TestReportsOrganize:
    def test_reports_and_organize(self, ray_session):
        import ray.data as rd

        from pappermate_ray.fixtures import build_pages_table
        from pappermate_ray.pipelines.extract_pipeline import build_extraction_pipeline
        from pappermate_ray.pipelines.organize import organize
        from pappermate_ray.pipelines.reports import (
            contract_type_histogram,
            party_histogram,
            status_report,
        )

        docs = build_extraction_pipeline(rd.from_arrow(build_pages_table(120)), batch_size=64)
        statuses = {r["status"]: r["n_docs"] for r in status_report(docs).take_all()}
        assert statuses.get("converted", 0) > 0 and statuses.get("error", 0) > 0
        hist = contract_type_histogram(docs).take_all()
        assert sum(r["n_docs"] for r in hist) == statuses["converted"]
        # histogram sorted by count desc (T3)
        counts = [r["n_docs"] for r in hist]
        assert counts == sorted(counts, reverse=True)
        parties = party_histogram(docs).take_all()
        assert any(r["party"].startswith("TechCorp") for r in parties)
        org = organize(docs).take_all()
        assert all(r["canonical_filename"].endswith(".pdf") for r in org)
        assert any(r["supplier_dir"] == "Unknown" for r in org)


def test_weighted_mixture_sample_rates_and_default(ray_session):
    """Hash-coin mixture: observed rates track weights; unknown groups
    fall back to default_weight (0 = dropped entirely); w>=1 keeps all."""
    import pyarrow as pa

    import ray.data as rd

    from pappermate_ray.ops.sample import weighted_mixture_sample

    n = 4000
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "g": pa.array(["a", "b", "c", "zz"][0:1] * 0 +
                      [["a", "b", "c", "zz"][i % 4] for i in range(n)], pa.string()),
    })
    out = weighted_mixture_sample(
        rd.from_arrow(t), "g", "id", {"a": 0.25, "b": 1.0, "c": 0.5},
    ).to_pandas()
    counts = out.g.value_counts()
    assert "zz" not in counts                  # default_weight=0
    assert counts["b"] == n // 4               # w>=1 keeps every row
    assert abs(counts["a"] / (n // 4) - 0.25) < 0.06
    assert abs(counts["c"] / (n // 4) - 0.50) < 0.06
    # deterministic: same call → same rows
    again = weighted_mixture_sample(
        rd.from_arrow(t), "g", "id", {"a": 0.25, "b": 1.0, "c": 0.5},
    ).to_pandas()
    assert sorted(out.id) == sorted(again.id)


def test_grouped_zscore_semantics(ray_session):
    """Per-group mean-0 (within rounding), all-equal group -> z=0."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from pappermate_ray.ops.normalize import grouped_zscore

    t = pa.table({
        "g": pa.array(["a"] * 6 + ["flat"] * 4),
        "v": pa.array([1, 2, 3, 4, 5, 6] + [7, 7, 7, 7], pa.int64()),
    })
    out = grouped_zscore(rd.from_arrow(t), "g", "v").to_pandas()
    assert (out[out.g == "flat"].z == 0.0).all()
    za = out[out.g == "a"].z
    assert abs(za.mean()) < 1e-6 and abs(za.std(ddof=0) - 1.0) < 1e-6


class TestSemanticDecontaminate:
    def test_drops_bench_and_near_copies_only(self, ray_session):
        """Planted leaks (cosine ~0.9999) and the bench vectors
        themselves (cosine=1) drop; random vectors (natural max cosine
        well under 0.9 at d=64) all survive."""
        import ray.data as rd

        from pappermate_ray.stages.similarity import semantic_decontaminate

        rng = np.random.RandomState(7)
        X = rng.normal(size=(60, 64))
        items = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(60)]
        # bench = vectors 0..4; planted paraphrase of bench 2 and 4
        for b in (2, 4):
            v = X[b].copy()
            v[0] += 0.01
            items.append({"vec_id": 1000 + b, "embedding": v.tolist()})
        corpus = rd.from_items(items)
        bench = rd.from_items(items[:5])
        kept = semantic_decontaminate(corpus, bench, threshold=0.9)
        got = sorted(r["vec_id"] for r in kept.take_all())
        assert got == list(range(5, 60))

    def test_empty_bench_passthrough(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.similarity import semantic_decontaminate

        rng = np.random.RandomState(9)
        items = [{"vec_id": i, "embedding": rng.normal(size=8).tolist()}
                 for i in range(10)]
        corpus = rd.from_items(items)
        bench = rd.from_items(items).filter(lambda r: False)
        assert semantic_decontaminate(corpus, bench).count() == 10

    def test_sharded_bench_identical(self, ray_session):
        """max_bench smaller than the bench set forces the multi-shard
        AND path; output must equal the single-broadcast run."""
        import ray.data as rd

        from pappermate_ray.stages.similarity import semantic_decontaminate

        rng = np.random.RandomState(13)
        X = rng.normal(size=(40, 32))
        items = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(40)]
        corpus = rd.from_items(items)
        bench = rd.from_items(items[:7])
        one = sorted(r["vec_id"] for r in
                     semantic_decontaminate(corpus, bench).take_all())
        sharded = sorted(r["vec_id"] for r in semantic_decontaminate(
            corpus, bench, max_bench=3).take_all())
        assert one == sharded == list(range(7, 40))

    def test_zero_norm_rows_kept(self, ray_session):
        """Zero embeddings carry no cosine evidence: a zero corpus row
        survives, a zero bench row drops nothing (the SQL oracle guards
        the NaN-cosine path the same way)."""
        import ray.data as rd

        from pappermate_ray.stages.similarity import semantic_decontaminate

        rng = np.random.RandomState(21)
        items = [{"vec_id": i, "embedding": rng.normal(size=16).tolist()}
                 for i in range(10)]
        items.append({"vec_id": 100, "embedding": [0.0] * 16})  # zero corpus row
        corpus = rd.from_items(items)
        bench = rd.from_items([items[0],
                               {"vec_id": 200, "embedding": [0.0] * 16}])
        kept = sorted(r["vec_id"] for r in
                      semantic_decontaminate(corpus, bench).take_all())
        assert kept == list(range(1, 10)) + [100]


class TestRollupCube:
    def _ds(self, blocks=3):
        import ray.data as rd

        rows = [{"a": "x", "b": "p", "v": 1.0}, {"a": "x", "b": "q", "v": 2.0},
                {"a": "y", "b": "p", "v": 4.0}, {"a": "y", "b": "p", "v": 8.0}]
        return rd.from_items(rows, override_num_blocks=blocks)

    def test_rollup_levels(self, ray_session):
        from pappermate_ray.ops.rollup import rollup_sum

        out = {(r["a"], r["b"]): r["s"]
               for r in rollup_sum(self._ds(), ["a", "b"], "v", "s").take_all()}
        assert out == {("x", "p"): 1.0, ("x", "q"): 2.0, ("y", "p"): 12.0,
                       ("x", None): 3.0, ("y", None): 12.0,
                       (None, None): 15.0}

    def test_cube_adds_b_margin(self, ray_session):
        from pappermate_ray.ops.rollup import cube_sum

        out = {(r["a"], r["b"]): r["s"]
               for r in cube_sum(self._ds(), ["a", "b"], "v", "s").take_all()}
        assert out[(None, "p")] == 13.0 and out[(None, "q")] == 2.0
        assert out[(None, None)] == 15.0 and out[("x", "p")] == 1.0
        assert len(out) == 8  # 3 finest + 2 a-margin + 2 b-margin + 1 total

    def test_int_sum_type_stable(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.rollup import rollup_sum

        ds = rd.from_items([{"a": "x", "v": 2}, {"a": "y", "v": 3}])
        rows = rollup_sum(ds, ["a"], "v", "s").take_all()
        assert {r["s"] for r in rows} == {2, 3, 5}
        assert all(isinstance(r["s"], int) for r in rows)


class TestQuantileBucket:
    def test_quartiles_hand_cdf(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.quantiles import quantile_bucket

        # values 1..8: quantile_disc edges at .25/.5/.75 = 2, 4, 6
        ds = rd.from_items([{"id": i, "v": i} for i in range(1, 9)],
                           override_num_blocks=3)
        out = {r["v"]: r["bucket"]
               for r in quantile_bucket(ds, "v", 4).take_all()}
        # edge-equal values stay LOW: 2->1, 4->2, 6->3
        assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}

    def test_skewed_ties(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.quantiles import quantile_bucket

        # 90% of rows share one value: it IS several edges; all its rows
        # land in bucket 1 (<= edge), the tail fills the top bucket
        rows = [{"v": 5}] * 18 + [{"v": 9}, {"v": 11}]
        out = quantile_bucket(rd.from_items(rows, override_num_blocks=4),
                              "v", 4).take_all()
        got = {(r["v"], r["bucket"]) for r in out}
        assert got == {(5, 1), (9, 4), (11, 4)}

    def test_rejects_single_bucket(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from pappermate_ray.ops.quantiles import quantile_bucket

        with _pytest.raises(ValueError, match="n_buckets"):
            quantile_bucket(rd.from_items([{"v": 1}]), "v", 1)


class TestCohortRetention:
    def test_hand_computed_windows(self, ray_session):
        from datetime import datetime

        import ray.data as rd

        from pappermate_ray.ops.retention import cohort_retention

        def ev(u, h, m=0):
            return {"user_id": u, "ts": datetime(2024, 1, 1, h, m)}

        rows = [
            ev(1, 9), ev(1, 9, 30), ev(1, 10),       # u1: 9->10 retained
            ev(2, 9),                                  # u2: 9 only
            ev(3, 10), ev(3, 11),                      # u3: 10->11 retained
            ev(4, 9), ev(4, 11),                       # u4: gap, not adjacent
        ]
        out = {r["window_start"].hour: (r["n_active"], r["n_retained"])
               for r in cohort_retention(
                   rd.from_items(rows, override_num_blocks=3),
                   "user_id", "ts").take_all()}
        assert out[9] == (3, 1)    # u1,u2,u4 active; only u1 returns at 10
        assert out[10] == (2, 1)   # u1,u3; u3 returns at 11
        assert out[11] == (2, 0)   # u3,u4; last window
        assert len(out) == 3       # no phantom windows from shifted markers

    def test_day_unit_and_bad_unit(self, ray_session):
        from datetime import datetime

        import pytest as _pytest
        import ray.data as rd

        from pappermate_ray.ops.retention import cohort_retention

        rows = [{"user_id": 1, "ts": datetime(2024, 1, d, h)}
                for d, h in [(1, 9), (1, 23), (2, 1)]]
        out = cohort_retention(rd.from_items(rows), "user_id", "ts",
                               unit="day").take_all()
        got = {r["window_start"].day: (r["n_active"], r["n_retained"])
               for r in out}
        assert got == {1: (1, 1), 2: (1, 0)}
        with _pytest.raises(ValueError, match="unit"):
            cohort_retention(rd.from_items(rows), "user_id", "ts",
                             unit="week")


class TestFunnelTransitions:
    def _events(self):
        from datetime import datetime

        import ray.data as rd

        def ev(u, m, t, eid):
            return {"user_id": u, "ts": datetime(2024, 1, 1, 9, m),
                    "event_type": t, "event_id": eid}

        rows = [
            # u1 completes view->click->purchase
            ev(1, 0, "view", 1), ev(1, 5, "click", 2), ev(1, 9, "purchase", 3),
            # u2: click BEFORE view -> depth 1 only (view found, no later click)
            ev(2, 0, "click", 4), ev(2, 5, "view", 5),
            # u3: view then click, no purchase
            ev(3, 0, "view", 6), ev(3, 2, "click", 7), ev(3, 4, "error", 8),
            # u4: nothing relevant
            ev(4, 0, "error", 9),
        ]
        return rd.from_items(rows, override_num_blocks=3)

    def test_funnel_cascade(self, ray_session):
        from pappermate_ray.ops.funnel import funnel_counts

        out = {r["step"]: r["n_users"]
               for r in funnel_counts(self._events(), "user_id", "ts",
                                      "event_type",
                                      ["view", "click", "purchase"]).take_all()}
        assert out == {"view": 3, "click": 2, "purchase": 1}

    def test_funnel_strict_ts_rule(self, ray_session):
        from datetime import datetime

        import ray.data as rd

        from pappermate_ray.ops.funnel import funnel_counts

        # click shares the view's timestamp: strict > means depth 1
        rows = [{"user_id": 1, "ts": datetime(2024, 1, 1, 9), "event_type": t,
                 "event_id": i} for i, t in enumerate(["view", "click"])]
        out = {r["step"]: r["n_users"]
               for r in funnel_counts(rd.from_items(rows), "user_id", "ts",
                                      "event_type", ["view", "click"]).take_all()}
        assert out == {"view": 1, "click": 0}

    def test_transitions_lag_parity(self, ray_session):
        from pappermate_ray.ops.funnel import event_transitions

        out = {(r["prev_type"], r["next_type"]): r["n"]
               for r in event_transitions(self._events(), "user_id", "ts",
                                          "event_type", "event_id").take_all()}
        assert out == {("view", "click"): 2, ("click", "purchase"): 1,
                       ("click", "view"): 1, ("click", "error"): 1}


class TestTemperatureSample:
    def test_rates_and_kept_set(self, ray_session):
        import hashlib
        import math

        import ray.data as rd

        from pappermate_ray.ops.sample import temperature_sample

        rows = ([{"g": "big", "id": i} for i in range(400)]
                + [{"g": "small", "id": 1000 + i} for i in range(100)])
        out, rates = temperature_sample(
            rd.from_items(rows, override_num_blocks=4), "g", "id")
        assert rates["small"] == 1.0
        assert rates["big"] == math.sqrt(100 / 400)

        def kept(i, rate):
            h = hashlib.md5(f"{i}:alpha42".encode()).hexdigest()[:8]
            thr = "gggggggg" if rate >= 1 else format(int(rate * 16**8), "08x")
            return h < thr

        want = {r["id"] for r in rows if kept(r["id"], rates[r["g"]])}
        got = {r["id"] for r in out.take_all()}
        assert got == want
        # every small-group row survives; big group is thinned
        assert all(1000 + i in got for i in range(100))
        assert 0 < sum(1 for i in got if i < 1000) < 400

    def test_alpha_one_keeps_everything(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.sample import temperature_sample

        rows = [{"g": g, "id": i} for i, g in enumerate("aabbbbbb")]
        out, rates = temperature_sample(rd.from_items(rows), "g", "id",
                                        alpha=1.0)
        assert all(r == 1.0 for r in rates.values())
        assert out.count() == len(rows)


class TestPivot:
    def test_pivot_counts_and_sum(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.pivot import pivot_counts, pivot_sum

        rows = [{"s": "a", "g": "x", "v": 1.5}, {"s": "a", "g": "x", "v": 2.5},
                {"s": "a", "g": "y", "v": 4.0}, {"s": "b", "g": "y", "v": 8.0},
                {"s": "b", "g": "zzz-unknown", "v": 99.0}]
        ds = rd.from_items(rows, override_num_blocks=2)
        got = {r["s"]: (r["n_x"], r["n_y"])
               for r in pivot_counts(ds, "s", "g", ["x", "y"],
                                     out_prefix="n_").take_all()}
        assert got == {"a": (2, 1), "b": (0, 1)}  # unknown cat dropped
        gots = {r["s"]: (r["x"], r["y"])
                for r in pivot_sum(ds, "s", "g", "v", ["x", "y"]).take_all()}
        assert gots == {"a": (4.0, 4.0), "b": (0.0, 8.0)}

    def test_pivot_int64_cells_exact_above_2_53(self, ray_session):
        # the widen path must never route int64 cells through a
        # float64-NaN placeholder (2^53+1 would come back off by one)
        import ray.data as rd

        from pappermate_ray.ops.pivot import pivot_counts

        big = (1 << 53) + 1
        rows = ([{"s": "a", "g": "x"}] * 3) + [{"s": "a", "g": "y"}]
        ds = rd.from_items(rows)
        # patch-free check of the scatter itself: run _widen on a
        # finest table carrying a pre-aggregated count above 2^53
        import pandas as pd

        from pappermate_ray.ops.pivot import _widen
        import pyarrow as pa

        finest = rd.from_arrow(pa.table({
            "s": ["a", "a", "b"],
            "g": ["x", "y", "x"],
            "n": pa.array([big, 7, 5], pa.int64()),
        }))
        got = {r["s"]: (r["n_x"], r["n_y"])
               for r in _widen(finest, "s", "g", "n", ["x", "y"],
                               "n_", pa.int64()).take_all()}
        assert got == {"a": (big, 7), "b": (5, 0)}
        # and the public API still counts correctly
        got2 = {r["s"]: (r["n_x"], r["n_y"])
                for r in pivot_counts(ds, "s", "g", ["x", "y"],
                                      out_prefix="n_").take_all()}
        assert got2 == {"a": (3, 1)}


class TestJoinCardinality:
    def test_exact_fanout_count(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.estimate import join_cardinality

        left = rd.from_items(
            [{"k": k} for k in [1, 1, 1, 2, 2, 3, 9]],
            override_num_blocks=2)
        right = rd.from_items(
            [{"rk": k} for k in [1, 1, 2, 3, 3, 3, 7]],
            override_num_blocks=2)
        # 1: 3*2=6, 2: 2*1=2, 3: 1*3=3 -> 11; 9 and 7 don't match
        assert join_cardinality(left, right, on="k", right_on="rk") == 11

    def test_limit_guard(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from pappermate_ray.ops.estimate import join_cardinality

        left = rd.from_items([{"k": i} for i in range(10)])
        right = rd.from_items([{"k": i} for i in range(10)])
        with _pytest.raises(ValueError, match="broadcast_limit"):
            join_cardinality(left, right, on="k", broadcast_limit=5)


class TestAutoJoin:
    def _sides(self):
        import ray.data as rd

        left = rd.from_items([{"k": i % 5, "a": i} for i in range(20)],
                             override_num_blocks=3)
        right = rd.from_items([{"rk": 0, "b": "x"}, {"rk": 1, "b": "y"},
                               {"rk": 1, "b": "z"},  # dup key: fan-out
                               {"rk": 9, "b": "w"}], override_num_blocks=2)
        return left, right

    def _want(self):
        rmap = {0: ["x"], 1: ["y", "z"], 9: ["w"]}
        out = []
        for i in range(20):
            for b in rmap.get(i % 5, []):
                out.append((i % 5, i, b))
        return sorted(out)

    def test_broadcast_path_equals_hash_path(self, ray_session):
        from pappermate_ray.ops.joins import auto_join, hash_join

        left, right = self._sides()
        bc = auto_join(left, right, on="k", right_on="rk",
                       broadcast_rows=100)
        assert sorted((r["k"], r["a"], r["b"])
                      for r in bc.take_all()) == self._want()
        hj = hash_join(left, right, on="k", right_on="rk")
        assert sorted((r["k"], r["a"], r["b"])
                      for r in hj.take_all()) == self._want()

    def test_threshold_flips_to_hash(self, ray_session):
        from pappermate_ray.ops.joins import auto_join

        left, right = self._sides()
        out = auto_join(left, right, on="k", right_on="rk",
                        broadcast_rows=1)  # force the shuffle plan
        assert sorted((r["k"], r["a"], r["b"])
                      for r in out.take_all()) == self._want()

    def test_unique_key_fast_path(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.joins import auto_join

        left = rd.from_items([{"k": i, "a": i * 2} for i in range(8)])
        right = rd.from_items([{"k": i, "c": i * 10} for i in range(4, 12)])
        out = auto_join(left, right, on="k", broadcast_rows=100).take_all()
        assert sorted((r["k"], r["a"], r["c"]) for r in out) == [
            (4, 8, 40), (5, 10, 50), (6, 12, 60), (7, 14, 70)]
