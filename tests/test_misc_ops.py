"""Tests: decode cascade, JSON fences, filename disambiguation,
pattern probe, entity histogram."""

import pyarrow as pa

from pappermate_ray.functions.misc import decode_cascade, md5_operation_hash, strip_json_fences


class TestMisc:
    def test_decode_cascade(self):
        assert decode_cascade("héllo".encode("utf-8")) == ("héllo", "utf-8")
        text, enc = decode_cascade("héllo".encode("latin-1"))
        assert enc == "latin-1" and "h" in text
        assert decode_cascade(b"plain")[0] == "plain"

    def test_json_fences(self):
        assert strip_json_fences('```json\n{"a": 1}\n```') == {"a": 1}
        assert strip_json_fences('{"a": 1}') == {"a": 1}
        assert strip_json_fences("not json") is None
        assert strip_json_fences("") is None

    def test_op_hash_stable(self):
        assert md5_operation_hash("a", "b") == md5_operation_hash("a", "b")
        assert md5_operation_hash("a", "b") != md5_operation_hash("a", "c")


class TestPatternProbe:
    def test_probe_finds_pattern_docs(self, ray_session):
        import ray
        import ray.data as rd

        from pappermate_ray.stages.patternprobe import PatternProbe

        ref = ray.put({"CONTRACT_TYPE": ["Master Service Agreement"]})
        ds = rd.from_items(
            [
                {"url": "u1", "text": "This Master Service Agreement is between parties. It covers services."},
                {"url": "u2", "text": "Totally unrelated text about weather and sports and cooking recipes."},
            ]
        )
        out = ds.map_batches(
            PatternProbe, batch_format="pyarrow", batch_size=8, concurrency=1,
            fn_constructor_kwargs={"patterns_ref": ref, "threshold": 0.3},
        ).take_all()
        urls = {r["url"] for r in out}
        assert "u1" in urls and "u2" not in urls
        assert all("Master Service Agreement" == r["pattern"] for r in out)
        assert all(r["best_segment"] for r in out)


class TestDisambiguate:
    def test_counter_suffix(self, ray_session):
        import ray.data as rd

        from pappermate_ray.pipelines.organize import disambiguate_filenames

        ds = rd.from_items(
            [
                {"url": "a", "canonical_filename": "X_MSA_2024_ID.pdf"},
                {"url": "b", "canonical_filename": "X_MSA_2024_ID.pdf"},
                {"url": "c", "canonical_filename": "X_MSA_2024_ID.pdf"},
                {"url": "d", "canonical_filename": "Y_SOW_2024_ID.pdf"},
            ]
        )
        out = {r["url"]: r["final_filename"] for r in disambiguate_filenames(ds).take_all()}
        assert out["a"] == "X_MSA_2024_ID.pdf"
        assert out["b"] == "X_MSA_2024_ID_1.pdf"
        assert out["c"] == "X_MSA_2024_ID_2.pdf"
        assert out["d"] == "Y_SOW_2024_ID.pdf"


class TestEntityHistogram:
    def test_histogram(self, ray_session):
        from pappermate_ray.queries import q_entity_type_histogram

        rows = q_entity_type_histogram("/root/testdata/sf0.001").take_all()
        counts = {r["entity_type"]: r["n_spans"] for r in rows}
        assert counts.get("CONTRACT_ID", 0) > 0
        assert counts.get("START_DATE", 0) > 0
        assert counts.get("CURRENCY", 0) > 0
