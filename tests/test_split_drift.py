"""split_assign (ops/sample.py) and corpus_drift (stages/dsir.py)."""

import pytest


class TestSplitAssign:
    def test_every_row_gets_exactly_one_label(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.sample import split_assign

        ds = rd.from_items([{"doc_id": i} for i in range(2000)],
                           override_num_blocks=4)
        out = split_assign(ds, "doc_id").take_all()
        assert len(out) == 2000
        counts = {}
        for r in out:
            counts[r["split"]] = counts.get(r["split"], 0) + 1
        # 90/5/5 within a loose binomial band
        assert 0.85 < counts["train"] / 2000 < 0.95
        assert 0.02 < counts["val"] / 2000 < 0.09
        assert 0.02 < counts["test"] / 2000 < 0.09

    def test_stable_under_repartitioning(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.sample import split_assign

        rows = [{"doc_id": i} for i in range(300)]
        a = {r["doc_id"]: r["split"] for r in split_assign(
            rd.from_items(rows, override_num_blocks=1), "doc_id").take_all()}
        b = {r["doc_id"]: r["split"] for r in split_assign(
            rd.from_items(rows, override_num_blocks=8), "doc_id").take_all()}
        assert a == b

    def test_fractions_must_sum_to_one(self, ray_session):
        import ray.data as rd

        from pappermate_ray.ops.sample import split_assign

        with pytest.raises(ValueError):
            split_assign(rd.from_items([{"doc_id": 1}]), "doc_id",
                         splits=(("train", 0.5), ("val", 0.1)))


class TestCorpusDrift:
    def test_identical_corpora_zero_drift(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.dsir import corpus_drift

        rows = [{"doc_id": i, "text": f"alpha beta w{i % 5}"} for i in range(40)]
        ds = rd.from_items(rows, override_num_blocks=3)
        out = corpus_drift(ds, ds).take_all()[0]
        assert out == {"kl": 0.0, "tv": 0.0}

    def test_shifted_corpus_positive_drift(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.dsir import corpus_drift

        old = rd.from_items([{"doc_id": i, "text": "alpha beta gamma"}
                             for i in range(40)])
        new = rd.from_items([{"doc_id": i, "text": "spam spam buy now"}
                             for i in range(40)])
        out = corpus_drift(old, new).take_all()[0]
        assert out["kl"] > 0.0001 and out["tv"] > 0.0001

    def test_block_invariance(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.dsir import corpus_drift

        old_rows = [{"doc_id": i, "text": f"base w{i % 7} w{i % 3}"}
                    for i in range(50)]
        new_rows = [{"doc_id": i, "text": f"base w{i % 7} drift{i % 4}"}
                    for i in range(50)]
        a = corpus_drift(rd.from_items(old_rows, override_num_blocks=1),
                         rd.from_items(new_rows, override_num_blocks=1)).take_all()
        b = corpus_drift(rd.from_items(old_rows, override_num_blocks=8),
                         rd.from_items(new_rows, override_num_blocks=8)).take_all()
        assert a == b
