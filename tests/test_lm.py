"""Bigram-LM perplexity scoring (stages/lm.py) — hand-computed model
math incl. the OOV/smoothing path, plus emission rules."""

import math

import pytest


class TestBigramLM:
    @pytest.fixture()
    def model_and_ds(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.lm import train_bigram_lm

        train = rd.from_items(
            [{"doc_id": 1, "text": "a b a b"}, {"doc_id": 2, "text": "b c"}],
            override_num_blocks=2,
        )
        return train_bigram_lm(train), rd

    def test_model_counts(self, model_and_ds):
        m, _ = model_and_ds
        assert list(m.vocab) == ["a", "b", "c"]
        assert list(m.uni_n) == [2, 3, 1]
        # pair keys over V+1=4: (a,b)=0*4+1=1 n=2; (b,a)=4 n=1; (b,c)=6 n=1
        assert list(m.big_keys) == [1, 4, 6]
        assert list(m.big_n) == [2, 1, 1]

    def test_score_with_oov(self, model_and_ds):
        m, rd = model_and_ds

        from pappermate_ray.stages.lm import perplexity_score

        ds = rd.from_items(
            [
                {"doc_id": 10, "text": "a b x"},  # (a,b) seen; (b,x) OOV w2
                {"doc_id": 11, "text": "a"},      # no bigram -> not emitted
                {"doc_id": 12, "text": "x y"},    # fully OOV
            ]
        )
        out = {r["doc_id"]: r for r in perplexity_score(ds, m).take_all()}
        assert set(out) == {10, 12}
        # P(b|a)=(2+.5)/(2+1.5); P(x|b)=(0+.5)/(3+1.5)
        lp = math.log(2.5 / 3.5) + math.log(0.5 / 4.5)
        assert out[10]["n_bigrams"] == 2
        assert out[10]["ppl"] == round(math.exp(-lp / 2), 2)
        # P(y|x)=(0+.5)/(0+1.5) -> ppl = 3.0 exactly
        assert out[12]["ppl"] == 3.0

    def test_min_count_prunes(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.lm import train_bigram_lm

        train = rd.from_items([{"doc_id": 1, "text": "a b a b c"}])
        m = train_bigram_lm(train, min_count=2)
        assert list(m.vocab) == ["a", "b"]       # c count 1 pruned
        assert list(m.big_keys) == [1]           # only (a,b) n=2 survives
        assert list(m.big_n) == [2]
