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


class TestCcnetBuckets:
    def test_carry_cols_pass_through_filtered(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.lm import perplexity_score, train_bigram_lm

        train = rd.from_items([{"doc_id": 0, "text": "a b a b"}])
        m = train_bigram_lm(train)
        ds = rd.from_items([
            {"doc_id": 1, "text": "a b", "lang": "en"},
            {"doc_id": 2, "text": "a", "lang": "fr"},   # <2 tokens: dropped
            {"doc_id": 3, "text": "b a", "lang": "de"},
        ])
        out = {r["doc_id"]: r["lang"] for r in
               perplexity_score(ds, m, carry_cols=("lang",)).take_all()}
        assert out == {1: "en", 3: "de"}

    def test_buckets_split_by_language(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.lm import ccnet_buckets, train_bigram_lm

        # en: clean docs repeat the trained phrase, dirty ones are OOV;
        # fr has its own scale so thresholds must be per-language
        def tier(j: int, clean: str, i: int) -> str:
            if j < 4:
                return clean                       # head tier
            if j < 6:
                return clean + f" junk{i}"         # middle: one OOV tail token
            return f"junk{i} weird{i} noise{i} blob{i}"  # tail: fully OOV

        rows = [{"doc_id": i, "lang": "en",
                 "text": tier(i, "good clean text here", i)} for i in range(8)]
        rows += [{"doc_id": i, "lang": "fr",
                  "text": tier(i - 8, "bon texte propre ici", i)}
                 for i in range(8, 16)]
        ds = rd.from_items(rows, override_num_blocks=3)
        m = train_bigram_lm(rd.from_items(
            [{"doc_id": 100, "text": "good clean text here"},
             {"doc_id": 101, "text": "bon texte propre ici"}]))
        out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(ds, m).take_all()}
        assert len(out) == 16
        for i in range(16):
            j = i % 8
            want = "head" if j < 4 else ("middle" if j < 6 else "tail")
            assert out[i] == want, (i, out[i], want)
