"""BM25 retrieval (stages/search.py) — hand-computed scores on a tiny
corpus, posting layout, and ranking cut."""

import math

import pytest
import ray.data as rd


class TestBM25:
    @pytest.fixture()
    def corpus(self, ray_session):
        import ray.data as rd

        return rd.from_items(
            [
                {"doc_id": 1, "text": "x x y"},
                {"doc_id": 2, "text": "x z"},
                {"doc_id": 3, "text": "z z z z"},
            ],
            override_num_blocks=2,
        )

    def test_postings_layout(self, corpus):
        from pappermate_ray.stages.search import build_postings

        rows = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
                for r in build_postings(corpus).take_all()}
        assert rows[("x", 1)] == (2, 3)
        assert rows[("y", 1)] == (1, 3)
        assert rows[("x", 2)] == (1, 2)
        assert rows[("z", 3)] == (4, 4)

    def test_scores_hand_computed(self, corpus):
        from pappermate_ray.stages.search import bm25_topk

        out = bm25_topk(corpus, ["x"], k=2).take_all()
        # N=3 avgdl=3 df(x)=2 -> idf = ln(1 + 1.5/2.5)
        idf = math.log(1.6)
        s1 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3))
        s2 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 3))
        assert [r["doc_id"] for r in out] == [1, 2]
        assert out[0]["score"] == round(s1, 4)
        assert out[1]["score"] == round(s2, 4)

    def test_k_cut_and_no_match(self, corpus):
        from pappermate_ray.stages.search import bm25_topk

        assert len(bm25_topk(corpus, ["x", "z"], k=1).take_all()) == 1
        assert bm25_topk(corpus, ["missingterm"], k=5).take_all() == []


class TestPhraseSearch:
    def test_counts_and_overlaps(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.search import phrase_search

        ds = rd.from_items([
            {"doc_id": 1, "text": "a b c a b c"},     # 2 matches of 'a b c'
            {"doc_id": 2, "text": "a b x c"},          # none
            {"doc_id": 3, "text": "a a b c"},          # 1
            {"doc_id": 4, "text": ""},
        ], override_num_blocks=2)
        out = {r["doc_id"]: r["n_matches"]
               for r in phrase_search(ds, ["a", "b", "c"]).take_all()}
        assert out == {1: 2, 3: 1}

    def test_repeated_phrase_terms(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.search import phrase_search

        ds = rd.from_items([
            {"doc_id": 1, "text": "the cat the dog"},   # 'the cat the' once
            {"doc_id": 2, "text": "the cat cat the"},   # no
            {"doc_id": 3, "text": "the the cat the"},   # match at pos 1
        ])
        out = {r["doc_id"]: r["n_matches"]
               for r in phrase_search(ds, ["the", "cat", "the"]).take_all()}
        assert out == {1: 1, 3: 1}

    def test_single_token_phrase_counts_occurrences(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.search import phrase_search

        ds = rd.from_items([{"doc_id": 1, "text": "x y x z x"}])
        out = phrase_search(ds, ["x"]).take_all()
        assert out == [{"doc_id": 1, "n_matches": 3}]


class TestPersistedIndex:
    """build_text_index / text_index_add / bm25_search_index: the
    persisted, append-only inverted index must score exactly like
    bm25_topk over the union corpus."""

    def _docs(self, n=40):
        vocab = ["vector", "hash", "stream", "data", "ray", "arrow",
                 "batch", "engine"]
        rows = []
        for i in range(n):
            words = [vocab[(i + j) % len(vocab)] for j in range(3 + i % 5)]
            rows.append({"doc_id": i, "text": " ".join(words)})
        return rows

    def test_two_increments_equal_union_bm25(self, ray_session, tmp_path):
        from pappermate_ray.stages.search import (bm25_search_index,
                                                  bm25_topk,
                                                  build_text_index,
                                                  text_index_add)

        rows = self._docs()
        idx = str(tmp_path / "ix")
        build_text_index(
            rd.from_items([r for r in rows if r["doc_id"] % 2 == 0],
                          override_num_blocks=3), idx)
        text_index_add(
            rd.from_items([r for r in rows if r["doc_id"] % 2 == 1],
                          override_num_blocks=3), idx)

        q = ["vector", "stream", "ray"]
        want = [(r["doc_id"], r["score"]) for r in
                bm25_topk(rd.from_items(rows), q, k=10).take_all()]
        got = [(r["doc_id"], r["score"]) for r in
               bm25_search_index(idx, q, k=10).take_all()]
        assert got == want and len(got) == 10

    def test_search_is_readonly_and_deterministic(self, ray_session,
                                                  tmp_path):
        import os

        from pappermate_ray.stages.search import (bm25_search_index,
                                                  build_text_index)

        idx = str(tmp_path / "ro")
        build_text_index(rd.from_items(self._docs(20)), idx)
        before = sorted(os.path.join(d, f)
                        for d, _, fs in os.walk(idx) for f in fs)
        a = bm25_search_index(idx, ["vector", "hash"], k=5).take_all()
        b = bm25_search_index(idx, ["vector", "hash"], k=5).take_all()
        assert a == b and len(a) == 5
        after = sorted(os.path.join(d, f)
                       for d, _, fs in os.walk(idx) for f in fs)
        assert before == after

    def test_absent_terms(self, ray_session, tmp_path):
        from pappermate_ray.stages.search import (bm25_search_index,
                                                  build_text_index)

        idx = str(tmp_path / "abs")
        build_text_index(rd.from_items(self._docs(10)), idx)
        # mixed present/absent: absent term contributes nothing
        out = bm25_search_index(idx, ["vector", "zzzznope"], k=5).take_all()
        assert len(out) == 5 and all(r["score"] > 0 for r in out)
        # all absent: empty result, no crash
        assert bm25_search_index(idx, ["zzzznope"], k=5).take_all() == []

    def test_added_docs_shift_idf(self, ray_session, tmp_path):
        """Appending an increment changes N and df — scores must reflect
        the UNION corpus, not the first increment (catches stale-stats
        bugs)."""
        from pappermate_ray.stages.search import (bm25_search_index,
                                                  build_text_index,
                                                  text_index_add)

        idx = str(tmp_path / "grow")
        build_text_index(
            rd.from_items([{"doc_id": 0, "text": "rare word here"}]), idx)
        s1 = bm25_search_index(idx, ["rare"], k=1).take_all()[0]["score"]
        text_index_add(
            rd.from_items([{"doc_id": i, "text": "common filler text"}
                           for i in range(1, 9)]), idx)
        s2 = bm25_search_index(idx, ["rare"], k=1).take_all()[0]["score"]
        assert s2 > s1  # N grew, df stayed 1 → idf rose


# ---------------------------------------------------------------------------
# search_snippets (KWIC)
# ---------------------------------------------------------------------------

def test_snippet_window_and_pos(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.search import search_snippets

    ds = rd.from_items([
        {"doc_id": 1, "text": "a b c target d e f"},
        {"doc_id": 2, "text": "target x y"},
        {"doc_id": 3, "text": "no hit here"},
        {"doc_id": 4, "text": "z target z target"},  # first occurrence wins
    ])
    got = {r["doc_id"]: (r["pos"], r["snippet"])
           for r in search_snippets(ds, "target", window=2).take_all()}
    assert got == {
        1: (3, "b c target d e"),
        2: (0, "target x y"),
        4: (1, "z target z target"),
    }


def test_snippet_token_boundary_not_substring(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.search import search_snippets

    ds = rd.from_items([
        {"doc_id": 1, "text": "retargeting is not target-ing"},
        {"doc_id": 2, "text": "the target stands alone"},
    ])
    got = [r["doc_id"] for r in search_snippets(ds, "target").take_all()]
    assert got == [2]


class TestSnippetWhitespaceContract:
    """Advisor finding: the gate (RE2 \\s), the tokenizer and the SQL
    mirror must share ONE whitespace rule — the RE2 ASCII class. NBSP
    is NOT a separator under that rule."""

    def test_nbsp_is_not_a_separator(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.search import search_snippets

        ds = rd.from_items([
            # NBSP glues 'window' to its neighbor: NOT a token
            {"doc_id": 1, "text": "a window closed"},
            {"doc_id": 2, "text": "the window pane here"},
            # ASCII-separated: a real token, NBSP inside other tokens
            {"doc_id": 3, "text": "big one window stays"},
        ])
        out = {r["doc_id"]: r for r in
               search_snippets(ds, "window", window=1).take_all()}
        assert set(out) == {3}
        assert out[3]["pos"] == 1
        assert out[3]["snippet"] == "big one window stays"

    def test_tab_newline_split_like_oracle(self, ray_session):
        import ray.data as rd

        from pappermate_ray.stages.search import search_snippets

        ds = rd.from_items([{"doc_id": 1, "text": "a\tb\nwindow  c"}])
        out = search_snippets(ds, "window", window=1).take_all()
        # repeated ASCII whitespace collapses like the oracle's \s+
        assert out[0]["pos"] == 2
        assert out[0]["snippet"] == "b window c"


class TestTextIndexGroupCommit:
    """Round-5 group-atomic text-index increments: a kill between the
    three sub-writes must leave the increment INVISIBLE, and the retry
    must not double-count."""

    def _docs(self, lo, hi):
        import ray.data as rd

        return rd.from_items(
            [{"doc_id": i, "text": f"common term{i % 3} word{i}"}
             for i in range(lo, hi)], override_num_blocks=2)

    def test_uncommitted_increment_is_invisible_and_retry_clean(
            self, ray_session, tmp_path):
        import os
        import shutil

        from pappermate_ray.stages.search import (bm25_search_index,
                                                  text_index_add)

        idx = str(tmp_path / "ti")
        text_index_add(self._docs(0, 10), idx)
        base = {r["doc_id"]: r["score"]
                for r in bm25_search_index(idx, ["common"], k=20).take_all()}

        # simulate a kill AFTER postings/df landed but BEFORE the commit
        # marker: copy the committed add_00000 dirs to add_00001 without
        # a marker
        for sub in ("postings", "df", "stats"):
            shutil.copytree(os.path.join(idx, sub, "add_00000"),
                            os.path.join(idx, sub, "add_00001"))
        mid = {r["doc_id"]: r["score"]
               for r in bm25_search_index(idx, ["common"], k=20).take_all()}
        assert mid == base  # orphan increment invisible

        # retry of the "killed" add overwrites the orphans at index 1
        text_index_add(self._docs(10, 20), idx)
        out = {r["doc_id"]
               for r in bm25_search_index(idx, ["common"], k=40).take_all()}
        assert out == set(range(20))

    def test_legacy_markerless_index_adopted(self, ray_session, tmp_path):
        import os
        import shutil

        from pappermate_ray.stages.search import (bm25_search_index,
                                                  text_index_add)

        idx = str(tmp_path / "ti2")
        text_index_add(self._docs(0, 10), idx)
        shutil.rmtree(os.path.join(idx, "commits"))  # make it "legacy"
        got = {r["doc_id"]
               for r in bm25_search_index(idx, ["common"], k=20).take_all()}
        assert got == set(range(10))  # marker-less dirs still count
        text_index_add(self._docs(10, 20), idx)  # adopt + append
        got = {r["doc_id"]
               for r in bm25_search_index(idx, ["common"], k=40).take_all()}
        assert got == set(range(20))
