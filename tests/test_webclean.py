"""Web-corpus curation operators (stages/webclean.py): corpus-level
paragraph dedup, Gopher repetition counters, benchmark decontamination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _collect(ds):
    tbs = list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    return pa.concat_tables(tbs).to_pandas() if tbs else pd.DataFrame()


def _corpus():
    """30 docs; docs 0/3/6/... share a boilerplate header, docs 0/5/10...
    share a footer; body paragraphs are unique per doc."""
    import ray.data as rd

    ids, texts = [], []
    for i in range(30):
        paras = []
        if i % 3 == 0:
            paras.append("subscribe to our newsletter")
        paras.append(f"unique body paragraph number {i} alpha")
        paras.append(f"second unique paragraph {i} beta")
        if i % 5 == 0:
            paras.append("all rights reserved footer")
        ids.append(i)
        texts.append("\n".join(paras))
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": pa.array(texts, pa.string())})), texts


def test_paragraph_dedup_removes_boilerplate(ray_session):
    from pappermate_ray.stages.webclean import paragraph_dedup

    ds, _ = _corpus()
    out = _collect(paragraph_dedup(ds, "doc_id", "text", sep="\n", min_docs=2))
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 30
    for _, r in out.iterrows():
        i = r["doc_id"]
        expect_removed = (1 if i % 3 == 0 else 0) + (1 if i % 5 == 0 else 0)
        assert r["n_removed"] == expect_removed, i
        # survivors: exactly the two unique body paragraphs, in order
        assert r["clean_text"] == (
            f"unique body paragraph number {i} alpha\nsecond unique paragraph {i} beta"
        )
        assert r["n_paras"] == 2 + expect_removed


def test_paragraph_dedup_distributed_path_identical(ray_session):
    """broadcast_limit=0 forces the semi-join + rebuild-join fallback;
    output must be byte-identical to the broadcast fast path."""
    from pappermate_ray.stages.webclean import paragraph_dedup

    ds, _ = _corpus()
    fast = _collect(paragraph_dedup(ds, "doc_id", "text", sep="\n", min_docs=2))
    ds2, _ = _corpus()
    dist = _collect(paragraph_dedup(ds2, "doc_id", "text", sep="\n", min_docs=2,
                                    broadcast_limit=0))
    fast = fast.sort_values("doc_id").reset_index(drop=True)
    dist = dist.sort_values("doc_id").reset_index(drop=True)[fast.columns]
    pd.testing.assert_frame_equal(fast, dist)


def test_paragraph_dedup_no_hot_paragraphs(ray_session):
    """All-unique corpus: nothing removed, clean_text == text."""
    import ray.data as rd

    from pappermate_ray.stages.webclean import paragraph_dedup

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["only one para here", "and a different one"], pa.string()),
    }))
    out = _collect(paragraph_dedup(ds, "doc_id", "text")).sort_values("doc_id")
    assert out["n_removed"].tolist() == [0, 0]
    assert out["clean_text"].tolist() == ["only one para here", "and a different one"]


def test_repetition_stats_exact():
    from pappermate_ray.stages.webclean import repetition_stats_batch

    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        # doc 1: 16 words, 'a' ×8; two 8-word lines, identical
        "text": pa.array(["a b a c a b a c a b a c a b a c",
                          "x y z"], pa.string()),
    })
    out = repetition_stats_batch(batch).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_words"] == 16
    assert out.loc[1, "n_distinct_words"] == 3
    assert out.loc[1, "n_lines"] == 2
    assert out.loc[1, "n_distinct_lines"] == 1  # both 8-word chunks equal
    assert out.loc[1, "top_word_n"] == 8
    assert out.loc[2, "n_words"] == 3
    assert out.loc[2, "n_distinct_words"] == 3
    assert out.loc[2, "n_lines"] == 1
    assert out.loc[2, "top_word_n"] == 1


def test_pii_scrub_exact():
    from pappermate_ray.stages.webclean import pii_scrub_batch

    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "mail a@b.co or c.d+x@e-f.org call 555-123-4567 from 10.0.0.1 end",
            "nothing sensitive here",
        ], pa.string()),
    })
    out = pii_scrub_batch(batch).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_emails"] == 2
    assert out.loc[1, "n_phones"] == 1
    assert out.loc[1, "n_ips"] == 1
    assert out.loc[1, "clean_text"] == \
        "mail [EMAIL] or [EMAIL] call [PHONE] from [IP] end"
    assert out.loc[2, "clean_text"] == "nothing sensitive here"
    assert out.loc[2, ["n_emails", "n_phones", "n_ips"]].tolist() == [0, 0, 0]


def test_decontaminate_planted(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.webclean import decontaminate

    grams = ["the quick brown fox", "lorem ipsum dolor sit"]
    texts = [
        "clean document with nothing shared",          # no hit
        "prefix the quick brown fox suffix",           # 1 hit
        "lorem ipsum dolor sit and the quick brown fox",  # 2 hits
    ]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([10, 11, 12], pa.int64()),
                                 "text": pa.array(texts, pa.string())}))
    out = _collect(decontaminate(ds, grams)).sort_values("doc_id")
    assert out["doc_id"].tolist() == [11, 12]
    assert out["n_hits"].tolist() == [1, 2]


def test_decontaminate_ngrams_token_aligned(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.webclean import decontaminate, decontaminate_ngrams

    grams = ["the quick brown fox jumps high", "lorem ipsum dolor sit amet now"]
    texts = [
        "clean document with nothing shared at all here",
        "prefix the quick brown fox jumps high suffix",            # exact window
        "lorem ipsum dolor sit amet now the quick brown fox jumps high",  # both
        # substring-only match: token mode must NOT hit ('xthe' != 'the')
        "prefixthe quick brown fox jumps high suffix",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                                 "text": pa.array(texts, pa.string())}))
    tok = _collect(decontaminate_ngrams(ds, grams, n=6)).sort_values("doc_id")
    assert tok["doc_id"].tolist() == [2, 3]
    assert tok["n_hits"].tolist() == [1, 2]
    # the substring mode DOES hit doc 4 — the semantic difference is real
    sub = _collect(decontaminate(ds, grams)).sort_values("doc_id")
    assert sub["doc_id"].tolist() == [2, 3, 4]


def test_decontaminate_ngrams_agrees_on_aligned_fixture(ray_session):
    """On the planted sf fixture (grams appended token-aligned with
    spaces) both modes must agree exactly."""
    from pappermate_ray.queries import q_decontaminate
    import ray.data as rd
    import pyarrow.parquet as pq

    from pappermate_ray.stages.webclean import decontaminate_ngrams

    SF = "/root/testdata/sf0.001"
    sub = _collect(q_decontaminate(SF)).sort_values("doc_id").reset_index(drop=True)

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    bench = sorted((d for d in docs if d["doc_id"] % 97 == 0), key=lambda d: d["doc_id"])
    grams = [" ".join((d["text"] or "").split(" ")[:6]) for d in bench]
    nb = len(grams)
    planted = []
    for d in docs:
        if d["doc_id"] % 97 == 0:
            continue
        text = d["text"] or ""
        if d["doc_id"] % 31 == 0:
            text = text + " " + grams[(d["doc_id"] // 31) % nb]
        planted.append({"doc_id": d["doc_id"], "text": text})
    ds = rd.from_items(planted)
    tok = _collect(decontaminate_ngrams(ds, grams, n=6)).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(sub, tok, check_dtype=False)


def _substr_corpus():
    """60 docs of 20 unique tokens each; every 3rd doc carries a shared
    10-token slogan (cross-doc dup), every 7th repeats its own first 8
    tokens at the end (intra-doc dup)."""
    import ray.data as rd

    slogan = " ".join(f"s{i}" for i in range(10))
    rows = []
    for d in range(60):
        t = " ".join(f"w{d}_{i}" for i in range(20))
        if d % 3 == 0:
            t += " " + slogan
        if d % 7 == 0:
            t += " " + " ".join(f"w{d}_{i}" for i in range(8))
        rows.append({"doc_id": d, "text": t})
    return rd.from_items(rows).repartition(6), slogan


def test_substring_dedup_first_occurrence_wins(ray_session):
    from pappermate_ray.stages.webclean import substring_dedup

    ds, slogan = _substr_corpus()
    out = _collect(substring_dedup(ds, n=8)).sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 60
    r0 = out[out.doc_id == 0].iloc[0]
    r3 = out[out.doc_id == 3].iloc[0]
    # globally first occurrence (doc 0) keeps the slogan; doc 3 loses all 10
    # tokens (3 overlapping dup windows merge into one span)
    assert slogan in r0.clean_text
    assert "s0" not in r3.clean_text and r3.n_removed_tokens == 10
    # intra-doc repeat: doc 7's trailing 8-token copy of its head is removed
    r7 = out[out.doc_id == 7].iloc[0]
    assert r7.n_removed_tokens == 8 and r7.clean_text.split(" ").count("w7_0") == 1
    # untouched doc: nothing removed, text round-trips
    r1 = out[out.doc_id == 1].iloc[0]
    assert r1.n_removed_tokens == 0 and r1.clean_text == " ".join(f"w1_{i}" for i in range(20))


def test_substring_dedup_distributed_path_identical(ray_session):
    """broadcast_limit=0 forces the explode→hash_join→rebuild fallback;
    output must be bit-identical to the broadcast fast path."""
    from pappermate_ray.stages.webclean import substring_dedup

    ds, _ = _substr_corpus()
    fast = _collect(substring_dedup(ds, n=8)).sort_values("doc_id").reset_index(drop=True)
    dist = _collect(substring_dedup(ds, n=8, broadcast_limit=0)).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, dist)


def test_substring_dedup_no_duplicates_passthrough(ray_session):
    import ray.data as rd
    from pappermate_ray.stages.webclean import substring_dedup

    ds = rd.from_items([{"doc_id": i, "text": " ".join(f"u{i}_{j}" for j in range(12))}
                        for i in range(10)])
    out = _collect(substring_dedup(ds, n=8)).sort_values("doc_id").reset_index(drop=True)
    assert out.n_removed_tokens.sum() == 0
    assert (out.n_tokens == 12).all()


def test_badwords_filter_word_boundary_and_case(ray_session):
    """C4-style blocklist: whole-word + case-insensitive semantics.
    'class' in the blocklist must drop 'CLASS dismissed' but KEEP
    'classify the rows' (boundary) and null text (no evidence)."""
    import ray.data as rd

    from pappermate_ray.stages.webclean import badwords_filter

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "a clean document",
            "CLASS dismissed",            # case-folded whole word -> drop
            "classify the rows",          # term inside a token -> keep
            "the class of 2024",          # plain whole word -> drop
            None,                         # null -> keep
            "subclass hierarchy",         # term at token end -> keep
        ], pa.string()),
    }))
    kept = badwords_filter(ds, ["class"], text_col="text")
    assert sorted(r["doc_id"] for r in kept.take_all()) == [0, 2, 4, 5]


def test_badwords_filter_empty_terms_passthrough(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.webclean import badwords_filter

    ds = rd.from_items([{"doc_id": i, "text": f"doc {i}"} for i in range(5)])
    assert badwords_filter(ds, [], text_col="text").count() == 5
    # blank lines in a real blocklist file must be inert, not crash or
    # match-everything
    assert badwords_filter(ds, ["", "doc 3"], text_col="text").count() == 4


def test_c4_line_filter_rules(ray_session):
    """Each C4 rule in isolation: terminal punctuation, min words,
    javascript lines, lorem-ipsum and curly-brace pages, min surviving
    lines; survivors rejoin in original order."""
    import ray.data as rd

    from pappermate_ray.stages.webclean import c4_line_filter

    good = "alpha beta gamma delta epsilon zeta."
    docs = {
        0: "\n".join([good, "eta theta iota kappa lambda mu!",
                      'nu xi omicron pi rho sigma"']),   # 3 kept -> survives
        1: "\n".join([good, good, "no terminal punctuation here at all",
                      "short line.", "uses javascript callbacks every day.",
                      good]),
        2: "\n".join([good, good, good, "lorem ipsum dolor sit amet."]),
        3: "\n".join([good, good, good, "function f() { return 1; }."]),
        4: "\n".join([good, good]),          # only 2 kept -> page drops
        5: None,                             # null text -> page drops
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
    }))
    out = {r["doc_id"]: r for r in c4_line_filter(ds).take_all()}
    assert sorted(out) == [0, 1]
    assert out[0]["n_lines_kept"] == 3
    assert out[0]["clean_text"] == docs[0]          # order preserved
    # doc 1: the three bad lines drop, the three good ones remain
    assert out[1]["n_lines_kept"] == 3
    assert out[1]["clean_text"] == good + "\n" + good + "\n" + good


def test_c4_line_filter_empty_batch_schema(ray_session):
    """A batch whose pages ALL fail the page rules must still emit the
    output schema (empty_table path)."""
    import ray.data as rd

    from pappermate_ray.stages.webclean import c4_line_filter

    ds = rd.from_items([{"doc_id": 1, "text": "all about lorem ipsum."}])
    out = c4_line_filter(ds)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "n_lines_kept", "clean_text"}


def test_gopher_quality_filter_rules(ray_session):
    """Each Gopher word rule in isolation; survivors carry exact stats."""
    import ray.data as rd

    from pappermate_ray.stages.webclean import gopher_quality_filter

    base = ("the quick brown fox jumps over a lazy dog today " * 6).strip()  # 60 words
    docs = {
        0: base,                                   # passes everything
        1: "the a short doc.",                     # < min_words
        2: " ".join(["zz"] * 60),                  # mean len 2 + no stopwords
        3: base + " " + " ".join(["#h"] * 40),     # hashtag ratio 40/100 > 10%
        4: base.replace("the", "xxe").replace(" a ", " b "),  # stopwords < 2
        5: None,                                   # null -> 1 empty word -> drops
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
    }))
    out = {r["doc_id"]: r for r in gopher_quality_filter(ds).take_all()}
    assert sorted(out) == [0]
    r = out[0]
    assert r["n_words"] == 60
    assert r["n_word_chars"] == len(base.replace(" ", ""))
    assert r["n_stopwords"] == 2        # 'the' and 'a' (distinct presence)
    assert r["n_hashtag_words"] == 0


def test_c4_and_gopher_filters_idempotent(ray_session):
    """Filter outputs re-filtered are fixpoints: every surviving line
    already satisfies the line rules, every surviving doc the word
    rules (clean_text/stat columns round-trip unchanged)."""
    import ray.data as rd

    from pappermate_ray.stages.webclean import (c4_line_filter,
                                                gopher_quality_filter)

    rng = np.random.RandomState(5)
    words = ["the", "a", "to", "of", "alpha", "beta", "gamma", "#tag",
             "javascript", "delta"]
    docs = []
    for i in range(50):
        n = rng.randint(5, 120)
        ws = [words[j] for j in rng.randint(0, len(words), n)]
        # random line breaks + random punctuation
        text = ""
        for k, w in enumerate(ws):
            text += w
            text += "." if rng.rand() < 0.2 else ""
            text += "\n" if rng.rand() < 0.15 else " "
        docs.append({"doc_id": i, "text": text.strip()})
    ds = rd.from_items(docs)

    c1 = c4_line_filter(ds).take_all()
    c1_in = rd.from_items([{"doc_id": r["doc_id"], "text": r["clean_text"]}
                           for r in c1])
    c2 = c4_line_filter(c1_in).take_all()
    assert {r["doc_id"]: (r["n_lines_kept"], r["clean_text"]) for r in c2} \
        == {r["doc_id"]: (r["n_lines_kept"], r["clean_text"]) for r in c1}

    g1 = gopher_quality_filter(ds, min_words=5).take_all()
    g1_in = rd.from_items([{"doc_id": r["doc_id"], "text": r["text"]}
                           for r in g1])
    g2 = gopher_quality_filter(g1_in, min_words=5).take_all()
    assert {r["doc_id"] for r in g2} == {r["doc_id"] for r in g1}


def test_badwords_filter_nonword_edge_terms(ray_session):
    """Terms with non-word edges (real C4 blocklists have them) anchor
    on whitespace/string edges instead of \\b — a bare \\b next to a
    non-word char never matches and would make the term silently inert."""
    import ray.data as rd

    from pappermate_ray.stages.webclean import badwords_filter

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "pay a$$ now",        # standalone -> drop
            "a$$",                # whole string -> drop
            "class a$$word here", # embedded in a token -> keep
            "plain clean text",
        ], pa.string()),
    }))
    kept = badwords_filter(ds, ["a$$"], text_col="text")
    assert sorted(r["doc_id"] for r in kept.take_all()) == [2, 3]


# ---- compression-ratio quality filter (round-4 continuation) ----

def test_compression_ratio_ordering(ray_session):
    import hashlib

    import ray.data as rd

    from pappermate_ray.stages.webclean import compression_ratio_batch

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array([
                      "abc " * 200,                         # pure repeat
                      "The quick brown fox jumps over the lazy dog. " * 8,
                      "".join(hashlib.md5(f"{i}".encode()).hexdigest()
                              for i in range(30)),          # hex stream
                      None,                                 # null text
                  ], pa.string())})
    out = compression_ratio_batch(t, "text")
    r = out["compression_ratio"].to_pylist()
    assert r[0] < r[1] < r[2], "repeat < prose < random must hold"
    assert r[3] == 1.0, "null text is never evidence of repetition"

    ds = rd.from_arrow(t)
    from pappermate_ray.stages.webclean import compression_quality_filter

    kept = compression_quality_filter(ds, "text", min_ratio=0.25).take_all()
    assert sorted(row["doc_id"] for row in kept) == [2, 3], \
        "repeat and short-loop prose drop; random + null survive"


def test_compression_filter_threshold_monotone(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.webclean import compression_quality_filter

    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(
                      [f"w{i} unique words flow naturally here " * (i + 2)
                       for i in range(6)], pa.string())})
    n_loose = compression_quality_filter(
        rd.from_arrow(t), "text", min_ratio=0.01).count()
    n_tight = compression_quality_filter(
        rd.from_arrow(t), "text", min_ratio=0.9).count()
    assert n_loose == 6 and n_tight == 0


def _host_corpus():
    """Two hosts: hostA (10 docs) with a nav para on 6/10 docs (60% —
    above the 400‰ rule), hostB (10 docs) carrying the SAME nav text on
    only 2/10 docs (20% — below). Host-scoping must remove it from A's
    docs but keep it on B's."""
    import ray.data as rd

    ids, hosts, texts = [], [], []
    nav = "shared navigation menu home about contact"
    for i in range(10):
        paras = ([nav] if i < 6 else []) + [f"hostA body paragraph {i}"]
        ids.append(i)
        hosts.append("a.example.com")
        texts.append("\n".join(paras))
    for i in range(10):
        paras = ([nav] if i < 2 else []) + [f"hostB body paragraph {i}"]
        ids.append(100 + i)
        hosts.append("b.example.com")
        texts.append("\n".join(paras))
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "host": pa.array(hosts, pa.string()),
        "text": pa.array(texts, pa.string()),
    }))


def test_host_boilerplate_scoped_to_host(ray_session):
    from pappermate_ray.stages.webclean import host_boilerplate_removal

    out = _collect(host_boilerplate_removal(
        _host_corpus(), host_col="host", id_col="doc_id", text_col="text",
        min_host_permille=400, min_docs=2)).sort_values("doc_id")
    out = out.reset_index(drop=True)
    assert len(out) == 20
    for _, r in out.iterrows():
        i = int(r["doc_id"])
        if i < 100:  # hostA: nav (on docs 0-5) is hot there
            carried = i < 6
            assert r["n_removed"] == (1 if carried else 0), i
            assert r["clean_text"] == f"hostA body paragraph {i}"
        else:  # hostB: same nav text survives (2/10 = 200‰ < 400‰)
            j = i - 100
            carried = j < 2
            assert r["n_removed"] == 0, i
            expect = (("shared navigation menu home about contact\n")
                      if carried else "") + f"hostB body paragraph {j}"
            assert r["clean_text"] == expect


def test_host_boilerplate_min_docs_guard(ray_session):
    """A 2-doc host where a para sits on 1 doc (500‰ ≥ 400‰) must keep
    it: the absolute min_docs=2 floor vetoes the ratio."""
    import ray.data as rd

    from pappermate_ray.stages.webclean import host_boilerplate_removal

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "host": pa.array(["tiny.example", "tiny.example"], pa.string()),
        "text": pa.array(["lonely banner\nreal content one",
                          "real content two"], pa.string()),
    }))
    out = _collect(host_boilerplate_removal(
        ds, min_host_permille=400, min_docs=2)).sort_values("doc_id")
    assert out["n_removed"].tolist() == [0, 0]
    assert out["clean_text"].tolist() == [
        "lonely banner\nreal content one", "real content two"]


def test_host_boilerplate_distributed_path_identical(ray_session):
    """broadcast_limit=0 forces the semi-join + rebuild-join fallback;
    output must match the broadcast fast path exactly."""
    from pappermate_ray.stages.webclean import host_boilerplate_removal

    fast = _collect(host_boilerplate_removal(
        _host_corpus(), min_host_permille=400, min_docs=2))
    dist = _collect(host_boilerplate_removal(
        _host_corpus(), min_host_permille=400, min_docs=2,
        broadcast_limit=0))
    fast = fast.sort_values("doc_id").reset_index(drop=True)
    dist = dist.sort_values("doc_id").reset_index(drop=True)[fast.columns]
    pd.testing.assert_frame_equal(fast, dist)


def test_host_boilerplate_no_hot_passthrough(ray_session):
    """All paragraphs unique: nothing removed anywhere."""
    import ray.data as rd

    from pappermate_ray.stages.webclean import host_boilerplate_removal

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "host": pa.array(["x", "y"], pa.string()),
        "text": pa.array(["alpha beta", "gamma delta"], pa.string()),
    }))
    out = _collect(host_boilerplate_removal(ds)).sort_values("doc_id")
    assert out["n_removed"].tolist() == [0, 0]
    assert out["clean_text"].tolist() == ["alpha beta", "gamma delta"]
