"""Vectorized text-analysis kernels (functions/quality.py batch section)
must be EXACTLY equal to the scalar functions — on arbitrary unicode, not
just the ASCII corpus."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pappermate_ray.functions.quality import (
    bpe_ish_token_count,
    detect_language,
    detect_language_batch,
    fingerprint,
    fingerprint_batch,
    quality_score,
    quality_score_batch,
    text_metrics_batch,
    token_count,
)

_TEXTS = st.lists(
    st.one_of(
        st.text(max_size=200),
        st.text(alphabet="aeiou 的一是了人丁 ぁあぃイ .,;!?\t\n ABCdef123", max_size=300),
        st.just(""),
        st.none(),
    ),
    min_size=0, max_size=20,
)


@given(_TEXTS)
@settings(max_examples=200, deadline=None)
def test_metrics_equal_scalar(texts):
    m = text_metrics_batch(texts)
    for i, t in enumerate(texts):
        t = t or ""
        assert m["n_chars"][i] == len(t)
        assert m["n_tokens"][i] == token_count(t)
        assert m["n_bpe_tokens"][i] == bpe_ish_token_count(t)


@given(_TEXTS)
@settings(max_examples=200, deadline=None)
def test_quality_equal_scalar(texts):
    q = quality_score_batch(texts)
    for i, t in enumerate(texts):
        assert q[i] == quality_score(t or ""), repr(t)


@given(_TEXTS)
@settings(max_examples=200, deadline=None)
def test_lang_equal_scalar(texts):
    langs = detect_language_batch(texts)
    for i, t in enumerate(texts):
        assert langs[i] == detect_language(t or ""), repr(t)


@given(_TEXTS)
@settings(max_examples=200, deadline=None)
def test_fingerprint_equal_scalar(texts):
    fps = fingerprint_batch(texts)
    for i, t in enumerate(texts):
        assert fps[i] == fingerprint(t or ""), repr(t)


def test_long_doc_scalar_tail():
    # one 100k-char doc among shorties exercises the scalar-tail branch
    texts = ["word " * 20_000] + ["short text"] * 5
    fps = fingerprint_batch(texts)
    for i, t in enumerate(texts):
        assert fps[i] == fingerprint(t)


def test_corpus_equality_sf0001():
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    texts = t["text"].to_pylist()
    m = text_metrics_batch(texts)
    q = quality_score_batch(texts)
    langs = detect_language_batch(texts)
    fps = fingerprint_batch(texts)
    for i, x in enumerate(texts):
        x = x or ""
        assert m["n_tokens"][i] == token_count(x)
        assert m["n_bpe_tokens"][i] == bpe_ish_token_count(x)
        assert q[i] == quality_score(x)
        assert langs[i] == detect_language(x)
        assert fps[i] == fingerprint(x)


def test_stop_sql_mirror_matches_kernel_on_planted_en():
    """Regression: the hand-kept _STOP_SQL once lacked 'en' (es/fr), so
    stop_hits diverged on any doc containing it. The mirror is now
    GENERATED from _STOPWORDS; this pins the planted case through real
    DuckDB against the batch kernel."""
    import duckdb

    from pappermate_ray.functions.quality import text_metrics_batch
    from pappermate_ray.queries import _STOP_SQL

    texts = ["vivimos en la ciudad", "the en of", "plain words only", ""]
    m = text_metrics_batch(texts)
    con = duckdb.connect()
    for i, txt in enumerate(texts):
        got = con.execute(
            "SELECT len(list_filter(regexp_split_to_array(?, '\\s+'),"
            f" t -> t <> '' AND lower(t) IN ({_STOP_SQL})))",
            [txt]).fetchone()[0]
        assert got == m["stop_hits"][i], (txt, got, m["stop_hits"][i])


# ---------------------------------------------------------------------------
# readability (Flesch / FK-grade)
# ---------------------------------------------------------------------------

def test_readability_hand_computed():
    import pyarrow as pa

    from pappermate_ray.stages.quality import readability_batch

    t = pa.table({"text": ["The cat sat. It ran!"]})
    r = readability_batch(t).to_pylist()[0]
    # words: The/cat/sat./It/ran! -> 5; sentences: '.' '!' -> 2
    # vowel runs: e, a, a, I, a -> 5
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    import math
    want_f = math.floor((206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)) * 1e4
                        + 0.5) / 1e4
    want_g = math.floor((0.39 * (5 / 2) + 11.8 * (5 / 5) - 15.59) * 1e4
                        + 0.5) / 1e4
    assert r["flesch"] == want_f
    assert r["fk_grade"] == want_g


def test_readability_empty_and_null_clamp():
    import pyarrow as pa

    from pappermate_ray.stages.quality import readability_batch

    t = pa.table({"text": pa.array(["", None], pa.string())})
    rows = readability_batch(t).to_pylist()
    for r in rows:
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (0, 0, 0)
        # clamped denominators -> finite fixed point, never NaN
        assert r["flesch"] == 205.82 and r["fk_grade"] == -15.2


def test_readability_multi_punct_runs_count_once():
    import pyarrow as pa

    from pappermate_ray.stages.quality import readability_batch

    r = readability_batch(pa.table({"text": ["Wait... what?! Ok."]})).to_pylist()[0]
    # '...' '?!' '.' are three runs
    assert r["n_sentences"] == 3


def test_lexical_diversity_hand_computed():
    import math

    import pyarrow as pa

    from pappermate_ray.stages.quality import lexical_diversity_batch

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": pa.array(["a b a b c", "", None], pa.string())})
    rows = lexical_diversity_batch(t).to_pylist()
    r = rows[0]
    assert (r["n_tokens"], r["n_types"]) == (5, 3)
    assert r["ttr"] == round(3 / 5, 6)
    assert r["guiraud"] == round(3 / math.sqrt(5), 6)
    for r in rows[1:]:
        assert (r["n_tokens"], r["n_types"], r["ttr"], r["guiraud"]) == \
            (0, 0, 0.0, 0.0)


def test_lexical_diversity_types_do_not_leak_across_docs():
    import pyarrow as pa

    from pappermate_ray.stages.quality import lexical_diversity_batch

    # same vocabulary in both docs — factorize is batch-wide, the
    # unique-(doc, code) pass must still count types PER DOC
    t = pa.table({"doc_id": [1, 2],
                  "text": ["x y z", "x x x x"]})
    rows = {r["doc_id"]: r for r in lexical_diversity_batch(t).to_pylist()}
    assert rows[1]["n_types"] == 3
    assert rows[2]["n_types"] == 1 and rows[2]["n_tokens"] == 4


def test_char_entropy_known_distributions():
    import math

    import pyarrow as pa

    from pappermate_ray.stages.quality import char_entropy_batch

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["abcd", "aab", "zzzz"]})
    rows = {r["doc_id"]: r["char_entropy_bits"]
            for r in char_entropy_batch(t).to_pylist()}
    assert rows[1] == 2.0                              # uniform over 4
    want = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(rows[2] - round(want, 6)) < 1e-9
    assert rows[3] == 0.0


def test_char_entropy_no_cross_doc_leak_and_unicode():
    import pyarrow as pa

    from pappermate_ray.stages.quality import char_entropy_batch

    # identical char sets across docs; counts must stay per-doc, and
    # non-BMP codepoints survive the utf-32 flat path
    t = pa.table({"doc_id": [1, 2], "text": ["αβ", "ααααα𝛼"]})
    rows = {r["doc_id"]: r for r in char_entropy_batch(t).to_pylist()}
    assert rows[1]["char_entropy_bits"] == 1.0
    assert rows[2]["n_chars"] == 6
    import math
    want = -(5 / 6) * math.log2(5 / 6) - (1 / 6) * math.log2(1 / 6)
    assert abs(rows[2]["char_entropy_bits"] - round(want, 6)) < 1e-9
