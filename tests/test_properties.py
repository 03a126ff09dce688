"""Property-based tests (hypothesis) for the pure function library.

Beyond the reference's test strategy (which has no property tests,
SURVEY.md §5): invariants that must hold for ARBITRARY input, because at
100 TB every weird input occurs.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pappermate_ray.functions.amounts import parse_amount
from pappermate_ray.functions.contract import extract_sections, parse_contract
from pappermate_ray.functions.dates import extract_dates
from pappermate_ray.functions.dedupfn import (
    jaccard,
    lsh_bands,
    minhash_signature,
    shingles,
    simhash64,
)
from pappermate_ray.functions.htmlx import extract_blocks, extract_main_text
from pappermate_ray.functions.naming import sanitize_filename
from pappermate_ray.functions.quality import detect_language, fingerprint, quality_score, token_count
from pappermate_ray.functions.spans import chunk_text, dedupe_spans, extract_spans

text_strategy = st.text(max_size=2000)
html_ish = st.text(
    alphabet=string.ascii_letters + string.digits + " <>/=\"'&#;.-\n",
    max_size=1500,
)


class TestNeverRaise:
    """Soft-fail contract: pure functions never raise on any string."""

    @given(text_strategy)
    @settings(max_examples=200, deadline=None)
    def test_parse_amount(self, s):
        out = parse_amount(s)
        assert out is None or isinstance(out, float)

    @given(text_strategy)
    @settings(max_examples=200, deadline=None)
    def test_extract_dates(self, s):
        for d in extract_dates(s):
            assert 0 <= d["position"] <= len(s)
            assert d["text"] in s

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_parse_contract(self, s):
        rec = parse_contract(s, default_name="x")
        assert rec["currency"]  # always has a currency default
        assert rec["contract_number"]

    @given(html_ish)
    @settings(max_examples=200, deadline=None)
    def test_extract_blocks(self, s):
        blocks = extract_blocks(s)
        # order strictly increasing from 0
        assert [b["order"] for b in blocks] == list(range(len(blocks)))

    @given(st.binary(max_size=500))
    @settings(max_examples=200, deadline=None)
    def test_extract_main_text_bytes(self, b):
        text, blocks, status, error = extract_main_text(b)
        assert status in ("converted", "error")
        if status == "error":
            assert text == "" and blocks == []

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_quality_funcs(self, s):
        assert 0.0 <= quality_score(s) <= 1.0
        assert token_count(s) >= 0
        assert isinstance(detect_language(s), str)
        assert -(2**63) <= fingerprint(s) < 2**63  # valid int64

    @given(st.text(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_sanitize_filename(self, s):
        name, status, err = sanitize_filename(s + ".pdf")
        assert status in ("success", "failed")


class TestStructural:
    @given(st.text(min_size=1, max_size=3000))
    @settings(max_examples=100, deadline=None)
    def test_chunker_reassembles(self, s):
        chunks = chunk_text(s, 128)
        assert "".join(c for _, c in chunks) == s
        assert all(0 <= off < len(s) for off, _ in chunks)

    @given(text_strategy)
    @settings(max_examples=100, deadline=None)
    def test_span_offsets_valid(self, s):
        for span in extract_spans(s):
            assert s[span["start"]:span["end"]] == span["text"]

    @given(text_strategy)
    @settings(max_examples=50, deadline=None)
    def test_dedupe_idempotent(self, s):
        spans = extract_spans(s)
        assert dedupe_spans(spans) == spans  # already deduped output is a fixpoint

    @given(st.text(max_size=500), st.text(max_size=500))
    @settings(max_examples=50, deadline=None)
    def test_fingerprint_ws_invariant(self, a, b):
        # whitespace runs don't change the fingerprint (normalized content)
        assert fingerprint(a + " " + b) == fingerprint(a + "   \t\n " + b)


class TestDedupMath:
    @given(st.text(min_size=0, max_size=800))
    @settings(max_examples=50, deadline=None)
    def test_minhash_self_similarity(self, s):
        sh = shingles(s)
        sig = minhash_signature(sh, 64)
        assert len(sig) == 64
        # identical text → identical signature and bands
        sig2 = minhash_signature(shingles(s), 64)
        assert (sig == sig2).all()
        assert lsh_bands(sig) == lsh_bands(sig2)

    @given(st.text(min_size=1, max_size=400), st.text(min_size=1, max_size=400))
    @settings(max_examples=50, deadline=None)
    def test_jaccard_bounds(self, a, b):
        j = jaccard(shingles(a), shingles(b))
        assert 0.0 <= j <= 1.0
        assert jaccard(shingles(a), shingles(a)) == 1.0

    @given(st.text(max_size=400))
    @settings(max_examples=50, deadline=None)
    def test_simhash_int64(self, s):
        h = simhash64(s)
        assert -(2**63) <= h < 2**63


class TestLayoutNeverRaises:
    @given(st.binary(max_size=600))
    @settings(max_examples=150, deadline=None)
    def test_arbitrary_payload_soft_fails(self, payload):
        from pappermate_ray.functions.layout import PDF_MAGIC, extract_pdf_text

        text, blocks, status, err = extract_pdf_text(PDF_MAGIC + payload)
        assert status in ("converted", "error")

    @given(
        st.lists(
            st.fixed_dictionaries(
                {
                    "x": st.floats(0, 600, allow_nan=False),
                    "y": st.floats(0, 790, allow_nan=False),
                    "w": st.floats(1, 400, allow_nan=False),
                    "h": st.floats(1, 40, allow_nan=False),
                    "text": st.text(max_size=40),
                }
            ),
            max_size=25,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_structured_pages_never_raise(self, lines):
        import json

        from pappermate_ray.functions.layout import PDF_MAGIC, extract_pdf_text

        payload = PDF_MAGIC + json.dumps(
            {"pages": [{"width": 612.0, "height": 792.0, "lines": lines}]}
        ).encode()
        text, blocks, status, err = extract_pdf_text(payload)
        assert status in ("converted", "error")
        # orders strictly increasing when content exists
        assert [b["order"] for b in blocks] == list(range(len(blocks)))


class TestSectionsQuirk:
    @given(st.text(alphabet=string.printable, max_size=1000))
    @settings(max_examples=100, deadline=None)
    def test_sections_never_raise(self, s):
        sections = extract_sections(s)
        assert all(isinstance(k, str) and isinstance(v, str) for k, v in sections.items())


class TestWebcleanProperties:
    """Pure webclean helpers (stages/webclean.py) under arbitrary input."""

    @given(st.lists(st.text(alphabet=string.ascii_lowercase + " ", min_size=0,
                            max_size=40), max_size=30),
           st.integers(min_value=1, max_value=8))
    @settings(max_examples=60, deadline=None)
    def test_window_hashes_match_bruteforce(self, tokens, n):
        import numpy as np

        from pappermate_ray.stages.webclean import _token_hashes, _window_hashes

        th = _token_hashes(tokens)
        wh = _window_hashes(th, n)
        if len(tokens) < n:
            assert len(wh) == 0
            return
        assert len(wh) == len(tokens) - n + 1
        # windows of equal token content hash equal; a rolling hash must be
        # a pure function of the window tokens
        seen = {}
        for i in range(len(wh)):
            key = tuple(tokens[i:i + n])
            if key in seen:
                assert wh[i] == seen[key]
            seen[key] = wh[i]

    @given(st.text(max_size=500))
    @settings(max_examples=60, deadline=None)
    def test_repetition_stats_invariants(self, s):
        import pyarrow as pa

        from pappermate_ray.stages.webclean import repetition_stats_batch

        out = repetition_stats_batch(
            pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([s], pa.string())})
        ).to_pylist()[0]
        assert 1 <= out["n_distinct_words"] <= out["n_words"]
        assert 1 <= out["n_distinct_lines"] <= out["n_lines"]
        assert 1 <= out["top_word_n"] <= out["n_words"]
        # lines are 8-word chunks of the word stream
        assert out["n_lines"] == (out["n_words"] + 7) // 8

    @given(st.text(max_size=400))
    @settings(max_examples=60, deadline=None)
    def test_pii_scrub_leaves_no_matches(self, s):
        import pyarrow as pa
        import pyarrow.compute as pc

        from pappermate_ray.stages.webclean import (
            PII_EMAIL, PII_IP, PII_PHONE, pii_scrub_batch)

        out = pii_scrub_batch(
            pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([s], pa.string())})
        )
        clean = out["clean_text"]
        # redaction is complete: no PII pattern survives in clean_text
        # ([PHONE]/[EMAIL]/[IP] tokens cannot themselves match any pattern)
        assert pc.count_substring_regex(clean, PII_EMAIL)[0].as_py() == 0
        assert pc.count_substring_regex(clean, PII_PHONE)[0].as_py() == 0
        assert pc.count_substring_regex(clean, PII_IP)[0].as_py() == 0


@given(st.integers(0, 2**31 - 1), st.integers(3000, 12000))
@settings(max_examples=20, deadline=None)
def test_hk_fingerprints_amplitude_scale_invariant(seed, n):
    """Haitsma–Kalker double-difference fingerprints are invariant to
    exact uniform amplitude scaling (all band energies scale together,
    strict-sign double differences keep sign)."""
    import numpy as np

    from pappermate_ray.functions.media import audio_fingerprints_hk

    rng = np.random.RandomState(seed)
    x = rng.randint(-8000, 8000, n).astype(np.int16)
    f1 = audio_fingerprints_hk(x)
    f2 = audio_fingerprints_hk((x.astype(np.int32) * 4).astype(np.int32))
    assert np.array_equal(f1, f2)
    assert np.array_equal(f1, audio_fingerprints_hk(x))  # deterministic
