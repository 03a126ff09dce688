"""HTML main-content extraction unit tests (functions/htmlx.py)."""

from pappermate_ray.fixtures import build_pages_table, make_page_row, wrap_html
from pappermate_ray.functions.htmlx import extract_blocks, extract_main_text


def test_boilerplate_stripped():
    html = wrap_html(1, "# Title Line Here\nThis is the main paragraph with enough characters.")
    text, blocks, status, error = extract_main_text(bytes(html))
    assert status == "converted"
    # nav/sidebar/footer links must not appear
    assert "Category" not in text
    assert "Related page" not in text
    assert "Privacy" not in text
    assert "Site 1 portal" not in text  # <header> stripped
    assert "var t=" not in text  # script stripped
    assert "# Title Line Here" in text
    assert "main paragraph" in text


def test_link_density_filter():
    html = (
        "<html><body>"
        '<div><a href="/1">link one here</a> <a href="/2">link two here</a> tiny</div>'
        "<p>A real content paragraph that easily clears the length threshold.</p>"
        "</body></html>"
    )
    blocks = extract_blocks(html)
    texts = [b["text"] for b in blocks]
    assert any("real content paragraph" in t for t in texts)
    assert not any("link one" in t for t in texts)


def test_block_types_and_order():
    html = (
        "<html><body><article>"
        "<h2>Heading text</h2>"
        "<p>First paragraph with plenty of characters to keep.</p>"
        "<table><tr><td>Cell content long enough to keep here</td></tr></table>"
        "</article></body></html>"
    )
    blocks = extract_blocks(html)
    kinds = [b["type"] for b in blocks]
    assert kinds == ["heading", "paragraph", "table"]
    assert [b["order"] for b in blocks] == [0, 1, 2]


def test_malformed_bytes_soft_fail():
    text, blocks, status, error = extract_main_text(b"<html><p>ok</p>" + "é".encode()[:1])
    assert status == "error"
    assert "decode error" in error
    assert text == ""


def test_empty_html_soft_fail():
    text, blocks, status, error = extract_main_text(b"")
    assert status == "error"


def test_pre_extracted_passthrough():
    md = "# Title\n\nBody line with sufficient length to matter.\n| a | b |"
    text, blocks, status, error = extract_main_text(None, md)
    assert status == "converted"
    assert text == md  # byte-identical passthrough
    assert blocks[0]["type"] == "heading"
    assert blocks[-1]["type"] == "table"


def test_deterministic():
    t = build_pages_table(50)
    row = {c: t[c][7].as_py() for c in t.column_names}
    again = make_page_row(7, "Generic filler sentence number 7 about data processing.")
    assert row["url"] == again["url"]
    assert row["html"] == again["html"]
    r1 = extract_main_text(row["html"], row["text"])
    r2 = extract_main_text(again["html"], again["text"])
    assert r1 == r2


def test_scanner_matches_htmlparser():
    """Differential test: the fast scanner must match the stdlib-HTMLParser
    reference collector segment-for-segment on the whole fixture corpus
    and on adversarial snippets."""
    from pappermate_ray.functions import htmlx

    def old_segments(s):
        p = htmlx._ContentParser()
        p.feed(s)
        p.close()
        return p.segments

    def norm(segs):
        return [
            (s.kind, "".join(s.pieces), s.total_chars, s.link_chars)
            for s in segs
            if s.total_chars > 0
        ]

    corpus = [
        r["html"] for r in build_pages_table(300).to_pylist() if r["html"]
    ]
    adversarial = [
        b"<html><head><title>T &amp; co</title></head><body><p>hello &lt;x&gt; padded text</p></body></html>",
        b"<p>unclosed paragraph text that just ends",
        b"<script>var x = '<p>not content</p>';</script><p>real paragraph content here</p>",
        b"<!-- <p>c</p> --><p>after comment paragraph long enough here</p>",
        b"<P CLASS='x'>UPPERCASE TAG paragraph should still work</P>",
        b"<textarea><p>inside</p></textarea><p>outside textarea long enough text</p>",
        b"<td>cell content long enough</td><br><a href=x>linky link link</a>",
    ]
    for raw in corpus + adversarial:
        try:
            s = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue
        assert norm(old_segments(s)) == norm(htmlx._scan_segments(s))


def test_scanner_fuzz_divergence_bound():
    """Random tag-soup fuzz vs HTMLParser: exact match on ≥ 99% of docs
    (the residue is malformed-endtag recovery, documented in htmlx)."""
    import random
    import string

    from pappermate_ray.functions import htmlx

    def old_segments(s):
        p = htmlx._ContentParser()
        p.feed(s)
        p.close()
        return p.segments

    def norm(segs):
        return [(s.kind, "".join(s.pieces), s.total_chars, s.link_chars)
                for s in segs if s.total_chars > 0]

    rng = random.Random(1234)
    tags = ["p", "div", "a", "td", "h1", "li", "span", "script", "style", "br", "table", "nav"]
    attrs = ['', ' class="x"', " href='a>b'", ' id="q>r"', ' data-x=1']
    diverge = tried = 0
    for _ in range(1500):
        parts = []
        for _ in range(rng.randint(1, 12)):
            r = rng.random()
            t = rng.choice(tags)
            if r < 0.35:
                parts.append(f"<{t}{rng.choice(attrs)}>")
            elif r < 0.55:
                parts.append(f"</{t}>")
            elif r < 0.65:
                parts.append("<!-- c -->")
            else:
                parts.append("".join(
                    rng.choice(string.ascii_letters + " &;#<>/!?")
                    for _ in range(rng.randint(3, 30))
                ))
        s = "".join(parts)
        try:
            a = norm(old_segments(s))
        except Exception:
            continue
        tried += 1
        if a != norm(htmlx._scan_segments(s)):
            diverge += 1
    assert tried > 1000
    assert diverge / tried < 0.01, f"{diverge}/{tried} divergences"


def test_fixture_has_error_and_giant_rows():
    t = build_pages_table(600)
    import pyarrow.compute as pc

    sizes = pc.binary_length(t["html"]).to_pylist()
    statuses = [extract_main_text(h, tx)[2] for h, tx in zip(t["html"].to_pylist(), t["text"].to_pylist())]
    assert statuses.count("error") > 10  # malformed tail exists
    assert max(s for s in sizes if s) > 20 * sorted(s for s in sizes if s)[len(sizes) // 2]  # giant-doc skew


def test_oversized_doc_truncated():
    """A giant payload is capped, converts, and is tagged truncated."""
    from pappermate_ray.stages.extract import extract_pages_batch
    import pyarrow as pa

    big = ("<p>" + "word " * 40 + "</p>") * 2000
    t = pa.table(
        {
            "url": ["u"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": [big.encode()],
            "text": pa.array([None], pa.string()),
            "lang": ["en"],
        }
    )
    out = extract_pages_batch(t, max_doc_bytes=10_000)
    assert out["status"][0].as_py() == "converted"
    assert "truncated" in out["error"][0].as_py()
    assert out["n_chars"][0].as_py() < 11_000
