"""HTML head-metadata extraction (stages/headmeta.py) — parsing contract
pins: quote styles, attribute order, case-insensitivity, first-match-wins,
title whitespace collapse, raw-entity capture, crawler-default robots
flags, the 64 KiB head bound and the invalid-UTF-8 fallback."""

from __future__ import annotations

import pyarrow as pa

from pappermate_ray.stages.headmeta import (head_metadata_batch,
                                            html_head_metadata)


def _meta(html: str | bytes, **kw):
    b = html.encode("utf-8") if isinstance(html, str) else html
    t = pa.table({"url": pa.array(["u"], pa.string()),
                  "html": pa.array([b], pa.binary())})
    out = head_metadata_batch(t, **kw)
    return {c: out[c][0].as_py() for c in out.column_names}


def test_plain_double_quoted_head():
    r = _meta('<html lang="en"><head><title>T one</title>'
              '<meta name="description" content="D one">'
              '<link rel="canonical" href="https://c.example/1"></head>')
    assert r["title"] == "T one"
    assert r["meta_description"] == "D one"
    assert r["canonical_url"] == "https://c.example/1"
    assert r["html_lang"] == "en"
    assert r["robots_noindex"] is False and r["robots_nofollow"] is False


def test_attribute_order_and_single_quotes():
    r = _meta("<html lang=pt><head>"
              "<meta content='rev desc' name='description'>"
              '<link href="https://c.example/2" rel="canonical"></head>')
    assert r["meta_description"] == "rev desc"
    assert r["canonical_url"] == "https://c.example/2"
    assert r["html_lang"] == "pt"


def test_uppercase_tags_and_unquoted_href():
    r = _meta('<HTML LANG="DE"><HEAD><TITLE>Gross</TITLE>'
              '<META NAME="DESCRIPTION" CONTENT="Inhalt">'
              "<link rel='canonical' href=https://c.example/3></HEAD>")
    assert r["title"] == "Gross"
    assert r["meta_description"] == "Inhalt"
    assert r["canonical_url"] == "https://c.example/3"
    assert r["html_lang"] == "DE"  # raw capture, no case normalization


def test_title_whitespace_collapsed_and_entities_raw():
    r = _meta("<html><head><title>\n  A   &amp;\tB \n</title></head>")
    assert r["title"] == "A &amp; B"  # collapsed, NOT unescaped


def test_first_match_wins_on_duplicates():
    r = _meta('<html><head><title>First</title><title>Second</title>'
              '<meta name="description" content="D1">'
              '<meta name="description" content="D2"></head>')
    assert r["title"] == "First"
    assert r["meta_description"] == "D1"


def test_robots_directives_and_defaults():
    r = _meta('<html><head>'
              '<meta content="NoIndex, nofollow" name="robots"></head>')
    assert r["robots_noindex"] is True and r["robots_nofollow"] is True
    r2 = _meta('<html><head><meta name="robots" content="noindex"></head>')
    assert r2["robots_noindex"] is True and r2["robots_nofollow"] is False
    r3 = _meta("<html><head></head><body>x</body>")
    assert r3["robots_noindex"] is False and r3["robots_nofollow"] is False


def test_absent_fields_are_null():
    r = _meta("<html><head></head><body>plain</body></html>")
    for c in ("title", "meta_description", "canonical_url", "html_lang"):
        assert r[c] is None


def test_head_bytes_bound_ignores_body_tail():
    # a "title" appearing past the head slice must not parse
    page = "<html><head></head><body>" + "x" * 200 + \
        "<title>late</title></body></html>"
    r = _meta(page, head_bytes=64)
    assert r["title"] is None


def test_invalid_utf8_page_still_parses_head():
    raw = b'<html><head><title>ok despite tail</title></head><body>' + \
        "é".encode("utf-8")[:1] + b"</body>"
    r = _meta(raw)
    assert r["title"] == "ok despite tail"


def test_fixture_pages_integration(ray_session):
    """Over the standard synthetic crawl: html rows yield title
    'doc {i}', PDF / pre-extracted / empty payloads yield null, and the
    corrupt (truncated, invalid-UTF-8) rows still parse their intact
    head. Exercises the Dataset wrapper end to end."""
    import ray.data as rd

    from pappermate_ray.fixtures import KINDS, build_pages_table

    pages = build_pages_table(120)
    out = html_head_metadata(
        rd.from_arrow(pages)).take_all()
    by_url = {r["url"]: r for r in out}
    assert len(by_url) == 120
    for i in range(120):
        kind = KINDS[i % len(KINDS)]
        row = by_url[f"https://site{i % 97}.example/{kind}/{i}"]
        is_html = kind != "pdf" and not (i % 20 != 13 and i % 7 == 3)
        if kind == "pdf" and i % 20 != 13:
            assert row["title"] is None  # PDF payload, no HTML head
        elif is_html:
            assert row["title"] == f"doc {i}", (i, kind, row)
        else:  # pre-extracted rows carry html=b""
            assert row["title"] is None
        assert row["robots_noindex"] is False


def test_duplicate_tags_document_order_wins():
    # repeated description metas in DIFFERENT attribute orders: the
    # document-order first one (content-first form, value B) must win —
    # a pattern-order coalesce would return A
    html = ('<html><head>'
            '<meta content="B" name="description">'
            '<meta name="description" content="A">'
            '<meta content="noindex" name="robots">'
            '<meta name="robots" content="none at all">'
            '</head>')
    rows = _meta(html)
    assert rows["meta_description"] == "B"
    assert rows["robots_noindex"] is True
    assert rows["robots_nofollow"] is False


def test_empty_value_still_participates():
    # empty content on the first (participating) variant must yield ""
    # rather than falling through to a later variant or null
    html = ('<head><meta name="description" content="">'
            '<meta content="later" name="description"></head>')
    assert _meta(html)["meta_description"] == ""


# ------------------------------------------------------- template fingerprints

def _tfp(rows):
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.stages.headmeta import template_fingerprints

    ds = rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array([r[1] for r in rows], pa.string()),
    }))
    return {r["url"]: (r["host"], r["template_id"])
            for r in template_fingerprints(ds).take_all()}


def test_template_id_ignores_content_and_attributes(ray_session):
    a = '<html><head><title>One</title></head><body><div class="x"><p>hello world</p></div></body></html>'
    b = '<HTML><head><title>Totally other</title></head><body><div id="y"><p>different text</p></div></body></html>'
    c = '<html><head><title>T</title></head><body><table><tr><td>z</td></tr></table></body></html>'
    got = _tfp([("https://a.example/1", a),
                ("https://a.example/2", b),
                ("https://b.example/1", c)])
    assert got["https://a.example/1"][1] == got["https://a.example/2"][1]
    assert got["https://a.example/1"][1] != got["https://b.example/1"][1]
    assert got["https://a.example/1"][0] == got["https://a.example/2"][0]


def test_template_id_is_the_md5_of_the_tag_sequence(ray_session):
    import hashlib
    html = '<html><body><p>x</p><p>y</p></body></html>'
    got = _tfp([("https://h.example/", html)])
    want = hashlib.md5(b"html body p p").hexdigest()
    assert got["https://h.example/"][1] == want


def test_template_malformed_html_soft_fails(ray_session):
    got = _tfp([("https://h.example/", "<<<not <1bad> html <p")])
    import hashlib
    # '<not' and '<p' parse as tag starts; '<1bad>' does not
    assert got["https://h.example/"][1] == hashlib.md5(b"not p").hexdigest()


# ---------------------------------------------------------------------------
# structured_data (OpenGraph / JSON-LD / microdata)
# ---------------------------------------------------------------------------

def _sd(html: str | bytes, **kw):
    from pappermate_ray.stages.headmeta import structured_data_batch
    t = pa.table({"url": ["https://h.example/"], "html": [html]})
    return structured_data_batch(t, **kw).to_pylist()[0]


def test_sd_full_og_card_and_jsonld():
    r = _sd('<html><head>'
            '<meta property="og:title" content="A Title"/>'
            '<meta property="og:type" content="article"/>'
            '<meta property="og:image" content="https://i.example/x.jpg"/>'
            '<script type="application/ld+json">{"@type": "Article"}</script>'
            '</head><body itemscope itemtype="https://schema.org/Article">'
            '<b itemprop="headline">x</b></body></html>')
    assert r["og_title"] == "A Title"
    assert r["og_type"] == "article"
    assert r["og_image"] == "https://i.example/x.jpg"
    assert r["n_ld_blocks"] == 1 and r["ld_types"] == "Article"
    assert r["n_itemprops"] == 1
    assert r["itemtype"] == "https://schema.org/Article"


def test_sd_content_first_uppercase_single_quotes():
    r = _sd("<HTML><HEAD><META CONTENT='T' PROPERTY='og:title'>"
            "</HEAD><BODY><i itemprop=genre>g</i></BODY></HTML>")
    assert r["og_title"] == "T"
    assert r["og_type"] == "" and r["og_image"] == ""
    assert r["n_itemprops"] == 1 and r["itemtype"] == ""


def test_sd_first_og_tag_wins_across_attribute_orders():
    r = _sd('<head><meta content="first" property="og:title">'
            '<meta property="og:title" content="second"></head>')
    assert r["og_title"] == "first"


def test_sd_ld_types_sorted_distinct_across_blocks():
    r = _sd('<script type="application/ld+json">{"@type": "WebPage"}</script>'
            '<script type="application/ld+json">{"@type" : "Article"}</script>'
            '<script type="application/ld+json">{"@type": "Article"}</script>')
    assert r["n_ld_blocks"] == 3
    assert r["ld_types"] == "Article,WebPage"


def test_sd_bare_page_is_all_empty_and_zero():
    r = _sd("<html><body><p>just text</p></body></html>")
    assert r["og_title"] == r["og_type"] == r["og_image"] == ""
    assert r["n_ld_blocks"] == 0 and r["ld_types"] == ""
    assert r["n_itemprops"] == 0 and r["itemtype"] == ""


def test_sd_binary_input_and_max_bytes_bound():
    head = ('<head><meta property="og:title" content="in head"/></head>'
            '<body>').encode()
    tail = (b'x' * 2048
            + b'<meta property="og:type" content="beyond-bound"/></body>')
    r = _sd(head + tail, max_bytes=1024)
    assert r["og_title"] == "in head"
    assert r["og_type"] == ""  # beyond the scan bound on purpose


# property: og extraction is invariant to attribute order, quote style
# and tag case, and first-tag-wins holds under arbitrary interleaving

def test_sd_property_attribute_permutations():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    val = st.text(alphabet="abcdefghij XYZ-_.,:/0123456789", min_size=0,
                  max_size=24)

    def og_tag(prop: str, content: str, order: bool, quote: str,
               upper: bool) -> str:
        # uppercase only tag/attribute NAMES — values stay verbatim
        meta, pk, ck = ("META", "PROPERTY", "CONTENT") if upper else \
                       ("meta", "property", "content")
        p = f"{pk}={quote}og:{prop}{quote}"
        c = f"{ck}={quote}{content}{quote}"
        return f"<{meta} {p} {c}>" if order else f"<{meta} {c} {p}>"

    @given(t1=val, t2=val, order1=st.booleans(), order2=st.booleans(),
           q1=st.sampled_from(['"', "'"]), q2=st.sampled_from(['"', "'"]),
           up=st.booleans())
    @settings(max_examples=120, deadline=None)
    def check(t1, t2, order1, order2, q1, q2, up):
        # quotes can't appear inside the quoted value
        html = ("<html><head>"
                + og_tag("title", t1, order1, q1, up)
                + og_tag("title", t2, order2, q2, False)
                + "</head><body></body></html>")
        r = _sd(html)
        assert r["og_title"] == t1  # document-order first tag wins

    check()


class TestOgDocumentOrder:
    """Round-4 advisor finding #2: 'FIRST matching tag' must mean first
    in DOCUMENT order across syntactic forms, not first-matching-
    pattern. The fused single-alternation extract honors that; pinned
    here because the planted oracle uses one form per page and cannot
    see it."""

    def test_first_tag_wins_across_forms(self):
        import pyarrow as pa

        from pappermate_ray.stages.headmeta import structured_data_batch

        dual1 = ('<html><head>'
                 '<meta content="EARLY" property="og:title">'
                 '<meta property="og:title" content="LATE">'
                 '</head></html>')
        dual2 = ('<html><head>'
                 '<meta property="og:title" content="EARLY2">'
                 '<meta content="LATE2" property="og:title">'
                 '</head></html>')
        quote_mix = ('<html><head>'
                     "<meta content='EARLY3' property='og:title'>"
                     '<meta property="og:title" content="LATE3">'
                     '</head></html>')
        t = pa.table({"url": ["u1", "u2", "u3"],
                      "html": [dual1, dual2, quote_mix]})
        got = structured_data_batch(t).to_pydict()["og_title"]
        assert got == ["EARLY", "EARLY2", "EARLY3"]
