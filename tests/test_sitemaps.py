"""Sitemap parsing (stages/sitemaps.py) — contract pins: loc-required
rule, entity unescape + trim, kind tagging for index recursion,
non-numeric priority, case-insensitive tags, soft-fail bytes."""

from __future__ import annotations


def _rows(items, ray_session=None):
    import ray.data as rd

    from pappermate_ray.stages.sitemaps import parse_sitemaps

    return parse_sitemaps(rd.from_items(items)).take_all()


def test_urlset_fields_and_unescape(ray_session):
    xml = (b'<?xml version="1.0"?><urlset>'
           b"<url><loc> https://e.example/a?x=1&amp;y=2 </loc>"
           b"<lastmod>2026-01-15</lastmod><changefreq>daily</changefreq>"
           b"<priority>0.75</priority></url>"
           b"<url><loc>https://e.example/b</loc></url>"
           b"<url><lastmod>2026-02-01</lastmod></url>"  # no loc: drops
           b"</urlset>")
    out = _rows([{"url": "https://e.example/sitemap.xml", "xml": xml}])
    assert len(out) == 2
    a, b = out
    assert a["loc"] == "https://e.example/a?x=1&y=2"  # trimmed + unescaped
    assert (a["lastmod"], a["changefreq"], a["priority"]) == \
        ("2026-01-15", "daily", 0.75)
    assert a["kind"] == "url"
    assert b["loc"] == "https://e.example/b"
    assert b["lastmod"] is None and b["priority"] is None


def test_sitemapindex_kind_for_recursion(ray_session):
    xml = (b"<SITEMAPINDEX><SITEMAP><LOC>https://e.example/sm/1.xml</LOC>"
           b"</SITEMAP></SITEMAPINDEX>")
    out = _rows([{"url": "u", "xml": xml}])
    assert [(r["kind"], r["loc"]) for r in out] == \
        [("sitemap", "https://e.example/sm/1.xml")]


def test_non_numeric_priority_is_null(ray_session):
    xml = (b"<urlset><url><loc>https://e.example/x</loc>"
           b"<priority>high</priority></url></urlset>")
    out = _rows([{"url": "u", "xml": xml}])
    assert out[0]["priority"] is None


def test_soft_fail_and_empty_payloads(ray_session):
    out = _rows([
        {"url": "a", "xml": b"\xff\xfe<urlset><url>"
                            b"<loc>https://e.example/k</loc></url></urlset>"},
        {"url": "b", "xml": b""},
        {"url": "c", "xml": b"<html>not a sitemap</html>"},
    ])
    assert [r["loc"] for r in out] == ["https://e.example/k"]
