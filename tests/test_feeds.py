"""Feed parsing (stages/feeds.py) — contract pins: link-required rule,
RSS text-link vs Atom href-link, guid/id + pubDate/updated mapping,
entity unescape, case-insensitive tags, soft-fail bytes."""

from __future__ import annotations


def _rows(items, ray_session=None):
    import ray.data as rd

    from pappermate_ray.stages.feeds import parse_feeds

    return parse_feeds(rd.from_items(items)).take_all()


def test_rss_items(ray_session):
    xml = (b'<?xml version="1.0"?><rss version="2.0"><channel>'
           b"<title>Chan</title><link>https://e.example/</link>"
           b"<item><title>A &amp; B</title>"
           b"<link> https://e.example/a?x=1&amp;y=2 </link>"
           b"<guid>tag:1</guid><pubDate>Mon, 05 Jan 2026</pubDate></item>"
           b"<item><title>No link drops</title></item>"
           b"<item><link>https://e.example/b</link></item>"
           b"</channel></rss>")
    out = _rows([{"url": "https://e.example/feed.xml", "xml": xml}])
    # channel-level <title>/<link> are OUTSIDE <item> blocks: not entries
    assert len(out) == 2
    a, b = out
    assert a["kind"] == "rss"
    assert a["title"] == "A & B"
    assert a["link"] == "https://e.example/a?x=1&y=2"
    assert (a["guid"], a["pubdate"]) == ("tag:1", "Mon, 05 Jan 2026")
    assert b["link"] == "https://e.example/b"
    assert b["title"] is None and b["guid"] is None and b["pubdate"] is None


def test_atom_entries(ray_session):
    xml = (b'<feed xmlns="http://www.w3.org/2005/Atom">'
           b'<ENTRY><TITLE type="text">T1</TITLE>'
           b'<LINK rel="alternate" href="https://e.example/p1"/>'
           b"<ID>urn:1</ID><UPDATED>2026-02-01T00:00:00Z</UPDATED></ENTRY>"
           b"<entry><id>urn:2</id></entry>"  # no href: drops
           b"</feed>")
    out = _rows([{"url": "u", "xml": xml}])
    assert len(out) == 1
    e = out[0]
    assert e["kind"] == "atom"
    assert (e["title"], e["link"], e["guid"], e["pubdate"]) == \
        ("T1", "https://e.example/p1", "urn:1", "2026-02-01T00:00:00Z")


def test_soft_fail_and_non_feed(ray_session):
    out = _rows([
        {"url": "a", "xml": b"\xff\xfe<rss><item>"
                            b"<link>https://e.example/k</link></item></rss>"},
        {"url": "b", "xml": b""},
        {"url": "c", "xml": b"<html>nope</html>"},
    ])
    assert [r["link"] for r in out] == ["https://e.example/k"]


def test_atom_single_quoted_href(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from pappermate_ray.stages.feeds import parse_feeds

    xml = ("<feed><entry><link href='https://e.example/p1'/>"
           "<id>urn:1</id><title>T1</title>"
           "<updated>2024-01-01</updated></entry></feed>")
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["https://e.example/feed.xml"], pa.string()),
        "xml": pa.array([xml.encode()], pa.binary()),
    }))
    rows = parse_feeds(ds).take_all()
    assert len(rows) == 1
    assert rows[0]["link"] == "https://e.example/p1"
    assert rows[0]["kind"] == "atom"
