"""URL/domain curation operators (stages/urls.py): parse, canonicalize,
registered domain, per-domain cap, blocklist."""

import pyarrow as pa
import pandas as pd
import pytest

from pappermate_ray.stages.urls import (
    blocklist_filter,
    blocklist_regex,
    canonicalize_batch,
    canonicalize_urls,
    domain_cap,
    parse_url_batch,
    parse_urls,
)


def _t(urls):
    return pa.table({"url": pa.array(urls, pa.string())})


def test_parse_fields():
    t = parse_url_batch(_t([
        "HTTP://WWW.Example.COM:8080/a/b?x=1&y=2#frag",
        "https://sub.example.co.uk/path",
        "http://example.com",
        "https://localhost:9000/",
    ]))
    assert t["scheme"].to_pylist() == ["http", "https", "http", "https"]
    assert t["host"].to_pylist() == [
        "www.example.com", "sub.example.co.uk", "example.com", "localhost"]
    assert t["port"].to_pylist() == [8080, -1, -1, 9000]
    assert t["path"].to_pylist() == ["/a/b", "/path", "", "/"]
    assert t["query"].to_pylist() == ["x=1&y=2", "", "", ""]
    assert t["fragment"].to_pylist() == ["frag", "", "", ""]
    assert t["registered_domain"].to_pylist() == [
        "example.com", "example.co.uk", "example.com", "localhost"]


def test_parse_non_url_rows_are_null():
    t = parse_url_batch(_t(["not a url", "ftp-ish:nope", "https://ok.example.org/x"]))
    assert t["scheme"].to_pylist() == [None, None, "https"]
    assert t["port"].to_pylist() == [None, None, -1]
    assert t["registered_domain"].to_pylist() == [None, None, "example.org"]


@pytest.mark.parametrize("url,canon", [
    # default-port strip is scheme-aware; non-default kept
    ("https://Ex.COM:443/a", "https://ex.com/a"),
    ("http://ex.com:443/a", "http://ex.com:443/a"),
    ("http://ex.com:80/a", "http://ex.com/a"),
    # empty path -> '/', fragment dropped
    ("https://ex.com#top", "https://ex.com/"),
    # tracking params removed, remainder sorted; '?' dropped when empty
    ("https://ex.com/p?utm_source=x&b=2&a=1", "https://ex.com/p?a=1&b=2"),
    ("https://ex.com/p?utm_campaign=x&ref=tw&fbclid=1", "https://ex.com/p"),
    # bare param names and values with '=' survive intact
    ("https://ex.com/p?flag&z=a=b", "https://ex.com/p?flag&z=a=b"),
])
def test_canonical_forms(url, canon):
    t = canonicalize_batch(_t([url]))
    assert t["canonical_url"].to_pylist() == [canon]


def test_canonicalize_null_passthrough():
    t = canonicalize_batch(_t(["nope", "https://a.example.com/x?id=1"]))
    assert t["canonical_url"].to_pylist() == [None, "https://a.example.com/x?id=1"]


def test_blocklist_regex_subdomain_semantics():
    import re

    pat = re.compile(blocklist_regex(["bad.com", "evil.co.uk"]))
    assert pat.search("bad.com")
    assert pat.search("a.bad.com")
    assert pat.search("deep.a.bad.com")
    assert not pat.search("notbad.com")       # no substring false-positive
    assert not pat.search("bad.com.br")       # suffix-anchored
    assert pat.search("x.evil.co.uk")


def test_blocklist_filter_url_col(ray_session):
    import ray.data as rd

    ds = rd.from_items([
        {"url": "https://keep.example.org/1"},
        {"url": "https://sub.bad.com/2"},
        {"url": "https://bad.com/3"},
        {"url": "https://alsokeep.io/4"},
    ])
    out = blocklist_filter(ds, ["bad.com"]).take_all()
    assert sorted(r["url"] for r in out) == [
        "https://alsokeep.io/4", "https://keep.example.org/1"]


def test_domain_cap_deterministic(ray_session):
    import ray.data as rd

    rows = [{"url": f"https://h{i % 2}.example.com/{i}", "prio": i}
            for i in range(10)]
    rows += [{"url": f"https://only.example.org/{i}", "prio": i} for i in range(2)]
    ds = parse_urls(rd.from_items(rows).repartition(3))
    out = domain_cap(ds, k=4, priority_col="prio").take_all()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["registered_domain"], []).append(r["prio"])
    # example.com had 10 rows -> capped at the 4 lowest priorities
    assert sorted(by_dom["example.com"]) == [0, 1, 2, 3]
    # under-cap domain unaffected
    assert sorted(by_dom["example.org"]) == [0, 1]


def test_parse_and_canonicalize_dataset_wrappers(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"url": "HTTP://A.ExAmple.COM:80/x?utm_a=1&q=2"}])
    p = parse_urls(ds).take_all()[0]
    assert p["host"] == "a.example.com" and p["port"] == 80
    c = canonicalize_urls(ds).take_all()[0]
    assert c["canonical_url"] == "http://a.example.com/x?q=2"


def test_host_quality_filter(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.urls import host_quality_filter

    # good.com: mean 400 over 3 docs; bad.com: mean 100 over 3 docs;
    # lone.org: mean 1000 but only 1 doc (fails min_docs).
    rows = (
        [{"registered_domain": "good.com", "n_chars": v} for v in (300, 400, 500)]
        + [{"registered_domain": "bad.com", "n_chars": v} for v in (100, 100, 100)]
        + [{"registered_domain": "lone.org", "n_chars": 1000}]
    )
    ds = rd.from_items(rows).repartition(3)
    out = host_quality_filter(ds, "n_chars", threshold=300, min_docs=2).take_all()
    assert {r["registered_domain"] for r in out} == {"good.com"}
    assert len(out) == 3
    # boundary: integer cross-multiplication keeps the exactly-at-mean domain
    edge = rd.from_items(
        [{"registered_domain": "edge.com", "n_chars": v} for v in (299, 301)])
    kept = host_quality_filter(edge, "n_chars", threshold=300, min_docs=2).take_all()
    assert len(kept) == 2


def test_robots_filter_broadcast_path(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.urls import robots_filter

    pages = rd.from_items(
        [
            {"doc_id": 0, "host": "a.com", "path": "/private/x"},
            {"doc_id": 1, "host": "a.com", "path": "/public/x"},
            {"doc_id": 2, "host": "b.com", "path": "/private/x"},  # no rule for b.com
            {"doc_id": 3, "host": "a.com", "path": "/privateer"},  # prefix match
            {"doc_id": 4, "host": "sub.a.com", "path": "/private/x"},  # exact host only
            {"doc_id": 5, "host": "c.com", "path": "/anything"},  # '' disallows all
        ],
        override_num_blocks=2,
    )
    rules = [("a.com", "/private"), ("c.com", "")]
    kept = {r["doc_id"] for r in robots_filter(pages, rules).take_all()}
    assert kept == {1, 2, 4}


def test_robots_filter_paths_identical(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.urls import robots_filter

    pages = rd.from_items(
        [{"doc_id": i, "host": f"h{i % 5}.com", "path": f"/p{i % 7}/x"}
         for i in range(60)],
        override_num_blocks=4,
    )
    rules = [(f"h{k}.com", f"/p{k}") for k in range(5)] + [("h1.com", "/p4")]
    bc = sorted(r["doc_id"] for r in robots_filter(pages, rules).take_all())
    dist = sorted(r["doc_id"] for r in
                  robots_filter(pages, rules, broadcast_bound=0).take_all())
    assert bc == dist
    assert 0 < len(bc) < 60


def test_canonicalize_idempotent():
    """canonicalize(canonicalize(u)) == canonicalize(u) — the canonical
    form is a fixpoint (re-ingesting an already-cleaned frontier must be
    a no-op)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    urlish = st.builds(
        lambda scheme, host, port, path, params, frag:
            f"{scheme}://{host}{port}{path}"
            + ("?" + "&".join(params) if params else "") + frag,
        scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
        host=st.sampled_from(["A.Example.COM", "sub.site7.co.uk", "X.ORG"]),
        port=st.sampled_from(["", ":80", ":443", ":8080"]),
        path=st.sampled_from(["", "/x", "/Doc/5", "/p/"]),
        params=st.lists(st.sampled_from(
            ["id=1", "a=2", "b=1", "utm_source=f", "ref=tw", "fbclid=z",
             "flag", "z=a=b"]), max_size=4, unique=True),
        frag=st.sampled_from(["", "#s", "#Sec/2?x=1"]),
    )

    @given(urlish)
    @settings(max_examples=300, deadline=None)
    def check(u):
        once = canonicalize_batch(_t([u]))["canonical_url"].to_pylist()[0]
        twice = canonicalize_batch(_t([once]))["canonical_url"].to_pylist()[0]
        assert twice == once
        assert "#" not in once
        for p in ("utm_", "fbclid", "gclid", "msclkid", "ref="):
            assert ("?" + p) not in once and ("&" + p) not in once

    check()


def test_frontier_schedule_politeness_bound(ray_session):
    import collections

    import ray.data as rd

    from pappermate_ray.stages.urls import frontier_schedule

    rows = [{"doc_id": i, "host": f"h{i % 3}", "priority": (i * 5) % 11}
            for i in range(40)]
    out = frontier_schedule(rd.from_items(rows), per_wave=2,
                            order_cols=("priority", "doc_id")).take_all()
    assert len(out) == 40
    per = collections.Counter((r["host"], r["wave"]) for r in out)
    assert max(per.values()) <= 2            # politeness bound
    by_host = collections.defaultdict(list)
    for r in sorted(out, key=lambda r: (r["wave"], r["slot"])):
        by_host[r["host"]].append((r["priority"], r["doc_id"]))
    for seq in by_host.values():             # best-priority-first per host
        assert seq == sorted(seq)
    # waves are dense per host: 14/13/13 rows over 3 hosts -> max wave 6
    assert max(r["wave"] for r in out) == 6


def test_url_pattern_traps_and_filter(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.urls import trap_filter, url_pattern_traps

    rows = [{"url": f"https://trap.com/cal/2026-{i % 12}-{i % 28}"}
            for i in range(50)]
    rows += [{"url": f"https://ok.org/page{i}"} for i in range(3)]
    rows.append({"url": "https://trap.com/cal/2026-1-1"})  # dup: counted once
    rows.append({"url": "junk"})                           # unparsable: drops

    traps = url_pattern_traps(rd.from_items(rows), min_urls=10)
    got = traps.take_all()
    assert [(r["host"], r["pattern"], r["n_urls"]) for r in got] == \
        [("trap.com", "/cal/N-N-N", 50)]

    kept = trap_filter(rd.from_items(rows), traps).take_all()
    assert sorted({r["url"] for r in kept}) == \
        ["https://ok.org/page0", "https://ok.org/page1",
         "https://ok.org/page2", "junk"]


def test_host_lang_profile(ray_session):
    import math

    import ray.data as rd

    from pappermate_ray.stages.urls import host_lang_profile

    # pure.com: single-lang host (entropy exactly 0.0, never -0.0);
    # mixed.net: 2/1/1 split over 3 langs → entropy 1.5 bits, majority
    # share 50% < 80% → mixed; tie.org: 2-vs-2 tie breaks to the
    # lexicographically smallest lang; edge.io: majority share exactly
    # 80% — the strict < keeps it NOT mixed at the boundary.
    rows = (
        [{"host": "pure.com", "lang": "en"}] * 4
        + [{"host": "mixed.net", "lang": "en"}] * 2
        + [{"host": "mixed.net", "lang": "pt"},
           {"host": "mixed.net", "lang": "de"}]
        + [{"host": "tie.org", "lang": "pt"}] * 2
        + [{"host": "tie.org", "lang": "de"}] * 2
        + [{"host": "edge.io", "lang": "en"}] * 4
        + [{"host": "edge.io", "lang": "fr"}]
        + [{"host": None, "lang": "en"}, {"host": "pure.com", "lang": None}]
    )
    out = {r["host"]: r
           for r in host_lang_profile(
               rd.from_items(rows).repartition(4)).take_all()}
    assert set(out) == {"pure.com", "mixed.net", "tie.org", "edge.io"}

    p = out["pure.com"]
    assert (p["n_docs"], p["n_langs"], p["majority_lang"], p["majority_n"]) \
        == (4, 1, "en", 4)
    assert p["lang_entropy"] == 0.0 and not math.copysign(1, p["lang_entropy"]) < 0
    assert not p["is_mixed"]

    m = out["mixed.net"]
    assert (m["n_docs"], m["n_langs"], m["majority_lang"], m["majority_n"]) \
        == (4, 3, "en", 2)
    assert m["lang_entropy"] == 1.5 and m["is_mixed"]

    t = out["tie.org"]
    assert (t["majority_lang"], t["majority_n"]) == ("de", 2)
    assert t["lang_entropy"] == 1.0 and t["is_mixed"]

    e = out["edge.io"]
    assert (e["n_docs"], e["majority_n"]) == (5, 4)
    assert not e["is_mixed"]  # 4*1000 == 800*5 — strict inequality


def test_trap_filter_broadcast_and_join_tiers_identical(ray_session):
    """Round-5 hybrid: broadcast packed-key is_in vs the distributed
    anti-join, identical survivors."""
    import ray.data as rd

    from pappermate_ray.stages.urls import trap_filter, url_pattern_traps

    rows = []
    for i in range(120):
        host = f"h{i % 4}.example"
        # hosts h0/h1 generate a calendar trap family (many urls, one
        # digit-collapsed pattern); others are organic
        if i % 4 in (0, 1):
            rows.append({"doc_id": i,
                         "url": f"https://{host}/cal/2024/{i}/page"})
        else:
            rows.append({"doc_id": i,
                         "url": f"https://{host}/article-{i}"})
    ds = rd.from_items(rows, override_num_blocks=3)
    traps = url_pattern_traps(ds, min_urls=3)
    bcast = sorted(r["doc_id"] for r in
                   trap_filter(ds, traps).take_all())
    joined = sorted(r["doc_id"] for r in
                    trap_filter(ds, traps, broadcast_bound=0).take_all())
    assert bcast == joined
    assert len(bcast) < 120  # the trap family actually dropped
