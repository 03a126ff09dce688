"""Hyperlink extraction (stages/links.py) and the HTML→link-graph
composite."""

import pytest


def _edges(rows, ray_session=None):
    import ray.data as rd

    from pappermate_ray.stages.links import extract_links

    return extract_links(rd.from_items(rows)).take_all()


def test_href_forms_and_resolution(ray_session):
    html = (
        b'<html><body>'
        b'<a href="/about">About  Us</a>'
        b"<a href='/q?x=1'>Quoted</a>"
        b'<a href=/bare>Bare</a>'
        b'<a href="https://other.example/page">Ext <b>bold</b></a>'
        b'<a href="#frag">Frag only</a>'
        b'<a href="javascript:void(0)">JS</a>'
        b'<a href="rel/path">Relative</a>'
        b'</body></html>'
    )
    out = _edges([{"url": "https://site1.example/a/1", "html": html}])
    got = {(r["dst_url"], r["anchor"]) for r in out}
    assert got == {
        ("https://site1.example/about", "About Us"),
        ("https://site1.example/q?x=1", "Quoted"),
        ("https://site1.example/bare", "Bare"),
        ("https://other.example/page", "Ext bold"),
    }
    assert all(r["src_url"] == "https://site1.example/a/1" for r in out)


def test_soft_fail_on_binary_and_empty(ray_session):
    out = _edges([
        {"url": "https://s.example/x", "html": b"\xff\xfe<a href=\"/k\">K</a>"},
        {"url": "https://s.example/y", "html": b""},
    ])
    # undecodable bytes are ignored (errors='ignore'), link still found
    assert [r["dst_url"] for r in out] == ["https://s.example/k"]


def test_link_graph_composite_on_fixture(ray_session):
    import ray.data as rd

    from pappermate_ray.fixtures import build_pages_table
    from pappermate_ray.ops.anchors import aggregate_anchors
    from pappermate_ray.stages.links import extract_links

    pages = rd.from_arrow(build_pages_table(60)).repartition(3)
    edges = extract_links(pages)
    agg = {r["dst_url"]: r for r in
           aggregate_anchors(edges, src_col="src_url",
                             dst_col="dst_url").take_all()}
    # every HTML page links /about in its footer; site 1 appears for
    # doc ids 1 and 98.. (only 60 docs here) -> at least doc 1
    assert any(d.endswith("/about") for d in agg)
    about = [r for d, r in agg.items() if d.endswith("/about")]
    assert sum(r["n_inlinks"] for r in about) > 0
    for r in about:
        assert set(r["anchors"].split("|")) == {"About"}


def test_nofollow_anchor_token_rule(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.links import extract_links

    html = (
        b'<html><body>'
        b'<a href="/keep">Keep</a>'
        b'<a href="/ad1" rel="nofollow">Ad1</a>'
        b"<a href='/ad2' rel='ugc nofollow'>Ad2</a>"
        b'<a href="/ad3" rel=nofollow>Ad3</a>'
        b'<a href="/near" rel="nofollowish">Near</a>'
        b'<a rel="sponsored" href="/spon">Spon</a>'
        b'</body></html>'
    )
    rows = [{"url": "https://s.example/p", "html": html}]
    on = extract_links(rd.from_items(rows), respect_nofollow=True).take_all()
    assert {r["dst_url"] for r in on} == {
        "https://s.example/keep",
        "https://s.example/near",   # token rule: 'nofollowish' is not nofollow
        "https://s.example/spon",
    }
    off = extract_links(rd.from_items(rows)).take_all()
    assert len(off) == 6  # default harvest unchanged


def test_nofollow_page_level_robots(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.links import extract_links

    blocked = (b'<html><head>'
               b'<meta content="index, NOFOLLOW" name="robots"></head>'
               b'<body><a href="/a">A</a><a href="/b">B</a></body></html>')
    openp = (b'<html><head><meta name="robots" content="noindex"></head>'
             b'<body><a href="/c">C</a></body></html>')
    rows = [{"url": "https://s.example/1", "html": blocked},
            {"url": "https://s.example/2", "html": openp}]
    on = extract_links(rd.from_items(rows), respect_nofollow=True).take_all()
    # noindex alone does NOT suppress edges; nofollow suppresses all
    assert {r["dst_url"] for r in on} == {"https://s.example/c"}
    off = extract_links(rd.from_items(rows)).take_all()
    assert len(off) == 3


def test_host_graph_rollup(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.links import host_graph

    rows = [{"src_url": f"https://a{i % 2}.com/p{i}",
             "dst_url": f"https://b{i % 3}.org/x"} for i in range(10)]
    rows.append({"src_url": "https://a0.com/p0",       # same page, 2nd link
                 "dst_url": "https://b1.org/y"})
    rows.append({"src_url": "https://a0.com/p0",       # duplicate edge:
                 "dst_url": "https://b0.org/x"})       # +1 link, +0 pages
    rows.append({"src_url": "https://a0.com/self",     # intra-host: drops
                 "dst_url": "https://a0.com/other"})
    rows.append({"src_url": "junk", "dst_url": "https://b0.org/"})

    got = {(r["src_host"], r["dst_host"]): (r["n_links"], r["n_src_pages"])
           for r in host_graph(rd.from_items(rows)).take_all()}
    assert got == {
        ("a0.com", "b0.org"): (3, 2),
        ("a0.com", "b1.org"): (2, 2),
        ("a0.com", "b2.org"): (2, 2),
        ("a1.com", "b0.org"): (2, 2),
        ("a1.com", "b1.org"): (2, 2),
        ("a1.com", "b2.org"): (1, 1),
    }

    kept = host_graph(rd.from_items(rows), include_intra=True).take_all()
    assert ("a0.com", "a0.com") in {(r["src_host"], r["dst_host"])
                                    for r in kept}


# ---------------------------------------------------------------- reciprocity

def _recip(pairs):
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.stages.links import host_reciprocity

    ds = rd.from_arrow(pa.table({
        "src_host": pa.array([a for a, _ in pairs], pa.string()),
        "dst_host": pa.array([b for _, b in pairs], pa.string()),
    })).repartition(3)
    out = host_reciprocity(ds).take_all()
    got = {r["host"]: (r["out_deg"], r["in_deg"], r["recip_out"],
                       r["recip_ratio"]) for r in out}
    assert len(got) == len(out)
    return got


def _recip_brute(pairs):
    d = {(a, b) for a, b in pairs if a != b}
    hosts = {h for p in d for h in p}
    out = {}
    for h in hosts:
        od = sum(1 for a, b in d if a == h)
        ind = sum(1 for a, b in d if b == h)
        rc = sum(1 for a, b in d if a == h and (b, a) in d)
        import numpy as np
        out[h] = (od, ind, rc, float(np.round(rc / od, 6)) if od else 0.0)
    return out


def test_reciprocity_matches_bruteforce(ray_session):
    import numpy as np
    rng = np.random.RandomState(3)
    hosts = [f"h{i}" for i in range(12)]
    pairs = [(hosts[rng.randint(12)], hosts[rng.randint(12)])
             for _ in range(80)]
    assert _recip(pairs) == _recip_brute(pairs)


def test_reciprocity_ring_and_sink(ray_session):
    # a↔b link exchange, c→a one-way, d pure sink
    pairs = [("a", "b"), ("b", "a"), ("c", "a"), ("a", "d"),
             ("a", "b"), ("a", "a")]  # dup + self-loop must collapse
    got = _recip(pairs)
    assert got["a"] == (2, 2, 1, 0.5)
    assert got["b"] == (1, 1, 1, 1.0)
    assert got["c"] == (1, 0, 0, 0.0)
    assert got["d"] == (0, 1, 0, 0.0)


# ---------------------------------------------------------------- co-citation

def _cocite(pairs, **kw):
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.stages.links import co_citation

    ds = rd.from_arrow(pa.table({
        "src_host": pa.array([a for a, _ in pairs], pa.string()),
        "dst_host": pa.array([b for _, b in pairs], pa.string()),
    })).repartition(3)
    out = co_citation(ds, **kw).take_all()
    return {(r["host_a"], r["host_b"]): r["n_shared"] for r in out}


def _cocite_brute(pairs, min_shared=2, max_fanout=10_000, coupling=False):
    d = {(a, b) for a, b in pairs if a != b}
    if coupling:
        d = {(b, a) for a, b in d}
    from collections import Counter, defaultdict
    by_key = defaultdict(set)
    for k, v in d:
        by_key[k].add(v)
    cnt = Counter()
    for k, vs in by_key.items():
        if len(vs) > max_fanout:
            continue
        vs = sorted(vs)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                cnt[(vs[i], vs[j])] += 1
    return {p: c for p, c in cnt.items() if c >= min_shared}


def test_cocitation_matches_bruteforce(ray_session):
    import numpy as np
    rng = np.random.RandomState(47)
    hosts = [f"h{i}" for i in range(15)]
    pairs = [(hosts[rng.randint(15)], hosts[rng.randint(15)])
             for _ in range(140)]
    for ms in (1, 2):
        assert _cocite(pairs, min_shared=ms) == \
            _cocite_brute(pairs, min_shared=ms)


def test_coupling_flips_the_axis(ray_session):
    # a and b both cite x and y: coupled (share outlinks), never
    # co-cited (nothing links TO them together)
    pairs = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    assert _cocite(pairs, min_shared=2, coupling=True) == {("a", "b"): 2}
    assert _cocite(pairs, min_shared=1, coupling=False) == \
        {("x", "y"): 2}


def test_fanout_cap_excludes_mega_hub(ray_session):
    # hub cites 5 hosts; with max_fanout=4 its pairs vanish entirely
    pairs = [("hub", f"t{i}") for i in range(5)] + \
            [("s", "t0"), ("s", "t1")]
    got = _cocite(pairs, min_shared=1, max_fanout=4)
    assert got == {("t0", "t1"): 1}


def test_adamic_adar_weighted_scores(ray_session):
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.stages.links import co_citation

    # s1 cites {a,b} (fanout 2), s2 cites {a,b,c} (fanout 3): aa(a,b) =
    # 1/ln2 + 1/ln3; counts unchanged vs the unweighted mode
    pairs = [("s1", "a"), ("s1", "b"),
             ("s2", "a"), ("s2", "b"), ("s2", "c")]
    ds = rd.from_arrow(pa.table({
        "src_host": pa.array([a for a, _ in pairs], pa.string()),
        "dst_host": pa.array([b for _, b in pairs], pa.string()),
    })).repartition(2)
    got = {(r["host_a"], r["host_b"]): (r["n_shared"], r["aa_score"])
           for r in co_citation(ds, min_shared=1, weighted=True).take_all()}
    assert got[("a", "b")][0] == 2
    assert got[("a", "b")][1] == float(
        np.round(1 / math.log(2) + 1 / math.log(3), 6))
    assert got[("a", "c")] == (1, float(np.round(1 / math.log(3), 6)))
    assert got[("b", "c")] == (1, float(np.round(1 / math.log(3), 6)))


def test_host_mirror_pairs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.stages.links import host_mirror_pairs

    # m1/m2: full mirrors (3 shared of 3 each → jaccard 1.0);
    # m1/part: 1 shared of (3 + 2 - 1) = 4 → jaccard 0.25, not a
    # mirror at 500‰; dup rows on m1 collapse via the distinct pass;
    # lone has no shared fp and must not appear.
    rows = [
        ("m1", "f1"), ("m1", "f2"), ("m1", "f3"), ("m1", "f3"),
        ("m2", "f1"), ("m2", "f2"), ("m2", "f3"),
        ("part", "f1"), ("part", "p1"),
        ("lone", "x1"),
    ]
    ds = rd.from_arrow(pa.table({
        "host": pa.array([h for h, _ in rows], pa.string()),
        "fp": pa.array([f for _, f in rows], pa.string()),
    })).repartition(3)
    got = {(r["host_a"], r["host_b"]): r
           for r in host_mirror_pairs(ds, min_shared=1).take_all()}
    assert set(got) == {("m1", "m2"), ("m1", "part"), ("m2", "part")}
    full = got[("m1", "m2")]
    assert (full["n_shared"], full["n_a"], full["n_b"]) == (3, 3, 3)
    assert full["jaccard"] == 1.0 and full["is_mirror"]
    p = got[("m1", "part")]
    assert (p["n_shared"], p["n_a"], p["n_b"]) == (1, 3, 2)
    assert p["jaccard"] == 0.25 and not p["is_mirror"]
    # exactly-at-threshold: 1 shared of union 2 → 500‰, ≥ keeps it
    edge = rd.from_arrow(pa.table({
        "host": pa.array(["a", "a", "b"], pa.string()),
        "fp": pa.array(["s", "e", "s"], pa.string()),
    }))
    e = host_mirror_pairs(edge, min_shared=1).take_all()
    assert len(e) == 1 and e[0]["jaccard"] == 0.5 and e[0]["is_mirror"]
    # storm cap: a fingerprint on >max hosts identifies nothing
    boiler = rd.from_arrow(pa.table({
        "host": pa.array([f"h{i}" for i in range(6)], pa.string()),
        "fp": pa.array(["boiler"] * 6, pa.string()),
    }))
    assert host_mirror_pairs(boiler, min_shared=1,
                             max_hosts_per_fp=5).take_all() == []
    # min_shared filters sub-threshold pairs
    assert ("m1", "part") not in {
        (r["host_a"], r["host_b"])
        for r in host_mirror_pairs(ds, min_shared=2).take_all()}


def test_mirror_cluster_transitivity(ray_session):
    """Mirror pairs chain through components: a~b and b~c puts all
    three in one cluster with the smallest host canonical, even when
    a and c never pair directly (string ids through cluster_pairs)."""
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.stages.dedup import cluster_pairs

    edges = rd.from_arrow(pa.table({
        "id_a": pa.array(["b.com", "a.com"], pa.string()),
        "id_b": pa.array(["c.com", "b.com"], pa.string()),
    }))
    got = {r["doc_id"]: r["cluster_id"]
           for r in cluster_pairs(edges).take_all()}
    assert got == {"a.com": "a.com", "b.com": "a.com", "c.com": "a.com"}


def test_reciprocity_driver_and_exchange_tiers_identical(ray_session):
    """Round-5 driver tier (factorize + packed-key isin + bincounts)
    vs the semi-join/tagged-union exchange path."""
    import numpy as np
    import ray.data as rd

    from pappermate_ray.stages.links import host_reciprocity

    rng = np.random.RandomState(31)
    hosts = [f"h{i}.example" for i in range(40)]
    rows = [{"src_host": hosts[int(rng.randint(40))],
             "dst_host": hosts[int(rng.randint(40))]}
            for _ in range(400)]
    ds = rd.from_items(rows, override_num_blocks=4)
    drv = sorted(map(tuple, (r.values() for r in host_reciprocity(
        ds).take_all())))
    exch = sorted(map(tuple, (r.values() for r in host_reciprocity(
        ds, driver_bound=0).take_all())))
    assert drv == exch


def test_co_citation_driver_and_exchange_tiers_identical(ray_session):
    import numpy as np
    import ray.data as rd

    from pappermate_ray.stages.links import co_citation

    rng = np.random.RandomState(37)
    hosts = [f"h{i}.example" for i in range(30)]
    rows = [{"src_host": hosts[int(rng.randint(30))],
             "dst_host": hosts[int(rng.randint(30))]}
            for _ in range(300)]
    ds = rd.from_items(rows, override_num_blocks=4)
    for weighted in (False, True):
        for coupling in (False, True):
            drv = sorted(map(tuple, (r.values() for r in co_citation(
                ds, min_shared=2, weighted=weighted,
                coupling=coupling).take_all())))
            exch = sorted(map(tuple, (r.values() for r in co_citation(
                ds, min_shared=2, weighted=weighted, coupling=coupling,
                driver_bound=0).take_all())))
            assert drv == exch
    # fan-out cap respected identically on both tiers
    capped_rows = [{"src_host": "hub", "dst_host": f"t{i}"}
                   for i in range(12)]
    ds2 = rd.from_items(capped_rows)
    a = sorted(map(tuple, (r.values() for r in co_citation(
        ds2, min_shared=1, max_fanout=10).take_all())))
    b = sorted(map(tuple, (r.values() for r in co_citation(
        ds2, min_shared=1, max_fanout=10, driver_bound=0).take_all())))
    assert a == b == []  # 12 > max_fanout: hub endorses nothing
