"""robots.txt parsing (stages/robots.py) — contract pins: group
accrual over consecutive UA lines, group close on directive,
comments/blank lines, sitemap agent-null rows, case rules, headless
directives drop, agent group selection (own beats *)."""

from __future__ import annotations


def _rows(body, host="h.example"):
    import ray.data as rd

    from pappermate_ray.stages.robots import parse_robots

    out = parse_robots(rd.from_items([{"host": host, "body": body}]))
    return [(r["agent"], r["directive"], r["value"])
            for r in out.take_all()]


def test_groups_and_directives(ray_session):
    body = (b"# global rules\n"
            b"User-Agent: *\n"
            b"Disallow: /private/   # comment\n"
            b"Allow: /private/ok\n"
            b"\n"
            b"User-agent: GoodBot\n"
            b"user-agent: OtherBot\n"
            b"Disallow: /tmp\n"
            b"User-agent: LateBot\n"   # new group (after a directive)
            b"Disallow:\n"
            b"Sitemap: https://h.example/sm.xml\n"
            b"Crawl-delay: 10\n")      # unknown directive: drops
    assert _rows(body) == [
        ("*", "disallow", "/private/"),
        ("*", "allow", "/private/ok"),
        ("goodbot", "disallow", "/tmp"),
        ("otherbot", "disallow", "/tmp"),
        ("latebot", "disallow", ""),
        (None, "sitemap", "https://h.example/sm.xml"),
    ]


def test_headless_and_soft_fail(ray_session):
    assert _rows(b"Disallow: /early\nUser-agent: *\nDisallow: /x\n") == \
        [("*", "disallow", "/x")]
    assert _rows(b"") == []
    assert _rows(b"\xff\xfeUser-agent: *\nDisallow: /k\n") == \
        [("*", "disallow", "/k")]


def test_rules_for_agent_group_selection(ray_session):
    import ray.data as rd

    from pappermate_ray.stages.robots import parse_robots, rules_for_agent

    bodies = [
        {"host": "a.example",
         "body": b"User-agent: *\nDisallow: /all\n"
                 b"User-agent: mybot\nDisallow: /mine\nDisallow: /mine2\n"},
        {"host": "b.example", "body": b"User-agent: *\nDisallow: /star\n"},
    ]
    parsed = parse_robots(rd.from_items(bodies))
    got = sorted((r["host"], r["prefix"])
                 for r in rules_for_agent(parsed, "MyBot").take_all())
    # a.example: own group wins (star rules ignored); b.example: falls
    # back to *
    assert got == [("a.example", "/mine"), ("a.example", "/mine2"),
                   ("b.example", "/star")]


def _gate_pages():
    import pyarrow as pa
    import ray.data as rd

    rows = [
        (1, "a.com", "/p1/x"),        # disallow /p1
        (2, "a.com", "/p1/ok/deep"),  # allow /p1/ok (longer) wins
        (3, "a.com", "/p2"),          # tie /p2: allow wins
        (4, "a.com", "/free"),        # no rule matches
        (5, "b.com", "/p1/x"),        # no rules for host at all
        (6, "a.com", "/p1"),          # exact disallow prefix
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "host": pa.array([r[1] for r in rows], pa.string()),
        "path": pa.array([r[2] for r in rows], pa.string()),
    })
    rules = [
        ("a.com", "/p1", False),
        ("a.com", "/p1/ok", True),
        ("a.com", "/p2", False),
        ("a.com", "/p2", True),
        ("a.com", "", False),   # empty value: never matches
    ]
    return rd.from_arrow(t).repartition(3), rules


def test_rfc_precedence_semantics(ray_session):
    from pappermate_ray.stages.urls import robots_filter_rfc

    pages, rules = _gate_pages()
    kept = sorted(r["doc_id"]
                  for r in robots_filter_rfc(pages, rules).take_all())
    assert kept == [2, 3, 4, 5]


def test_rfc_tiers_identical(ray_session):
    from pappermate_ray.stages.urls import robots_filter_rfc

    pages, rules = _gate_pages()
    bcast = sorted(r["doc_id"]
                   for r in robots_filter_rfc(pages, rules).take_all())
    joined = sorted(r["doc_id"]
                    for r in robots_filter_rfc(
                        pages, rules, broadcast_bound=0).take_all())
    assert bcast == joined == [2, 3, 4, 5]


def test_sitemap_between_ua_lines_splits_groups(ray_session):
    # RFC 9309: only UA lines directly following each other share a
    # group — a sitemap or unknown record between them splits, so A must
    # NOT inherit B's disallow
    body = (b"User-agent: A\n"
            b"Sitemap: https://x.example/sm.xml\n"
            b"User-agent: B\n"
            b"Disallow: /d\n")
    assert _rows(body) == [
        (None, "sitemap", "https://x.example/sm.xml"),
        ("b", "disallow", "/d"),
    ]
    body2 = (b"User-agent: A\n"
             b"Crawl-delay: 5\n"
             b"User-agent: B\n"
             b"Disallow: /d\n")
    assert _rows(body2) == [("b", "disallow", "/d")]
