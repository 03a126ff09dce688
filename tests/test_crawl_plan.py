"""ops/sample.quota_head + pipelines/crawl_plan.py (SQL equivalence is
the oracle gate's `crawl_plan` row; here: tier equivalence, exact-budget
and politeness invariants)."""

import collections

import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.sample import quota_head
from pappermate_ray.pipelines.crawl_plan import plan_crawl


def _rows(n, hosts=7):
    return pa.table({
        "host": pa.array([f"h{i % hosts}" for i in range(n)], pa.string()),
        "doc_id": pa.array(list(range(n)), pa.int64()),
    })


def _quotas(d):
    return rd.from_arrow(pa.table({
        "host": pa.array(list(d), pa.string()),
        "quota": pa.array(list(d.values()), pa.int64()),
    }))


def test_quota_head_tiers_identical(ray_session):
    q = {"h0": 3, "h1": 0, "h2": 5, "h4": 100}  # h3,h5,h6 absent -> 0
    ds = rd.from_arrow(_rows(140)).repartition(9)
    bcast = quota_head(ds, "host", "doc_id", _quotas(q)).take_all()
    joined = quota_head(ds, "host", "doc_id", _quotas(q),
                        broadcast_bound=0).take_all()
    key = lambda r: (r["host"], r["doc_id"])
    assert sorted(map(key, bcast)) == sorted(map(key, joined))
    got = collections.Counter(r["host"] for r in bcast)
    assert got == {"h0": 3, "h2": 5, "h4": 20}  # h4 supply-capped at 20
    # first-k by doc_id: h0's members are its 3 smallest ids
    h0 = sorted(r["doc_id"] for r in bcast if r["host"] == "h0")
    assert h0 == [0, 7, 14]


def test_plan_crawl_budget_and_politeness(ray_session):
    # synthetic frontier: 300 urls over 11 hosts, no robots rules,
    # trap threshold high enough that nothing trips
    urls = pa.table({
        "doc_id": pa.array(list(range(300)), pa.int64()),
        "url": pa.array(
            [f"https://site{i % 11}.com/p{i % 4}/page{i}" for i in range(300)],
            pa.string()),
    })
    plan = plan_crawl(rd.from_arrow(urls).repartition(7), rules=[],
                      budget=97, per_wave=2, trap_min_urls=10**6)
    rows = plan.take_all()
    assert len(rows) == 97  # exact budget
    per_wave = collections.Counter(
        (r["wave"], r["registered_domain"]) for r in rows)
    assert max(per_wave.values()) <= 2  # politeness bound
    # proportional: equal supply -> quotas differ by at most 1
    per_dom = collections.Counter(r["registered_domain"] for r in rows)
    assert len(per_dom) == 11
    assert max(per_dom.values()) - min(per_dom.values()) <= 1
    # slots enumerate within (domain, wave)
    for (w, d), c in per_wave.items():
        slots = sorted(r["slot"] for r in rows
                       if r["wave"] == w and r["registered_domain"] == d)
        assert slots == list(range(c))


def test_plan_crawl_survives_junk_urls(ray_session):
    # real frontiers carry non-URL garbage; those rows must be dropped at
    # the door (null registered_domain would crash every downstream
    # groupby under the Ray 2.49 null-string-key sort bug) and must not
    # consume budget
    urls = pa.table({
        "doc_id": pa.array(list(range(60)), pa.int64()),
        "url": pa.array(
            ["junk" if i % 20 == 5 else
             f"https://site{i % 5}.com/p/page{i}" for i in range(60)],
            pa.string()),
    })
    plan = plan_crawl(rd.from_arrow(urls).repartition(4), rules=[],
                      budget=20, per_wave=2, trap_min_urls=10**6)
    rows = plan.take_all()
    assert len(rows) == 20
    assert all(r["registered_domain"] is not None for r in rows)
    junk_ids = {i for i in range(60) if i % 20 == 5}
    assert not junk_ids & {r["doc_id"] for r in rows}
