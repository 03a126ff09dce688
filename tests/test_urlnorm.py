"""Crawl URL canonicalization (functions/urlnorm.py) — rule coverage,
pass-through of non-URLs, idempotence, and the Dataset stage."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pappermate_ray.functions.urlnorm import (
    canonicalize_url_array,
    canonicalize_urls,
)


def canon1(u):
    return canonicalize_url_array(pa.array([u], pa.string()))[0].as_py()


@pytest.mark.parametrize("raw,want", [
    # fragment strip
    ("https://a.example/x#frag", "https://a.example/x"),
    # scheme+host lowercase, path case preserved
    ("HTTPS://A.Example/Path/X", "https://a.example/Path/X"),
    # default ports drop; non-default ports stay
    ("http://a.example:80/x", "http://a.example/x"),
    ("https://a.example:443/x", "https://a.example/x"),
    ("https://a.example:8443/x", "https://a.example:8443/x"),
    ("http://a.example:8080/x", "http://a.example:8080/x"),
    # tracking params: any position, order of survivors preserved
    ("https://a.example/x?utm_source=f&id=1&utm_medium=m", "https://a.example/x?id=1"),
    ("https://a.example/x?id=1&fbclid=zz", "https://a.example/x?id=1"),
    ("https://a.example/x?a=1&gclid=g&b=2", "https://a.example/x?a=1&b=2"),
    ("https://a.example/x?msclkid=m", "https://a.example/x"),
    ("https://a.example/x?utm_a=1&utm_b=2&id=4", "https://a.example/x?id=4"),
    # utm value may be empty
    ("https://a.example/p/?gclid=g&utm_x=", "https://a.example/p/"),
    # a NON-tracking param named like a prefix is kept
    ("https://a.example/x?utmost=1", "https://a.example/x?utmost=1"),
    # empty path → '/'
    ("https://a.example", "https://a.example/"),
    ("https://a.example?utm_campaign=z", "https://a.example/"),
    ("https://a.example?id=1", "https://a.example/?id=1"),
    # already canonical → unchanged
    ("https://a.example/x?id=1", "https://a.example/x?id=1"),
])
def test_rules(raw, want):
    assert canon1(raw) == want


def test_non_urls_pass_through():
    arr = pa.array(["not a url", "/relative/path", "", None], pa.string())
    out = canonicalize_url_array(arr).to_pylist()
    assert out == ["not a url", "/relative/path", "", None]


_URLISH = st.builds(
    lambda scheme, host, port, path, params, frag:
        f"{scheme}://{host}{port}{path}"
        + ("?" + "&".join(params) if params else "") + frag,
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    host=st.sampled_from(["A.Example", "site7.example", "X.Y.Z"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.sampled_from(["", "/x", "/Doc/5", "/p/"]),
    params=st.lists(st.sampled_from(
        ["id=1", "a=2", "utm_source=f", "utm_medium=", "fbclid=z", "gclid=g"]),
        max_size=4),
    frag=st.sampled_from(["", "#s", "#Sec/2?x=1"]),
)


@given(_URLISH)
@settings(max_examples=300, deadline=None)
def test_idempotent(u):
    c = canon1(u)
    assert canon1(c) == c
    # canonical form never carries fragments or tracking params
    assert "#" not in c
    for p in ("utm_", "fbclid=", "gclid=", "msclkid="):
        assert ("?" + p) not in c and ("&" + p) not in c


def test_dataset_stage(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "url": pa.array(["HTTPS://A.Example:443/x?utm_a=1&id=2#f"], pa.string()),
    }))
    out = canonicalize_urls(ds).take_all()
    assert out[0]["canonical_url"] == "https://a.example/x?id=2"
    assert out[0]["url"].startswith("HTTPS://")


# ---------------------------------------------------------------------------
# Registrable-domain (eTLD+1) extraction
# ---------------------------------------------------------------------------

from pappermate_ray.functions.urlnorm import (  # noqa: E402
    add_registrable_domain,
    registrable_domain_array,
)


@pytest.mark.parametrize("host,want", [
    ("www.shop5.co.uk", "shop5.co.uk"),        # 2-label suffix wins
    ("a.b.news3.com.br", "news3.com.br"),      # deep subdomains collapse
    ("site1.example", "site1.example"),        # 1-label suffix
    ("example.co.uk", "example.co.uk"),        # exactly registrable
    ("co.uk", None),                            # bare public suffix
    ("uk", None),                               # bare TLD
    ("weird.zone", None),                       # unknown suffix
    ("localhost", None),
    (None, None),
])
def test_registrable(host, want):
    out = registrable_domain_array(pa.array([host], pa.string()))
    assert out[0].as_py() == want


def test_registrable_custom_suffixes():
    out = registrable_domain_array(
        pa.array(["x.y.zone"], pa.string()), suffixes=["zone"])
    assert out[0].as_py() == "y.zone"


def test_add_registrable_domain_stage(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"url": pa.array(
        ["HTTPS://WWW.Shop1.CO.UK:443/p", "https://cdn.io/x", "nope"],
        pa.string())}))
    rows = add_registrable_domain(ds).take_all()
    assert rows[0]["registrable_domain"] == "shop1.co.uk"
    assert rows[1]["registrable_domain"] == "cdn.io"
    assert rows[2]["registrable_domain"] is None
