"""Crawl URL canonicalization — the normalization pass every crawl-dedup
chain runs BEFORE ``latest_by_url`` (otherwise ``http://Host/x#frag`` and
``https://host/x?utm_source=feed`` count as distinct pages and the dedup
under-merges).

Beyond-reference operator (driver brief: crawl-ingest operations); the
rule set is the public-crawler standard (RFC 3986 §6 syntax-based
normalization plus the tracking-parameter strip every production crawler
applies):

1. drop the fragment (``#...`` never reaches the server);
2. lowercase scheme and host (case-insensitive per RFC 3986 §3.1/§3.2.2 —
   the PATH stays case-sensitive);
3. drop default ports (``:80`` for http, ``:443`` for https);
4. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``) wherever they sit in the query string, preserving the
   relative order of surviving parameters; an emptied query drops its
   ``?``;
5. an empty path becomes ``/`` (``https://host`` ≡ ``https://host/``).

Everything is a chain of RE2 kernels over the whole column
(``pyarrow.compute`` — zero Python rows, zero exchange), and because
DuckDB's ``regexp_replace`` is the same RE2, the oracle mirrors the chain
verbatim (q:canonical_urls value-hash-gates it end to end). Rows that are
not absolute URLs (no ``scheme://`` head) pass through unchanged rather
than erroring — crawl url columns carry garbage.

Known, documented approximation: a literal ``?&`` (empty-named first
parameter) is collapsed to ``?`` by the tidy pass — an illegal-in-practice
query shape we trade for a fixed-pass, loop-free kernel chain.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# tracking params stripped from query strings (public crawler blocklists)
TRACKING_PARAMS = ("utm_[A-Za-z0-9_]*", "fbclid", "gclid", "msclkid")

_TRACK_RE = r"&(?:" + "|".join(TRACKING_PARAMS) + r")=[^&#]*"
_HEAD_RE = r"^(?P<head>[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)(?P<rest>.*)$"


def canonicalize_url_array(urls: "pa.ChunkedArray | pa.Array") -> "pa.Array | pa.ChunkedArray":
    """Vectorized canonical form of a string column of URLs.

    Non-absolute rows (no ``scheme://``) are returned unchanged; nulls
    stay null. Idempotent: ``canon(canon(x)) == canon(x)`` (property-
    tested).
    """
    u = pc.replace_substring_regex(urls, pattern=r"#.*$", replacement="")
    ex = pc.extract_regex(u, _HEAD_RE)
    ok = pc.is_valid(ex)
    head = pc.utf8_lower(pc.struct_field(ex, "head"))
    head = pc.replace_substring_regex(
        head, pattern=r"^(http://[^/:?#]+):80$", replacement=r"\1")
    head = pc.replace_substring_regex(
        head, pattern=r"^(https://[^/:?#]+):443$", replacement=r"\1")
    rest = pc.struct_field(ex, "rest")
    # every query param &-prefixed (first '?' only) → ONE global tracking
    # strip → undo the sentinel → drop an emptied query's '?'
    rest = pc.replace_substring_regex(
        rest, pattern=r"\?", replacement="?&", max_replacements=1)
    rest = pc.replace_substring_regex(rest, pattern=_TRACK_RE, replacement="")
    rest = pc.replace_substring_regex(
        rest, pattern=r"\?&", replacement="?", max_replacements=1)
    rest = pc.replace_substring_regex(rest, pattern=r"\?$", replacement="")
    # empty path → '/' (\0 = whole match, so '?q' → '/?q' and '' → '/')
    rest = pc.replace_substring_regex(
        rest, pattern=r"^(?:$|\?)", replacement=r"/\0", max_replacements=1)
    return pc.if_else(ok, pc.binary_join_element_wise(head, rest, ""), u)


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canonical_url"):
    """Dataset stage: append ``out_col`` with the canonical form.

    Single streaming ``map_batches`` pass, no exchange — safe to fuse
    ahead of ``latest_by_url`` / exact-dedup at any scale.
    """

    def f(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, canonicalize_url_array(t[url_col]))

    return ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Registrable-domain (public-suffix) extraction
# --------------------------------------------------------------------------

# Pinned snapshot of common public suffixes (the full Mozilla PSL is an
# external artifact this sandbox can't fetch; the operator takes the live
# list as a parameter and this deterministic subset is the default).
# Multi-label entries make the longest-suffix-wins rule observable.
DEFAULT_PUBLIC_SUFFIXES = frozenset({
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "ai", "dev",
    "app", "info", "biz", "example",
    "de", "fr", "es", "it", "nl", "se", "no", "fi", "dk", "pl", "ru",
    "jp", "cn", "kr", "in", "br", "mx", "ar", "ca", "ch", "at", "be",
    "uk", "au",
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au",
    "com.br", "net.br", "org.br", "gov.br",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "co.in", "net.in", "org.in",
})


def registrable_domain_array(hosts, suffixes=None):
    """Vectorized eTLD+1: the registrable domain of each host under the
    longest-matching public suffix (suffix + one label), or null when the
    host IS a bare suffix / matches no suffix. Pure Arrow kernels: three
    fixed-width tail extractions + set membership — no Python rows, no
    per-host loops; suffix snapshots to ~2 labels (the overwhelming PSL
    case; pass a wider ``suffixes`` list and extend the tails if a
    3-label zone ever matters)."""
    sufs = sorted(suffixes if suffixes is not None else DEFAULT_PUBLIC_SUFFIXES)
    one = pa.array([s for s in sufs if "." not in s], pa.string())
    two = pa.array([s for s in sufs if s.count(".") == 1], pa.string())
    t1 = pc.struct_field(pc.extract_regex(hosts, r"(?P<d>[^.]+)$"), "d")
    t2 = pc.struct_field(pc.extract_regex(hosts, r"(?P<d>[^.]+\.[^.]+)$"), "d")
    t3 = pc.struct_field(
        pc.extract_regex(hosts, r"(?P<d>[^.]+\.[^.]+\.[^.]+)$"), "d")
    # longest suffix wins: a 2-label public suffix ⇒ registrable = last 3
    # labels; else a 1-label suffix ⇒ last 2; else null. A host equal to
    # the suffix itself has no registrable domain (tail extraction of the
    # wider window is null), which if_else propagates naturally.
    is2 = pc.fill_null(pc.is_in(t2, value_set=two), False)
    is1 = pc.fill_null(pc.is_in(t1, value_set=one), False)
    null_str = pa.scalar(None, pa.string())
    return pc.if_else(is2, t3, pc.if_else(is1, t2, null_str))


def add_registrable_domain(ds, url_col: str = "url",
                           out_col: str = "registrable_domain",
                           suffixes=None):
    """Dataset stage: host extracted from ``url_col`` (lowercased,
    port-stripped), then the eTLD+1 under the suffix snapshot. One
    streaming pass, zero exchange — the grouping key every host-level
    aggregate (host_quality, domain_cap) should prefer over raw hosts."""

    def f(t: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(t[url_col], r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<h>[^/:?#]*)"),
            "h")
        host = pc.utf8_lower(host)
        return t.append_column(
            out_col, registrable_domain_array(host, suffixes=suffixes))

    return ds.map_batches(f, batch_format="pyarrow")
