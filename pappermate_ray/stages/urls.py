"""URL/domain operators for web-corpus curation.

The reference stores documents under sanitized filesystem names
(reference/src/pappermate/services/file_organizer.py — sanitize/move by
contract metadata); at web scale the analogous organizing key is the URL.
This module supplies the standard crawl-curation URL passes every
training-data pipeline needs (CCNet / RefinedWeb-style host-level
curation):

- ``parse_url_batch`` / ``parse_urls``: single-RE2-pass vectorized URL
  decomposition (scheme, host, port, path, query, fragment) plus a
  public-suffix-lite registered domain (eTLD+1).
- ``canonicalize_batch`` / ``canonicalize_urls``: crawl-frontier URL
  canonicalization — lowercase scheme/host, drop the fragment, strip
  default ports, remove tracking parameters (``utm_*``, click ids),
  sort surviving query params.
- ``domain_cap``: keep at most ``k`` documents per registered domain
  (deterministic priority order) — the per-host quota pass used to stop
  mega-hosts from dominating a training mix.
- ``blocklist_filter``: drop documents whose host matches a blocked
  domain or any of its subdomains.

Scale notes (100 TB design point):
- parse/canonicalize are embarrassingly parallel ``map_batches`` stages:
  one compiled RE2 pass per column (pyarrow ``extract_regex``), no
  shuffle, no Python row loop. Query-param sorting uses the
  explode → global-sort → stable-regroup trick on a pandas Series, so
  the per-row work is C-level too.
- ``domain_cap`` is the only shuffle (one hash exchange on the domain);
  per-group work is a tiny sort+head. Hot domains are exactly what the
  cap bounds, so group size is capped by the pre-cap crawl dup rate —
  salting is unnecessary because output per group is ≤ k.
- ``blocklist_filter`` broadcasts the blocklist as ONE compiled RE2
  alternation inside the batch fn (blocklists are external fixed-size
  artifacts, ≤ a few MB — same shape as decontaminate's small side).
"""

from __future__ import annotations

import re

import numpy as np
from typing import List, Optional, Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# RFC-3986-lite splitter. All groups named (pyarrow extract_regex requires
# it); optional groups yield '' for matched rows, the whole struct is null
# for rows that are not absolute URLs.
URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<hostport>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"
)

# Public-suffix-lite: the handful of two-level suffixes the fixture and
# tests exercise. Production swaps in the full publicsuffix.org list —
# the regex shape (alternation tried before the generic two-label tail,
# RE2 leftmost-first) is unchanged.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.br", "net.br",
    "com.au", "co.jp", "co.in", "com.cn",
)
REG_DOMAIN_RE = (
    "(?P<rd>[^.]+\\.(?:"
    + "|".join(s.replace(".", "\\.") for s in MULTI_SUFFIXES)
    + ")$|[^.]+\\.[^.]+$)"
)

# Tracking params dropped by canonicalization: any utm_* plus these names.
TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "ref")
TRACKING_PREFIX = "utm_"

_PORT_RE = r":(?P<port>[0-9]+)$"
DEFAULT_PORTS = {"http": 80, "https": 443}


def _decompose(urls: pa.ChunkedArray | pa.Array):
    """Shared single-pass split → (scheme, host, port[int64,-1], path,
    query, fragment). Lowercases scheme and host (case-insensitive per
    RFC 3986 §3.1/§3.2.2); everything else byte-preserved."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, pattern=URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    hostport = pc.struct_field(parts, "hostport")
    host = pc.utf8_lower(pc.replace_substring_regex(hostport, _PORT_RE, ""))
    port_m = pc.extract_regex(hostport, pattern=_PORT_RE)
    port = pc.fill_null(
        pc.cast(pc.struct_field(port_m, "port"), pa.int64()), -1
    )
    # rows whose hostport had no port still need -1, and null-struct rows
    # (non-URLs) must stay null like the other fields
    port = pc.if_else(pc.is_null(hostport), pa.scalar(None, pa.int64()), port)
    path = pc.struct_field(parts, "path")
    query = pc.struct_field(parts, "query")
    fragment = pc.struct_field(parts, "fragment")
    return scheme, host, port, path, query, fragment


def registered_domain(host: pa.Array) -> pa.Array:
    """eTLD+1 via one anchored RE2 alternation (multi-level suffixes
    first; leftmost-first semantics pick the longest registrable tail).
    Dotless hosts (``localhost``) fall back to the host itself."""
    m = pc.extract_regex(host, pattern=REG_DOMAIN_RE)
    return pc.coalesce(pc.struct_field(m, "rd"), host)


def parse_url_batch(t: pa.Table, url_col: str = "url") -> pa.Table:
    """Append scheme/host/port/path/query/fragment/registered_domain.
    Absent ports are encoded as -1 so the column stays non-null int64."""
    scheme, host, port, path, query, fragment = _decompose(t[url_col])
    return (
        t.append_column("scheme", scheme)
        .append_column("host", host)
        .append_column("port", port)
        .append_column("path", path)
        .append_column("query", query)
        .append_column("fragment", fragment)
        .append_column("registered_domain", registered_domain(host))
    )


def parse_urls(ds, url_col: str = "url"):
    return ds.map_batches(
        parse_url_batch, batch_format="pyarrow", fn_kwargs={"url_col": url_col}
    )


def _sorted_clean_query(query: pa.Array) -> pa.Array:
    """Drop tracking params, sort the rest. Explode → filter → global
    value sort → stable regroup: every step is a vectorized pandas/C
    kernel, no per-row Python in the loop body."""
    q = query.to_pandas()
    idx = pd.RangeIndex(len(q))
    q.index = idx
    ex = q.str.split("&").explode()
    names = ex.str.split("=", n=1).str[0]
    keep = (
        ex.notna()
        & ex.ne("")
        & ~names.str.startswith(TRACKING_PREFIX, na=False)
        & ~names.isin(TRACKING_EXACT)
    )
    ex = ex[keep]
    # global sort by value; mergesort keeps index groups stable, so after
    # regrouping by row each row's params come out ascending
    ex = ex.sort_values(kind="mergesort")
    joined = ex.groupby(level=0, sort=True).agg("&".join)
    out = joined.reindex(idx, fill_value="")
    # preserve nulls from non-URL rows
    out[q.isna()] = None
    return pa.array(out, pa.string())


def canonicalize_batch(
    t: pa.Table, url_col: str = "url", out_col: str = "canonical_url"
) -> pa.Table:
    """Crawl-frontier canonical form: lowercase scheme+host, default-port
    strip, empty path → '/', tracking params removed, remaining params
    sorted, fragment dropped."""
    scheme, host, port, path, query, _ = _decompose(t[url_col])
    is_default = pc.or_(
        pc.equal(port, -1),
        pc.or_(
            pc.and_(pc.equal(scheme, "http"), pc.equal(port, 80)),
            pc.and_(pc.equal(scheme, "https"), pc.equal(port, 443)),
        ),
    )
    port_str = pc.if_else(
        pc.fill_null(is_default, True),
        "",
        pc.binary_join_element_wise(":", pc.cast(port, pa.string()), ""),
    )
    path = pc.if_else(pc.equal(path, ""), "/", path)
    q2 = _sorted_clean_query(query)
    q_str = pc.if_else(
        pc.equal(q2, ""), "", pc.binary_join_element_wise("?", q2, "")
    )
    canon = pc.binary_join_element_wise(
        scheme, "://", host, port_str, path, q_str, ""
    )
    return t.append_column(out_col, canon)


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canonical_url"):
    return ds.map_batches(
        canonicalize_batch,
        batch_format="pyarrow",
        fn_kwargs={"url_col": url_col, "out_col": out_col},
    )


def _reverse_labels(host: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Reverse dot-separated host labels and comma-join them
    (``news.example.com`` → ``com,example,news``) — the SURT host
    form. Vectorized via the explode → whole-series-reverse → stable
    regroup trick (reversing the exploded series reverses label order
    WITHIN each row while groupby keeps appearance order); null hosts
    stay null."""
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    h = host.to_pandas()
    idx = pd.RangeIndex(len(h))
    h.index = idx
    ex = h.fillna("").str.split(".").explode()
    ex = ex.iloc[::-1]
    joined = ex.groupby(level=0, sort=True).agg(",".join)
    out = joined.reindex(idx)
    out[h.isna()] = None
    return pa.array(out, pa.string())


def surt_key_batch(
    t: pa.Table, url_col: str = "url", out_col: str = "surt"
) -> pa.Table:
    """SURT (Sort-friendly URI Reordering Transform) key — the
    web-archive / Common-Crawl CDX index key: scheme dropped, ONE
    leading ``www.`` label stripped, host labels reversed and
    comma-joined, non-default port kept as ``:port`` before the ``)``,
    empty path → ``/``, tracking params removed and the rest sorted
    (the ``canonicalize_batch`` query rule), fragment dropped, whole
    key lowercased. ``https://WWW.News.Example.COM/A/b?y=2&x=1`` →
    ``com,example,news)/a/b?x=1&y=2``. Keying a crawl on SURT
    co-locates every capture of a page (and sorts a site's pages
    contiguously) regardless of surface-url noise — the precondition
    for the sorted CDX layout in ``stages/cdx.py``. Non-URL rows get a
    null key. Same vectorized shape as ``canonicalize_batch``: RE2
    decompose + pandas explode/regroup, no Python row loop."""
    scheme, host, port, path, query, _ = _decompose(t[url_col])
    rhost = _reverse_labels(
        pc.replace_substring_regex(host, r"^www\.", ""))
    is_default = pc.or_(
        pc.equal(port, -1),
        pc.or_(
            pc.and_(pc.equal(scheme, "http"), pc.equal(port, 80)),
            pc.and_(pc.equal(scheme, "https"), pc.equal(port, 443)),
        ),
    )
    port_str = pc.if_else(
        pc.fill_null(is_default, True),
        "",
        pc.binary_join_element_wise(":", pc.cast(port, pa.string()), ""),
    )
    path = pc.if_else(pc.equal(path, ""), "/", path)
    q2 = _sorted_clean_query(query)
    q_str = pc.if_else(
        pc.equal(q2, ""), "", pc.binary_join_element_wise("?", q2, "")
    )
    key = pc.utf8_lower(pc.binary_join_element_wise(
        rhost, port_str, ")", path, q_str, ""))
    return t.append_column(out_col, key)


def surt_keys(ds, url_col: str = "url", out_col: str = "surt"):
    return ds.map_batches(
        surt_key_batch,
        batch_format="pyarrow",
        fn_kwargs={"url_col": url_col, "out_col": out_col},
    )


def frontier_schedule(
    ds,
    per_wave: int,
    host_col: str = "host",
    order_cols: Sequence[str] = ("priority",),
    npart: Optional[int] = None,
):
    """Politeness-aware frontier scheduling: assign every candidate URL
    a fetch ``wave`` such that at most ``per_wave`` urls of one host
    land in the same wave, best-``order_cols`` first within each host
    (``wave = rank_in_host // per_wave``, ``slot = rank % per_wave``).
    A crawler then fetches wave 0, wave 1, ... and per-host concurrency
    is bounded by construction — the frontier-sharding dual of
    ``robots_filter``'s per-page gate.

    Scale shape: ONE narrow hash exchange via
    ``ops/grouping.partition_grouped`` (partition-sized groups, never
    per-host groups — a mega-host is just a long run inside its
    partition); per-partition work is one vectorized sort + a Cython
    ``groupby.cumcount``. Pass ``order_cols`` that break ties
    deterministically (e.g. ``("priority", "doc_id")``)."""
    from ..ops.grouping import partition_grouped

    u, gcols = partition_grouped(ds, [host_col], npart)

    def sched(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([host_col, *order_cols], kind="mergesort")
        rank = df.groupby(host_col, sort=False).cumcount()
        df["wave"] = (rank // per_wave).astype("int64")
        df["slot"] = (rank % per_wave).astype("int64")
        return df.drop(columns=["_pkey"])

    return u.groupby(gcols).map_groups(sched, batch_format="pandas")


def domain_cap(
    ds,
    k: int,
    priority_col: str,
    domain_col: str = "registered_domain",
):
    """Keep at most ``k`` rows per registered domain, lowest
    ``priority_col`` first (deterministic). One hash shuffle on the
    domain; emits ≤ k rows per group so the output is skew-free by
    construction."""
    from ..ops.sample import stratified_head

    return stratified_head(ds, domain_col, priority_col, k)


def host_quality_filter(
    ds,
    metric_col: str,
    threshold: int,
    min_docs: int = 1,
    domain_col: str = "registered_domain",
    num_partitions: Optional[int] = None,
):
    """CCNet-style host-level curation: keep documents whose registered
    domain's MEAN ``metric_col`` clears ``threshold`` (and the domain
    has ≥ ``min_docs`` docs) — a page is judged by its host's aggregate
    quality, not only its own.

    Scale shape: ONE narrow groupby on the domain (Ray pre-aggregates
    count+sum per block, so the shuffle carries 2 ints per domain per
    block); the passing-domain keyset stays distributed and applies via
    semi-join — per-domain stats never touch the driver (at 100 TB the
    domain table is hundreds of millions of rows). The mean test is
    evaluated as the INTEGER cross-multiplication ``sum ≥ threshold ×
    count``, so there is no float division to disagree with the SQL
    oracle at ties.
    """
    from ray.data.aggregate import Count, Sum

    from ..ops.joins import semi_join

    stats = (
        ds.select_columns([domain_col, metric_col])
        .groupby(domain_col)
        .aggregate(Count(), Sum(metric_col, alias_name="_s"))
    )

    def passing(t: pa.Table) -> pa.Table:
        n = pc.cast(t["count()"], pa.int64())
        s = pc.cast(t["_s"], pa.int64())
        ok = pc.and_(
            pc.greater_equal(s, pc.multiply(pa.scalar(threshold, pa.int64()), n)),
            pc.greater_equal(n, min_docs),
        )
        return t.filter(ok).select([domain_col])

    keep = stats.map_batches(passing, batch_format="pyarrow")
    # keep's schema is known — probing schema() would execute the
    # aggregate once before the join executes it again (CLAUDE.md)
    d_schema = pa.schema([pa.field(domain_col, pa.string())])
    return semi_join(ds, keep, on=domain_col,
                     num_partitions=num_partitions, right_schema=d_schema)


def host_lang_profile(
    ds,
    host_col: str = "host",
    lang_col: str = "lang",
    mixed_share_permille: int = 800,
    num_partitions: Optional[int] = None,
):
    """Per-host language-mix profile — the CCNet-style consistency
    signal that routes hosts to language-specific processing and flags
    incoherent ones (parked domains, scraped-spam mixes, MT farms):
    ``(host, n_docs, n_langs, majority_lang, majority_n, lang_entropy,
    is_mixed)``. ``majority_lang`` ties break to the smallest lang;
    ``is_mixed`` is the exact-integer test ``majority_n * 1000 <
    mixed_share_permille * n_docs`` (no float division at ties);
    ``lang_entropy`` is the Shannon entropy of the lang distribution in
    bits, rounded to 6 (``+ 0.0`` normalizes the single-lang ``-0.0``).

    Scale shape: blocks pre-compress to (host, lang, n) partials, ONE
    narrow grouped exchange sums them (the shuffle carries lang-
    cardinality rows per host per block — never documents), then the
    partition-grouped finisher profiles every host in its partition
    vectorized (lexsort + run reductions) — host cardinality never
    drives Python dispatch. Rows with a null host or lang drop (an
    unparsable URL has no host to profile).
    """
    from ray.data.aggregate import Sum

    from ..ops.grouping import partition_grouped

    def partial(t: pa.Table) -> pa.Table:
        sub = pa.table({host_col: t[host_col], lang_col: t[lang_col]})
        sub = sub.filter(pc.and_(pc.is_valid(sub[host_col]),
                                 pc.is_valid(sub[lang_col])))
        g = sub.group_by([host_col, lang_col]).aggregate([([], "count_all")])
        return pa.table({
            host_col: g[host_col], lang_col: g[lang_col],
            "_n": pc.cast(g["count_all"], pa.int64()),
        })

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([host_col, lang_col]).aggregate(Sum("_n", alias_name="n"))

    def profile(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "host": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
                "n_langs": pd.Series([], dtype=np.int64),
                "majority_lang": pd.Series([], dtype=object),
                "majority_n": pd.Series([], dtype=np.int64),
                "lang_entropy": pd.Series([], dtype=np.float64),
                "is_mixed": pd.Series([], dtype=bool),
            })
        # majority-first order inside each host: n desc, lang asc
        g = g.sort_values([host_col, "n", lang_col],
                          ascending=[True, False, True], kind="mergesort")
        hosts = g[host_col].to_numpy()
        n = g["n"].to_numpy().astype(np.int64)
        first = np.ones(len(g), bool)
        first[1:] = hosts[1:] != hosts[:-1]
        starts = np.flatnonzero(first)
        n_docs = np.add.reduceat(n, starts)
        n_langs = np.diff(np.append(starts, len(g))).astype(np.int64)
        # entropy terms in the SAME sorted order every run (sum order
        # is deterministic; the SQL side agrees far below the 1e-6 grid)
        p = n / np.repeat(n_docs, n_langs)
        ent = np.add.reduceat(-p * np.log2(p), starts)
        ent = np.round(ent, 6) + 0.0
        maj_n = n[starts]
        return pd.DataFrame({
            "host": hosts[starts],
            "n_docs": n_docs,
            "n_langs": n_langs,
            "majority_lang": g[lang_col].to_numpy()[starts],
            "majority_n": maj_n,
            "lang_entropy": ent,
            "is_mixed": maj_n * 1000 < mixed_share_permille * n_docs,
        })

    pds, pcols = partition_grouped(counts, [host_col], npart=num_partitions)
    return pds.groupby(pcols).map_groups(profile, batch_format="pandas")


def blocklist_regex(blocked: Sequence[str]) -> str:
    """Host matcher: the domain itself or any subdomain of it."""
    return "(?:^|\\.)(?:" + "|".join(re.escape(d) for d in sorted(blocked)) + ")$"


def blocklist_filter(
    ds,
    blocked: Sequence[str],
    url_col: str = "url",
    host_col: Optional[str] = None,
):
    """Drop rows whose host is (a subdomain of) a blocked domain. The
    blocklist compiles to one RE2 alternation evaluated per batch — the
    broadcast-small-side join shape, no shuffle."""
    pattern = blocklist_regex(blocked)

    def _filter(t: pa.Table) -> pa.Table:
        if host_col is not None:
            host = pc.utf8_lower(pc.cast(t[host_col], pa.string()))
        else:
            _, host, *_ = _decompose(t[url_col])
        hit = pc.fill_null(pc.match_substring_regex(host, pattern), False)
        return t.filter(pc.invert(hit))

    return ds.map_batches(_filter, batch_format="pyarrow")


def robots_filter(
    ds,
    rules,
    host_col: str = "host",
    path_col: str = "path",
    id_col: str = "doc_id",
    broadcast_bound: int = 2_000_000,
    num_partitions: Optional[int] = None,
):
    """Crawl-politeness filter: drop a page when ANY disallow rule for
    its exact host is a prefix of its path (the robots.txt
    ``Disallow:`` core; longest-match Allow overrides are out of scope
    and a rule with prefix ``''`` matches every path — encode
    allow-all by omitting the host).

    ``rules`` is a Dataset (or list of ``(host, prefix)`` tuples) with
    columns ``(host, prefix)``. Hybrid small-side shape, like
    paragraph_dedup's removal set:

    - rules ≤ ``broadcast_bound``: the rule table ships ONCE via
      ``ray.put`` as a host→prefixes dict; each batch tests only the
      (host, prefix) pairs whose host actually occurs in the batch,
      one vectorized ``starts_with`` per pair — no shuffle at all.
      Robots corpora are crawl-metadata-sized (rules ≪ pages), so this
      is the common case even at 100 TB.
    - beyond the bound: one hash join pages×rules on the host (only
      ``(id, host, path)`` enter the exchange, never the payload),
      per-batch prefix verify vectorized per DISTINCT prefix, then a
      distributed anti-join of the violating ids back onto the pages.
    """
    import ray
    import ray.data as rd

    from ..ops.joins import adaptive_partitions, anti_join, hash_join

    if not isinstance(rules, rd.Dataset):
        rules = rd.from_items([{"host": h, "prefix": p} for h, p in rules])
    n_rules = rules.count()

    if n_rules <= broadcast_bound:
        rule_rows = rules.take_all()
        rulemap: dict = {}
        for r in rule_rows:
            rulemap.setdefault(r["host"], []).append(r["prefix"])
        ref = ray.put(rulemap)

        def _drop(t: pa.Table) -> pa.Table:
            rm = ray.get(ref)
            host = pc.cast(t[host_col], pa.string())
            path = pc.cast(t[path_col], pa.string())
            uniq = pc.unique(host).to_pylist()
            drop = pa.array([False] * t.num_rows, pa.bool_())
            for h in uniq:
                for prefix in rm.get(h, ()):
                    hit = pc.and_(pc.equal(host, h),
                                  pc.starts_with(path, prefix))
                    drop = pc.or_(drop, pc.fill_null(hit, False))
            return t.filter(pc.invert(drop))

        return ds.map_batches(_drop, batch_format="pyarrow")

    # distributed fallback: narrow join on host, verify, anti-join back
    narrow = ds.select_columns([id_col, host_col, path_col])
    id_t = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    joined = hash_join(
        narrow, rules, on=host_col, right_on="host",
        num_partitions=num_partitions,
        left_schema=pa.schema([(id_col, id_t), (host_col, pa.string()),
                               (path_col, pa.string())]),
        right_schema=pa.schema([("host", pa.string()),
                                ("prefix", pa.string())]),
    )

    def _verify(t: pa.Table) -> pa.Table:
        path = pc.cast(t[path_col], pa.string())
        prefix = pc.cast(t["prefix"], pa.string())
        hit = pa.array([False] * t.num_rows, pa.bool_())
        for p in pc.unique(prefix).to_pylist():
            m = pc.and_(pc.equal(prefix, p), pc.starts_with(path, p))
            hit = pc.or_(hit, pc.fill_null(m, False))
        return t.filter(hit).select([id_col])

    violators = joined.map_batches(_verify, batch_format="pyarrow")
    return anti_join(
        ds, violators, on=id_col,
        num_partitions=num_partitions or adaptive_partitions(n_rules),
        right_schema=pa.schema([(id_col, id_t)]),
    )


def url_pattern_traps(
    ds,
    url_col: str = "url",
    min_urls: int = 100,
):
    """Crawl-trap detection: collapse every digit run in the path to
    ``N`` and count DISTINCT urls per ``(host, pattern)`` — a calendar,
    session-id or pagination trap shows up as one pattern fanning out
    to unbounded urls (``/cal/N-N-N`` with 10^6 instances). Returns the
    trap table ``(host, pattern, n_urls)`` for patterns with
    ``n_urls >= min_urls``; feed it to ``trap_filter`` to drop the
    trapped urls from a frontier.

    Scale shape: one vectorized RE2 pass (decompose + digit collapse),
    then the host_graph rollup idiom — distinct ``(host, pattern,
    url)`` triples first, then the pattern rollup; two narrow grouped
    exchanges, no joins, trap hosts are long runs inside partitions,
    never per-key groups."""
    from ray.data.aggregate import Count

    def pat(t: pa.Table) -> pa.Table:
        _, host, _, path, _, _ = _decompose(t[url_col])
        pattern = pc.replace_substring_regex(path, r"[0-9]+", "N")
        out = pa.table({"host": host, "pattern": pattern,
                        "url": t[url_col]})
        return out.filter(pc.is_valid(host))

    tri = ds.map_batches(pat, batch_format="pyarrow")
    per_url = tri.groupby(["host", "pattern", "url"]).aggregate(Count())
    rolled = per_url.groupby(["host", "pattern"]).aggregate(Count())

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table({"host": t["host"], "pattern": t["pattern"],
                        "n_urls": t["count()"]})
        return out.filter(pc.greater_equal(out["n_urls"], min_urls))

    return rolled.map_batches(finish, batch_format="pyarrow")


def trap_filter(
    ds,
    traps,
    url_col: str = "url",
    num_partitions: Optional[int] = None,
    broadcast_bound: int = 2_000_000,
):
    """Drop urls whose (host, digit-collapsed pattern) is in the trap
    table — the apply side of ``url_pattern_traps``. Hybrid (the
    robots_filter_rfc rule): a trap table within ``broadcast_bound``
    rows ships ONCE via ``ray.put`` as packed keys and the urls filter
    in a zero-exchange streaming ``is_in`` map; beyond the bound a
    distributed anti-join runs on the (host, pattern) key — trap
    tables are aggregate-sized (a flagged mega-host contributes ONE
    row), so the exchange is narrow either way. Tiers asserted
    identical in tests."""
    import ray as _ray

    from ..ops.joins import anti_join

    sep = "\x1f"  # never occurs in a host; paths are sanitized urls

    def keyed(t: pa.Table) -> pa.Table:
        _, host, _, path, _, _ = _decompose(t[url_col])
        pattern = pc.replace_substring_regex(path, r"[0-9]+", "N")
        return (t.append_column("host", host)
                 .append_column("pattern", pattern))

    traps = traps.materialize()
    if traps.count() <= broadcast_bound:
        keys = []
        for t in traps.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"):
            keys.extend(
                f"{h}{sep}{p}" for h, p in
                zip(t["host"].to_pylist(), t["pattern"].to_pylist()))
        kref = _ray.put(pa.array(keys, pa.string()))

        def drop_trapped(t: pa.Table) -> pa.Table:
            tk = _ray.get(kref)
            kt = keyed(t)
            combined = pc.binary_join_element_wise(
                pc.cast(kt["host"], pa.string()),
                pc.cast(kt["pattern"], pa.string()), sep)
            keep = pc.invert(pc.is_in(combined, value_set=tk))
            return t.filter(keep)

        return ds.map_batches(drop_trapped, batch_format="pyarrow")

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    # right_schema: the trap lineage ends in two aggregates — without
    # the pinned schema the join armor's probe would execute them twice
    kept = anti_join(keyed_ds, traps, on=["host", "pattern"],
                     num_partitions=num_partitions,
                     right_schema=pa.schema([
                         ("host", pa.string()), ("pattern", pa.string()),
                         ("n_urls", pa.int64())]))
    return kept.drop_columns(["host", "pattern"])


def robots_filter_rfc(
    ds,
    rules,
    host_col: str = "host",
    path_col: str = "path",
    id_col: str = "doc_id",
    broadcast_bound: int = 2_000_000,
    num_partitions: Optional[int] = None,
):
    """RFC 9309 §2.3.2 precedence gate — the full-compliance upgrade of
    ``robots_filter``: among ALL of a host's rules whose prefix matches
    the page path, the LONGEST prefix wins; an equal-length tie goes to
    Allow; a page with no matching rule is allowed. Empty-value rules
    never match (an empty ``Disallow:`` means allow-all, per the
    parse_robots contract).

    ``rules`` is a Dataset (or list of ``(host, prefix, allow)``
    tuples) with columns ``(host, prefix, allow:bool)`` — exactly what
    ``stages/robots.parse_robots`` emits once allow rows are kept.

    The precedence fold is one integer max: score a matching rule
    ``2·len(prefix) + allow`` (longer beats shorter; the +1 gives
    Allow the equal-length win) and a page is allowed iff its BEST
    score is odd — no-match rows default to score 1 (odd, allowed;
    unreachable by a real rule, whose score is ≥ 2).

    Same hybrid tiers as ``robots_filter``: rules ≤ bound broadcast
    once via ``ray.put`` (zero exchange; one vectorized starts_with
    per (host-present, rule) pair); beyond it a narrow (id, host,
    path)×rules hash join on the host, a per-row vectorized score, one
    Max groupby on the id, and a distributed anti-join of the
    even-best ids back onto the pages — payloads never enter any
    exchange."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max

    from ..ops.joins import adaptive_partitions, anti_join, hash_join

    if not isinstance(rules, rd.Dataset):
        rules = rd.from_items(
            [{"host": h, "prefix": p, "allow": bool(a)} for h, p, a in rules])
    n_rules = rules.count()

    def _scores(host: pa.Array, path: pa.Array, rm: dict) -> np.ndarray:
        best = np.ones(len(host), np.int64)
        for h in pc.unique(host).to_pylist():
            for prefix, allow in rm.get(h, ()):
                hit = pc.and_(pc.equal(host, h),
                              pc.starts_with(path, prefix))
                m = pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
                np.maximum(best, np.where(m, 2 * len(prefix) + int(allow), 1),
                           out=best)
        return best

    if n_rules <= broadcast_bound:
        rulemap: dict = {}
        for r in rules.take_all():
            if r["prefix"]:
                rulemap.setdefault(r["host"], []).append(
                    (r["prefix"], bool(r["allow"])))
        ref = ray.put(rulemap)

        def _gate(t: pa.Table) -> pa.Table:
            best = _scores(pc.cast(t[host_col], pa.string()),
                           pc.cast(t[path_col], pa.string()), ray.get(ref))
            return t.filter(pa.array(best % 2 == 1))

        return ds.map_batches(_gate, batch_format="pyarrow")

    # distributed tier: verdicts fold through one Max groupby on the id
    narrow = ds.select_columns([id_col, host_col, path_col])
    id_t = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    joined = hash_join(
        narrow, rules, on=host_col, right_on="host",
        num_partitions=num_partitions,
        left_schema=pa.schema([(id_col, id_t), (host_col, pa.string()),
                               (path_col, pa.string())]),
        right_schema=pa.schema([("host", pa.string()),
                                ("prefix", pa.string()),
                                ("allow", pa.bool_())]),
    )

    def _score_rows(t: pa.Table) -> pa.Table:
        path = pc.cast(t[path_col], pa.string())
        prefix = pc.cast(t["prefix"], pa.string())
        allow = pc.fill_null(t["allow"], False).to_numpy(zero_copy_only=False)
        score = np.ones(t.num_rows, np.int64)
        for p in pc.unique(prefix).to_pylist():
            if not p:
                continue
            m = pc.and_(pc.equal(prefix, p), pc.starts_with(path, p))
            m = pc.fill_null(m, False).to_numpy(zero_copy_only=False)
            score = np.where(m, 2 * len(p) + allow.astype(np.int64), score)
        return pa.table({id_col: t[id_col],
                         "score": pa.array(score, pa.int64())})

    best = (joined.map_batches(_score_rows, batch_format="pyarrow")
            .groupby(id_col).aggregate(Max("score", alias_name="best")))
    violators = best.map_batches(
        lambda t: t.filter(pa.array(
            t["best"].to_numpy(zero_copy_only=False) % 2 == 0))
        .select([id_col]),
        batch_format="pyarrow")
    return anti_join(
        ds, violators, on=id_col,
        num_partitions=num_partitions or adaptive_partitions(n_rules),
        right_schema=pa.schema([(id_col, id_t)]),
    )
