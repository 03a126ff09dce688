"""Composed crawl-planning flagship: turn a raw candidate-URL frontier
into an exact fetch plan — the crawl-side twin of
``pipelines/curate_full.py``'s curation chain, tying the round-4 crawl
family together end to end:

    parse urls → robots politeness gate → crawl-trap hygiene
    → per-domain budget apportionment (exact largest remainder)
    → per-domain quota head (best-priority pages up to the quota)
    → politeness wave schedule (≤ per_wave fetches of one domain
      per wave)

The output is "this week we fetch EXACTLY ``budget`` pages: this page,
in this wave, in this slot" — Σ selected == budget by construction
(largest-remainder quotas sum exactly; every quota ≤ its domain's
supply whenever budget ≤ surviving pages, since
floor(B·s/S) + 1 ≤ s for B < S).

Scale shape (all stages reuse the audited first-class operators):
robots rules broadcast once (``stages/urls.robots_filter``); trap
detection is two narrow grouped exchanges over (host, pattern) keys
(``url_pattern_traps``); the quota split never sorts the domain table
(``ops/apportion``); selection and wave assignment ride ONE
partition-grouped exchange each (``ops/sample.quota_head``,
``stages/urls.frontier_schedule``) — the page payload crosses exactly
two narrow exchanges total, everything else is key-level.

Reference parity: the reference has no crawler, but this is the
operating mode its corpus intake implies at 100 TB (SURVEY.md §2 S1 +
the beyond-reference crawl brief); rule semantics follow
``services/file_handler.py``'s allow-list gating idiom generalized to
RFC 9309 disallow prefixes.
"""

from __future__ import annotations

from typing import Optional, Sequence


def plan_crawl(
    pages,
    rules,
    budget: int,
    per_wave: int = 2,
    trap_min_urls: int = 3,
    key_col: str = "registered_domain",
    priority_col: str = "doc_id",
    url_col: str = "url",
    npart: Optional[int] = None,
):
    """``pages`` needs (doc_id, url); urls are parsed in-flight.
    ``rules`` is a (host, prefix) Dataset or tuple list for the robots
    gate. Returns (doc_id, url, key, wave, slot) with EXACTLY
    ``budget`` rows whenever the surviving frontier ≥ budget."""
    from ..ops.apportion import largest_remainder
    from ..ops.sample import quota_head
    from ..stages.urls import (frontier_schedule, parse_urls, robots_filter,
                               trap_filter, url_pattern_traps)

    import pyarrow as pa
    import pyarrow.compute as pc

    parsed = parse_urls(pages, url_col=url_col)
    # real frontiers contain non-URL garbage: parse_urls gives those rows a
    # NULL registered_domain, which (a) can never be fetched and (b) would
    # crash every downstream groupby on the nullable string key (the
    # documented Ray 2.49 null-key sort bug) — drop them at the door
    parsed = parsed.map_batches(
        lambda t: t.filter(pc.is_valid(t[key_col])), batch_format="pyarrow")
    gated = robots_filter(parsed, rules, num_partitions=npart)
    # trap stage re-derives host/pattern from the url itself — feed it
    # the narrow (id, url) projection so its appended keys can't
    # collide with the parsed columns
    narrow = gated.select_columns([priority_col, url_col])
    traps = url_pattern_traps(narrow, min_urls=trap_min_urls)
    clean = parse_urls(trap_filter(narrow, traps, url_col=url_col,
                                   num_partitions=npart), url_col=url_col)

    scores = clean.groupby(key_col).count().map_batches(
        lambda t: pa.table({key_col: t[key_col],
                            "score": pc.cast(t["count()"], pa.int64())}),
        batch_format="pyarrow")
    quotas = largest_remainder(scores, budget, key_col=key_col,
                               score_col="score")
    selected = quota_head(clean, key_col, priority_col, quotas, npart=npart)
    waves = frontier_schedule(selected, per_wave, host_col=key_col,
                              order_cols=(priority_col,), npart=npart)
    return waves.select_columns([priority_col, url_col, key_col,
                                 "wave", "slot"])
