"""robots.txt parsing — fetched robots payloads → a rules table that
feeds ``stages/urls.robots_filter`` directly: one row per
(host, agent, directive, value).

Completes the politeness loop: ``parse_robots`` turns the crawl's
fetched ``/robots.txt`` bodies into the ``(host, prefix)`` rule table
the filter consumes (``rules_for_agent`` does the projection), the
same way ``parse_sitemaps`` feeds the discovery side.

Contract (pinned by tests + the planted oracle; RFC 9309 core):

- lines split on LF (CR trimmed); ``#`` comments strip to EOL; blank
  lines are ignored (they do NOT close a group);
- ``user-agent:`` lines open a group; CONSECUTIVE user-agent lines
  (nothing but comments/blanks between them) share the group — a
  directive then emits one row per agent in the group; the next
  user-agent line after ANY other line (allow/disallow, sitemap, or
  an unknown ``key: value`` record) starts a fresh group, per
  RFC 9309's "directly following each other" rule;
- ``allow:`` / ``disallow:`` rows carry the group's agents; an empty
  value is kept (empty disallow = no restriction — the consumer's
  semantics, the parser preserves it);
- ``sitemap:`` is group-independent (agent = null);
- directive names and agent tokens match case-insensitively and are
  emitted lowercased; values are trimmed, case-preserved;
- directives before any user-agent line and unknown directives drop;
  undecodable bytes soft-fail per row (SafeProcessor rule).

Scale shape: stateless streaming ``map_batches``, zero exchanges —
robots bodies are host-metadata-sized (one per host, ≪ corpus).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_DIRECTIVES = ("allow", "disallow", "sitemap", "user-agent")


def parse_robots(
    ds: "rd.Dataset",
    host_col: str = "host",
    body_col: str = "body",
) -> "rd.Dataset":
    """(host, agent, directive, value) — one row per allow/disallow per
    group agent, plus agent-null sitemap rows."""

    def batch(t: pa.Table) -> pa.Table:
        hosts, agents, dirs, vals = [], [], [], []
        for host, raw in zip(t[host_col].to_pylist(),
                             t[body_col].to_pylist()):
            if not raw:
                continue
            try:
                body = raw.decode("utf-8") if isinstance(raw, bytes) \
                    else str(raw)
            except UnicodeDecodeError:
                body = raw.decode("utf-8", errors="ignore")
            group: list = []
            group_open = False  # True while consecutive UA lines accrue
            for line in body.split("\n"):
                line = line.split("#", 1)[0].strip().rstrip("\r")
                if not line or ":" not in line:
                    continue
                key, _, val = line.partition(":")
                key = key.strip().lower()
                val = val.strip()
                if key == "user-agent":
                    if not group_open:
                        group = []
                        group_open = True
                    group.append(val.lower())
                    continue
                # any non-UA record ends the start-group line sequence
                # (RFC 9309 §2.1: only UA lines "directly following each
                # other" share a group) — including sitemap and unknown
                # directives, not just allow/disallow
                group_open = False
                if key == "sitemap":
                    hosts.append(host)
                    agents.append(None)
                    dirs.append("sitemap")
                    vals.append(val)
                    continue
                if key in ("allow", "disallow"):
                    for a in group:
                        hosts.append(host)
                        agents.append(a)
                        dirs.append(key)
                        vals.append(val)
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "agent": pa.array(agents, pa.string()),
            "directive": pa.array(dirs, pa.string()),
            "value": pa.array(vals, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")


def rules_for_agent(rules: "rd.Dataset", agent: str = "*") -> "rd.Dataset":
    """Project the parsed table to the ``(host, prefix)`` disallow
    rules ``robots_filter`` consumes: the agent's own group if it has
    one on that host, else the ``*`` group (RFC 9309 group-selection
    core, computed per host). Narrow — rules tables are
    host-metadata-sized."""
    agent = agent.lower()

    def pick(t: pa.Table) -> pa.Table:
        import collections
        per_host: dict = collections.defaultdict(
            lambda: {"own": [], "star": []})
        for r in t.to_pylist():
            if r["directive"] != "disallow":
                continue
            if r["agent"] == agent:
                per_host[r["host"]]["own"].append(r["value"])
            elif r["agent"] == "*":
                per_host[r["host"]]["star"].append(r["value"])
        hosts, prefixes = [], []
        for h, d in per_host.items():
            for p in (d["own"] if d["own"] else d["star"]):
                hosts.append(h)
                prefixes.append(p)
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "prefix": pa.array(prefixes, pa.string())})

    # group selection needs every rule of one host together: rules are
    # per-host metadata (tiny), so co-locate by host with one narrow
    # grouped exchange, then pick vectorized-enough per partition
    from ..ops.grouping import partition_grouped

    u, gcols = partition_grouped(rules, ["host"])
    return u.groupby(gcols).map_groups(
        lambda df: pick(pa.Table.from_pandas(df.drop(columns=["_pkey"]),
                                             preserve_index=False))
        .to_pandas(),
        batch_format="pandas")
