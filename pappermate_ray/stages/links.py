"""Hyperlink extraction from crawl HTML — the edge-building pass that
feeds the link-graph operators (ops/pagerank.py, ops/hits.py,
ops/anchors.py, ops/triangles.py) from raw pages instead of synthetic
edge tables: pages(url, html) → (src_url, dst_url, anchor) rows.

Deliberately separate from functions/htmlx.py (the golden-frozen
extractor — its byte-identical text contract must not change): link
harvesting is a different consumer of the same bytes.

Shuffle-free streaming map; one compiled regex per worker process, one
``finditer`` pass per page (HTML-scanner-grade parsing is not needed
for hrefs — the regex tolerates attribute order and quoting style).
Relative hrefs resolve against the source url's scheme+host; protocol
and fragment-only links drop; anchor text is tag-stripped and
whitespace-collapsed. Per-row soft-fail (undecodable bytes emit
nothing), the SafeProcessor rule every extraction stage follows.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.markup import strip_tags_collapse
# page-level <meta name=robots> patterns — ONE source of truth:
# stages/headmeta.py (RE2-safe inline-flag syntax works in Python re too)
from .headmeta import _ROBOTS_RES as _HEADMETA_ROBOTS_RES

_A_RE = re.compile(
    r"<a\s[^>]*?href\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a>",
    re.IGNORECASE | re.DOTALL,
)

_ROOT_RE = re.compile(r"^(https?://[^/?#]*)", re.IGNORECASE)

# rel attribute of one <a ...> opening tag (quoted either way or bare);
# nofollow is checked token-wise on the captured value, so rel="ugc
# nofollow" counts and rel="nofollowish" does not.
_REL_RE = re.compile(
    r"rel\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.IGNORECASE)

# scanned over the head slice only
_ROBOTS_PAGE_RES = tuple(re.compile(p) for p in _HEADMETA_ROBOTS_RES)


def _anchor_nofollow(open_tag: str) -> bool:
    m = _REL_RE.search(open_tag)
    if not m:
        return False
    val = m.group(1) or m.group(2) or m.group(3) or ""
    return "nofollow" in val.lower().split()


def _page_nofollow(html: str, head_bytes: int = 65536) -> bool:
    head = html[:head_bytes]
    # document-order first robots meta wins when the tag repeats — rank
    # the attribute-order variants by match POSITION, not pattern order
    # (a name-first pattern must not beat an earlier content-first tag)
    best = None
    for pat in _ROBOTS_PAGE_RES:
        m = pat.search(head)
        if m and (best is None or m.start() < best.start()):
            best = m
    return best is not None and "nofollow" in best.group("v").lower()



def extract_links(
    ds: "rd.Dataset",
    url_col: str = "url",
    html_col: str = "html",
    respect_nofollow: bool = False,
) -> "rd.Dataset":
    """``(src_url, dst_url, anchor)`` — one row per resolvable <a href>.

    ``respect_nofollow=True`` applies the crawl-graph hygiene rule every
    PageRank-grade link graph needs (nofollow edges carry no endorsement):
    anchors whose ``rel`` contains the ``nofollow`` token drop, and pages
    whose ``<meta name=robots>`` contains ``nofollow`` contribute no
    edges at all. Default False — the original harvest is golden for the
    existing link-graph oracles."""

    def batch(t: pa.Table) -> pa.Table:
        out_s, out_d, out_a = [], [], []
        for src, raw in zip(t[url_col].to_pylist(), t[html_col].to_pylist()):
            if not raw:
                continue
            try:
                html = raw.decode("utf-8") if isinstance(raw, bytes) else str(raw)
            except UnicodeDecodeError:
                html = raw.decode("utf-8", errors="ignore")
            if respect_nofollow and _page_nofollow(html):
                continue
            m = _ROOT_RE.match(src or "")
            root = m.group(1) if m else None
            for hit in _A_RE.finditer(html):
                if respect_nofollow and _anchor_nofollow(
                        hit.group(0)[:hit.group(0).index(">") + 1]):
                    continue
                href = hit.group(2) or hit.group(3) or hit.group(4) or ""
                href = href.split("#", 1)[0].strip()
                if not href or href.startswith(("javascript:", "mailto:", "data:")):
                    continue
                if href.startswith(("http://", "https://")):
                    dst = href
                elif href.startswith("/") and root:
                    dst = root + href
                else:
                    continue  # relative-path / scheme-relative: out of scope
                anchor = strip_tags_collapse(hit.group(5))
                out_s.append(src)
                out_d.append(dst)
                out_a.append(anchor)
        return pa.table({
            "src_url": pa.array(out_s, pa.string()),
            "dst_url": pa.array(out_d, pa.string()),
            "anchor": pa.array(out_a, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")


def host_graph(
    edges: "rd.Dataset",
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    include_intra: bool = False,
):
    """Host-level web graph from page-level edges (the Common-Crawl
    host-graph rollup): ``(src_host, dst_host, n_links,
    n_src_pages)`` where ``n_links`` counts edges and ``n_src_pages``
    counts DISTINCT linking pages. Intra-host edges (site navigation)
    drop by default — they carry no cross-site endorsement; pass
    ``include_intra=True`` to keep them. Rows whose url does not
    parse to a host drop.

    Scale shape: hosts come from ONE vectorized RE2 pass per side
    (``stages/urls._decompose``); then two narrow grouped exchanges —
    distinct ``(src_host, dst_host, src_url)`` triples first (the
    exact-distinct shuffle; no payload, url strings only), then the
    host-pair rollup over triple counts. No joins. The result is
    node-bounded (hosts², sparse), so it feeds ``pagerank_auto``'s
    dense path directly."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from .urls import _decompose

    def hostify(t: pa.Table) -> pa.Table:
        _, sh, _, _, _, _ = _decompose(t[src_col])
        _, dh, _, _, _, _ = _decompose(t[dst_col])
        out = pa.table({"src_host": sh, "dst_host": dh,
                        "src_url": t[src_col]})
        keep = pc.and_(pc.is_valid(sh), pc.is_valid(dh))
        if not include_intra:
            keep = pc.and_(keep, pc.invert(pc.equal(sh, dh)))
        return out.filter(keep)

    tri = edges.map_batches(hostify, batch_format="pyarrow")
    per_page = tri.groupby(["src_host", "dst_host", "src_url"]) \
        .aggregate(Count())
    rolled = per_page.groupby(["src_host", "dst_host"]).aggregate(
        Sum("count()"), Count())

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "src_host": t["src_host"],
            "dst_host": t["dst_host"],
            "n_links": t["sum(count())"],
            "n_src_pages": t["count()"],
        })

    return rolled.map_batches(rename, batch_format="pyarrow")


def host_reciprocity(
    pairs: "rd.Dataset",
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    round_to: int = 6,
    pre_canonicalized: bool = False,
    driver_bound: int = 1_000_000,
) -> "rd.Dataset":
    """Link-exchange signals per host over a host-pair edge table (the
    ``host_graph`` output, or any (src_host, dst_host) rows):
    ``(host, out_deg, in_deg, recip_out, recip_ratio)`` where
    ``recip_out`` counts the host's outgoing DISTINCT host links whose
    reverse edge also exists and ``recip_ratio = recip_out/out_deg``
    (0.0 for hosts with no outlinks). High reciprocity + balanced
    in/out over many partners is the classic link-farm / link-exchange
    spam signature (mutual-endorsement rings), the host-level hygiene
    input PageRank-grade ranking wants BEFORE the rank runs.

    Scale shape: one distinct groupby canonicalizes the pair set
    (self-loops drop, multiplicity collapses; skipped when the caller
    passes an already-distinct materialized table via
    ``pre_canonicalized`` — host_hygiene does, saving an exchange);
    then the round-5 bounded tier: a distinct pair set within
    ``driver_bound`` rows finishes ON THE DRIVER in one vectorized
    numpy pass (factorize hosts, pack keys, mutual = isin against the
    reversed keys, three bincounts) — the small-host-graph regime was
    paying two exchange spin-ups (semi-join + tagged-union groupby) to
    count thousands of rows. Beyond the bound: ONE armored key-only
    semi-join against the reversed pair set finds mutual edges; three
    narrow per-host counts merge through a single tagged-union
    groupby-sum. Only host-pair keys ever ride an exchange — the table
    is host²-sparse, never page-sized. Both tiers asserted identical
    in tests."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..ops.joins import hash_join

    def canon(t: pa.Table) -> pa.Table:
        out = pa.table({"src": t[src_col], "dst": t[dst_col]})
        keep = pc.and_(
            pc.and_(pc.is_valid(out["src"]), pc.is_valid(out["dst"])),
            pc.invert(pc.equal(out["src"], out["dst"])))
        return out.filter(keep)

    if pre_canonicalized:
        d = pairs
    else:
        d = (pairs.map_batches(canon, batch_format="pyarrow")
             .groupby(["src", "dst"]).aggregate(Count())
             .select_columns(["src", "dst"]).materialize())
    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    if d.count() <= driver_bound:
        src_l, dst_l = [], []
        for t in d.iter_batches(batch_size=65536, batch_format="pyarrow"):
            src_l.extend(t["src"].to_pylist())
            dst_l.extend(t["dst"].to_pylist())
        hosts, codes = np.unique(np.array(src_l + dst_l, dtype=object),
                                 return_inverse=True)
        n = len(hosts)
        a = codes[: len(src_l)].astype(np.int64)
        b = codes[len(src_l):].astype(np.int64)
        fwd = a * n + b
        mutual = np.isin(fwd, b * n + a)
        out_deg = np.bincount(a, minlength=n)
        in_deg = np.bincount(b, minlength=n)
        recip = np.bincount(a[mutual], minlength=n)
        with np.errstate(divide="ignore", invalid="ignore"):
            rr = np.where(out_deg > 0,
                          recip / np.where(out_deg > 0, out_deg, 1), 0.0)
        keep = (out_deg > 0) | (in_deg > 0)
        idx = np.flatnonzero(keep)
        return rd.from_arrow(pa.table({
            "host": pa.array(hosts[idx].tolist(), pa.string()),
            "out_deg": pa.array(out_deg[idx], pa.int64()),
            "in_deg": pa.array(in_deg[idx], pa.int64()),
            "recip_out": pa.array(recip[idx], pa.int64()),
            "recip_ratio": pa.array(np.round(rr[idx], round_to),
                                    pa.float64()),
        }))

    rev = d.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow")
    mutual = hash_join(d, rev, on=("src", "dst"), join_type="left_semi",
                       left_schema=edge_schema, right_schema=edge_schema)

    def tagged(ds, col, slot):
        def f(t: pa.Table) -> pa.Table:
            z = np.zeros(t.num_rows, np.int64)
            cols = {"host": t[col]}
            for i, name in enumerate(("out_deg", "in_deg", "recip_out")):
                cols[name] = pa.array(
                    np.ones(t.num_rows, np.int64) if i == slot else z,
                    pa.int64())
            return pa.table(cols)
        return ds.map_batches(f, batch_format="pyarrow")

    merged = (tagged(d, "src", 0)
              .union(tagged(d, "dst", 1))
              .union(tagged(mutual, "src", 2))
              .groupby("host")
              .aggregate(Sum("out_deg", alias_name="out_deg"),
                         Sum("in_deg", alias_name="in_deg"),
                         Sum("recip_out", alias_name="recip_out")))

    def ratio(t: pa.Table) -> pa.Table:
        od = t["out_deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        rc = t["recip_out"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            rr = np.where(od > 0, rc / np.where(od > 0, od, 1.0), 0.0)
        return pa.table({
            "host": t["host"],
            "out_deg": t["out_deg"],
            "in_deg": t["in_deg"],
            "recip_out": t["recip_out"],
            "recip_ratio": pa.array(np.round(rr, round_to), pa.float64()),
        })

    return merged.map_batches(ratio, batch_format="pyarrow")


def co_citation(
    pairs: "rd.Dataset",
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    min_shared: int = 2,
    max_fanout: int = 10_000,
    coupling: bool = False,
    weighted: bool = False,
    round_to: int = 6,
    driver_bound: int = 1_000_000,
    pair_bound: int = 5_000_000,
) -> "rd.Dataset":
    """Co-citation similarity over a host-pair edge table: ``(host_a,
    host_b, n_shared)`` for host pairs endorsed by ≥ ``min_shared``
    common in-linking hosts (Small 1973 — two pages repeatedly cited
    together are topically related even with zero direct links; the
    link-structure sibling of the embedding near-dup operators).
    ``coupling=True`` flips to bibliographic coupling (Kessler 1963:
    pairs of hosts CITING the same targets — "these two sites share a
    reading list"). ``weighted=True`` appends the Adamic–Adar link
    prediction score (2003) ``aa_score = Σ 1/ln(fanout(shared))`` —
    a hub endorsing half the web contributes almost nothing, a
    selective citer contributes a lot; the min_shared filter still
    applies to the raw count.

    Scale shape (the winnow_clone_pairs / _shared_hash_pairs core,
    string-id-preserving): one distinct groupby canonicalizes the pair
    set, then ONE partition-grouped exchange keyed on the shared
    endpoint — in-partition triu pair runs with a ``max_fanout`` storm
    cap (a mega-hub citing half the web endorses nothing; its quadratic
    pair explosion is excluded, mirrored exactly in the oracle) and a
    local pair-count combine — plus one narrow pair groupby-sum. Only
    host strings ride the exchanges."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from ..ops.grouping import partition_grouped

    def canon(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        key, val = (dst_col, src_col) if coupling else (src_col, dst_col)
        out = pa.table({"key": t[key], "val": t[val]})
        keep = pc.and_(
            pc.and_(pc.is_valid(out["key"]), pc.is_valid(out["val"])),
            pc.invert(pc.equal(out["key"], out["val"])))
        return out.filter(keep)

    d = (pairs.map_batches(canon, batch_format="pyarrow")
         .groupby(["key", "val"]).aggregate(Count())
         .select_columns(["key", "val"]).materialize())

    # round-5 bounded tier: a distinct pair set within ``driver_bound``
    # rows whose eligible-run triu fan-out stays within ``pair_bound``
    # finishes in one vectorized numpy pass on the driver — the
    # small-host-graph regime was paying two exchange spin-ups to pair
    # thousands of rows. Either bound exceeded → distributed path.
    if d.count() <= driver_bound:
        keys_l, vals_l = [], []
        for t in d.iter_batches(batch_size=65536, batch_format="pyarrow"):
            keys_l.extend(t["key"].to_pylist())
            vals_l.extend(t["val"].to_pylist())
        hosts, codes = np.unique(np.array(keys_l + vals_l, dtype=object),
                                 return_inverse=True)
        h = len(hosts)
        kk = codes[: len(keys_l)].astype(np.int64)
        vv = codes[len(keys_l):].astype(np.int64)
        order = np.lexsort((vv, kk))
        kk, vv = kk[order], vv[order]
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]]) \
            if len(kk) else np.array([], np.int64)
        ends = np.r_[starts[1:], len(kk)] if len(starts) else starts
        m = ends - starts
        elig = (m >= 2) & (m <= max_fanout)
        if int((m[elig] * (m[elig] - 1) // 2).sum()) <= pair_bound:
            pks, wts = [], []
            for s, e in zip(starts[elig], ends[elig]):
                run = vv[s:e]  # sorted ⇒ triu gives host_a < host_b
                ia, ib = np.triu_indices(e - s, 1)
                pks.append(run[ia] * h + run[ib])
                if weighted:
                    wts.append(np.full(len(ia), 1.0 / np.log(e - s)))
            if pks:
                pk = np.concatenate(pks)
                upk, inv = np.unique(pk, return_inverse=True)
                n_shared = np.bincount(inv)
                keep = n_shared >= min_shared
                upk, n_shared = upk[keep], n_shared[keep]
                cols = {
                    "host_a": pa.array(hosts[upk // h].tolist(),
                                       pa.string()),
                    "host_b": pa.array(hosts[upk % h].tolist(),
                                       pa.string()),
                    "n_shared": pa.array(n_shared.astype(np.int64),
                                         pa.int64()),
                }
                if weighted:
                    aa = np.bincount(inv, weights=np.concatenate(wts))
                    cols["aa_score"] = pa.array(
                        np.round(aa[keep], round_to), pa.float64())
            else:
                cols = {"host_a": pa.array([], pa.string()),
                        "host_b": pa.array([], pa.string()),
                        "n_shared": pa.array([], pa.int64())}
                if weighted:
                    cols["aa_score"] = pa.array([], pa.float64())
            return rd.from_arrow(pa.table(cols))

    parted, gcols = partition_grouped(d, ["key"])

    def run_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "val"], kind="mergesort")
        keys = df["key"].to_numpy()
        vals = df["val"].to_numpy()
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]]) \
            if len(df) else np.array([], np.int64)
        ends = np.r_[starts[1:], len(df)] if len(starts) else starts
        out_a, out_b, out_w = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2 or m > max_fanout:
                continue
            ia, ib = np.triu_indices(m, 1)
            run = vals[s:e]  # sorted ⇒ triu gives host_a < host_b
            out_a.append(run[ia])
            out_b.append(run[ib])
            if weighted:
                out_w.append(np.full(len(ia), 1.0 / np.log(m)))
        empty = {"host_a": pd.Series([], dtype="str"),
                 "host_b": pd.Series([], dtype="str"),
                 "n_shared": pd.Series([], dtype=np.int64)}
        if weighted:
            empty["aa_part"] = pd.Series([], dtype=np.float64)
        if not out_a:
            return pd.DataFrame(empty)
        dfp = pd.DataFrame({"host_a": np.concatenate(out_a),
                            "host_b": np.concatenate(out_b)})
        if weighted:
            dfp["aa_part"] = np.concatenate(out_w)
            out = dfp.groupby(["host_a", "host_b"], as_index=False).agg(
                n_shared=("aa_part", "size"), aa_part=("aa_part", "sum"))
            return out.astype({"n_shared": np.int64})
        out = dfp.groupby(["host_a", "host_b"], as_index=False).size()
        return out.rename(columns={"size": "n_shared"}).astype(
            {"n_shared": np.int64})

    local = parted.groupby(gcols).map_groups(run_pairs,
                                             batch_format="pandas")
    aggs = [Sum("n_shared", alias_name="n_shared")]
    if weighted:
        aggs.append(Sum("aa_part", alias_name="aa_sum"))
    summed = local.groupby(["host_a", "host_b"]).aggregate(*aggs)
    summed = summed.filter(lambda r: r["n_shared"] >= min_shared)
    if not weighted:
        return summed

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "host_a": t["host_a"],
            "host_b": t["host_b"],
            "n_shared": t["n_shared"],
            "aa_score": pa.array(
                np.round(t["aa_sum"].to_numpy(zero_copy_only=False),
                         round_to), pa.float64()),
        })

    return summed.map_batches(fin, batch_format="pyarrow")


def host_hygiene(
    pairs: "rd.Dataset",
    seeds: "rd.Dataset",
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    k: int = 2,
    kcore_rounds: int = 3,
    trust_iters: int = 3,
) -> "rd.Dataset":
    """Composed host-hygiene signal table — the three spam lenses this
    module family provides, joined into one row per host: ``(host,
    out_deg, in_deg, recip_out, recip_ratio, core_degree, trustrank)``.
    Reciprocity exposes link-exchange rings, the k-core degree exposes
    densely interlinked cliques (``core_degree`` = surviving degree
    after ``kcore_rounds`` peel rounds at threshold ``k``; 0 = peeled
    away), and TrustRank exposes distance from the trusted ``seeds`` —
    a ranking pipeline reads all three BEFORE believing raw authority.

    Scale shape: the pair set canonicalizes ONCE (distinct groupby,
    materialized — three consumers) and feeds all three operators;
    the final assembly is one inner join (trustrank covers every
    endpoint by construction) plus one armored left-outer join (peeled
    hosts take core_degree 0). Host strings are the widest thing any
    exchange carries."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ..ops.joins import adaptive_partitions, hash_join
    from ..ops.kcore import k_core
    from ..ops.pagerank import trustrank

    def canon(t: pa.Table) -> pa.Table:
        out = pa.table({"src": t[src_col], "dst": t[dst_col]})
        keep = pc.and_(
            pc.and_(pc.is_valid(out["src"]), pc.is_valid(out["dst"])),
            pc.invert(pc.equal(out["src"], out["dst"])))
        return out.filter(keep)

    d = (pairs.map_batches(canon, batch_format="pyarrow")
         .groupby(["src", "dst"]).aggregate(Count())
         .select_columns(["src", "dst"]).materialize())

    r = host_reciprocity(d, src_col="src", dst_col="dst",
                         pre_canonicalized=True)
    kc = k_core(d, k, rounds=kcore_rounds)
    nodes = (d.map_batches(lambda t: pa.table({"node": t["src"]}),
                           batch_format="pyarrow")
             .union(d.map_batches(lambda t: pa.table({"node": t["dst"]}),
                                  batch_format="pyarrow"))
             .groupby("node").aggregate(Count())
             .select_columns(["node"]).materialize())
    tr = trustrank(nodes, d, seeds, iters=trust_iters, round_to=8)

    np_ = adaptive_partitions(nodes.count())
    r_schema = pa.schema([
        ("host", pa.string()), ("out_deg", pa.int64()),
        ("in_deg", pa.int64()), ("recip_out", pa.int64()),
        ("recip_ratio", pa.float64())])
    tr_schema = pa.schema([("node", pa.string()),
                           ("trustrank", pa.float64())])
    kc_schema = pa.schema([("node", pa.string()), ("degree", pa.int64())])

    out = hash_join(r, tr, on="host", right_on="node",
                    num_partitions=np_,
                    left_schema=r_schema, right_schema=tr_schema)
    out = hash_join(
        out, kc, on="host", right_on="node", join_type="left_outer",
        num_partitions=np_,
        left_schema=pa.schema(list(r_schema) + [("trustrank", pa.float64())]),
        right_schema=kc_schema)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["host"],
            "out_deg": t["out_deg"],
            "in_deg": t["in_deg"],
            "recip_out": t["recip_out"],
            "recip_ratio": t["recip_ratio"],
            "core_degree": pc.fill_null(pc.cast(t["degree"], pa.int64()), 0),
            "trustrank": t["trustrank"],
        })

    return out.map_batches(fin, batch_format="pyarrow")


def host_mirror_pairs(
    ds: "rd.Dataset",
    host_col: str = "host",
    fp_col: str = "fp",
    min_shared: int = 2,
    max_hosts_per_fp: int = 1_000,
    mirror_permille: int = 500,
    round_to: int = 6,
    num_partitions=None,
) -> "rd.Dataset":
    """Mirror / aggregator detection over (host, page-fingerprint) rows
    (Bharat & Broder 1999, "mirror hosts on the web"): ``(host_a,
    host_b, n_shared, n_a, n_b, jaccard, is_mirror)`` for host pairs
    sharing ≥ ``min_shared`` distinct page fingerprints. ``jaccard`` =
    shared / (n_a + n_b − shared) over each host's DISTINCT-fingerprint
    page set (one float division, round-``round_to``); ``is_mirror`` is
    the exact-integer test ``shared · 1000 ≥ mirror_permille · union``
    — no float compare at the threshold. A training pipeline drops or
    downweights one side of a mirror pair BEFORE near-dup passes: a
    full site mirror is one decision, not a million pair decisions.

    Scale shape (the co_citation core, content-keyed): distinct
    (fp, host) first (a host re-serving one page 10k times counts
    once), per-host page totals via a narrow groupby, then ONE
    partition-grouped exchange keyed on the FINGERPRINT — in-partition
    triu host-pair runs with a ``max_hosts_per_fp`` storm cap (a
    boilerplate page served by half the web identifies nothing; its
    quadratic explosion is excluded, mirrored exactly in the oracle)
    and a local pair-count combine — a narrow pair groupby-sum, and two
    armored hash joins against the aggregate-sized per-host totals.
    Only 32-char digests and host strings ride the exchanges; page
    payloads never shuffle.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..ops.grouping import partition_grouped
    from ..ops.joins import adaptive_partitions, hash_join

    def canon(t: pa.Table) -> pa.Table:
        out = pa.table({"fp": t[fp_col], "host": t[host_col]})
        return out.filter(pc.and_(pc.is_valid(out["fp"]),
                                  pc.is_valid(out["host"])))

    d = (ds.map_batches(canon, batch_format="pyarrow")
         .groupby(["fp", "host"]).aggregate(Count())
         .select_columns(["fp", "host"]))
    d = d.materialize()  # two consumers: totals + the pair exchange

    totals = d.groupby("host").aggregate(Count())

    def tot_fin(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["host"],
                         "n_pages": pc.cast(t["count()"], pa.int64())})

    # aggregate-sized (one row per host) and consumed by BOTH joins —
    # materialize once or the groupby lineage executes twice
    totals = totals.map_batches(tot_fin,
                                batch_format="pyarrow").materialize()
    join_parts = adaptive_partitions(totals.count())

    parted, gcols = partition_grouped(d, ["fp"], npart=num_partitions)

    def run_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["fp", "host"], kind="mergesort")
        fps = df["fp"].to_numpy()
        hosts = df["host"].to_numpy()
        starts = np.flatnonzero(np.r_[True, fps[1:] != fps[:-1]]) \
            if len(df) else np.array([], np.int64)
        ends = np.r_[starts[1:], len(df)] if len(starts) else starts
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2 or m > max_hosts_per_fp:
                continue
            ia, ib = np.triu_indices(m, 1)
            run = hosts[s:e]  # sorted ⇒ triu gives host_a < host_b
            out_a.append(run[ia])
            out_b.append(run[ib])
        if not out_a:
            return pd.DataFrame({
                "host_a": pd.Series([], dtype="str"),
                "host_b": pd.Series([], dtype="str"),
                "n_shared": pd.Series([], dtype=np.int64)})
        dfp = pd.DataFrame({"host_a": np.concatenate(out_a),
                            "host_b": np.concatenate(out_b)})
        out = dfp.groupby(["host_a", "host_b"], as_index=False).size()
        return out.rename(columns={"size": "n_shared"}).astype(
            {"n_shared": np.int64})

    local = parted.groupby(gcols).map_groups(run_pairs,
                                             batch_format="pandas")
    pairs = local.groupby(["host_a", "host_b"]).aggregate(
        Sum("n_shared", alias_name="n_shared"))
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_shared"], min_shared)),
        batch_format="pyarrow")

    tot_schema = pa.schema([pa.field("host", pa.string()),
                            pa.field("n_pages", pa.int64())])
    pair_schema = pa.schema([pa.field("host_a", pa.string()),
                             pa.field("host_b", pa.string()),
                             pa.field("n_shared", pa.int64())])

    def side(t: pa.Table, col: str, out: str) -> pa.Table:
        i = t.schema.get_field_index("n_pages")
        t = t.set_column(i, out, t["n_pages"])
        # Ray's join drops the right key column when right_on differs;
        # armor variants may keep it — drop defensively
        if "host" in t.schema.names:
            t = t.drop_columns(["host"])
        return t

    j = hash_join(pairs, totals, on="host_a", right_on="host",
                  num_partitions=num_partitions or join_parts,
                  left_schema=pair_schema, right_schema=tot_schema)
    j = j.map_batches(lambda t: side(t, "host_a", "n_a"),
                      batch_format="pyarrow")
    ja_schema = pa.schema(list(pair_schema) + [pa.field("n_a", pa.int64())])
    j = hash_join(j, totals, on="host_b", right_on="host",
                  num_partitions=num_partitions or join_parts,
                  left_schema=ja_schema, right_schema=tot_schema)
    j = j.map_batches(lambda t: side(t, "host_b", "n_b"),
                      batch_format="pyarrow")

    def fin(t: pa.Table) -> pa.Table:
        sh = t["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        union = na + nb - sh
        jac = np.round(sh / union, round_to) + 0.0
        return pa.table({
            "host_a": t["host_a"], "host_b": t["host_b"],
            "n_shared": pa.array(sh, pa.int64()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
            "is_mirror": pa.array(sh * 1000 >= mirror_permille * union),
        })

    return j.map_batches(fin, batch_format="pyarrow")
