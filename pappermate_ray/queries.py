"""Query battery: one entry per operator family (SURVEY.md §2).

Each ``q_*`` takes ``sf_dir`` and returns a Dataset / pyarrow Table. The
matching ANSI-SQL oracle lives in ``ORACLE_SQL`` (run by the driver via
DuckDB over the same parquet, views pre-registered). Column names match
between both sides; float aggregates are rounded identically on both sides
so the value-hash compare is stable.

Scale notes are in each docstring: what shuffles, what broadcasts, what
streams. Nothing here materializes a large input on the driver.
"""

from __future__ import annotations

import hashlib
import os as _os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean, Min, Sum

from .ops.joins import broadcast_anti, broadcast_lookup, broadcast_semi, hash_join
from .ops.sample import stratified_head


def _tmp_cache(prefix: str, sf_dir: str) -> str:
    """/tmp cache dir for a gate artifact derived from ``sf_dir``'s
    parquet, keyed on fixtures.FIXTURES_VERSION so regenerated corpora
    never serve a stale artifact (the _minhash_index_dir pattern)."""
    from .fixtures import FIXTURES_VERSION

    tag = sf_dir.strip("/").replace("/", "_")
    return f"/tmp/{prefix}_v{FIXTURES_VERSION}_{tag}"


def _round_cols(ds: "rd.Dataset", spec: Dict[str, int]) -> "rd.Dataset":
    def _r(batch: pa.Table) -> pa.Table:
        for col, nd in spec.items():
            i = batch.schema.get_field_index(col)
            batch = batch.set_column(i, col, pc.round(batch[col], ndigits=nd))
        return batch

    return ds.map_batches(_r, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.5 A1-A3) — partial-combine then tiny shuffle
# --------------------------------------------------------------------------

def q_event_histogram(sf_dir: str):
    """Histogram by event_type with partial per-batch pre-aggregation.

    The map side collapses each block to ≤|distinct keys| rows before the
    hash shuffle — at 100 TB the exchange moves key-cardinality rows per
    block, not the corpus (SURVEY.md §2.5 A1).
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("value", "sum"), ("value", "count")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "value_part": g["value_sum"],
                "cnt_part": pc.cast(g["value_count"], pa.int64()),
            }
        )

    ds = ds.map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby("event_type").aggregate(
        Sum("cnt_part", alias_name="n_events"),
        Sum("value_part", alias_name="total_value"),
    )
    return _round_cols(agg, {"total_value": 2})


def q_lineitem_pricing(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate over lineitem.

    Partial pre-aggregation inside map_batches (pyarrow group_by per
    block) collapses each block to ≤6 rows before the hash shuffle — the
    exchange is O(keys × blocks), not O(rows). Mean decomposes into
    (sum, count) partials.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("l_discount", "sum"), ("l_discount", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "qty_part": g["l_quantity_sum"],
                "price_part": g["l_extendedprice_sum"],
                "disc_part": g["l_discount_sum"],
                "n_part": pc.cast(g["l_discount_count"], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("qty_part", alias_name="sum_qty"),
        Sum("price_part", alias_name="sum_price"),
        Sum("disc_part", alias_name="sum_disc"),
        Sum("n_part", alias_name="n"),
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.round(pc.divide(t["sum_disc"], pc.cast(t["n"], pa.float64())), ndigits=6)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.round(t["sum_qty"], ndigits=2),
                "sum_price": pc.round(t["sum_price"], ndigits=2),
                "avg_disc": avg,
                "n": t["n"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_lang_counts(sf_dir: str):
    """Distinct-value histogram (A10 corpus-wide distinct via hash shuffle)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def q_distinct_sources(sf_dir: str):
    """Corpus-wide distinct via ds.unique (A10's exact-distinct shuffle)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    vals = ds.unique("source")
    return pa.table({"n_sources": pa.array([len(vals)], pa.int64())})


def q_events_hourly(sf_dir: str):
    """Tumbling event-time window as a derived-key groupby (guide §streaming)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        return t.append_column("window_start", w).drop_columns(["ts"])

    ds = ds.map_batches(add_window, batch_format="pyarrow")
    agg = ds.groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
    )
    return _round_cols(agg, {"sum_value": 2})


# --------------------------------------------------------------------------
# Filters / projections / per-row maps (§2.2)
# --------------------------------------------------------------------------

def q_docs_filter_project(sf_dir: str):
    """Vectorized predicate + projection (M18-style gate, pruned read)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["lang"], "en"), pc.greater_equal(t["n_chars"], 200))
        ).select(["doc_id", "source", "n_chars"]),
        batch_format="pyarrow",
    )


def q_ascii_docs(sf_dir: str):
    """ASCII-safety predicate (M18): char length == byte length."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _ascii(t: pa.Table) -> pa.Table:
        mask = pc.equal(pc.utf8_length(t["text"]), pc.binary_length(pc.cast(t["text"], pa.binary())))
        return t.filter(mask).select(["doc_id"])

    return ds.map_batches(_ascii, batch_format="pyarrow")


def q_token_counts(sf_dir: str):
    """Whitespace token count per doc, vectorized (quality ops)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _tok(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t["text"])))
        # split_whitespace('') yields [''] → force 0 for blank docs
        blank = pc.equal(pc.utf8_trim_whitespace(t["text"]), "")
        n = pc.if_else(blank, pa.scalar(0, pa.int32()), n)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(_tok, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Sorts / top-k / sampling (§2.6)
# --------------------------------------------------------------------------

def q_top_docs(sf_dir: str):
    """Global top-k by column (T4-shape: sort + limit)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


def q_grouped_topk(sf_dir: str):
    """Per-lang top-3 docs by n_chars (grouped top-k; T4's grouped analog)."""
    from .ops.sample import grouped_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    return grouped_topk(ds, "lang", "n_chars", "doc_id", 3)


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: first 2 per (lang, source) (T6)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"])
    return stratified_head(ds, ["lang", "source"], "doc_id", 2)


# --------------------------------------------------------------------------
# Joins (§2.4)
# --------------------------------------------------------------------------

def q_mktsegment_revenue(sf_dir: str):
    """Broadcast join: small dimension (customer) ray.put once, orders stream."""
    import pyarrow.parquet as pq

    cust_t = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    lookup = dict(zip(cust_t["c_custkey"].to_pylist(), cust_t["c_mktsegment"].to_pylist()))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    joined = broadcast_lookup(orders, lookup, "o_custkey", "c_mktsegment")
    agg = joined.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="revenue"),
        Count(alias_name="n_orders"),
    )
    return _round_cols(agg, {"revenue": 2})


def q_orderstatus_lineitem(sf_dir: str):
    """Large-large partitioned hash join (lineitem ⋈ orders) then aggregate."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"])
    # num_partitions defaults to cluster cores (ops/joins.py); the round-1
    # hardcoded 16 under-parallelized the engine's biggest all-to-all
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    agg = joined.groupby("o_orderstatus").aggregate(
        Count(alias_name="n_items"),
        Sum("l_extendedprice", alias_name="sum_price"),
    )
    return _round_cols(agg, {"sum_price": 2})


def q_nation_region(sf_dir: str):
    """Dimension ⋈ dimension broadcast join + grouped count."""
    import pyarrow.parquet as pq

    region_t = pq.read_table(f"{sf_dir}/region.parquet")
    lookup = dict(zip(region_t["r_regionkey"].to_pylist(), region_t["r_name"].to_pylist()))
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    joined = broadcast_lookup(nation, lookup, "n_regionkey", "r_name")
    return joined.groupby("r_name").aggregate(Count(alias_name="n_nations"))


def q_customers_without_orders(sf_dir: str):
    """Anti-join via broadcast key set (D5 resume shape).

    Predicate pushed into the read (only 'F'-status custkeys build the key
    set) so the broadcast side stays small at scale.
    """
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    keys = orders.unique("o_custkey")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return broadcast_anti(cust, keys, "c_custkey")


def q_customers_with_orders(sf_dir: str):
    """Semi-join + global count."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    keys = orders.unique("o_custkey")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    n = broadcast_semi(cust, keys, "c_custkey").count()
    return pa.table({"n_customers": pa.array([n], pa.int64())})


def q_sliding_windows(sf_dir: str):
    """Sliding 2h windows advancing hourly: each event contributes to the
    two windows covering it (flat-map to window keys → grouped aggregate).
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def explode_windows(t: pa.Table) -> pa.Table:
        w0i = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64())
        w1i = pc.subtract(w0i, pa.scalar(3_600_000_000, pa.int64()))  # −1h in µs
        mk = lambda wi: pa.table(
            {"event_type": t["event_type"],
             "window_start": pc.cast(wi, pa.timestamp("us")),
             "value": t["value"]}
        )
        return pa.concat_tables([mk(w0i), mk(w1i)])

    exploded = ds.map_batches(explode_windows, batch_format="pyarrow")
    agg = exploded.groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
    )
    return _round_cols(agg, {"sum_value": 2})


def q_regex_extract(sf_dir: str):
    """Per-row regex extraction (M1/M32-shape) with a DuckDB RE2 oracle:
    first engine-keyword match per doc (empty string when none)."""
    import re

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pat = re.compile(r"\b(spark|merge|window)\b")

    def _ex(t: pa.Table) -> pa.Table:
        outs = []
        for text in t["text"].to_pylist():
            m = pat.search(text or "")
            outs.append(m.group(1) if m else "")
        return pa.table({"doc_id": t["doc_id"], "first_kw": pa.array(outs, pa.string())})

    return ds.map_batches(_ex, batch_format="pyarrow")


def q_wordcount_top(sf_dir: str, k: int = 20):
    """Corpus word count with partial per-batch combine → tiny shuffle →
    global top-k (the canonical wordcount; T3 ordering with tie-break)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for text in t["text"].to_pylist():
            for w in (text or "").split():
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {"token": pa.array(list(counts.keys()), pa.string()),
             "c": pa.array(list(counts.values()), pa.int64())}
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("token").aggregate(
        Sum("c", alias_name="cnt")
    )
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(k)


def q_cumulative_hourly(sf_dir: str):
    """Running cumulative count/sum per event_type at each hour boundary
    (ordered incremental semantics). Dataset-expressible: hourly partials
    via groupby, then per-key ordered cumsum in map_groups. The raw-actor
    variant (state/streaming.py) is cross-checked against this in tests.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"event_type": t["event_type"], "window_start": w, "value": t["value"]})

    hourly = ds.map_batches(add_window, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]
    ).aggregate(Count(alias_name="n"), Sum("value", alias_name="s"))

    def cumsum(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("window_start", kind="mergesort")
        g["cum_events"] = g["n"].cumsum().astype("int64")
        g["cum_value"] = g["s"].cumsum().round(2)
        return g[["event_type", "window_start", "cum_events", "cum_value"]]

    return hourly.groupby("event_type").map_groups(cumsum, batch_format="pandas")


def q_jaccard_verify(sf_dir: str):
    """Dedup verification with an exact oracle: word-set Jaccard between
    each planted near-dup pair (doc, doc+' extra') of the dup-bearing
    corpus. The pair list is the deterministic plant (doc_id % 10 == 0),
    texts are fetched by a distributed semi-filter over the union corpus,
    similarity computed from hashed word sets (64-bit FNV — collision-free
    in practice). Oracle reconstructs b's word set as a ∪ {'extra'}."""
    import pyarrow.parquet as pq

    from .functions.dedupfn import jaccard, shingles

    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    pair_ids = [int(d) for d in base["doc_id"].to_pylist() if d % 10 == 0]
    pairs = [(d, d + 1_000_000) for d in pair_ids]

    ds = _docs_with_dups(sf_dir)
    need = pa.array([i for p in pairs for i in p])
    texts: dict = {}
    filtered = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["doc_id"], value_set=need)),
        batch_format="pyarrow",
    )
    for batch in filtered.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            texts[did] = shingles((text or "").lower(), 1)  # hashed word unigrams
    out_a, out_j = [], []
    for a, b in pairs:
        out_a.append(a)
        out_j.append(round(jaccard(texts.get(a, set()), texts.get(b, set())), 6))
    return pa.table({"doc_id": pa.array(out_a, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


def q_props_json(sf_dir: str):
    """JSON scalar extraction (§2.8 json family): pull props.k per event,
    aggregate per event_type. Vectorized-ish per batch; oracle uses
    DuckDB json_extract."""
    import json as _json

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def extract_k(t: pa.Table) -> pa.Table:
        ks = []
        for p in t["props"].to_pylist():
            try:
                ks.append(int(_json.loads(p)["k"]))
            except Exception:
                ks.append(None)
        return pa.table({"event_type": t["event_type"], "k": pa.array(ks, pa.int64())})

    agg = ds.map_batches(extract_k, batch_format="pyarrow").groupby("event_type").aggregate(
        Sum("k", alias_name="sum_k"),
        Count(alias_name="n"),
    )
    return agg


def q_asof_latest_order(sf_dir: str):
    """Backward as-of join: for each event, the customer's most recent
    order at/before the event time (ops/asof.py). One hash shuffle on the
    shared key; deterministic max-orderkey tie-break."""
    from .ops.asof import asof_join

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    out = asof_join(
        events, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        left_id="event_id", right_id="o_orderkey",
    )
    return out.map_batches(
        lambda t: pa.table({"event_id": t["left_id"], "o_orderkey": t["right_id"]}),
        batch_format="pyarrow",
    )


def q_range_join_windows(sf_dir: str):
    """Range join: events matched to per-customer 12h service windows
    (derived deterministically from orders) by interval containment
    (ops/rangejoin.py). Single shuffle on the customer key."""
    from .ops.rangejoin import range_join

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    DAY_US = 86_400_000_000
    BASE_US = 1_704_067_200_000_000  # 2024-01-01 in µs since epoch

    def windows(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        start = (keys % 30).astype(np.int64) * DAY_US + BASE_US
        end = start + DAY_US // 2
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
             "wstart": pa.array(start).cast(pa.timestamp("us")),
             "wend": pa.array(end).cast(pa.timestamp("us"))}
        )

    win = orders.map_batches(windows, batch_format="pyarrow")
    out = range_join(
        events, win,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_start="wstart", right_end="wend",
        left_id="event_id", right_id="o_orderkey",
    )
    return out.map_batches(
        lambda t: pa.table({"event_id": t["left_id"], "o_orderkey": t["right_id"]}),
        batch_format="pyarrow",
    )


def q_user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per-user session count with a 30-min inactivity gap.

    One hash shuffle on ``hash(user_id) mod P`` (partition groups, not
    per-user pandas groups — billions of users would pay ~1 ms of
    DataFrame overhead each); within a partition ALL users sessionize in
    one vectorized pass: sort by (user, ts), session starts are rows
    where the user changes OR the gap exceeds the threshold, per-user
    counts fall out of one groupby-sum over a boolean column.
    """
    from .ops.grouping import partition_grouped

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    grouped, pkey_cols = partition_grouped(ds, ["user_id"])

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        new_user = np.empty(len(g), bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        starts = new_user | gap.to_numpy()
        out = (
            pd.DataFrame({"user_id": uid, "s": starts})
            .groupby("user_id", sort=False)["s"].sum().reset_index()
            .rename(columns={"s": "n_sessions"})
        )
        return out.astype({"user_id": "int64", "n_sessions": "int64"})

    return grouped.groupby(pkey_cols).map_groups(sessions, batch_format="pandas")


# --------------------------------------------------------------------------
# Dedup (§2.7)
# --------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    """Exact dedup: content hash → hash-partitioned group → keep min id (D1).

    The md5 column is computed in-stream per batch; the shuffle key is the
    16-byte digest, so the exchange is narrow regardless of document size.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()), "doc_id": t["doc_id"]})

    ds = ds.map_batches(add_hash, batch_format="pyarrow")
    return ds.groupby("h").aggregate(
        Min("doc_id", alias_name="keep_id"),
        Count(alias_name="dup_count"),
    )


# --------------------------------------------------------------------------
# Similarity search (embeddings)
# --------------------------------------------------------------------------

def q_knn_bruteforce(sf_dir: str, k: int = 5, n_queries: int = 3):
    """Brute-force cosine top-k: query matrix broadcast, batches stream.

    The query block (n_queries × d) is ray.put once; every batch computes
    a (batch × n_queries) float64 matmul and emits its LOCAL top-k per
    query; a final tiny sort/head per query merges the partials — the
    classic scatter-gather top-k (no full pairwise materialization).
    """
    import pyarrow.parquet as pq

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qids = [i for i in range(n_queries)]
    qmask = pc.is_in(qt["vec_id"], value_set=pa.array(qids))
    qtab = qt.filter(qmask)
    Q = np.array(qtab["embedding"].to_pylist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_vec_ids = np.array(qtab["vec_id"].to_pylist(), dtype=np.int64)
    ref = ray.put((q_vec_ids, Qn))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def local_topk(t: pa.Table) -> pa.Table:
        qv, qn = ray.get(ref)
        X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ qn.T  # (batch, n_queries)
        vec_ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qv):
            col = sims[:, j]
            mask = vec_ids != qid
            ids, ss = vec_ids[mask], col[mask]
            take = min(k, len(ids))
            idx = np.argsort(-ss, kind="stable")[:take]
            out_q.extend([qid] * take)
            out_n.extend(ids[idx].tolist())
            out_s.extend(ss[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        return g[["query_id", "neighbor_id"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


ORACLE_SQL: Dict[str, str] = {
    "event_histogram": """
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY event_type
    """,
    "lineitem_pricing": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "lang_counts": "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang",
    "distinct_sources": "SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources FROM documents",
    "events_hourly": """
        SELECT event_type,
               date_trunc('hour', ts) AS window_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    "docs_filter_project": """
        SELECT doc_id, source, n_chars FROM documents
        WHERE lang = 'en' AND n_chars >= 200
    """,
    "ascii_docs": """
        SELECT doc_id FROM documents
        WHERE length(text) = octet_length(encode(text))
    """,
    "token_counts": """
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               END AS n_tokens
        FROM documents
    """,
    "top_docs": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 10
    """,
    "grouped_topk": """
        SELECT doc_id, lang, n_chars FROM (
            SELECT doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
            FROM documents
        ) t WHERE rn <= 3
    """,
    "stratified_sample": """
        SELECT doc_id, lang, source FROM (
            SELECT doc_id, lang, source,
                   ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
            FROM documents
        ) t WHERE rn <= 2
    """,
    "mktsegment_revenue": """
        SELECT c_mktsegment,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "orderstatus_lineitem": """
        SELECT o_orderstatus,
               COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice), 2) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    "nation_region": """
        SELECT r_name, COUNT(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "customers_without_orders": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "customers_with_orders": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    "dedup_exact": """
        SELECT md5(text) AS h,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS dup_count
        FROM documents GROUP BY md5(text)
    """,
    "cumulative_hourly": """
        SELECT event_type, window_start,
               CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY window_start
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events,
               ROUND(SUM(s) OVER (PARTITION BY event_type ORDER BY window_start
                                  ROWS UNBOUNDED PRECEDING), 2) AS cum_value
        FROM (
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n, SUM(value) AS s
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        ) h
    """,
    "jaccard_verify": """
        SELECT doc_id,
               CASE WHEN n_words = 0 THEN 0.0
                    ELSE ROUND(n_words * 1.0 /
                               CASE WHEN has_extra THEN n_words ELSE n_words + 1 END, 6)
               END AS jaccard
        FROM (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')))
                   END AS n_words,
                   CASE WHEN trim(text) = '' THEN FALSE
                        ELSE list_contains(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')), 'extra')
                   END AS has_extra
            FROM documents WHERE doc_id % 10 = 0
        ) t
    """,
    "props_json": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    "range_join_windows": """
        WITH win AS (
            SELECT o_orderkey, o_custkey,
                   TIMESTAMP '2024-01-01' + (o_orderkey % 30) * INTERVAL 1 DAY AS wstart,
                   TIMESTAMP '2024-01-01' + (o_orderkey % 30) * INTERVAL 1 DAY
                       + INTERVAL 12 HOUR AS wend
            FROM orders
        )
        SELECT e.event_id, w.o_orderkey
        FROM events e
        JOIN win w ON e.user_id = w.o_custkey
                  AND w.wstart <= e.ts AND e.ts < w.wend
    """,
    "asof_latest_order": """
        SELECT event_id, o_orderkey FROM (
            SELECT e.event_id, o.o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM events e
            JOIN orders o ON e.user_id = o.o_custkey
            WHERE o.o_orderdate <= e.ts
        ) t WHERE rn = 1
    """,
    "sliding_windows": """
        SELECT event_type, window_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM (
            SELECT event_type, value,
                   unnest([date_trunc('hour', ts),
                           date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start
            FROM events
        ) w
        GROUP BY event_type, window_start
    """,
    "regex_extract": """
        SELECT doc_id,
               COALESCE(regexp_extract(text, '\\b(spark|merge|window)\\b', 1), '') AS first_kw
        FROM documents
    """,
    "wordcount_top": """
        SELECT token, CAST(SUM(1) AS BIGINT) AS cnt FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ) t
        GROUP BY token
        ORDER BY cnt DESC, token
        LIMIT 20
    """,
    "user_sessions": """
        SELECT user_id, CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions
        FROM (
            SELECT user_id,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                    > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ) marks
        ) numbered
        GROUP BY user_id
    """,
    "knn_bruteforce": """
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM embeddings a, embeddings b
        WHERE a.vec_id < 3 AND b.vec_id <> a.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY a.vec_id
            ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id
        ) <= 5
    """,
}

# url reconstruction from doc_id arithmetic (fixtures.make_page_row):
# url = https://site{i%97}.example/{KINDS[i%6]}/{i}
_URL_SQL = (
    "'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example/' || "
    "CASE doc_id % 6 WHEN 0 THEN 'contract' WHEN 1 THEN 'plain' "
    "WHEN 2 THEN 'relation' WHEN 3 THEN 'pdf' WHEN 4 THEN 'dates' "
    "ELSE 'cjk' END || '/' || CAST(doc_id AS VARCHAR)"
)

# relation-doc planted ids (fixtures._relation_md)
_CHILD_SQL = ("'DEV-' || CAST(2020 + doc_id % 6 AS VARCHAR) || '-' || "
              "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')")
_PARENT_SQL = ("'MAIN-' || CAST(2019 + doc_id % 4 AS VARCHAR) || '-' || "
               "lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0')")

# dup-bearing corpus + exact 3-word-shingle jaccard edges (the SQL mirror
# of stages/dedup.minhash_pairs_exact_verified at threshold 0.8, k=3 —
# <3-word docs collapse to one whole-text shingle, as in dedupfn.shingles)
_JACCARD_EDGES_SQL = """
        corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text || ' extra' FROM documents
            WHERE doc_id % 10 = 0
        ),
        words AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
            FROM corpus WHERE trim(text) <> ''
        ),
        sets AS (
            SELECT doc_id,
                   CASE WHEN len(w) >= 3
                        THEN list_distinct(list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                        ELSE [array_to_string(w, ' ')] END AS ws
            FROM words
        ),
        edges AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.ws, b.ws)) * 1.0
                  / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.8
        )
"""

ORACLE_SQL.update({
    "minhash_near_dups": f"WITH {_JACCARD_EDGES_SQL} SELECT id_a, id_b FROM edges",
    "dedup_keep_list": f"""
        WITH RECURSIVE {_JACCARD_EDGES_SQL},
        und AS (
            SELECT id_a AS s, id_b AS d FROM edges
            UNION ALL
            SELECT id_b, id_a FROM edges
        ),
        reach(s, d) AS (
            SELECT s, d FROM und
            UNION
            SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s
        ),
        comp AS (
            SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
            FROM reach GROUP BY s
        )
        SELECT cluster_id, MIN(doc_id) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM comp GROUP BY cluster_id
    """,
    "simhash_near_dups": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        ),
        keys AS (
            SELECT doc_id,
                   md5(array_to_string(
                       list_sort(regexp_split_to_array(lower(trim(text)), '\\s+')),
                       chr(10))) AS k
            FROM corpus
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM keys a JOIN keys b ON a.k = b.k AND a.doc_id < b.doc_id
    """,
    "contract_edges": f"""
        SELECT {_CHILD_SQL} AS child_id, {_PARENT_SQL} AS parent_id
        FROM documents WHERE doc_id % 6 = 2 AND doc_id % 20 <> 13
    """,
    "hierarchy_orphans": f"""
        SELECT DISTINCT {_PARENT_SQL} AS parent_id
        FROM documents WHERE doc_id % 6 = 2 AND doc_id % 20 <> 13
    """,
    "key_clause_histogram": """
        SELECT clause, COUNT(*) AS n_docs
        FROM documents,
             (VALUES ('confidencialidade'), ('pagamento'), ('pagamentos'),
                     ('vigência')) c(clause)
        WHERE doc_id % 20 <> 13 AND (doc_id % 6 = 0 OR doc_id % 6 = 3)
        GROUP BY clause
    """,
    "contract_type_histogram": """
        SELECT contract_type, COUNT(*) AS n_docs FROM (
            SELECT CASE doc_id % 6 WHEN 2 THEN 'pwo' WHEN 3 THEN 'lsa'
                   ELSE 'msa' END AS contract_type
            FROM documents WHERE doc_id % 20 <> 13
        ) t GROUP BY contract_type
    """,
    "latest_by_url": f"""
        SELECT {_URL_SQL} AS url,
               TIMESTAMP '2024-01-01'
                   + to_seconds(37 * doc_id
                                + CASE WHEN doc_id % 3 = 0 THEN 1000 ELSE 0 END)
                   AS warc_ts
        FROM documents
    """,
    "salted_user_value": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY user_id
    """,
    "validate_documents": f"""
        SELECT {_URL_SQL} AS url, CAST(1 AS BOOLEAN) AS doc_is_valid,
               '' AS doc_validation_errors
        FROM documents
    """,
    "validate_hierarchy": f"""
        SELECT DISTINCT {_PARENT_SQL} AS hierarchy_id,
               'Root contract ID must exist in contracts list' AS rule_errors
        FROM documents WHERE doc_id % 6 = 2 AND doc_id % 20 <> 13
    """,
    "table_cells": f"""
        SELECT {_URL_SQL} AS url,
               CAST(r AS BIGINT) AS row_id, CAST(c AS BIGINT) AS col_id,
               CAST(1 AS BIGINT) AS rowspan, CAST(1 AS BIGINT) AS colspan,
               (r = 0) AS is_header,
               CASE WHEN r = 0 AND c = 0 THEN 'Item ' || CAST(doc_id % 9 AS VARCHAR)
                    WHEN r = 0 AND c = 1 THEN 'Quantity'
                    WHEN r = 0 AND c = 2 THEN 'Price'
                    WHEN r = 1 AND c = 0 THEN 'Support hours'
                    WHEN r = 1 AND c = 1 THEN CAST(doc_id % 40 + 1 AS VARCHAR)
                    WHEN r = 1 AND c = 2 THEN 'R$ 100,00'
                    WHEN r = 2 AND c = 0 THEN 'Licenses'
                    WHEN r = 2 AND c = 1 THEN CAST(doc_id % 7 + 1 AS VARCHAR)
                    ELSE 'R$ 250,00' END AS cell_text
        FROM documents, (VALUES (0), (1), (2)) rr(r), (VALUES (0), (1), (2)) cc(c)
        WHERE doc_id % 6 = 3 AND doc_id % 20 <> 13
    """,
})

# --------------------------------------------------------------------------
# Non-SQL-expressible queries (driver records rows-only checks)
# --------------------------------------------------------------------------

def q_extraction_docs(sf_dir: str):
    """Flagship pipeline: per-url extraction summary (golden-tested in pytest)."""
    from .pipelines.extract_pipeline import run_extraction

    docs = run_extraction(sf_dir)
    return docs.select_columns(
        ["url", "status", "n_chars", "contract_number", "contract_type",
         "client_name", "vendor_name", "currency", "n_entities", "parse_confidence"]
    )


def q_extraction_accuracy(sf_dir: str):
    """Extraction QA: per-document-kind accuracy of the extracted
    contract_number against the fixture's planted ground truth (derivable
    from the url's row index — the corpus is a pure function of it).
    The self-evaluation harness a training-data pipeline runs after every
    extractor change."""
    from .fixtures import CTYPES
    from .pipelines.extract_pipeline import run_extraction

    def score(t: pa.Table) -> pa.Table:
        kinds, ok = [], []
        for url, num, status in zip(
            t["url"].to_pylist(), t["contract_number"].to_pylist(), t["status"].to_pylist()
        ):
            kind = url.split("/")[3]
            i = int(url.rsplit("/", 1)[-1])
            if kind == "contract":
                want = f"{CTYPES[i % len(CTYPES)]}-{2020 + (i % 6)}-{i % 1000:03d}"
            elif kind == "relation":
                # pinned reference quirk (contract_parser.py:120): the
                # "ref" alternation matches INSIDE "reference" and the
                # (?i) flag makes the [A-Z0-9...] capture class
                # case-insensitive, so the cascade extracts the literal
                # tail "erence" — faithful, absurd, and exactly what this
                # QA harness exists to surface
                want = "erence"
            elif kind == "pdf":
                want = f"{CTYPES[i % len(CTYPES)]}-{2020 + (i % 6)}-{i % 1000:03d}"
            else:
                continue  # kinds without a planted number
            kinds.append(kind)
            ok.append(1 if (status == "converted" and num == want) else 0)
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "correct": pa.array(ok, pa.int64())})

    scored = run_extraction(sf_dir).map_batches(score, batch_format="pyarrow")
    agg = scored.groupby("kind").aggregate(
        Count(alias_name="n_docs"), Sum("correct", alias_name="n_correct")
    )

    def finish(t: pa.Table) -> pa.Table:
        acc = pc.round(
            pc.divide(pc.cast(t["n_correct"], pa.float64()), pc.cast(t["n_docs"], pa.float64())),
            ndigits=4,
        )
        return t.append_column("accuracy", acc)

    return agg.map_batches(finish, batch_format="pyarrow")


def q_extraction_status(sf_dir: str):
    from .pipelines.extract_pipeline import run_extraction
    from .pipelines.reports import status_report

    return status_report(run_extraction(sf_dir))


def q_contract_type_histogram(sf_dir: str):
    from .pipelines.extract_pipeline import run_extraction
    from .pipelines.reports import contract_type_histogram

    return contract_type_histogram(run_extraction(sf_dir))


def q_party_histogram(sf_dir: str):
    from .pipelines.extract_pipeline import run_extraction
    from .pipelines.reports import party_histogram

    return party_histogram(run_extraction(sf_dir))


def q_contract_edges(sf_dir: str):
    """J3: explode parent references → edges(child_id, parent_id)."""
    import re

    from .pipelines.extract_pipeline import run_extraction

    parent_pat = re.compile(r"Parent contract reference:\s*([A-Z]+-\d{4}-\d{3})")
    # child id from the contract-id span rule (contract_analyzer.py:223-227)
    # rather than the quirky M1 cascade (which captures 'erence' here —
    # see q_extraction_accuracy)
    child_pat = re.compile(r"\b([A-Z]{2,4}-\d{4}-\d{3})\b")

    def edges(t: pa.Table) -> pa.Table:
        kids, parents = [], []
        for text in t["text"].to_pylist():
            if not text:
                continue
            pm = parent_pat.search(text)
            if not pm:
                continue
            cm = child_pat.search(text)
            if not cm:
                continue
            kids.append(cm.group(1))
            parents.append(pm.group(1))
        return pa.table({"child_id": pa.array(kids, pa.string()),
                         "parent_id": pa.array(parents, pa.string())})

    return run_extraction(sf_dir).map_batches(edges, batch_format="pyarrow")


def q_organize(sf_dir: str):
    """M27-M30 organize projection: canonical filename + supplier partition."""
    from .pipelines.extract_pipeline import run_extraction
    from .pipelines.organize import organize

    return organize(run_extraction(sf_dir)).select_columns(
        ["url", "canonical_filename", "supplier_dir", "operation"]
    )


def q_sanitize_names(sf_dir: str):
    """M14/M17: deterministic CJK filename sanitization over contract names."""
    from .pipelines.extract_pipeline import run_extraction
    from .pipelines.organize import sanitize_url_names

    return sanitize_url_names(run_extraction(sf_dir)).select_columns(
        ["url", "sanitized_name", "sanitize_status"]
    )


def _docs_with_dups(sf_dir: str):
    """documents ∪ mutated copies of every 10th doc (id+1_000_000) — the
    deterministic dup-bearing corpus for near-dup oracles."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def mutate(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did % 10 == 0:
                ids.append(did + 1_000_000)
                texts.append((text or "") + " extra")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.union(ds.map_batches(mutate, batch_format="pyarrow"))


def q_minhash_near_dups(sf_dir: str):
    """MinHash+LSH near-dup pairs over the dup-bearing corpus, verified
    with EXACT word-set Jaccard (stages/dedup.minhash_pairs_exact_verified)
    — which makes the operator DuckDB-oracle-checkable: the oracle
    reconstructs the dup-bearing corpus in SQL and computes all-pairs
    exact Jaccard; band recall (r=2/b=32) guarantees no ≥0.8 pair is
    missed. Output is the pair list (floats dropped so the value-hash
    compare is exact-integer)."""
    from .stages.dedup import minhash_pairs_exact_verified

    pairs = minhash_pairs_exact_verified(
        _docs_with_dups(sf_dir), "doc_id", "text", threshold=0.8
    )
    return pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")


def q_dedup_keep_list(sf_dir: str):
    """End-to-end near-dup dedup: exact-verified MinHash-LSH pairs →
    connected components → one survivor per cluster (the full
    training-data dedup pipeline). Oracle: same edge set in SQL, then a
    recursive-CTE transitive closure for the components."""
    from .stages.dedup import cluster_pairs, keep_list, minhash_pairs_exact_verified

    pairs = minhash_pairs_exact_verified(
        _docs_with_dups(sf_dir), "doc_id", "text", threshold=0.8
    )
    return keep_list(cluster_pairs(pairs))


def _minhash_index_dir(sf_dir: str) -> str:
    """The documents corpus's persisted LSH signature index, built once
    per (fixtures-version, sf) under /tmp (same cache pattern as
    ``_warc_fixture``); re-runs hit the _SUCCESS marker."""
    import os

    from .fixtures import FIXTURES_VERSION
    from .stages.dedup import build_minhash_index

    tag = sf_dir.strip("/").replace("/", "_")
    out = f"/tmp/mh_index_v{FIXTURES_VERSION}_{tag}"
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        old = rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
        build_minhash_index(old, out)
        with open(marker, "w"):
            pass
    return out


def q_minhash_against_index(sf_dir: str):
    """Cross-corpus INCREMENTAL near-dedup (stages/dedup.
    build_minhash_index + match_against_index): the existing corpus's
    LSH signature index lives on parquet; a synthetic re-crawl batch —
    every 7th doc lightly edited (+2M ids) plus genuinely fresh pages
    (+3M ids) — is matched against the STORED index. Only the new batch
    is shingled; the old corpus is never re-read or re-hashed. Oracle:
    exact all-pairs new×old word-shingle Jaccard in SQL; band recall
    (r=4/b=32) guarantees no ≥0.8 pair is missed."""
    from .stages.dedup import match_against_index

    index_dir = _minhash_index_dir(sf_dir)
    old = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])

    def recrawl(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did % 7 == 0:
                ids.append(did + 2_000_000)
                texts.append((text or "") + " updated")
            if did % 11 == 0:
                ids.append(did + 3_000_000)
                texts.append(f"fresh page about topic {did}")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    pairs = match_against_index(
        old.map_batches(recrawl, batch_format="pyarrow"), index_dir,
        threshold=0.8)
    return pairs.map_batches(lambda t: t.select(["new_id", "old_id"]),
                             batch_format="pyarrow")


def _docs_with_exact_dups(sf_dir: str):
    """documents ∪ VERBATIM copies of every 10th doc (id+1_000_000) — the
    planted corpus for the simhash exact-recall oracle."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def copy(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 10 == 0))
        return pa.table({"doc_id": pc.add(sub["doc_id"], 1_000_000),
                         "text": sub["text"]})

    return ds.union(ds.map_batches(copy, batch_format="pyarrow"))


def q_simhash_near_dups(sf_dir: str):
    """SimHash-accelerated exact order-insensitive dedup over a
    verbatim-copy corpus: hamming-0 bucket collisions verified by a word
    MULTISET fingerprint (verify_multiset) — oracle is the SQL
    sorted-word-multiset self-join. Pure-simhash verification alone is
    NOT enough: a count-±1 multiset difference can leave every sign sum
    on the same side (observed on the fixture corpus), so simhash equals
    but multisets differ. The hamming ≤ k near-dup variant stays
    available in stages/dedup (pytest-covered; not SQL-expressible)."""
    from .stages.dedup import simhash_pairs

    pairs = simhash_pairs(_docs_with_exact_dups(sf_dir), "doc_id", "text",
                          max_hamming=0, verify_multiset=True)
    return pairs.map_batches(lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")


def q_latest_by_url(sf_dir: str):
    """Crawl-ingest dedup (north-rule first shuffle): the pages corpus is
    augmented with deterministic re-crawls (every 3rd url a newer capture
    at +1000 s, every 7th an older one at −500 s); latest_by_url keeps
    one row per url via the aggregate+semi-join fast path. Oracle
    reconstructs urls and winning timestamps from doc_id arithmetic
    (fixtures.make_page_row: url = site{i%97}/kind/{i}, ts = epoch+37i s).
    """
    from .fixtures import read_pages
    from .stages.dedup import latest_by_url

    def recrawl(t: pa.Table) -> pa.Table:
        ids = np.array([int(u.rsplit("/", 1)[-1]) for u in t["url"].to_pylist()])
        parts = [t]
        for mod, delta_s in ((3, 1000), (7, -500)):
            sub = t.filter(pa.array(ids % mod == 0))
            ts = pc.add(pc.cast(sub["warc_ts"], pa.int64()),
                        pa.scalar(delta_s * 1_000_000, pa.int64()))
            sub = sub.set_column(
                sub.schema.get_field_index("warc_ts"), "warc_ts",
                pc.cast(ts, pa.timestamp("us")),
            )
            parts.append(sub)
        return pa.concat_tables(parts)

    corpus = read_pages(sf_dir).map_batches(recrawl, batch_format="pyarrow")
    out = latest_by_url(corpus)
    return out.map_batches(lambda t: t.select(["url", "warc_ts"]), batch_format="pyarrow")


def q_salted_user_value(sf_dir: str):
    """Skew-safe grouped aggregate (ops/salt.py): two-phase salted shuffle,
    identical result to the plain groupby — oracled against it."""
    from .ops.salt import salted_count_sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    agg = salted_count_sum(ds, "user_id", "value", n_salts=8,
                           count_alias="n_events", sum_alias="total_value")
    return _round_cols(agg, {"total_value": 2})


def q_validate_documents(sf_dir: str):
    """Document business rules (reference validation/schema.py:211-230)
    over the extracted corpus: filename/file_path derive from the url,
    file_size from the page payload bytes. The fixture corpus validates
    clean by construction (error rows carry messages, content never
    exceeds payload) — the oracle pins exactly that, and the rule
    branches themselves are unit-tested with planted-failure batches
    (tests/test_validation_rules.py)."""
    from .fixtures import read_pages
    from .stages.extract import extract_pages_batch
    from .stages.validate import validate_documents_batch

    def prep(t: pa.Table) -> pa.Table:
        sizes = [
            len(h) if h else len((x or "").encode("utf-8"))
            for h, x in zip(t["html"].to_pylist(), t["text"].to_pylist())
        ]
        out = extract_pages_batch(t)
        out = out.append_column("file_size", pa.array(sizes, pa.int64()))
        names = [u.rsplit("/", 1)[-1] for u in out["url"].to_pylist()]
        out = out.append_column("filename", pa.array(names, pa.string()))
        out = out.append_column("file_path", out["url"])
        v = validate_documents_batch(out)
        errs = ["; ".join(e or []) for e in v["doc_validation_errors"].to_pylist()]
        return pa.table({"url": v["url"], "doc_is_valid": v["doc_is_valid"],
                         "doc_validation_errors": pa.array(errs, pa.string())})

    return read_pages(sf_dir).map_batches(prep, batch_format="pyarrow")


def q_validate_hierarchy(sf_dir: str):
    """Hierarchy business rules (reference validation/schema.py:233-260):
    hierarchies built from the contract edge table (one per parent); the
    fixture corpus' parents are never present as contracts, so every
    hierarchy fails the root-membership rule — which the oracle pins."""
    from .stages.validate import validate_hierarchies_batch

    edges = q_contract_edges(sf_dir)

    def build(group: pd.DataFrame) -> pd.DataFrame:
        # partition-grouped (ops/grouping.py): parents are unbounded at
        # corpus scale — one run walk per partition, not a pandas group
        # per parent
        g = group.sort_values(["parent_id", "child_id"], kind="mergesort")
        par = g["parent_id"].to_numpy()
        kids = g["child_id"].to_numpy()
        change = np.zeros(len(g), bool)
        change[0] = True
        change[1:] = par[1:] != par[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(g))
        parents = par[starts]
        return pd.DataFrame({
            "hierarchy_id": parents,
            "name": [f"Hierarchy {p}" for p in parents],
            "root_contract_id": parents,
            "contract_ids": [list(kids[s:e]) for s, e in zip(starts, ends)],
            "is_valid": [True] * len(parents),
            "validation_errors": [[] for _ in parents],
        })

    from .ops.grouping import partition_grouped

    grouped_e, pkey_cols = partition_grouped(edges, ["parent_id"])
    hier = grouped_e.groupby(pkey_cols).map_groups(build, batch_format="pandas")

    def finish(t: pa.Table) -> pa.Table:
        v = validate_hierarchies_batch(t)
        errs = ["; ".join(e or []) for e in v["rule_errors"].to_pylist()]
        return pa.table({"hierarchy_id": v["hierarchy_id"],
                         "rule_errors": pa.array(errs, pa.string())})

    return hier.map_batches(finish, batch_format="pyarrow")


def q_table_cells(sf_dir: str):
    """Structured table-cell model (Marker TableProcessor analog,
    reference table_processor_fixed.py:181-203): explode the nested
    ``cells`` lists of PDF-layout table blocks into one row per cell
    carrying row_id/col_id/rowspan/colspan/is_header. Oracle reconstructs
    every pdf-kind doc's 3×3 fixture table from doc_id arithmetic."""
    from .pipelines.extract_pipeline import run_extraction

    def explode(t: pa.Table) -> pa.Table:
        urls, rids, cids, rspan, cspan, hdr, txt = [], [], [], [], [], [], []
        for url, blocks in zip(t["url"].to_pylist(), t["blocks"].to_pylist()):
            for b in blocks or []:
                if b["type"] == "table" and b.get("cells"):
                    for c in b["cells"]:
                        urls.append(url)
                        rids.append(c["row_id"])
                        cids.append(c["col_id"])
                        rspan.append(c["rowspan"])
                        cspan.append(c["colspan"])
                        hdr.append(c["is_header"])
                        txt.append(c["text"])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "row_id": pa.array(rids, pa.int64()),
            "col_id": pa.array(cids, pa.int64()),
            "rowspan": pa.array(rspan, pa.int64()),
            "colspan": pa.array(cspan, pa.int64()),
            "is_header": pa.array(hdr, pa.bool_()),
            "cell_text": pa.array(txt, pa.string()),
        })

    return run_extraction(sf_dir).map_batches(explode, batch_format="pyarrow")


def q_embedding_near_dups(sf_dir: str):
    """Embedding-cosine near-dup via sign-LSH buckets, 4 rotated tables
    (round-3: oracled — was rows-only).

    Random embeddings carry no near-dups, so the corpus is augmented with
    deterministically perturbed copies of every 20th vector
    (vec_id+1_000_000) — those pairs are what the operator must find,
    and with 4 tables it finds ALL of them (single-table recall ~97%
    on this fixture; miss^4 ≈ 1e-6), so the DuckDB oracle can emit the
    planted set exactly. Pair identities only — the sim values are
    float32 kernel output, pinned instead by ``cosine_pairs_exact``."""
    from .stages.similarity import lsh_bucketed_cosine_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def perturb(t: pa.Table) -> pa.Table:
        ids, vecs = [], []
        for vid, vec in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()):
            if vid % 20 == 0:
                v = list(vec)
                v[0] = v[0] + 0.01
                ids.append(vid + 1_000_000)
                vecs.append(v)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "embedding": pa.array(vecs, type=t["embedding"].type)})

    full = ds.union(ds.map_batches(perturb, batch_format="pyarrow"))
    return lsh_bucketed_cosine_pairs(full, threshold=0.95,
                                     n_tables=4).select_columns(["id_a", "id_b"])


def q_ivf_knn(sf_dir: str):
    """IVF-bucketed approximate knn (scale path; recall vs exact tested
    in pytest). Same 3 query vectors as knn_bruteforce."""
    import pyarrow.parquet as pq

    from .stages.similarity import ivf_knn

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qtab = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2])))
    Q = np.array(qtab["embedding"].to_pylist(), dtype=np.float64)
    qids = np.array(qtab["vec_id"].to_pylist(), dtype=np.int64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ivf_knn(ds, Q, qids, k=5).select_columns(["query_id", "neighbor_id"])


def q_ivf_knn_fullprobe(sf_dir: str):
    """IVF with n_probe == n_centroids probes EVERY inverted list, so the
    approximate path degenerates to exact brute force — which makes the
    whole IVF machinery (sampled centroid build, assignment, probe
    filter, scatter-gather merge) checkable against the same DuckDB
    exact-kNN oracle as knn_bruteforce. Any pruning bug that drops a
    vector from its list surfaces as a missing neighbor here."""
    import pyarrow.parquet as pq

    from .stages.similarity import ivf_knn

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qtab = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2])))
    Q = np.array(qtab["embedding"].to_pylist(), dtype=np.float64)
    qids = np.array(qtab["vec_id"].to_pylist(), dtype=np.int64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = ivf_knn(ds, Q, qids, k=5, n_centroids=16, n_probe=16)
    return out.select_columns(["query_id", "neighbor_id"])


def q_pq_knn_lossless(sf_dir: str):
    """Product-quantization ANN (stages/similarity PQ family) in its
    LOSSLESS degenerate configuration — m=1 subspace with one centroid
    per corpus vector, trained on the full corpus — so ADC over the
    PERSISTED index (build_pq_index → pq_search_index) equals exact
    brute-force cosine and the whole train/encode/store/LUT/scan chain
    shares knn_bruteforce's DuckDB oracle (the ivf_knn_fullprobe
    pattern). The compressed settings' recall is pinned in
    tests/test_pq.py. Index cached per sf under /tmp; searching never
    re-reads the raw embeddings."""
    import os

    import pyarrow.parquet as pqt

    from .stages.similarity import build_pq_index, pq_search_index

    idx = _tmp_cache("pq_index", sf_dir)
    marker = os.path.join(idx, "_SUCCESS")
    if not os.path.exists(marker):
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        n = ds.count()
        build_pq_index(ds, idx, m=1, n_centroids=n, sample_size=n)
        with open(marker, "w"):
            pass
    qt = pqt.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qtab = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2])))
    Q = np.array(qtab["embedding"].to_pylist(), dtype=np.float64)
    qids = np.array(qtab["vec_id"].to_pylist(), dtype=np.int64)
    out = pq_search_index(idx, Q, qids, k=5)
    return out.map_batches(lambda t: t.select(["query_id", "neighbor_id"]),
                           batch_format="pyarrow")


def q_text_analysis(sf_dir: str):
    """Fused language-ID / quality / token / fingerprint pass."""
    from .stages.quality import analyze_text_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(analyze_text_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "pred_lang", "quality", "n_tokens", "n_bpe_tokens", "fingerprint"]
    )


def q_clean_corpus(sf_dir: str):
    """The full training-data curation chain (pipelines/curate.py):
    extract → quality filter → near-dup keep-list → clean survivors."""
    from .pipelines.curate import clean_corpus
    from .pipelines.extract_pipeline import run_extraction

    return clean_corpus(run_extraction(sf_dir))


def q_curate_full(sf_dir: str):
    """The COMPOSED pretraining-corpus job (pipelines/curate_full.py):
    crawl ingest → latest_by_url → blocklist → quality gate →
    paragraph_dedup → MinHash keep-list → decontaminate → PII scrub →
    sequence packing → shard manifest, every stage a real engine
    operator, the WHOLE chain mirrored by one DuckDB WITH-chain oracle
    (all-integer/string manifest, exact value-hash compare)."""
    from .pipelines.curate_full import curate_full

    return curate_full(sf_dir)


def q_translate_names(sf_dir: str):
    """M21/ST5: cached deterministic translation of CJK contract names
    (actor pool holding the per-actor LRU cache)."""
    from .pipelines.extract_pipeline import run_extraction
    from .stages.translate import CachedTranslator

    docs = run_extraction(sf_dir)
    out = docs.map_batches(
        CachedTranslator, batch_format="pyarrow", batch_size=256, concurrency=2,
    )
    return out.select_columns(["url", "lang", "translated_name", "was_translated"])


def q_media_features(sf_dir: str):
    """Multimodal feature extraction — REAL codecs (BMP/WAV/RVID decode,
    functions/media.py) over a CLOSED-FORM planted media table (round-4
    verdict #4): constant-color BMPs (w = 2h, channels multiples of 51),
    silent WAVs, constant-frame RVIDs. The actor-pool decode path is the
    production one, byte-real end to end — but every one of the 16
    float32 features is media-id arithmetic the DuckDB oracle restates
    (channel means are exact fifths, lumas are fifteenths, stds/grads
    collapse to 0, durations/frame counts are dyadics). Features emit
    EXPLODED as (…, dim, val) float64 on the pinned floor(x·1e6+0.5)/1e6
    grid both engines apply — float32-vs-float64 drift is ~1e-7, an
    order below the grid's boundary distance for every planted value.
    The richer gradient/sine media keep their codec coverage in
    tests/test_media_codecs.py."""
    from .functions.media import encode_bmp, encode_rvid, encode_wav
    from .stages.multimodal import MEDIA_SCHEMA, MediaFeatureExtract

    def flat_image(i: int, w: int, h: int) -> np.ndarray:
        img = np.empty((h, w, 3), np.uint8)
        img[..., 0] = 51 * (i % 6)
        img[..., 1] = 51 * ((i // 3) % 6)
        img[..., 2] = 51 * ((i // 9) % 6)
        return img

    rows = []
    for i in range(200):
        mtype = ["image", "audio", "video"][i % 3]
        if mtype == "image":
            h = 32 + 8 * (i % 7)
            payload = encode_bmp(flat_image(i, 2 * h, h))
            meta = (2 * h, h, 0)
        elif mtype == "audio":
            n = 800 * (1 + i % 10)
            payload = encode_wav(np.zeros(n, np.int16), 8000)
            meta = (0, 0, n // 8)
        else:
            n_frames = 4 + i % 5
            payload = encode_rvid([flat_image(i, 40, 24)] * n_frames)
            meta = (40, 24, n_frames * 40)
        rows.append({"media_id": i, "media_type": mtype, "payload": payload,
                     "meta_width": meta[0], "meta_height": meta[1],
                     "meta_duration_ms": meta[2]})
    media = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    ds = media.map_batches(
        MediaFeatureExtract, batch_format="pyarrow", batch_size=32, concurrency=(1, 4),
    )

    def explode(t: pa.Table) -> pa.Table:
        ids, types, sts, dims, vals = [], [], [], [], []
        for mid, mt, st, f in zip(
                t["media_id"].to_pylist(), t["media_type"].to_pylist(),
                t["decode_status"].to_pylist(), t["features"].to_pylist()):
            ids.extend([mid] * 16)
            types.extend([mt] * 16)
            sts.extend([st] * 16)
            dims.extend(range(16))
            vals.append(np.floor(np.asarray(f, np.float64) * 1e6 + 0.5) / 1e6)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "decode_status": pa.array(sts, pa.string()),
            "dim": pa.array(dims, pa.int64()),
            "val": pa.array(np.concatenate(vals) if vals else
                            np.array([], np.float64), pa.float64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


_ORACLE_SQL_MEDIA_FEATURES = r"""
    WITH m AS (
      SELECT unnest(range(0, 200)) AS media_id),
    g AS (
      SELECT media_id, unnest(range(0, 16)) AS dim FROM m),
    p AS (
      SELECT media_id, dim,
             CASE media_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio' ELSE 'video' END AS mt,
             -- image geometry: h in 32..80, w = 2h
             (32 + 8 * (media_id % 7)) AS ih,
             -- constant channels, multiples of 51
             51 * (media_id % 6) AS r,
             51 * ((media_id // 3) % 6) AS gch,
             51 * ((media_id // 9) % 6) AS b,
             800 * (1 + media_id % 10) AS nsamp,
             (4 + media_id % 5) AS nframes
      FROM g),
    v AS (
      SELECT media_id, mt, dim,
        CASE
          WHEN mt = 'audio' THEN
            CASE dim WHEN 0 THEN nsamp / 8000.0
                     WHEN 1 THEN 8000.0 / 48000.0
                     ELSE 0.0 END
          ELSE  -- image (w=2h) and video (first frame 40x24) share shape
            CASE dim
              WHEN 0 THEN (CASE WHEN mt = 'image' THEN 2 * ih ELSE 40 END)
                          / 4096.0
              WHEN 1 THEN (CASE WHEN mt = 'image' THEN ih ELSE 24 END)
                          / 4096.0
              WHEN 2 THEN CASE WHEN mt = 'image' THEN 2.0 ELSE 40.0 / 24.0 END
              WHEN 3 THEN r / 255.0
              WHEN 4 THEN gch / 255.0
              WHEN 5 THEN b / 255.0
              WHEN 9 THEN (r + gch + b) / 765.0
              WHEN 10 THEN (r + gch + b) / 765.0
              WHEN 11 THEN (r + gch + b) / 765.0
              WHEN 12 THEN (r + gch + b) / 765.0
              WHEN 13 THEN least(r, gch, b) / 255.0
              WHEN 14 THEN greatest(r, gch, b) / 255.0
              WHEN 15 THEN CASE WHEN mt = 'video' THEN nframes / 1024.0
                                ELSE 0.0 END
              ELSE 0.0 END
        END AS raw
      FROM p)
    SELECT media_id, mt AS media_type, 'ok' AS decode_status,
           CAST(dim AS BIGINT) AS dim,
           floor(raw * 1e6 + 0.5) / 1e6 AS val
    FROM v
"""


def q_phash_near_dups(sf_dir: str):
    """Perceptual near-dup image pairs (stages/multimodal.
    phash_near_dups): aHash-64 over decoded BMPs, Hamming-LSH band
    buckets, in-partition popcount verify. Input = the deterministic
    synthetic image rows + exact re-encoded copies of every 10th image
    (found at hamming 0). Rows-only (SQL cannot decode BMP); the
    brute-force-equivalence guarantee is pinned in
    tests/test_media_codecs.py."""
    from .functions.media import encode_bmp
    from .stages.multimodal import _synth_image, phash_near_dups

    rows = []
    for i in range(200):
        rows.append({"media_id": i,
                     "payload": encode_bmp(_synth_image(i, 48, 32))})
        if i % 10 == 0:
            rows.append({"media_id": 1_000 + i,
                         "payload": encode_bmp(_synth_image(i, 48, 32))})
    # one block per row would make every downstream stage run 200 tiny
    # tasks and the shuffles exchange 200x200 block pairs
    return phash_near_dups(rd.from_items(rows, override_num_blocks=8))


def q_video_near_dups(sf_dir: str):
    """Near-dup video pairs (stages/multimodal.video_near_dups): sampled
    frames seek-decoded, per-frame aHash, shared-hash-count pairs via
    one partition-grouped exchange (winnow_clone_pairs shape). Input =
    100 seeded-noise RVID containers; every 10th gains a re-encoded
    copy (shares all sampled hashes) and every 20th a truncated copy
    (shares ≥2). Rows-only (SQL cannot decode the container); planted
    recall pinned in tests/test_media_codecs.py."""
    from .functions.media import encode_rvid
    from .stages.multimodal import video_near_dups

    def frames(seed: int, n: int):
        rng = np.random.RandomState(1000 + seed)
        return [rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
                for _ in range(n)]

    rows = []
    for i in range(100):
        fs = frames(i, 8)
        rows.append({"media_id": i, "payload": encode_rvid(fs)})
        if i % 10 == 0:
            rows.append({"media_id": 1_000 + i, "payload": encode_rvid(fs)})
        if i % 20 == 0:
            rows.append({"media_id": 2_000 + i,
                         "payload": encode_rvid(fs[:6])})
    return video_near_dups(rd.from_items(rows, override_num_blocks=8),
                           n_frames=4, min_shared=2)


def q_audio_near_dups(sf_dir: str):
    """Near-dup audio pairs (stages/multimodal.audio_near_dups):
    Haitsma–Kalker spectral sub-fingerprints, shared-count pairs through
    the same grouped-exchange core as video_near_dups. Input = 100
    deterministic two-tone-plus-noise WAV clips; every 10th gains an
    amplitude-halved copy (fingerprints are scale-invariant) and every
    20th a truncated copy. Rows-only; invariances pinned in
    tests/test_media_codecs.py."""
    from .functions.media import encode_wav
    from .stages.multimodal import audio_near_dups

    def clip(seed: int, n: int = 16000) -> np.ndarray:
        rng = np.random.RandomState(seed)
        t = np.arange(n, dtype=np.float64)
        f0 = 200 + 37 * seed
        return (np.sin(2 * np.pi * f0 * t / 8000) * 9000
                + np.sin(2 * np.pi * (f0 * 2.3) * t / 8000) * 4000
                + rng.normal(0, 300, n)).astype(np.int16)

    rows = []
    for i in range(100):
        c = clip(i)
        rows.append({"media_id": i, "payload": encode_wav(c, 8000)})
        if i % 10 == 0:
            rows.append({"media_id": 1_000 + i,
                         "payload": encode_wav((c // 2).astype(np.int16),
                                               8000)})
        if i % 20 == 0:
            rows.append({"media_id": 2_000 + i,
                         "payload": encode_wav(c[:10000], 8000)})
    return audio_near_dups(rd.from_items(rows, override_num_blocks=8),
                           min_shared=4)


def q_validate(sf_dir: str):
    """SchemaValidator business rules over parsed contracts (§3.3)."""
    from .pipelines.extract_pipeline import run_extraction
    from .stages.validate import validate_contracts_batch

    docs = run_extraction(sf_dir)
    out = docs.map_batches(validate_contracts_batch, batch_format="pyarrow")

    def stringify(t: pa.Table) -> pa.Table:
        # '; '-joined error list — keeps the driver's generic pandas
        # conversion away from variable-length list columns
        errs = ["; ".join(e or []) for e in t["validation_errors"].to_pylist()]
        return pa.table({"url": t["url"], "is_valid": t["is_valid"],
                         "validation_errors": pa.array(errs, pa.string())})

    return out.map_batches(stringify, batch_format="pyarrow")


def q_blocks_parse(sf_dir: str):
    """Blocks-input (Marker-JSON path) parse: M2/M4/M6 over the nested
    blocks column produced by extraction."""
    from .functions.blocksparse import parse_contract_from_blocks
    from .pipelines.extract_pipeline import run_extraction

    def parse_blocks(t: pa.Table) -> pa.Table:
        recs = []
        for url, blocks, status in zip(
            t["url"].to_pylist(), t["blocks"].to_pylist(), t["status"].to_pylist()
        ):
            if status == "error" or not blocks:
                recs.append({"url": url, "contract_number": None, "contract_type": None,
                             "n_sections": 0, "n_table_blocks": 0, "confidence": 0.0})
                continue
            r = parse_contract_from_blocks(blocks, default_name=url)
            recs.append({"url": url, "contract_number": r["contract_number"],
                         "contract_type": r["contract_type"], "n_sections": r["n_sections"],
                         "n_table_blocks": r["n_table_blocks"], "confidence": r["confidence"]})
        return pa.Table.from_pylist(recs)

    return run_extraction(sf_dir).map_batches(parse_blocks, batch_format="pyarrow")


def q_key_clause_histogram(sf_dir: str):
    """A1 over the exploded key_clauses list column."""
    from .pipelines.extract_pipeline import run_extraction

    def explode(t: pa.Table) -> pa.Table:
        clauses = []
        for lst in t["key_clauses"].to_pylist():
            clauses.extend(lst or [])
        return pa.table({"clause": pa.array(clauses, pa.string())})

    from ray.data.aggregate import Count

    docs = run_extraction(sf_dir)
    return docs.map_batches(explode, batch_format="pyarrow").groupby("clause").aggregate(
        Count(alias_name="n_docs")
    )


def q_hierarchy_orphans(sf_dir: str):
    """J3 orphan check: parent ids referenced by edges that have no
    corresponding contract in the corpus (anti-join on contract_number)."""
    edges = q_contract_edges(sf_dir)
    from .pipelines.extract_pipeline import run_extraction

    docs = run_extraction(sf_dir)
    known = docs.map_batches(
        lambda t: t.select(["contract_number"]), batch_format="pyarrow"
    ).unique("contract_number")
    from .ops.joins import broadcast_anti

    orphans = broadcast_anti(edges, [k for k in known if k], "parent_id").unique("parent_id")
    return pa.table({"parent_id": pa.array(sorted(orphans), pa.string())})


def q_training_rows(sf_dir: str):
    """S10 JSONL training-data projection (text + labels + metadata)."""
    from .io.export import training_rows
    from .pipelines.extract_pipeline import run_extraction

    return training_rows(run_extraction(sf_dir))


def q_csv_projection(sf_dir: str):
    """S9 CSV projection (lists joined with '; ')."""
    from .io.export import csv_projection
    from .pipelines.extract_pipeline import run_extraction

    return csv_projection(run_extraction(sf_dir))


def q_entity_type_histogram(sf_dir: str):
    """Explode the nested entities column (fm) → grouped counts (A1-shape
    over span types)."""
    from ray.data.aggregate import Count

    from .pipelines.extract_pipeline import run_extraction

    def explode(t: pa.Table) -> pa.Table:
        types = []
        for spans in t["entities"].to_pylist():
            types.extend(s["entity_type"] for s in (spans or []))
        return pa.table({"entity_type": pa.array(types, pa.string())})

    docs = run_extraction(sf_dir)
    return docs.map_batches(explode, batch_format="pyarrow").groupby("entity_type").aggregate(
        Count(alias_name="n_spans")
    )


def q_pattern_probe(sf_dir: str):
    """J4: broadcast pattern store × docs similarity probe (no shuffle)."""
    from .functions.spans import BASE_PATTERNS
    from .pipelines.extract_pipeline import run_extraction
    from .stages.patternprobe import PatternProbe

    ref = ray.put(BASE_PATTERNS)
    docs = run_extraction(sf_dir)
    return docs.map_batches(
        PatternProbe,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=4,
        fn_constructor_kwargs={"patterns_ref": ref, "threshold": 0.3},
    )


def q_unique_filenames(sf_dir: str):
    """D4: collision-free output filenames via per-group enumeration."""
    from .pipelines.extract_pipeline import run_extraction
    from .pipelines.organize import disambiguate_filenames, organize

    org = organize(run_extraction(sf_dir))
    return disambiguate_filenames(org).select_columns(
        ["url", "canonical_filename", "final_filename"]
    )


def q_random_sample(sf_dir: str):
    """T5 seeded random sample (deterministic for a fixed Ray version)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return ds.random_sample(0.1, seed=42)


def q_media_frames(sf_dir: str):
    """Multimodal frame-sample plumbing: resize metadata + per-frame
    feature rows (explode), payloads never leaving the decode stages."""
    from .stages.multimodal import FrameSample, MediaResize, synth_media_table

    media = rd.from_arrow(synth_media_table(120))
    resized = media.map_batches(
        MediaResize, batch_format="pyarrow", batch_size=32, concurrency=2,
        fn_constructor_kwargs={"max_side": 128},
    )
    frames = resized.map_batches(
        FrameSample, batch_format="pyarrow", batch_size=32, concurrency=2,
        fn_constructor_kwargs={"n_frames": 4},
    )
    return frames.select_columns(["media_id", "media_type", "frame"])


def q_doc_embeddings(sf_dir: str):
    """Text → deterministic hashed-BoW embedding (the doc-embedding
    stage feeding the similarity ops; reuses patternprobe's embedding),
    emitted EXPLODED as (doc_id, dim, val) float64 rows so the whole
    feature-hash derivation is value-gated (round-4 verdict #4): the
    DuckDB oracle restates FNV-1a 64 byte-for-byte via list_reduce over
    HUGEINT (xor + mod-2⁶⁴ multiply), the %64 bucket, the top-bit sign
    and the L2 normalize. Both engines divide the same exact integer
    counts by the same IEEE sqrt, and BOTH apply the pinned
    floor(x·1e6 + 0.5)/1e6 grid (no ROUND-mode dependence). The
    production embedding column (float32 list) is this same math before
    the f32 cast — pinned separately in tests."""
    from .stages.patternprobe import hashed_bow

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def embed(t: pa.Table) -> pa.Table:
        dids, dims, vals = [], [], []
        for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            v = hashed_bow((x or "")[:5000], 64)
            dids.extend([did] * 64)
            dims.extend(range(64))
            vals.append(np.floor(v * 1e6 + 0.5) / 1e6)
        return pa.table({
            "doc_id": pa.array(dids, pa.int64()),
            "dim": pa.array(dims, pa.int64()),
            "val": pa.array(np.concatenate(vals) if vals else
                            np.array([], np.float64), pa.float64()),
        })

    return ds.map_batches(embed, batch_format="pyarrow")


# registered into SQL_QUERIES/ORACLE_SQL at the module tail (the dicts
# are defined after this point in the file)
_ORACLE_SQL_DOC_EMB = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(
               regexp_split_to_array(lower(substr(text, 1, 5000)), '\s+'),
               w -> w <> '')) AS w
      FROM documents),
    hashed AS (
      -- FNV-1a 64 byte-for-byte (ASCII corpus): seed prepended, then
      -- (h XOR byte) * 1099511628211 mod 2^64 per byte via HUGEINT
      SELECT doc_id,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(1, length(w) + 1),
                                i -> ascii(substr(w, i, 1))::HUGEINT)),
               (acc, b) -> (xor(acc::UBIGINT, b::UBIGINT)::HUGEINT
                            * 1099511628211::HUGEINT)
                           % 18446744073709551616::HUGEINT) AS h
      FROM toks),
    contrib AS (
      SELECT doc_id, CAST(h % 64 AS BIGINT) AS dim,
             SUM(CASE WHEN h >= 9223372036854775808::HUGEINT
                      THEN -1.0 ELSE 1.0 END) AS v
      FROM hashed GROUP BY doc_id, CAST(h % 64 AS BIGINT)),
    norms AS (
      SELECT doc_id, sqrt(SUM(v * v)) AS nrm FROM contrib GROUP BY doc_id),
    grid AS (
      SELECT d.doc_id, g.dim
      FROM documents d, (SELECT unnest(range(0, 64)) AS dim) g)
    SELECT g.doc_id, CAST(g.dim AS BIGINT) AS dim,
           floor(COALESCE(c.v / NULLIF(n.nrm, 0), 0.0) * 1e6 + 0.5) / 1e6
             AS val
    FROM grid g
    LEFT JOIN contrib c ON c.doc_id = g.doc_id AND c.dim = g.dim
    LEFT JOIN norms n ON n.doc_id = g.doc_id
"""


# --------------------------------------------------------------------------
# Web-corpus curation family (stages/webclean.py): corpus-level paragraph
# dedup, Gopher repetition counters, benchmark decontamination. Each query
# synthesizes its deterministic fixture corpus from the documents table and
# has an exact DuckDB oracle that reconstructs the same corpus in SQL.
# --------------------------------------------------------------------------

_BP1 = "subscribe to our newsletter accept cookies to continue all rights reserved"
_BP2 = "share this story follow us on social media terms of service apply"
_PARA_WORDS = 12


def _docs_with_boilerplate(sf_dir: str):
    """documents → paragraph-structured corpus: each doc's words chunked
    into 12-word paragraphs joined by '\\n', with planted boilerplate
    (doc_id%7 → nav-bar para prepended, doc_id%13 → share-footer para
    appended) so corpus-level paragraph frequency has known hot rows."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        outs = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            w = (text or "").split(" ")
            chunks = [" ".join(w[i:i + _PARA_WORDS]) for i in range(0, len(w), _PARA_WORDS)]
            paras = (([_BP1] if did % 7 == 0 else [])
                     + chunks
                     + ([_BP2] if did % 13 == 0 else []))
            outs.append("\n".join(paras))
        return pa.table({"doc_id": t["doc_id"], "text": pa.array(outs, pa.string())})

    return ds.map_batches(prep, batch_format="pyarrow")


def q_paragraph_dedup(sf_dir: str):
    """RefinedWeb-style corpus-level repeated-paragraph removal: any
    paragraph present in ≥2 distinct docs (planted boilerplate + natural
    chunk collisions) is dropped from every doc; survivors are rejoined
    in order. Only 8-byte paragraph keys shuffle (stages/webclean.py)."""
    from .stages.webclean import paragraph_dedup

    return paragraph_dedup(
        _docs_with_boilerplate(sf_dir), "doc_id", "text", sep="\n", min_docs=2
    )


_RARE_PROMO = "limited time offer visit our partner site for exclusive deals today"


def q_host_boilerplate(sf_dir: str):
    """Site-template boilerplate removal (stages/webclean.
    host_boilerplate_removal): a nav paragraph planted on ~50% of each
    host's pages (host = doc_id%23, distinct para text per host) falls
    to the 400‰ per-host rule, while a cross-host promo para on only
    doc_id%29 (~34‰ per host) survives — the case a corpus-global
    min_docs threshold cannot express. Only host-scoped int64 keys
    ride the exchanges; the oracle recomputes per-host frequencies
    from the identically-planted corpus."""
    from .stages.webclean import host_boilerplate_removal

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        ids, hosts, outs = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            host = f"h{did % 23}"
            w = (text or "").split(" ")
            chunks = [" ".join(w[i:i + _PARA_WORDS])
                      for i in range(0, len(w), _PARA_WORDS)]
            paras = (([f"HOSTBP {host} navigation menu follow links"]
                      if did % 2 == 0 else [])
                     + chunks
                     + ([_RARE_PROMO] if did % 29 == 0 else []))
            ids.append(did)
            hosts.append(host)
            outs.append("\n".join(paras))
        return pa.table({
            "doc_id": pa.array(ids, t["doc_id"].type),
            "host": pa.array(hosts, pa.string()),
            "text": pa.array(outs, pa.string()),
        })

    return host_boilerplate_removal(
        ds.map_batches(prep, batch_format="pyarrow"),
        host_col="host", id_col="doc_id", text_col="text",
        min_host_permille=400, min_docs=2)


_DUP_SLOGAN = " ".join(f"dup{i}" for i in range(12))


def q_substring_dedup(sf_dir: str):
    """Exact duplicated-substring removal at 8-token-window granularity
    (Lee et al. 2021 semantics, stages/webclean.substring_dedup): every
    5th doc carries a shared 12-token slogan (cross-doc duplicate — the
    globally first occurrence keeps it, every later one loses all 12
    tokens as the 5 dup windows merge into one span); every 11th doc
    repeats its own first 8 tokens at the end (intra-doc duplicate).
    Pass 1 shuffles 16 bytes per window; the oracle keys on exact window
    text, so a 64-bit window-hash collision would surface as a mismatch."""
    from .stages.webclean import substring_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        outs = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            text = text or ""
            head8 = " ".join(text.split(" ")[:8])
            if did % 5 == 0:
                text = text + " " + _DUP_SLOGAN
            if did % 11 == 0:
                text = text + " " + head8
            outs.append(text)
        return pa.table({"doc_id": t["doc_id"], "text": pa.array(outs, pa.string())})

    return substring_dedup(ds.map_batches(plant, batch_format="pyarrow"), n=8)


def _warc_fixture(sf_dir: str) -> str:
    """Deterministic WARC corpus derived from documents.parquet (one
    response record per doc, url http://{source}/doc/{doc_id}), written
    once per (fixtures-version, sf) under /tmp via the distributed
    ``write_warc`` sink. Re-runs are byte-identical (content-hash
    filenames, gzip mtime 0)."""
    import os

    from .fixtures import FIXTURES_VERSION
    from .io.warc import write_warc

    tag = sf_dir.strip("/").replace("/", "_")
    out = f"/tmp/warc_fixture_v{FIXTURES_VERSION}_{tag}"
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])

        def to_records(t: pa.Table) -> pa.Table:
            urls = [f"http://{s}/doc/{d}" for s, d in
                    zip(t["source"].to_pylist(), t["doc_id"].to_pylist())]
            payloads = [(x or "").encode("utf-8") for x in t["text"].to_pylist()]
            return pa.table({"url": pa.array(urls, pa.string()),
                             "payload": pa.array(payloads, pa.binary())})

        write_warc(docs.map_batches(to_records, batch_format="pyarrow"), out
                   ).materialize()
        with open(marker, "w"):
            pass
    return out


def q_warc_roundtrip(sf_dir: str):
    """WARC ingestion end-to-end (io/warc.py): documents → distributed
    ``write_warc`` sink (per-record gzip members, HTTP envelope) →
    streaming ``read_warc`` source (one task per archive, bounded
    blocks, envelope stripped) → per-doc integrity row. The oracle
    recomputes url/byte-length/md5 from the parquet table, so any header
    mis-parse, payload truncation, or encoding drift hash-mismatches.
    Scale: parallelism = archive-file count; payload bytes live in Arrow
    binary arrays end to end, never Python rows on the driver."""
    from .io.warc import read_warc

    warc_dir = _warc_fixture(sf_dir)
    ds = read_warc(warc_dir, records_per_block=64)

    def integrity(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        payloads = t["payload"].to_pylist()
        return pa.table({
            "doc_id": pa.array([int(u.rsplit("/", 1)[1]) for u in urls], pa.int64()),
            "url": t["url"],
            "payload_length": t["payload_length"],
            "payload_md5": pa.array(
                [hashlib.md5(p or b"").hexdigest() for p in payloads], pa.string()),
        })

    return ds.map_batches(integrity, batch_format="pyarrow")


def q_repetition_stats(sf_dir: str):
    """Gopher-style within-doc repetition counters (exact integers —
    callers derive dup fractions downstream; integer output keeps the
    oracle hash immune to float-rounding-mode ties)."""
    from .stages.webclean import repetition_stats_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(repetition_stats_batch, batch_format="pyarrow")


def q_decontaminate(sf_dir: str):
    """Benchmark n-gram contamination scan: every 97th doc stands in for
    the held-out eval suite (its leading 6-gram is the contaminating
    n-gram); every 31st non-bench doc gets one planted. The gram list is
    the broadcast small side; the corpus streams (stages/webclean.py)."""
    from .stages.webclean import decontaminate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bench_only(t: pa.Table) -> pa.Table:
        mask = (t["doc_id"].to_numpy() % 97) == 0
        return t.filter(pa.array(mask))

    # the benchmark side is a fixed external artifact (eval suites don't
    # grow with the corpus) — driver-collecting it IS the broadcast-small
    # pattern, synthesized here from every 97th doc for determinism
    bench = sorted(
        ds.map_batches(bench_only, batch_format="pyarrow").take_all(),
        key=lambda r: r["doc_id"],
    )
    grams_by_rank = [" ".join((r["text"] or "").split(" ")[:6]) for r in bench]
    n_bench = len(grams_by_rank)
    if n_bench == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_hits": pa.array([], pa.int64())})

    def plant(t: pa.Table) -> pa.Table:
        ids, outs = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did % 97 == 0:
                continue  # bench docs are not scan targets
            text = text or ""
            if did % 31 == 0:
                text = text + " " + grams_by_rank[(did // 31) % n_bench]
            ids.append(did)
            outs.append(text)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(outs, pa.string())})

    corpus = ds.map_batches(plant, batch_format="pyarrow")
    return decontaminate(corpus, grams_by_rank)


def q_decontaminate_ngrams(sf_dir: str):
    """Scale-path decontamination: token-aligned rolling-hash windows
    (O(tokens) per doc independent of benchmark size) over the same
    planted fixture as q_decontaminate; the oracle enumerates the
    6-token windows in SQL (exact token semantics, not substring)."""
    from .stages.webclean import decontaminate_ngrams

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bench_only(t: pa.Table) -> pa.Table:
        mask = (t["doc_id"].to_numpy() % 97) == 0
        return t.filter(pa.array(mask))

    bench = sorted(
        ds.map_batches(bench_only, batch_format="pyarrow").take_all(),
        key=lambda r: r["doc_id"],
    )
    grams_by_rank = [" ".join((r["text"] or "").split(" ")[:6]) for r in bench]
    n_bench = len(grams_by_rank)
    if n_bench == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_hits": pa.array([], pa.int64())})

    def plant(t: pa.Table) -> pa.Table:
        ids, outs = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did % 97 == 0:
                continue
            text = text or ""
            if did % 31 == 0:
                text = text + " " + grams_by_rank[(did // 31) % n_bench]
            ids.append(did)
            outs.append(text)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(outs, pa.string())})

    corpus = ds.map_batches(plant, batch_format="pyarrow")
    return decontaminate_ngrams(corpus, grams_by_rank, n=6)


def q_cosine_pairs_exact(sf_dir: str):
    """All-pairs exact cosine near-dup baseline over the embeddings table
    ∪ perturbed copies of every 10th vector (the planted near-identical
    pairs; natural max cosine on this table is ~0.51, threshold 0.9 —
    enormous margin, so float32-vs-float64 math can't flip a pair).
    Oracle: SQL self-join with list_cosine_similarity."""
    from .stages.similarity import cosine_pairs_exact

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def perturb(t: pa.Table) -> pa.Table:
        ids, vecs = [], []
        for vid, vec in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()):
            if vid % 10 != 0:
                continue
            ids.append(vid + 1_000_000)
            # 1-based component index to match DuckDB's list_transform lambda
            vecs.append([x * (1 + 0.002 * (((vid + i + 1) % 5) - 2))
                         for i, x in enumerate(vec)])
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "embedding": pa.array(vecs, pa.list_(pa.float32()))})

    corpus = ds.union(ds.map_batches(perturb, batch_format="pyarrow"))
    return cosine_pairs_exact(corpus, "vec_id", "embedding", threshold=0.9)


def q_semantic_decontaminate(sf_dir: str):
    """Embedding-space benchmark decontamination
    (stages/similarity.semantic_decontaminate): bench = every 97th
    vector (the eval set, mirroring the n-gram decontamination plants);
    corpus = embeddings ∪ near-identical perturbed copies of every even
    bench vector (the planted paraphrase leaks). Survivors must exclude
    the bench rows themselves (cosine(self)=1) AND the planted copies
    (cosine ≈ 0.999996) while keeping everything else — natural max
    cosine on this table is ~0.51 vs threshold 0.9, so float32-vs-float64
    math cannot flip a row. Oracle: NOT EXISTS over
    list_cosine_similarity."""
    from .stages.similarity import semantic_decontaminate

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def pick_bench(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 == 0))

    def plant(t: pa.Table) -> pa.Table:
        # vectorized prefilter BEFORE any list conversion — only ~1/194
        # rows are planted, so converting the whole embedding column to
        # Python lists per batch would dominate the construction
        all_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((all_ids % 97 == 0) & (all_ids % 2 == 0)))
        ids, vecs = [], []
        for vid, vec in zip(t["vec_id"].to_pylist(),
                            t["embedding"].to_pylist()):
            ids.append(vid + 2_000_000)
            # 1-based component index to match DuckDB's list_transform
            vecs.append([x * (1 + 0.002 * (((vid + i + 1) % 5) - 2))
                         for i, x in enumerate(vec)])
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "embedding": pa.array(vecs, pa.list_(pa.float32()))})

    bench = ds.map_batches(pick_bench, batch_format="pyarrow")
    corpus = ds.union(ds.map_batches(plant, batch_format="pyarrow"))
    clean = semantic_decontaminate(corpus, bench, "vec_id", "embedding",
                                   threshold=0.9)
    return clean.select_columns(["vec_id"])


def q_c4_line_filter(sf_dir: str):
    """C4 line-level cleaning (stages/webclean.c4_line_filter). Planted
    line structure (the corpus has no newlines or punctuation): each doc
    becomes 6-word lines; line j gets ' javascript' when (doc_id+j)%17=0
    (line rule must drop it) and a terminal '.' unless (doc_id+j)%4=0
    (unpunctuated lines must drop); every 29th doc gains a 'Lorem Ipsum'
    line and every 31st a curly-brace line (page rules must drop the
    whole doc). Short trailing chunks exercise the ≥5-word rule. Oracle:
    the same construction in SQL (list_transform chunking, RE2 line
    predicates, string_agg rebuild ORDER BY line index)."""
    from .stages.webclean import c4_line_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        outs = []
        for d, x in zip(ids, t["text"].to_pylist()):
            w = (x or "").split()
            ls = []
            for j in range((len(w) + 5) // 6):
                line = " ".join(w[6 * j:6 * j + 6])
                if (d + j) % 17 == 0:
                    line += " javascript"
                if (d + j) % 4 != 0:
                    line += "."
                ls.append(line)
            if d % 29 == 0:
                ls.append("these lines look like Lorem Ipsum dolor text.")
            if d % 31 == 0:
                ls.append("var cfg = { mode: fast }.")
            outs.append("\n".join(ls))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(outs, pa.string())})

    corpus = ds.map_batches(plant, batch_format="pyarrow")
    return c4_line_filter(corpus).select_columns(
        ["doc_id", "n_lines_kept", "clean_text"])


def q_gopher_quality_filter(sf_dir: str):
    """Gopher word-level quality rules
    (stages/webclean.gopher_quality_filter). Plants (applied in this
    order, mirrored in SQL): every 41st doc becomes 60×'zz' (mean word
    length 2 < 3 AND zero stopwords — two rules trip), every 19th is
    truncated to its first 10 words (< min_words), every 23rd gains 40
    '#h' tokens (hashtag ratio > 10%). Everything else passes on its
    organic stats. Exact-integer rule arithmetic on both sides."""
    from .stages.webclean import gopher_quality_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        outs = []
        for d, x in zip(ids, t["text"].to_pylist()):
            x = x or ""
            if d % 41 == 0:
                x = " ".join(["zz"] * 60)
            if d % 19 == 0:
                x = " ".join(x.split(" ")[:10])
            if d % 23 == 0:
                x = x + " " + " ".join(["#h"] * 40)
            outs.append(x)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(outs, pa.string())})

    corpus = ds.map_batches(plant, batch_format="pyarrow")
    kept = gopher_quality_filter(corpus)
    return kept.select_columns(["doc_id", "n_words", "n_word_chars",
                                "n_stopwords", "n_hashtag_words"])


def q_badwords_filter(sf_dir: str):
    """C4-style blocklist-word filter (stages/webclean.badwords_filter).
    Planted fixture (the organic corpus vocabulary is too small/uniform
    to blocklist): every 17th doc gains ' Darn17 extra' (case-folded
    match must drop it), every 23rd ' heck23' (plain match), every 41st
    ' xdarn17y' (blocklist term INSIDE a longer token — the word
    boundary must KEEP it). Blocklist = darn17/heck23/frig31 (frig31
    never occurs — inert). Oracle: NOT regexp_matches with the same RE2
    alternation (DuckDB's regex engine IS RE2, so \\b semantics are
    engine-identical)."""
    from .stages.webclean import badwords_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        out = [
            (x or "")
            + (" Darn17 extra" if d % 17 == 0 else "")
            + (" heck23" if d % 23 == 0 else "")
            + (" xdarn17y" if d % 41 == 0 else "")
            for d, x in zip(ids, texts)
        ]
        return t.set_column(t.schema.get_field_index("text"), "text",
                            pa.array(out, pa.string()))

    corpus = ds.map_batches(plant, batch_format="pyarrow")
    kept = badwords_filter(corpus, ["darn17", "heck23", "frig31"],
                           text_col="text")
    return kept.select_columns(["doc_id", "lang"])


def q_bottomk_sample(sf_dir: str):
    """Exactly-k deterministic uniform sample (bottom-k hashing,
    ops/sample.bottomk_sample): scatter-gather local bottom-k, no full
    sort. Unlike seeded engine RNG (q:random_sample, rows-only), the
    hash-priority sampler is exactly reproducible in SQL."""
    from .ops.sample import bottomk_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return bottomk_sample(ds, "doc_id", k=40)


def q_heavy_hitters_words(sf_dir: str):
    """Count-Min + candidate-union heavy hitters over the corpus word
    stream (stages/sketch.py) — the sketch-based scale path for
    wordcount_top: per-block fixed-size sketches merge in O(blocks),
    no all-to-all word shuffle. Oracle: exact SQL top-20. The sketch
    output EQUALS exact counts here deterministically: the fixed hash
    family maps this corpus's vocabulary collision-free in all 4 CM
    rows (verified at every sf), and every heavy hitter is in some
    block's local top — so the gate checks the sketch end-to-end."""
    from .stages.sketch import heavy_hitters

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def words(t: pa.Table):
        return [w for x in t["text"].to_pylist() for w in (x or "").split()]

    return heavy_hitters(ds, words, k=20)


def q_hll_distinct_bigrams(sf_dir: str):
    """HyperLogLog distinct count of word bigrams (stages/sketch.py):
    per-block 16 KiB register rows merged by max — replaces the exact
    distinct's all-to-all shuffle at 100 TB. Approximate by design
    (±0.8% at p=14, accuracy pinned in tests/test_sketch.py), so
    rows-only checked: no SQL oracle can reproduce the estimator."""
    from .stages.sketch import hll_distinct

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def bigrams(t: pa.Table):
        out = []
        for x in t["text"].to_pylist():
            w = (x or "").split()
            out.extend(f"{a} {b}" for a, b in zip(w, w[1:]))
        return out

    est, n_sketches = hll_distinct(ds, bigrams)
    return pa.table({"est_distinct": pa.array([round(est, 1)], pa.float64()),
                     "n_block_sketches": pa.array([n_sketches], pa.int64())})


def q_hll_bigrams_check(sf_dir: str):
    """Oracled companion to ``hll_distinct_bigrams`` (round-2 verdict
    item #6): the Ray side computes BOTH the exact distinct-bigram
    count (one distinct-gram exchange) and the HLL estimate (O(blocks)
    register partials), and emits (n_exact, within_2pct) — the DuckDB
    oracle emits (COUNT(DISTINCT bigram), TRUE), so the sketch's ±2%
    accuracy claim is value-hash-gated, not just pytest-pinned."""
    from ray.data.aggregate import Count

    from .stages.sketch import hll_distinct

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def bigram_list(t: pa.Table):
        out = []
        for x in t["text"].to_pylist():
            w = (x or "").split()
            out.extend(f"{a} {b}" for a, b in zip(w, w[1:]))
        return out

    def distinct_bigrams(t: pa.Table) -> pa.Table:
        return pa.table({"bg": pa.array(sorted(set(bigram_list(t))), pa.string())})

    est, _ = hll_distinct(ds, bigram_list)
    n_exact = (
        ds.map_batches(distinct_bigrams, batch_format="pyarrow")
        .groupby("bg").aggregate(Count()).count()
    )
    within = abs(est - n_exact) <= 0.02 * n_exact
    return pa.table({
        "n_exact": pa.array([n_exact], pa.int64()),
        "within_2pct": pa.array([bool(within)], pa.bool_()),
    })


_GOLDENS_PARQUET = _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "tests", "goldens",
    "golden_extractions.parquet"))


def q_party_histogram_golden(sf_dir: str):
    """Oracled party histogram (round-2 verdict item #6): the explode +
    group runs over the golden-frozen parse outputs re-read from the
    in-repo goldens parquet (byte-frozen by tests/test_golden.py), and
    the DuckDB oracle reads the SAME file — so the report operator is
    value-hash-gated over real extractor output, independent of
    sf_dir. The live-extraction variant stays rows-only
    (``party_histogram``)."""
    from .pipelines.reports import party_histogram

    return party_histogram(rd.read_parquet(_GOLDENS_PARQUET))


def q_pii_scrub(sf_dir: str):
    """PII redaction (email/phone/IP → tokens + counts), planted
    deterministically per doc_id; Arrow RE2 kernels column-wide, zero
    Python loops (stages/webclean.pii_scrub_batch)."""
    from .stages.webclean import pii_scrub_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        outs = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            text = text or ""
            if did % 5 == 0:
                text += f" contact user{did}@example.com now"
            if did % 9 == 0:
                text += f" call 555-{did % 900 + 100:03d}-4567 today"
            if did % 11 == 0:
                text += f" from 10.0.{did % 256}.{did % 200 + 1} logged"
            outs.append(text)
        return pa.table({"doc_id": t["doc_id"], "text": pa.array(outs, pa.string())})

    return ds.map_batches(plant, batch_format="pyarrow").map_batches(
        pii_scrub_batch, batch_format="pyarrow"
    )


def q_sequence_pack(sf_dir: str):
    """Token-stream sequence packing manifest (GPT-style concat-and-
    split training shards): each doc's global token offset via the
    distributed prefix scan (ops/prefix.py), then its first/last
    2048-token training sequence. All-integer output; oracle is a SQL
    window cumsum."""
    from .ops.prefix import prefix_sum_by_int_key

    L = 2048
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def toklen(t: pa.Table) -> pa.Table:
        ids, ns = [], []
        for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            n = len((x or "").split())
            if n:
                ids.append(did)
                ns.append(n)
        return pa.table({"doc_id": pa.array(ids, t["doc_id"].type),
                         "n_tokens": pa.array(ns, pa.int64())})

    with_off = prefix_sum_by_int_key(
        ds.map_batches(toklen, batch_format="pyarrow"),
        "doc_id", "n_tokens", out_col="start_offset",
    )

    def seqs(t: pa.Table) -> pa.Table:
        start = np.asarray(t["start_offset"], np.int64)
        n = np.asarray(t["n_tokens"], np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
            "start_offset": t["start_offset"],
            "first_seq": pa.array(start // L, pa.int64()),
            "last_seq": pa.array((start + n - 1) // L, pa.int64()),
        })

    return with_off.map_batches(seqs, batch_format="pyarrow")


def q_approx_quantiles(sf_dir: str):
    """HDR-histogram quantile sketch (stages/sketch.approx_quantiles):
    fixed 4096-slot per-block histograms merged by vector add — the
    mergeable scale path for quantiles. Integer-exact monotone
    bucketing makes even the approximation bit-exact against a SQL
    quantile_disc over bucket lower edges."""
    from .stages.sketch import approx_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    edges, _ = approx_quantiles(ds, "n_chars", [0.25, 0.5, 0.75, 0.95])
    return pa.table({
        name: pa.array([v], pa.int64())
        for name, v in zip(["p25", "p50", "p75", "p95"], edges)
    })


def q_pagerank(sf_dir: str):
    """Distributed PageRank (ops/pagerank.py), 5 synchronous rounds at
    d=0.85 over a deterministic 3-out-link graph planted on doc_ids
    (targets (7i+1)%N, (11i+3)%N, (13i+5)%N — ids are contiguous
    0..N-1 so every target is a node). Each round = one src-key hash
    join + one dst-key groupby-sum; oracle unrolls the rounds into
    chained SQL CTEs."""
    from .ops.pagerank import pagerank

    nodes = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = nodes.count()

    def mk_edges(t: pa.Table) -> pa.Table:
        i = np.asarray(t["doc_id"], np.int64)
        src = np.concatenate([i, i, i])
        dst = np.concatenate([(i * 7 + 1) % n, (i * 11 + 3) % n, (i * 13 + 5) % n])
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        })

    edges = nodes.map_batches(mk_edges, batch_format="pyarrow")
    # ids are contiguous 0..N-1 → dense broadcast fast path (the join
    # path is the >2M-node shape; both are asserted equal in tests)
    return pagerank(nodes, edges, node_col="doc_id", iters=5, round_to=8,
                    dense_ids=True)


def q_link_graph(sf_dir: str):
    """End-to-end link-graph build from crawl HTML (stages/links.py →
    ops/anchors.py): harvest <a href> edges from the pages fixture's
    real HTML (relative hrefs resolved against the source host), then
    aggregate per-target inlink counts + source-ordered anchor text.
    Oracled since round 3 (verdict item #6): the fixture's link sets
    are pure doc_id arithmetic — full HTML rows carry the 22
    boilerplate links, 200-byte-truncated malformed rows keep exactly
    the first 3 nav links (the cut lands past nav link 3 for every
    doc_id < 10^6), pdf/pre-extracted rows carry none — so the DuckDB
    mirror reconstructs the aggregate exactly."""
    from .fixtures import read_pages
    from .ops.anchors import aggregate_anchors
    from .stages.links import extract_links

    edges = extract_links(read_pages(sf_dir))
    return aggregate_anchors(edges, src_col="src_url", dst_col="dst_url")


def q_authority_rank(sf_dir: str):
    """Composed web-graph flagship (the graph sibling of curate_full):
    crawl HTML → extract_links → URL-level PageRank over the REAL
    harvested edge set (string node ids exercise the join path — the
    100 TB shape; no arithmetic edge planting). Node set = every url
    that emits or receives a link. Oracle: the link_graph fixture
    arithmetic rebuilds the exact edge set (page urls from the KINDS
    cascade, full docs → 22 targets, truncated docs → first 3 nav
    links), then 3 unrolled PR rounds — so the whole composition
    (harvest + graph build + iterate) is value-gated."""
    from ray.data.aggregate import Count as _Count

    from .fixtures import read_pages
    from .ops.pagerank import pagerank_auto
    from .stages.links import extract_links

    # pin the harvested edge table (link-sized — ~1.5% of page bytes):
    # it has FIVE consumers (two node-side scans, outdeg, the per-round
    # join lineage, n) and without the pin each re-runs the full pages
    # read + HTML link scan
    edges = extract_links(read_pages(sf_dir)).materialize()

    def side(col: str):
        return edges.select_columns([col]).map_batches(
            lambda t, c=col: pa.table({"node": t[c]}),
            batch_format="pyarrow")

    # nodes likewise: pagerank consumes it three times (N, rank init,
    # the teleport zero-rows union)
    nodes = side("src_url").union(side("dst_url")) \
        .groupby("node").aggregate(_Count()) \
        .select_columns(["node"]).materialize()
    # hybrid dispatcher: this harvested url graph is node-bounded, so it
    # dictionary-encodes to the zero-join dense path (ops/pagerank.py
    # pagerank_auto); a beyond-bound graph falls back to the BSP joins
    ranked = pagerank_auto(nodes, edges, node_col="node", src_col="src_url",
                           dst_col="dst_url", iters=3, round_to=8)
    return ranked.map_batches(
        lambda t: pa.table({"url": t["node"], "pagerank": t["pagerank"]}),
        batch_format="pyarrow")


def q_winnow_fingerprints(sf_dir: str):
    """MOSS winnowing fingerprints (stages/winnow.py, k=3 token grams,
    window w=4): per-window minimum of packed (md5-8hex ‖ position)
    keys — shuffle-free streaming map; oracle is a window-function MIN
    over the same packed strings."""
    from .stages.winnow import winnow_fingerprints

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return winnow_fingerprints(docs, k=3, w=4)


def q_distinctive_terms(sf_dir: str):
    """Per-language distinctive terms (stages/keywords.distinctive_terms,
    Monroe 2008 log-odds with Dirichlet α=0.01): what a language slice
    over-uses relative to the rest — one (lang,word) exchange, totals
    broadcast, delta as a fixed ln chain mirrored in the oracle."""
    from .stages.keywords import distinctive_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])
    return distinctive_terms(docs, group_col="lang", k=5)


def q_grouped_top_words(sf_dir: str):
    """Per-language top-5 words (grouped heavy hitters): per-block
    (lang, word) partial counts pre-combine inside map_batches, one
    distinct-pair groupby-sum, then grouped top-k on the tiny
    aggregated table — the per-slice vocabulary diagnostic next to the
    corpus-level wordcount_top."""
    from .ops.sample import grouped_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])

    def partials(t: pa.Table) -> pa.Table:
        from collections import Counter
        cnt: "Counter" = Counter()
        for lg, x in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for tok in (x or "").split():
                cnt[(lg, tok)] += 1
        return pa.table({
            "lang": pa.array([k[0] for k in cnt], pa.string()),
            "word": pa.array([k[1] for k in cnt], pa.string()),
            "n_part": pa.array(list(cnt.values()), pa.int64()),
        })

    from ray.data.aggregate import Sum

    counts = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .aggregate(Sum("n_part", alias_name="n"))
    )
    return grouped_topk(counts, "lang", "n", "word", k=5)


def q_profile_table(sf_dir: str):
    """Per-column profile of the documents table (ops/profile.py):
    row/null/distinct counts + stringified min/max for the scalar
    columns — the input-drop QA report."""
    from .ops.profile import profile_table

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    return profile_table(ds, ["doc_id", "lang", "source", "n_chars"])


def q_profile_table_approx(sf_dir: str):
    """Exchange-free profiler (ops/profile.py approx=True): HLL block
    partials replace the per-column distinct exchanges; n_distinct is
    a ±~1% estimate (rows-only driver check; the ±2% band vs exact is
    pinned in tests/test_profile.py)."""
    from .ops.profile import profile_table

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    return profile_table(ds, ["doc_id", "lang", "source", "n_chars"],
                         approx=True)


def q_profile_approx_check(sf_dir: str):
    """Gate-checkable band oracle for the exchange-free profiler (same
    pattern as ``hll_bigrams_check``): Ray runs BOTH profiler paths —
    exact per-column distinct exchanges and the HLL-sketch approx mode —
    and emits (col_name, n_distinct_exact, within_2pct). The SQL oracle
    recomputes the exact distincts and pins within_2pct TRUE, so the
    driver gate value-hashes the HLL estimate end-to-end instead of
    trusting the pytest-only band."""
    from .ops.profile import profile_table

    cols = ["doc_id", "lang", "source", "n_chars"]
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    exact = {r["col_name"]: r["n_distinct"]
             for r in profile_table(ds, cols).take_all()}
    approx = {r["col_name"]: r["n_distinct"]
              for r in profile_table(ds, cols, approx=True).take_all()}
    return pa.table({
        "col_name": pa.array(cols, pa.string()),
        "n_distinct_exact": pa.array([int(exact[c]) for c in cols], pa.int64()),
        "within_2pct": pa.array(
            [abs(approx[c] - exact[c]) <= max(1.0, 0.02 * exact[c])
             for c in cols], pa.bool_()),
    })


def q_hll_store_check(sf_dir: str):
    """Gate-checkable oracle for the PERSISTED mergeable HLL store
    (stages/sketch save_hll_increment / stored_hll_*): the documents
    corpus is sketched in TWO parity increments into a /tmp-cached
    store; the merged stored registers must equal the single-pass
    registers of the union corpus BIT-EXACTLY (max-merge is lossless),
    and the estimate must sit within 2% of the exact distinct-word
    count (recomputed in SQL). Same band-check pattern as
    profile_approx_check."""
    import os

    from ray.data.aggregate import Count as _Count

    from .stages.sketch import (hll_merge, save_hll_increment,
                                stored_hll_estimate, stored_hll_registers)

    words_fn = lambda t: [w for x in t["text"].to_pylist()  # noqa: E731
                          for w in (x or "").split()]
    store = _tmp_cache("hll_store", sf_dir)
    marker = os.path.join(store, "_SUCCESS")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    if not os.path.exists(marker):
        for parity in (0, 1):
            save_hll_increment(
                docs.map_batches(
                    lambda t, p=parity: t.filter(pc.equal(
                        pc.bit_wise_and(t["doc_id"], 1), p)),
                    batch_format="pyarrow"),
                words_fn, store)
        with open(marker, "w"):
            pass

    # single-pass registers over the union corpus (block partials merged)
    def sketch_all(t: pa.Table) -> pa.Table:
        from .stages.sketch import hll_registers
        return pa.table({"regs": pa.array(
            [hll_registers(words_fn(t)).tobytes()], pa.binary())})

    rows = docs.map_batches(sketch_all, batch_format="pyarrow").take_all()
    single = hll_merge(np.frombuffer(r["regs"], dtype=np.uint8)
                       for r in rows)
    merged = stored_hll_registers(store)
    est, n_inc = stored_hll_estimate(store)

    # exact distinct words, distributed (gate-scale; the band's anchor)
    def explode_words(t: pa.Table) -> pa.Table:
        return pa.table({"w": pa.array(sorted(set(words_fn(t))), pa.string())})

    n_exact = (docs.map_batches(explode_words, batch_format="pyarrow")
               .groupby("w").aggregate(_Count()).count())

    return pa.table({
        "n_increments": pa.array([n_inc], pa.int64()),
        "registers_equal_union": pa.array(
            [bool(np.array_equal(merged, single))], pa.bool_()),
        "n_distinct_exact": pa.array([int(n_exact)], pa.int64()),
        "within_2pct": pa.array(
            [abs(est - n_exact) <= max(1.0, 0.02 * n_exact)], pa.bool_()),
    })


def q_corpus_overlap_check(sf_dir: str):
    """Gate-checkable band oracle for ``stored_hll_overlap``: two
    sketch stores (docs with even ids / ids divisible by 3 — word sets
    overlap partially) are built /tmp-cached, then the
    inclusion-exclusion overlap report is banded against the exact
    distinct-word counts recomputed in SQL. Pins that two 16 KiB
    artifacts answer the what-do-these-corpora-share question without
    touching either corpus."""
    import os

    from ray.data.aggregate import Count as _Count

    from .stages.sketch import save_hll_increment, stored_hll_overlap

    words_fn = lambda t: [w for x in t["text"].to_pylist()  # noqa: E731
                          for w in (x or "").split()]
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def part(mod, res):
        return docs.map_batches(
            lambda t, m=mod, r=res: t.filter(pc.equal(_pc_mod(t["doc_id"], m),
                                                      r)),
            batch_format="pyarrow")

    stores = {}
    for name, (mod, res) in {"a": (2, 0), "b": (3, 0)}.items():
        store = _tmp_cache(f"hll_ovl_{name}", sf_dir)
        if not os.path.exists(os.path.join(store, "_SUCCESS")):
            save_hll_increment(part(mod, res), words_fn, store)
            with open(os.path.join(store, "_SUCCESS"), "w"):
                pass
        stores[name] = store

    r = stored_hll_overlap(stores["a"], stores["b"])

    # exact side/union/intersection word counts, distributed
    def explode(side_mod, side_res, tag_col):
        return part(side_mod, side_res).map_batches(
            lambda t: pa.table({"w": pa.array(sorted(set(words_fn(t))),
                                              pa.string())}),
            batch_format="pyarrow").groupby("w").aggregate(
            _Count(alias_name=tag_col))

    wa = explode(2, 0, "ca")
    wb = explode(3, 0, "cb")
    n_a, n_b = wa.count(), wb.count()
    from .ops.joins import semi_join
    n_inter = semi_join(
        wa.select_columns(["w"]), wb.select_columns(["w"]), on="w",
        left_schema=pa.schema([("w", pa.string())]),
        right_schema=pa.schema([("w", pa.string())])).count()
    n_union = n_a + n_b - n_inter

    return pa.table({
        "n_union_exact": pa.array([int(n_union)], pa.int64()),
        "n_inter_exact": pa.array([int(n_inter)], pa.int64()),
        "union_within_3pct": pa.array(
            [abs(r["est_union"] - n_union) <= max(1.0, 0.03 * n_union)],
            pa.bool_()),
        "inter_within_5pct_of_union": pa.array(
            [abs(r["est_intersection"] - n_inter) <= max(1.0, 0.05 * n_union)],
            pa.bool_()),
        "jaccard_within_5pct": pa.array(
            [abs(r["jaccard"] - (n_inter / n_union if n_union else 0.0))
             <= 0.05], pa.bool_()),
    })


def q_fuzzy_name_pairs(sf_dir: str):
    """Edit-distance near-dup pairs (stages/fuzzy.fuzzy_pairs): distinct
    part names within Levenshtein ≤ 2, with the id-pair multiplicity
    each match represents. SymSpell deletion-neighbourhood blocking
    (recall-exact for the threshold) + ONE grouped exchange + vectorized
    DP verify; the oracle brute-forces levenshtein over the distinct-name
    cross join (64 names at sf0.01 — tractable ONLY because the operator
    semantics are defined on distinct values, which is also what makes
    it 100 TB-safe: the corpus contributes one groupby-count)."""
    from .stages.fuzzy import fuzzy_pairs

    parts = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
    pairs = fuzzy_pairs(parts, "p_name", max_dist=2)
    return pairs.map_batches(
        lambda t: pa.table({
            "name_a": t["name_a"],
            "name_b": t["name_b"],
            "dist": t["dist"],
            "n_id_pairs": pc.multiply(t["cnt_a"], t["cnt_b"]),
        }),
        batch_format="pyarrow")


def q_fuzzy_token_match(sf_dir: str):
    """Spell-correction join (stages/fuzzy.fuzzy_match_lookup): each
    part's leading token matched to its nearest entry of a broadcast
    dictionary within Levenshtein ≤ 1 (ties → lexicographic smallest);
    'old'→'cold' is the planted correction, 'hot'/'large' stay null.
    Oracle replays the rule with DuckDB levenshtein + ROW_NUMBER."""
    from .stages.fuzzy import fuzzy_match_lookup

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name"])

    def first_tok(t: pa.Table) -> pa.Table:
        toks = pc.list_element(pc.split_pattern(t["p_name"], " "), 0)
        return pa.table({"p_partkey": t["p_partkey"], "tok": toks})

    ds = parts.map_batches(first_tok, batch_format="pyarrow")
    return fuzzy_match_lookup(
        ds, "tok", ["red", "blue", "cold", "small", "new"], max_dist=1)


def q_stored_quantiles_check(sf_dir: str):
    """Persisted HDR store (stages/sketch.save_hdr_increment /
    stored_quantiles): the n_chars distribution lands in TWO increments
    (doc_id parity); the merged quantiles equal the one-shot sketch
    exactly (histograms ADD) and therefore share approx_quantiles'
    bit-exact hdr-edge oracle verbatim — the quantile member of the
    persisted-store family (HLL=distinct, stats=sum/count,
    HDR=distribution)."""
    import os

    from .stages.sketch import save_hdr_increment, stored_quantiles

    store = _tmp_cache("hdr_store", sf_dir)
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
        for mod in (0, 1):
            part = docs.map_batches(
                lambda t, m=mod: t.filter(
                    pc.equal(_pc_mod(t["doc_id"], 2), m)),
                batch_format="pyarrow")
            save_hdr_increment(part, "n_chars", store)
        with open(os.path.join(store, "_SUCCESS"), "w"):
            pass

    edges = stored_quantiles(store, [0.25, 0.5, 0.75, 0.95])
    return pa.table({
        name: pa.array([v], pa.int64())
        for name, v in zip(["p25", "p50", "p75", "p95"], edges)
    })


def q_events_hourly_store(sf_dir: str):
    """Materialized-view maintenance (stages/statstore): the hourly
    event counters land in TWO increments (event_id parity split) of
    grouped partials on parquet; the merged view is one tiny additive
    groupby over partial rows — the events are never re-read — and
    EXACTLY equals the one-shot events_hourly aggregate, whose oracle
    it shares verbatim (the bm25_index_topk pattern for stats)."""
    import os

    from .stages.statstore import save_stats_increment, stored_stats

    store = _tmp_cache("stats_store", sf_dir)
    if not os.path.exists(os.path.join(store, "_SUCCESS")):
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "event_type", "ts",
                                      "value"])

        def prep(mod):
            def f(t: pa.Table) -> pa.Table:
                sel = t.filter(pc.equal(_pc_mod(t["event_id"], 2), mod))
                w = pc.floor_temporal(sel["ts"], unit="hour")
                return pa.table({"event_type": sel["event_type"],
                                 "window_start": w,
                                 "value": sel["value"]})
            return f

        for mod in (0, 1):
            save_stats_increment(
                ev.map_batches(prep(mod), batch_format="pyarrow"), store,
                ["event_type", "window_start"], "value")
        with open(os.path.join(store, "_SUCCESS"), "w"):
            pass

    merged = stored_stats(store, ["event_type", "window_start"])
    return _round_cols(merged, {"sum_value": 2})


def q_brand_revenue(sf_dir: str):
    """Fact × dimension through the ADAPTIVE join (ops/joins.auto_join):
    the part table measures under the broadcast bound, so the plan is
    the zero-exchange broadcast join (put once, vectorized index_in per
    batch) — the 100 TB dimension-table hot path — followed by a narrow
    grouped revenue sum. Above the bound the same call becomes the
    armored partitioned hash join (equivalence pinned in tests)."""
    from .ops.joins import auto_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"])
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    joined = auto_join(li, part, on="l_partkey", right_on="p_partkey")

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"p_brand": t["p_brand"], "rev": r})

    agg = (joined.map_batches(rev, batch_format="pyarrow")
           .groupby("p_brand").aggregate(Sum("rev", alias_name="revenue")))
    return _round_cols(agg, {"revenue": 2})


def q_join_cardinality(sf_dir: str):
    """Exact join-size estimation WITHOUT the join (ops/estimate.
    join_cardinality): |orders ⋈ lineitem| from the two per-key count
    histograms — two narrow aggregate exchanges + a broadcast
    multiply — the planner question ('how big would this join be')
    answered at a fraction of the join's cost. Oracle computes the same
    Σ c_L(k)·c_R(k) in SQL; also equals COUNT(*) of the actual join."""
    from .ops.estimate import join_cardinality

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])
    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])
    n = join_cardinality(orders, lineitem, on="o_orderkey",
                         right_on="l_orderkey")
    return pa.table({"n_join_rows": pa.array([n], pa.int64())})


def q_csv_roundtrip(sf_dir: str):
    """CSV source end-to-end (io/export.read_csv + Dataset.write_csv):
    same integrity pattern as jsonl_roundtrip/warc_roundtrip — the
    oracle recomputes char count + md5 from parquet, so quoting,
    embedded-newline or unicode drift in the CSV path hash-mismatches."""
    import hashlib as _hl
    import os

    from .io.export import read_csv

    out = _tmp_cache("csv_src", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
        docs.write_csv(out)
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass

    files = [os.path.join(out, f) for f in sorted(os.listdir(out))
             if f.endswith(".csv")]
    ds = read_csv(files)

    def integrity(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_chars_roundtrip": pa.array(
                [len(x or "") for x in texts], pa.int64()),
            "text_md5": pa.array(
                [_hl.md5((x or "").encode("utf-8")).hexdigest()
                 for x in texts], pa.string()),
        })

    return ds.map_batches(integrity, batch_format="pyarrow")


def q_grouped_quantiles_approx(sf_dir: str):
    """Per-language HDR quantiles of n_chars (stages/sketch.
    grouped_approx_quantiles): the skew-immune scale path — one fixed
    32 KiB histogram per group×block shuffles, never values; integer-
    exact monotone bucketing makes the approximation BIT-EXACT equal to
    SQL quantile_disc over the hdr edge expression per group (the
    approx_quantiles property, grouped)."""
    from .stages.sketch import grouped_approx_quantiles

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "n_chars"])
    return grouped_approx_quantiles(docs, "lang", "n_chars",
                                    [0.25, 0.5, 0.75],
                                    ["p25", "p50", "p75"])


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL interchange end-to-end (io/export.write_jsonl/read_jsonl):
    documents → Ray's file-per-block JSONL sink → parallel JSONL source
    → per-doc integrity row (char count + md5 of the roundtripped
    text). The oracle recomputes both from the parquet table, so any
    escaping/unicode/newline drift in the JSON path hash-mismatches —
    the warc_roundtrip pattern for the training-data interchange
    format."""
    import hashlib as _hl
    import os

    from .io.export import read_jsonl, write_jsonl

    out = _tmp_cache("jsonl_src", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
        write_jsonl(docs, out)
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass

    files = [os.path.join(out, f) for f in sorted(os.listdir(out))
             if f.endswith(".json")]
    ds = read_jsonl(files)

    def integrity(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_chars_roundtrip": pc.cast(pc.utf8_length(t["text"]),
                                         pa.int64()),
            "text_md5": pa.array(
                [_hl.md5((x or "").encode("utf-8")).hexdigest()
                 for x in t["text"].to_pylist()], pa.string()),
        })

    return ds.map_batches(integrity, batch_format="pyarrow")


def q_fuzzy_keep_list(sf_dir: str):
    """End-to-end ENTITY RESOLUTION: fuzzy edit-distance pairs →
    connected components → one canonical name per cluster — the fuzzy
    family plugged into the same clustering machinery the MinHash
    keep-list uses (stages/dedup.cluster_pairs/keep_list, which
    preserve string ids). Oracle: the levenshtein edge set + the
    recursive-CTE transitive closure, LEAST/MIN on VARCHAR."""
    from .stages.dedup import cluster_pairs, keep_list
    from .stages.fuzzy import fuzzy_pairs

    parts = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
    pairs = fuzzy_pairs(parts, "p_name", max_dist=2).map_batches(
        lambda t: pa.table({"id_a": t["name_a"], "id_b": t["name_b"]}),
        batch_format="pyarrow")
    return keep_list(cluster_pairs(pairs))


def q_lang_pivot(sf_dir: str):
    """Crosstab (ops/pivot.pivot_counts): docs per source × language as
    a wide table — ONE finest (source, lang) aggregate exchange, then a
    fixed-category widen per source group (static schema is what makes
    a distributed pivot possible). Oracle is the CASE-sum formulation."""
    from .ops.pivot import pivot_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "lang"])
    return pivot_counts(docs, "source", "lang",
                        ["de", "en", "es", "fr", "zh"], out_prefix="n_")


def q_temperature_sample(sf_dir: str):
    """Temperature (alpha=0.5) rebalancing sample (ops/sample.
    temperature_sample): per-language keep rates sqrt(c_min/c_g), the
    smallest language keeps everything, head languages thin toward
    count^0.5 mass. The EXACT kept set is SQL-replicable because the
    rate chain is div→sqrt→mul→trunc — all IEEE correctly-rounded ops,
    bit-identical across numpy/CPython/DuckDB (pow/ln would not be) —
    and the coin is the shared md5-hex Bernoulli."""
    from .ops.sample import temperature_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    out, _rates = temperature_sample(docs, "lang", "doc_id", alpha=0.5)
    return out


def q_purchase_funnel(sf_dir: str):
    """Ordered funnel (ops/funnel.funnel_counts): users reaching each of
    view → click → purchase under the strict first-occurrence cascade —
    one (user) hash exchange + per-user sorted scan; the oracle is the
    cascade-CTE formulation (MIN-ts chain with strict >)."""
    from .ops.funnel import funnel_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel_counts(ds, "user_id", "ts", "event_type",
                         ["view", "click", "purchase"])


def q_event_transitions(sf_dir: str):
    """Markov transition counts (ops/funnel.event_transitions): adjacent
    event-type pairs per user ordered by (ts, event_id) — exactly SQL's
    lag() window aggregated; per-user partials mean the final exchange
    carries (prev, next, n) triples, never rows."""
    from .ops.funnel import event_transitions

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type", "event_id"])
    return event_transitions(ds, "user_id", "ts", "event_type", "event_id")


def q_hourly_retention(sf_dir: str):
    """Cohort retention (ops/retention.cohort_retention): distinct
    hourly actives and how many return the NEXT hour — restated
    join-free as two-sided presence detection under ONE (user, window)
    hash exchange (the textbook self-join's build side is the whole
    activity table; here nothing is built and hot users only skew their
    own groups). Oracle is the LEFT-JOIN formulation in DuckDB."""
    from .ops.retention import cohort_retention

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return cohort_retention(ds, "user_id", "ts", unit="hour")


def q_length_quartiles(sf_dir: str):
    """Global quantile-bucket labeling (ops/quantiles.quantile_bucket):
    each doc tagged with its corpus-wide n_chars quartile — VALUE-edge
    ntile with the pinned stay-low tie rule (bucket = 1 + |edges <
    value|), edges from the exact discrete-quantile machinery
    (value-count compression, rows never sort). Oracle recomputes the
    edges with DuckDB quantile_disc and replays the comparison rule."""
    from .ops.quantiles import quantile_bucket

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    return quantile_bucket(docs, "n_chars", 4)


def q_rollup_revenue(sf_dir: str):
    """Multi-level subtotal report (ops/rollup.rollup_sum): revenue by
    (l_returnflag, l_linestatus) with per-flag subtotals and a grand
    total in ONE result — the corpus is scanned and shuffled exactly
    once (finest groupby); coarser levels re-aggregate the tiny finest
    result. Oracle is DuckDB's native GROUP BY ROLLUP; both sides round
    the sum to 2 decimals (established float-sum rule)."""
    from .ops.rollup import rollup_sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice",
                 "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "l_linestatus": t["l_linestatus"],
                         "rev": rev})

    rolled = rollup_sum(ds.map_batches(add_rev, batch_format="pyarrow"),
                        ["l_returnflag", "l_linestatus"], "rev", "revenue")
    return _round_cols(rolled, {"revenue": 2})


def q_fuzzy_index_match(sf_dir: str):
    """Persisted-SymSpell-index probe (stages/fuzzy.fuzzy_match_index):
    the dictionary lands in TWO append-only increments on parquet; the
    part leading tokens probe the stored deletion neighbourhood
    (read-only — old increments are never re-expanded); the
    driver-small distinct-match report maps back over the rows to
    reproduce fuzzy_token_match's output EXACTLY, so it shares that
    oracle verbatim (the bm25_index_topk pattern)."""
    import os

    from .stages.fuzzy import (build_fuzzy_index, fuzzy_index_add,
                               fuzzy_match_index)

    idx = _tmp_cache("fuzzy_idx", sf_dir)
    if not os.path.exists(os.path.join(idx, "_SUCCESS")):
        build_fuzzy_index(
            rd.from_items([{"word": "red"}, {"word": "blue"}]), idx,
            max_dist=1)
        fuzzy_index_add(
            rd.from_items([{"word": w} for w in ("cold", "small", "new")]),
            idx, max_dist=1)
        with open(os.path.join(idx, "_SUCCESS"), "w"):
            pass

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name"])

    def first_tok(t: pa.Table) -> pa.Table:
        toks = pc.list_element(pc.split_pattern(t["p_name"], " "), 0)
        return pa.table({"p_partkey": t["p_partkey"], "tok": toks})

    toks = parts.map_batches(first_tok, batch_format="pyarrow")
    matches = {r["value"]: (r["match"], int(r["match_dist"]))
               for r in fuzzy_match_index(toks, "tok", idx,
                                          max_dist=1).take_all()}

    def map_back(t: pa.Table) -> pa.Table:
        ms = [matches.get(x, (None, -1)) for x in t["tok"].to_pylist()]
        return t.append_column(
            "tok_match", pa.array([m[0] for m in ms], pa.string()),
        ).append_column(
            "tok_match_dist", pa.array([m[1] for m in ms], pa.int64()))

    return toks.map_batches(map_back, batch_format="pyarrow")


def q_weighted_sample_docs(sf_dir: str):
    """Weighted-without-replacement corpus sample (ops/sample.
    weighted_bottomk_sample — Efraimidis–Spirakis with the max-of-w-md5
    key): quality-tier weights 1..4 derived from doc_id, exactly 100
    winners; scatter-gather top-k, no corpus sort. The oracle replays
    the identical priority in SQL (list_max over range(w) md5 draws) —
    bit-exact hex, no float libm at the rank-k boundary."""
    from .ops.sample import weighted_bottomk_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    weighted = docs.map_batches(
        lambda t: t.append_column(
            "weight", pc.add(_pc_mod(t["doc_id"], 4), pa.scalar(1, pa.int64()))),
        batch_format="pyarrow")
    return weighted_bottomk_sample(weighted, "doc_id", "weight", k=100)


def q_grouped_distinct_check(sf_dir: str):
    """Band oracle for hll_distinct_by_group — the COUNT(DISTINCT) GROUP
    BY scale path: per-language word-distinct estimates (one 16 KiB
    register row per group×block shuffles, never the words) checked
    within ±2.5% of the exact counts, which are recomputed DISTRIBUTED
    on the Ray side (distinct (lang, word) exchange) and in SQL on the
    oracle side; only the 5-row per-language report reaches the driver."""
    from ray.data.aggregate import Count as _Count

    from .stages.sketch import hll_distinct_by_group

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])
    words_fn = lambda t: [w for x in t["text"].to_pylist()  # noqa: E731
                          for w in (x or "").split()]
    est = {r["lang"]: r["est_distinct"]
           for r in hll_distinct_by_group(docs, "lang", words_fn).take_all()}

    def explode(t: pa.Table) -> pa.Table:
        langs, ws = [], []
        for lang, x in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for w in set((x or "").split()):
                langs.append(lang)
                ws.append(w)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "w": pa.array(ws, pa.string())})

    exact = (docs.map_batches(explode, batch_format="pyarrow")
             .groupby(["lang", "w"]).aggregate(_Count(alias_name="c"))
             .groupby("lang").aggregate(_Count(alias_name="n_distinct_exact"))
             .take_all())
    langs = sorted(r["lang"] for r in exact)
    nx = {r["lang"]: r["n_distinct_exact"] for r in exact}
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_distinct_exact": pa.array([int(nx[g]) for g in langs], pa.int64()),
        "within_2p5pct": pa.array(
            [abs(est[g] - nx[g]) <= max(2.0, 0.025 * nx[g]) for g in langs],
            pa.bool_()),
    })


def q_winnow_clone_pairs(sf_dir: str):
    """MOSS clone report (stages/winnow.winnow_clone_pairs): document
    pairs sharing ≥2 distinct winnowing fingerprints, common
    fingerprints (shared by >10 docs) pruned. One narrow (fp, doc)
    groupby + one partition-grouped pair exchange + one pair-count
    groupby — text never shuffles."""
    from .stages.winnow import winnow_clone_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return winnow_clone_pairs(docs, k=3, w=4, min_shared=2, max_fp_docs=10)


def q_phrase_search(sf_dir: str):
    """Exact-phrase retrieval (stages/search.phrase_search) for
    'big order scan': positional alignment intersection — phrase-term
    occurrences only enter the exchange, two narrow groupbys on the
    doc-id key family."""
    from .stages.search import phrase_search

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return phrase_search(docs, ["big", "order", "scan"])


def q_chunk_documents(sf_dir: str):
    """RAG token-window chunking (stages/chunking.py): 128-token
    windows at stride 64 (50% overlap) — shuffle-free flat-map, window
    rule reproduced in SQL via range + list_slice."""
    from .stages.chunking import chunk_documents

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return chunk_documents(docs, chunk_tokens=128, stride=64)


def q_collocations_pmi(sf_dir: str):
    """Top-30 PMI collocations (stages/keywords.collocations_pmi,
    min_count=3): distributed distinct-gram counting (the bigram-LM
    pass), vocabulary-sized driver math; the PMI ln-chain is written
    in the same left-associated order both engines evaluate, so
    ranking by the rounded value is exact."""
    from .stages.keywords import collocations_pmi

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return collocations_pmi(docs, k=30, min_count=3)


def q_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment (ops/sample.split_assign,
    90/5/5): md5(id:salt) first-8-hex against cumulative hex-literal
    thresholds — zero shuffles, stable under repartitioning/retries,
    string-compare = numeric-compare so the SQL oracle is exact."""
    from .ops.sample import split_assign

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return split_assign(ds, "doc_id")


def q_corpus_drift(sf_dir: str):
    """Corpus drift monitor (stages/dsir.corpus_drift): KL(new‖old) +
    total variation between the even-doc and odd-doc halves' hashed-gram
    multinomials — two streaming count passes, (bucket,count) ints in
    the shuffle, 65k-vector math on the driver."""
    from .stages.dsir import corpus_drift

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def half(parity: int):
        def _h(t: pa.Table) -> pa.Table:
            i = np.asarray(t["doc_id"], np.int64)
            return t.filter(pa.array(i % 2 == parity))
        return _h

    old = docs.map_batches(half(0), batch_format="pyarrow")
    new = docs.map_batches(half(1), batch_format="pyarrow")
    return corpus_drift(old, new)


def q_snapshot_diff(sf_dir: str):
    """Crawl snapshot diff (ops/snapshot.py): old = docs with
    doc_id%5≠0, new = docs with doc_id%7≠0 whose %3==0 members changed
    content — classify every url as added/removed/changed in ONE
    tagged-union exchange (only url+md5 digest move; unchanged urls,
    the crawl-scale majority, never leave the partition)."""
    import hashlib

    from .ops.snapshot import snapshot_diff

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def side(keep_mod: int, bump_v2: bool):
        def _s(t: pa.Table) -> pa.Table:
            i = np.asarray(t["doc_id"], np.int64)
            keep = i % keep_mod != 0
            i = i[keep]
            texts = np.array(t["text"].to_pylist(), dtype=object)[keep]
            dig = [hashlib.md5(
                       (x + ("v2" if bump_v2 and d % 3 == 0 else "")).encode()
                   ).hexdigest()
                   for d, x in zip(i, texts)]
            return pa.table({
                "url": pa.array([f"u{d}" for d in i], pa.string()),
                "digest": pa.array(dig, pa.string()),
            })
        return _s

    old = docs.map_batches(side(5, False), batch_format="pyarrow")
    new = docs.map_batches(side(7, True), batch_format="pyarrow")
    return snapshot_diff(old, new)


def q_recrawl_priority(sf_dir: str):
    """Recrawl scheduling over a 6-snapshot observation history
    (ops/snapshot.recrawl_priority): per-url change rate between
    consecutive OBSERVED appearances → integer-exact priority buckets
    (new/hot/warm/cold). The history is planted by doc-id arithmetic —
    url present in snapshot s iff (doc_id+s)%7≠0 (gaps included),
    digest = (doc_id·31+s)//3 so change cadence varies per url — and
    DuckDB reconstructs the identical observations, LAGs per url and
    applies the same permille thresholds. One partition-grouped
    exchange over (url, snap, digest) rows; payload-free by shape."""
    from .ops.snapshot import recrawl_priority

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    n_snaps = 6

    def observations(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.arange(n_snaps, dtype=np.int64)
        did = np.repeat(ids, n_snaps)
        snap = np.tile(s, len(ids))
        keep = (did + snap) % 7 != 0
        did, snap = did[keep], snap[keep]
        dig = (did * 31 + snap) // 3
        return pa.table({
            "url": pa.array([f"u{d}" for d in did], pa.string()),
            "snap": pa.array(snap, pa.int64()),
            "digest": pa.array([str(v) for v in dig], pa.string()),
        })

    obs = docs.map_batches(observations, batch_format="pyarrow")
    return recrawl_priority(obs)


def q_tfidf_keywords(sf_dir: str):
    """Top-5 TF-IDF keywords per doc (stages/keywords.py): distributed
    document-frequency model (one distinct-term exchange) broadcast
    via ray.put, per-batch lexsort tf runs, score = tf·ln(N/df) — ONE
    double product both engines derive identically, so ranking is
    bit-stable with no pre-rank rounding; ties resolve by term."""
    from .stages.keywords import tfidf_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return tfidf_topk(docs, k=5)


def q_triangle_counts(sf_dir: str):
    """Per-vertex triangle counts (ops/triangles.py): degree-ordered
    wedge counting over a planted mixed graph (i→i+1 chain, i→i+2
    skip, i→2i doubling, all mod N — ~510 triangles at N=500).
    Integer counts end-to-end; oracle = canonical a<b self-join."""
    from .ops.triangles import triangle_counts

    nodes = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = nodes.count()

    def mk_edges(t: pa.Table) -> pa.Table:
        i = np.asarray(t["doc_id"], np.int64)
        src = np.concatenate([i, i, i])
        dst = np.concatenate([(i + 1) % n, (i + 2) % n, (i * 2) % n])
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        })

    edges = nodes.map_batches(mk_edges, batch_format="pyarrow")
    # contiguous ids → broadcast fast path (the join path is the
    # >2M-edge shape; both asserted equal in tests)
    return triangle_counts(nodes, edges, node_col="doc_id", dense_ids=True)


def q_dsir_select(sf_dir: str):
    """DSIR importance resampling (stages/dsir.py, Xie et al. 2023):
    target model = the doc_id%7==0 slice, raw model = the whole corpus,
    hashed unigram+bigram features (md5 last-4-hex buckets, 16^4
    space), add-1 smoothed log-ratio weights rounded to 3 decimals,
    top-50 by (lw DESC, doc_id). Two narrow bucket-count exchanges
    (≤65k distinct int keys each) + one broadcast scoring pass + a
    per-block top-k prune — the corpus text never shuffles."""
    from .stages.dsir import dsir_select

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def tgt(t: pa.Table) -> pa.Table:
        i = np.asarray(t["doc_id"], np.int64)
        return t.filter(pa.array(i % 7 == 0))

    target = docs.map_batches(tgt, batch_format="pyarrow")
    return dsir_select(docs, target, k=50)


def q_hits(sf_dir: str):
    """Distributed HITS hubs & authorities (ops/hits.py), 4 alternating
    integer rounds over the same planted 3-out-link doc_id graph as
    q_pagerank — except the first map is QUADRATIC ((i²+1) mod N, not a
    bijection), so indegrees vary and hub/authority scores genuinely
    differ across nodes. Normalization-free formulation keeps scores
    int64 end-to-end — bit-exact vs the unrolled-CTE oracle with no
    float rounding at all. Contiguous ids → dense broadcast fast path
    (the join path is the >2M-node shape; both asserted equal in
    tests)."""
    from .ops.hits import hits

    nodes = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = nodes.count()

    def mk_edges(t: pa.Table) -> pa.Table:
        i = np.asarray(t["doc_id"], np.int64)
        src = np.concatenate([i, i, i])
        dst = np.concatenate([(i * i + 1) % n, (i * 11 + 3) % n, (i * 13 + 5) % n])
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        })

    edges = nodes.map_batches(mk_edges, batch_format="pyarrow")
    return hits(nodes, edges, node_col="doc_id", iters=4, dense_ids=True)


_PR_ROUNDS = "".join(
    f""",
        r{i} AS (SELECT d.doc_id AS node,
                   0.15/(SELECT n FROM nn)
                   + 0.85*COALESCE(SUM(r{i-1}.r/ew.od), 0) AS r
                 FROM documents d
                 LEFT JOIN ew ON ew.dst = d.doc_id
                 LEFT JOIN r{i-1} ON r{i-1}.node = ew.src
                 GROUP BY d.doc_id)"""
    for i in range(1, 6)
)

# HITS rounds: integer sums only — CAST each round back to BIGINT
# (DuckDB SUM(int) widens to HUGEINT) so types stay int64 like Ray's
_HITS_ROUNDS = "".join(
    f""",
        a{i} AS (SELECT d.doc_id AS node,
                   CAST(COALESCE(SUM(h{i-1}.s), 0) AS BIGINT) AS s
                 FROM documents d
                 LEFT JOIN edges e ON e.dst = d.doc_id
                 LEFT JOIN h{i-1} ON h{i-1}.node = e.src
                 GROUP BY d.doc_id),
        h{i} AS (SELECT d.doc_id AS node,
                   CAST(COALESCE(SUM(a{i}.s), 0) AS BIGINT) AS s
                 FROM documents d
                 LEFT JOIN edges e ON e.src = d.doc_id
                 LEFT JOIN a{i} ON a{i}.node = e.dst
                 GROUP BY d.doc_id)"""
    for i in range(1, 5)
)

# winnowing selection CTEs shared by winnow_fingerprints and
# winnow_clone_pairs (k=3 token grams, window w=4)
_WINNOW_CTE = r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        g AS (SELECT doc_id, len(w) - 2 AS ng,
                     unnest(range(GREATEST(len(w) - 2, 0))) AS j, w
              FROM toks),
        gr AS (SELECT doc_id, ng, j,
                 substr(md5(array_to_string(list_slice(w, j+1, j+3), ' ')), 1, 8)
                 || printf('%08d', j) AS pk
               FROM g),
        wm AS (SELECT doc_id, ng, j,
                 MIN(pk) OVER (PARTITION BY doc_id ORDER BY j
                               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mpk
               FROM gr),
        sel AS (SELECT DISTINCT doc_id, mpk FROM wm
                WHERE j >= LEAST(4, ng) - 1)
"""

# bigram-LM scoring CTEs shared by lm_perplexity and ccnet_buckets:
# train on doc_id%3<>0, score every doc's consecutive-token bigrams
_LM_SCORED_CTE = r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        tr AS (SELECT * FROM toks WHERE doc_id % 3 <> 0),
        ucnt AS (SELECT g, COUNT(*) AS c
                 FROM (SELECT unnest(w) AS g FROM tr) GROUP BY g),
        vv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM ucnt),
        tb AS (SELECT unnest(list_transform(range(len(w)-1),
                        j -> {'w1': w[j+1], 'w2': w[j+2]})) AS bg FROM tr),
        bcnt AS (SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS c
                 FROM tb GROUP BY 1, 2),
        sb AS (SELECT doc_id, unnest(list_transform(range(len(w)-1),
                        j -> {'w1': w[j+1], 'w2': w[j+2]})) AS bg FROM toks),
        scored AS (
          SELECT s.doc_id, COUNT(*) AS n_bigrams,
                 SUM(ln(COALESCE(bc.c, 0) + 0.5)
                     - ln(COALESCE(uc.c, 0) + 0.5 * (SELECT v FROM vv))) AS lp
          FROM sb s
          LEFT JOIN bcnt bc ON bc.w1 = s.bg.w1 AND bc.w2 = s.bg.w2
          LEFT JOIN ucnt uc ON uc.g = s.bg.w1
          GROUP BY s.doc_id)
"""


def q_grouped_bottomk_sample(sf_dir: str):
    """Exactly-8-per-language deterministic sample
    (ops/sample.grouped_bottomk_sample): per-block per-group bottom-k
    prune, then one group-key shuffle of k×blocks rows."""
    from .ops.sample import grouped_bottomk_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return grouped_bottomk_sample(ds, "lang", "doc_id", k=8)


def q_bm25_topk(sf_dir: str):
    """Lexical retrieval (stages/search.py): Okapi BM25 top-10 for a
    fixed 3-term query over inverted postings — postings pruned to
    query terms before any shuffle, idf table driver-bounded by |query|,
    scatter-gather top-k. Scores rounded to 4 decimals pre-ranking on
    both sides."""
    from .stages.search import bm25_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bm25_topk(ds, ["vector", "hash", "stream"], k=10)


def q_bm25_index_topk(sf_dir: str):
    """BM25 against the PERSISTED inverted index (stages/search
    build_text_index / text_index_add / bm25_search_index), built in TWO
    append-only increments (doc_id parity split) to exercise the
    incremental merge: stats and per-term df partials combine at search
    time, so scores must equal bm25_topk over the union corpus — and
    they share its oracle. Only the query terms' hash buckets are
    listed/read at search; corpus text is never touched. Index cached
    per sf under /tmp."""
    import os

    from .stages.search import bm25_search_index, text_index_add

    idx = _tmp_cache("text_index", sf_dir)
    marker = os.path.join(idx, "_SUCCESS")
    if not os.path.exists(marker):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        for parity in (0, 1):
            text_index_add(
                docs.map_batches(
                    lambda t, p=parity: t.filter(pc.equal(
                        pc.bit_wise_and(t["doc_id"], 1), p)),
                    batch_format="pyarrow"),
                idx)
        with open(marker, "w"):
            pass
    return bm25_search_index(idx, ["vector", "hash", "stream"], k=10)


def q_lm_perplexity(sf_dir: str):
    """CCNet-style LM quality scoring (stages/lm.py): train an
    add-0.5-smoothed bigram LM on the held-in 2/3 of the corpus
    (doc_id % 3 != 0), score EVERY doc's perplexity — held-out docs
    exercise the OOV/smoothing path. Model counts shuffle as distinct
    grams only; scoring is two searchsorted passes per batch."""
    from .stages.lm import perplexity_score, train_bigram_lm

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def held_in(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(np.asarray(t["doc_id"]) % 3 != 0))

    model = train_bigram_lm(ds.map_batches(held_in, batch_format="pyarrow"))
    return perplexity_score(ds, model)


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail bucketing (stages/lm.py ccnet_buckets):
    the deployment step after LM scoring — every doc bucketed by its
    perplexity's position within its own language (p25/p75 discrete
    quantiles, lower ppl = head). Same held-in-2/3 training split as
    q_lm_perplexity; threshold table is O(#langs) and re-broadcasts."""
    from .stages.lm import ccnet_buckets, train_bigram_lm

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def held_in(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(np.asarray(t["doc_id"]) % 3 != 0))

    model = train_bigram_lm(
        ds.select_columns(["doc_id", "text"])
        .map_batches(held_in, batch_format="pyarrow"))
    return ccnet_buckets(ds, model)


def q_grouped_quantiles(sf_dir: str):
    """Exact per-language length quantiles (ops/quantiles.py): the
    threshold-setting stat for curation filters. Value-count compression
    keeps the shuffle at distinct-(lang, n_chars) pairs, never rows;
    discrete-quantile rule pinned to DuckDB's quantile_disc."""
    from .ops.quantiles import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    return grouped_quantiles(ds, "lang", "n_chars", [0.25, 0.5, 0.75, 0.95])


_KM_K, _KM_ITERS, _KM_R = 8, 3, 6


def q_grouped_zscore(sf_dir: str):
    """Per-language z-score of document length (ops/normalize.py):
    narrow count/sum/sumsq aggregate → O(groups) broadcast → streaming
    normalize; integer sums keep the mean/var derivation bit-exact vs
    the SQL oracle's identical expression."""
    from .ops.normalize import grouped_zscore

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    return grouped_zscore(ds, "lang", "n_chars")


def q_mixture_sample(sf_dir: str):
    """Deterministic domain-reweighted mixture (ops/sample.
    weighted_mixture_sample): source srcN keeps rows at rate
    ((N%4)+1)/4 via md5 hash coins — one streaming filter, no shuffle,
    no RNG state; hex-literal thresholds make it SQL-reproducible."""
    from .ops.sample import weighted_mixture_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    weights = {f"src{i}": ((i % 4) + 1) / 4 for i in range(20)}
    return weighted_mixture_sample(ds, "source", "doc_id", weights)


def q_shard_shuffle(sf_dir: str):
    """Deterministic global shuffle → training-shard manifest
    (ops/shard.py): shard_id = md5 hash-assign (streaming, ZERO
    shuffle), shard_pos = within-shard md5-priority rank (ONE hash
    exchange on shard_id, per-shard local sort). Replaces the 100 TB
    global sort with num_shards independent small sorts; exactly
    SQL-reproducible, unlike engine-RNG random_shuffle."""
    from .ops.shard import shard_positions

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return shard_positions(ds, "doc_id", num_shards=8)


_BPE_MERGES = 6


def q_bpe_merges(sf_dir: str):
    """Distributed BPE merge learning (stages/bpe.py, Sennrich 2016):
    ONE corpus scan → Heaps-compressed vocab table; each merge round
    shuffles only distinct (pair, count) partials and applies the merge
    as a streaming string replace. Canonical wrapped-symbol state makes
    Python str.replace and SQL replace() the identical merge operator,
    so the whole training run oracles as unrolled CTE rounds."""
    from .stages.bpe import learn_bpe, word_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    merges, _ = learn_bpe(word_counts(ds), num_merges=_BPE_MERGES)
    return merges


def q_bpe_token_counts(sf_dir: str):
    """BPE encoding pass (stages/bpe.py): learn _BPE_MERGES merges, then
    ONE streaming encode pass over the corpus with the final
    word→symbol-count vocab broadcast via ray.put (vocab ≪ corpus —
    the small-side-lookup shape, no join shuffle). Returns per-doc
    whitespace-token and BPE-token counts — the sizing stat every
    sequence-packing/budgeting step needs."""
    from .stages.bpe import bpe_token_counts, learn_bpe, word_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    _, state = learn_bpe(word_counts(ds), num_merges=_BPE_MERGES)
    return bpe_token_counts(ds, state)


def q_bpe_encode_ids(sf_dir: str):
    """Token-ID emission (stages/bpe.bpe_encode_ids): learn the merges,
    assign deterministic symbol ids (sorted distinct symbols), emit
    each doc's full id sequence. The gate projects order-SENSITIVE
    evidence — first and last token id per doc — so an ordering bug in
    the per-doc rebuild (not just a count drift) hash-mismatches. The
    full list<int32> column is exercised in pytest (round-trip decode +
    broadcast ≡ distributed)."""
    from .stages.bpe import bpe_encode_ids, learn_bpe, word_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    _, state = learn_bpe(word_counts(ds), num_merges=_BPE_MERGES)
    enc = bpe_encode_ids(ds, state)

    def project(t: pa.Table) -> pa.Table:
        seqs = t["token_ids"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
            "n_bpe_tokens": t["n_bpe_tokens"],
            "first_id": pa.array([int(s[0]) for s in seqs], pa.int64()),
            "last_id": pa.array([int(s[-1]) for s in seqs], pa.int64()),
        })

    return enc.map_batches(project, batch_format="pyarrow")


def _bpe_rounds_sql(num_merges: int) -> str:
    """Unrolled words/v0/p{r}/b{r}/v{r} CTE chain for the BPE oracle."""
    parts = [r"""WITH words AS (
          SELECT token AS word, CAST(SUM(1) AS BIGINT) AS cnt FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents WHERE trim(text) <> ''
          ) t GROUP BY token),
        v0 AS (
          SELECT word, cnt,
                 array_to_string(list_transform(range(1, length(word) + 1),
                   p -> chr(31) || substr(word, p, 1) || chr(31)), ' ') AS s
          FROM words)"""]
    for r in range(1, num_merges + 1):
        parts.append(f""",
        p{r} AS (
          SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c FROM (
            SELECT cnt,
                   unnest(list_transform(syms, (x, i) -> x || ' ' || syms[i + 1])) AS pair
            FROM (SELECT cnt, string_split(s, ' ') AS syms FROM v{r - 1})
          ) WHERE pair IS NOT NULL GROUP BY pair),
        b{r} AS (SELECT pair, c FROM p{r} ORDER BY c DESC, pair LIMIT 1),
        v{r} AS (
          SELECT word, cnt,
                 replace(s, (SELECT pair FROM b{r}),
                         replace((SELECT pair FROM b{r}), chr(31) || ' ' || chr(31), '')) AS s
          FROM v{r - 1})""")
    return "".join(parts)


def _bpe_merges_sql(num_merges: int) -> str:
    sel = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank,"
        f" replace(split_part(pair, ' ', 1), chr(31), '') AS left_sym,"
        f" replace(split_part(pair, ' ', 2), chr(31), '') AS right_sym,"
        f" c AS pair_count FROM b{r}"
        for r in range(1, num_merges + 1))
    return _bpe_rounds_sql(num_merges) + "\n        " + sel


def _bpe_token_counts_sql(num_merges: int) -> str:
    return _bpe_rounds_sql(num_merges) + f""",
        d AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
          FROM documents WHERE trim(text) <> '')
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(len(string_split(v.s, ' '))) AS BIGINT) AS n_bpe_tokens
        FROM d JOIN v{num_merges} v USING (word)
        GROUP BY doc_id"""


def q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means (ops/kmeans.py): k=8, 3 assignment
    rounds over the embeddings table. Centroids broadcast per round,
    corpus never shuffled; partial sums merge in a bounded
    O(blocks·k·d) reduce. Seeding (k smallest ids), pre-argmin distance
    rounding and mean rounding make the fixed-iteration computation
    bit-reproducible in SQL — the oracle unrolls the rounds into
    chained CTEs (the PageRank pattern) with QUALIFY-row_number argmin
    and an unnest-regroup centroid mean."""
    from .ops.kmeans import kmeans_assign

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return kmeans_assign(ds, "vec_id", "embedding",
                         k=_KM_K, iters=_KM_ITERS, round_to=_KM_R)


def _km_rounds_sql() -> str:
    """Unrolled a1/c1/…/a{iters} CTE chain for the k-means oracle."""
    parts = []
    for i in range(1, _KM_ITERS + 1):
        parts.append(f"""
        a{i} AS (
          SELECT e.vec_id, c.cluster,
                 ROUND(list_sum(list_transform(e.v,
                       (x, j) -> (x - c.cent[j]) * (x - c.cent[j]))), {_KM_R}) AS d2
          FROM e CROSS JOIN c{i-1} c
          QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY d2, c.cluster) = 1)""")
        if i < _KM_ITERS:
            parts.append(f"""
        c{i} AS (
          SELECT p.cluster, COALESCE(n.cent, p.cent) AS cent
          FROM c{i-1} p LEFT JOIN (
            SELECT cluster, list(mu ORDER BY dim) AS cent
            FROM (
              SELECT cluster, dim, ROUND(AVG(x), {_KM_R}) AS mu
              FROM (
                SELECT a{i}.cluster AS cluster, unnest(e.v) AS x,
                       unnest(range(1, len(e.v) + 1)) AS dim
                FROM a{i} JOIN e USING (vec_id))
              GROUP BY cluster, dim)
            GROUP BY cluster) n ON n.cluster = p.cluster)""")
    return ",".join(parts)


def _km_prelude(corpus_sql: str = "SELECT vec_id, embedding FROM embeddings") -> str:
    """WITH-chain for the k-means oracle over an arbitrary corpus SQL."""
    return f"""
        WITH corpus AS ({corpus_sql}),
        e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM corpus),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster,
                 v AS cent
          FROM e ORDER BY vec_id LIMIT {_KM_K}),{_km_rounds_sql()}"""


_KM_PRELUDE = _km_prelude()

# the planted near-identical corpus for semantic dedup, ALL-float64:
# the perturbation arithmetic must be bit-identical between numpy and
# DuckDB (k-means distances are exact-compared on the 1e-6 grid), so
# the python side never round-trips through float32 storage
_SEMDEDUP_CORPUS_SQL = """
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 1000000,
                   list_transform(embedding,
                                  (x, i) -> x * (1 + 0.002 * (((vec_id + i) % 5) - 2)))
            FROM embeddings WHERE vec_id % 10 = 0"""


def _emb_with_near_dups_f64(sf_dir: str):
    """embeddings ∪ perturbed copies of every 10th vector, float64 lists
    (python mirror of _SEMDEDUP_CORPUS_SQL)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def widen(t: pa.Table) -> pa.Table:
        ids, base, pert = t["vec_id"].to_pylist(), [], []
        pids = []
        for vid, vec in zip(ids, t["embedding"].to_pylist()):
            base.append([float(x) for x in vec])
            if vid % 10 == 0:
                pids.append(vid + 1_000_000)
                pert.append([float(x) * (1 + 0.002 * (((vid + i + 1) % 5) - 2))
                             for i, x in enumerate(vec)])
        return pa.table({
            "vec_id": pa.array(ids + pids, pa.int64()),
            "embedding": pa.array(base + pert, pa.list_(pa.float64())),
        })

    return ds.map_batches(widen, batch_format="pyarrow")


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (stages/similarity.semantic_dedup): k-means the planted
    near-dup corpus, then smallest-id-wins cosine dedup WITHIN each
    cluster — one cluster-key shuffle instead of all-pairs O(N²).
    Oracle: the k-means CTE chain over the same union corpus + a
    NOT EXISTS smaller-similar-neighbor probe per row."""
    from .stages.similarity import semantic_dedup

    return semantic_dedup(
        _emb_with_near_dups_f64(sf_dir),
        k=_KM_K, iters=_KM_ITERS, threshold=0.9, round_to=_KM_R)


ORACLE_SQL.update({
    "kmeans_clusters": _KM_PRELUDE + f"""
        SELECT vec_id, cluster, d2 AS dist FROM a{_KM_ITERS}
    """,
    "grouped_zscore": """
        WITH s AS (
          SELECT lang, COUNT(*) AS n,
                 CAST(SUM(n_chars) AS BIGINT) AS sm,
                 CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
          FROM documents GROUP BY lang)
        SELECT d.doc_id, d.lang, d.n_chars,
               CASE WHEN (CAST(ss AS DOUBLE)/n
                          - (CAST(sm AS DOUBLE)/n) * (CAST(sm AS DOUBLE)/n)) <= 0
                    THEN 0.0
                    ELSE ROUND((d.n_chars - CAST(sm AS DOUBLE)/n)
                               / sqrt(CAST(ss AS DOUBLE)/n
                                      - (CAST(sm AS DOUBLE)/n) * (CAST(sm AS DOUBLE)/n)),
                               6) END AS z
        FROM documents d JOIN s USING (lang)
    """,
    "mixture_sample": """
        SELECT doc_id, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':mix42'), 1, 8) <
              CASE (CAST(substr(source, 4) AS INT) % 4)
                WHEN 0 THEN '40000000'
                WHEN 1 THEN '80000000'
                WHEN 2 THEN 'c0000000'
                ELSE 'gggggggg' END
    """,
    "bpe_merges": _bpe_merges_sql(_BPE_MERGES),
    "bpe_token_counts": _bpe_token_counts_sql(_BPE_MERGES),
    "bpe_encode_ids": _bpe_rounds_sql(_BPE_MERGES) + f""",
        sid AS (
          SELECT sym,
                 CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS tid
          FROM (SELECT DISTINCT unnest(string_split(s, ' ')) AS sym
                FROM v{_BPE_MERGES})),
        d AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS word,
                 unnest(range(len(regexp_split_to_array(trim(text), '\\s+')))) AS pos
          FROM documents WHERE trim(text) <> ''),
        enc AS (
          SELECT d.doc_id, d.pos, string_split(v.s, ' ') AS syms
          FROM d JOIN v{_BPE_MERGES} v USING (word)),
        stats AS (
          SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(len(syms)) AS BIGINT) AS n_bpe_tokens,
                 arg_min(syms[1], pos) AS first_sym,
                 arg_max(syms[len(syms)], pos) AS last_sym
          FROM enc GROUP BY doc_id)
        SELECT s.doc_id, s.n_tokens, s.n_bpe_tokens,
               f.tid AS first_id, l.tid AS last_id
        FROM stats s
        JOIN sid f ON f.sym = s.first_sym
        JOIN sid l ON l.sym = s.last_sym
    """,
    "shard_shuffle": """
        WITH h AS (
          SELECT doc_id,
                 md5(CAST(doc_id AS VARCHAR) || ':shard42') AS prio,
                 CAST(concat('0x',
                   substr(md5(CAST(doc_id AS VARCHAR) || ':shard42'), 1, 8))
                   AS BIGINT) % 8 AS shard_id
          FROM documents)
        SELECT doc_id, shard_id,
               row_number() OVER (PARTITION BY shard_id
                                  ORDER BY prio, doc_id) - 1 AS shard_pos
        FROM h
    """,
    "semantic_dedup": _km_prelude(_SEMDEDUP_CORPUS_SQL) + f"""
        SELECT a.vec_id, a.cluster,
               NOT EXISTS (
                 SELECT 1 FROM a{_KM_ITERS} b JOIN e eb ON eb.vec_id = b.vec_id
                 WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
                   AND ROUND(list_cosine_similarity(ea.v, eb.v), {_KM_R}) >= 0.9
               ) AS keep
        FROM a{_KM_ITERS} a JOIN e ea ON ea.vec_id = a.vec_id
    """,
    "sequence_pack": r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
          FROM documents WHERE trim(text) <> ''),
        o AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS start_offset
          FROM t)
        SELECT doc_id, n_tokens, start_offset,
               CAST(start_offset // 2048 AS BIGINT) AS first_seq,
               CAST((start_offset + n_tokens - 1) // 2048 AS BIGINT) AS last_seq
        FROM o
    """,
    "approx_quantiles": """
        WITH e AS (
          SELECT CASE WHEN n_chars < 64 THEN n_chars
                 ELSE ((64 | ((n_chars >> (length(printf('%b', n_chars)) - 7)) & 63))
                       << (length(printf('%b', n_chars)) - 7)) END AS edge
          FROM documents)
        SELECT quantile_disc(edge, 0.25) AS p25,
               quantile_disc(edge, 0.50) AS p50,
               quantile_disc(edge, 0.75) AS p75,
               quantile_disc(edge, 0.95) AS p95
        FROM e
    """,
    "pagerank": f"""
        WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        edges AS (
          SELECT doc_id AS src, (doc_id*7+1) % (SELECT n FROM nn) AS dst FROM documents
          UNION ALL
          SELECT doc_id, (doc_id*11+3) % (SELECT n FROM nn) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents),
        od AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
        ew AS (SELECT e.src, e.dst, od.od FROM edges e JOIN od USING (src)),
        r0 AS (SELECT doc_id AS node, 1.0/(SELECT n FROM nn) AS r FROM documents)
        {_PR_ROUNDS}
        SELECT node AS doc_id, ROUND(r, 8) AS pagerank FROM r5
    """,
    "hits": f"""
        WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        edges AS (
          SELECT doc_id AS src, (doc_id*doc_id+1) % (SELECT n FROM nn) AS dst FROM documents
          UNION ALL
          SELECT doc_id, (doc_id*11+3) % (SELECT n FROM nn) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn) FROM documents),
        h0 AS (SELECT doc_id AS node, CAST(1 AS BIGINT) AS s FROM documents)
        {_HITS_ROUNDS}
        SELECT a4.node AS doc_id, a4.s AS auth, h4.s AS hub
        FROM a4 JOIN h4 ON a4.node = h4.node
    """,
    # delta's ln chain written in the EXACT order the numpy expression
    # evaluates (multiplication binds first, then left-assoc +/-)
    "distinctive_terms": r"""
        WITH toks AS (
          SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS word
          FROM documents WHERE trim(text) <> ''),
        c AS (SELECT lang, word, COUNT(*) AS n
              FROM toks GROUP BY lang, word),
        lt AS (SELECT lang, CAST(SUM(n) AS DOUBLE) AS t FROM c GROUP BY lang),
        wt AS (SELECT word, CAST(SUM(n) AS DOUBLE) AS cw FROM c GROUP BY word),
        tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS tt FROM c),
        vv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM wt),
        s AS (
          SELECT c.lang, c.word, CAST(c.n AS BIGINT) AS n,
            ROUND(
              ln(CAST(c.n AS DOUBLE) + 0.01)
              - ln(lt.t + 0.01 * (SELECT v FROM vv)
                   - CAST(c.n AS DOUBLE) - 0.01)
              - ln(wt.cw - CAST(c.n AS DOUBLE) + 0.01)
              + ln((SELECT tt FROM tot) - lt.t + 0.01 * (SELECT v FROM vv)
                   - (wt.cw - CAST(c.n AS DOUBLE)) - 0.01),
              6) AS delta
          FROM c JOIN lt USING (lang) JOIN wt USING (word))
        SELECT lang, word, n, delta FROM s
        QUALIFY row_number() OVER (
            PARTITION BY lang ORDER BY delta DESC, word) <= 5
    """,
    "grouped_top_words": r"""
        WITH toks AS (
          SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS word
          FROM documents WHERE trim(text) <> ''),
        c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
              FROM toks GROUP BY lang, word)
        SELECT lang, word, n FROM c
        QUALIFY row_number() OVER (
            PARTITION BY lang ORDER BY n DESC, word) <= 5
    """,
    "profile_table": " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM documents"""
        for c in ("doc_id", "lang", "source", "n_chars")
    ),
    # winnowing: pk = hash || zero-padded pos, so lexicographic MIN ==
    # min of (hash, leftmost pos); short docs (< w grams) keep their
    # single whole-doc window via the j >= LEAST(w, ng)-1 gate
    "winnow_fingerprints": _WINNOW_CTE + """
        SELECT doc_id, CAST(substr(mpk, 9, 8) AS BIGINT) AS pos,
               substr(mpk, 1, 8) AS fp
        FROM sel
    """,
    "winnow_clone_pairs": _WINNOW_CTE + """
        , fd AS (SELECT DISTINCT doc_id, substr(mpk, 1, 8) AS fp FROM sel),
        ok AS (SELECT fp FROM fd GROUP BY fp
               HAVING COUNT(*) BETWEEN 2 AND 10),
        pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
               FROM fd a
               JOIN fd b ON a.fp = b.fp AND a.doc_id < b.doc_id
               JOIN ok ON ok.fp = a.fp)
        SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM pr GROUP BY id_a, id_b HAVING COUNT(*) >= 2
    """,
    # positional alignment: occurrence of phrase[i] at position p
    # claims start a = p - i; a start with all 3 slots is a match
    "phrase_search": r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        pos AS (SELECT doc_id, unnest(w) AS term,
                       unnest(range(len(w))) AS p FROM toks),
        ph AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'big'),
                                     (1, 'order'), (2, 'scan')) t(i, term)),
        al AS (SELECT pos.doc_id, pos.p - ph.i AS a
               FROM pos JOIN ph ON ph.term = pos.term),
        fullm AS (SELECT doc_id, a FROM al
                  GROUP BY doc_id, a HAVING COUNT(*) = 3)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
        FROM fullm GROUP BY doc_id
    """,
    "chunk_documents": r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        c AS (SELECT doc_id, unnest(range(0, len(w), 64)) AS s, w FROM toks)
        SELECT doc_id,
               CAST(s // 64 AS BIGINT) AS chunk_id,
               CAST(LEAST(len(w) - s, 128) AS BIGINT) AS n_tokens,
               array_to_string(list_slice(w, s + 1, s + 128), ' ') AS chunk_text
        FROM c
    """,
    # PMI ln-chain written in the exact left-associated order the
    # numpy expression evaluates — identical doubles, then ROUND(…,6)
    "collocations_pmi": r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        uni AS (SELECT g, COUNT(*) AS c
                FROM (SELECT unnest(w) AS g FROM toks) GROUP BY g),
        t1 AS (SELECT CAST(SUM(c) AS DOUBLE) AS v FROM uni),
        big AS (SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS c
                FROM (SELECT unnest(list_transform(range(len(w)-1),
                        j -> {'w1': w[j+1], 'w2': w[j+2]})) AS bg FROM toks)
                GROUP BY 1, 2),
        t2 AS (SELECT CAST(SUM(c) AS DOUBLE) AS v FROM big),
        p AS (
          SELECT b.w1, b.w2, CAST(b.c AS BIGINT) AS n,
                 ROUND(ln(CAST(b.c AS DOUBLE)) - ln((SELECT v FROM t2))
                       - ln(CAST(u1.c AS DOUBLE)) + ln((SELECT v FROM t1))
                       - ln(CAST(u2.c AS DOUBLE)) + ln((SELECT v FROM t1)),
                       6) AS pmi
          FROM big b
          JOIN uni u1 ON u1.g = b.w1
          JOIN uni u2 ON u2.g = b.w2
          WHERE b.c >= 3)
        SELECT w1, w2, n, pmi FROM p
        ORDER BY pmi DESC, w1, w2 LIMIT 30
    """,
    # thresholds are the SAME int(frac * 16^8) hex literals split_assign
    # computes; lowercase-hex string compare = numeric compare
    "split_assign": f"""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split42'), 1, 8)
                         < '{format(int(0.9 * 16 ** 8), "08x")}' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split42'), 1, 8)
                         < '{format(int(0.95 * 16 ** 8), "08x")}' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "corpus_drift": r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        g AS (
          SELECT doc_id, unnest(w) AS g FROM toks
          UNION ALL
          SELECT doc_id, unnest(list_transform(range(GREATEST(len(w)-1, 0)),
                          j -> w[j+1] || ' ' || w[j+2])) AS g FROM toks),
        gb AS (SELECT doc_id, substr(md5(g), 29, 4) AS b FROM g),
        ocnt AS (SELECT b, COUNT(*) AS c FROM gb WHERE doc_id % 2 = 0 GROUP BY b),
        ncnt AS (SELECT b, COUNT(*) AS c FROM gb WHERE doc_id % 2 = 1 GROUP BY b),
        space AS (SELECT printf('%04x', i) AS b FROM range(65536) t(i)),
        j AS (SELECT s.b, CAST(COALESCE(o.c, 0) AS DOUBLE) AS co,
                     CAST(COALESCE(nn.c, 0) AS DOUBLE) AS cn
              FROM space s
              LEFT JOIN ocnt o ON o.b = s.b
              LEFT JOIN ncnt nn ON nn.b = s.b),
        tot AS (SELECT SUM(co) AS so, SUM(cn) AS sn FROM j),
        p AS (SELECT (co + 1.0) / ((SELECT so FROM tot) + 65536.0) AS po,
                     (cn + 1.0) / ((SELECT sn FROM tot) + 65536.0) AS pn
              FROM j)
        SELECT ROUND(SUM(pn * ln(pn / po)), 6) AS kl,
               ROUND(0.5 * SUM(ABS(pn - po)), 6) AS tv
        FROM p
    """,
    "recrawl_priority": """
        WITH obs AS (
          SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
                 s,
                 CAST((CAST(doc_id AS BIGINT) * 31 + s) // 3 AS VARCHAR)
                   AS digest
          FROM documents
          CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5]) AS s)
          WHERE (doc_id + s) % 7 <> 0),
        lagged AS (
          SELECT url, digest,
                 LAG(digest) OVER (PARTITION BY url ORDER BY s) AS prev
          FROM obs),
        agg AS (
          SELECT url,
                 CAST(COUNT(*) AS BIGINT) AS n_obs,
                 CAST(SUM(CASE WHEN prev IS NOT NULL AND digest <> prev
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
          FROM lagged GROUP BY url)
        SELECT url, n_obs, n_changes,
               CASE WHEN n_obs = 1 THEN 'new'
                    WHEN 1000 * n_changes >= 500 * (n_obs - 1) THEN 'hot'
                    WHEN 1000 * n_changes >= 200 * (n_obs - 1) THEN 'warm'
                    ELSE 'cold' END AS priority
        FROM agg
    """,
    "snapshot_diff": """
        WITH o AS (
          SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, md5(text) AS digest
          FROM documents WHERE doc_id % 5 <> 0),
        nw AS (
          SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
                 md5(text || CASE WHEN doc_id % 3 = 0 THEN 'v2' ELSE '' END)
                   AS digest
          FROM documents WHERE doc_id % 7 <> 0)
        SELECT COALESCE(o.url, nw.url) AS url,
               CASE WHEN o.url IS NULL THEN 'added'
                    WHEN nw.url IS NULL THEN 'removed'
                    ELSE 'changed' END AS status,
               COALESCE(o.digest, '') AS old_digest,
               COALESCE(nw.digest, '') AS new_digest
        FROM o FULL OUTER JOIN nw ON o.url = nw.url
        WHERE o.url IS NULL OR nw.url IS NULL OR o.digest <> nw.digest
    """,
    "tfidf_keywords": r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        nn AS (SELECT COUNT(*) AS n FROM toks),
        tf AS (SELECT doc_id, g AS term, COUNT(*) AS tf
               FROM (SELECT doc_id, unnest(w) AS g FROM toks)
               GROUP BY doc_id, g),
        scored AS (
          SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
                 tf.tf * ln(CAST((SELECT n FROM nn) AS DOUBLE) / df.df) AS score
          FROM tf
          JOIN (SELECT term, COUNT(*) AS df FROM tf GROUP BY term) df
            USING (term))
        SELECT doc_id, term, tf, ROUND(score, 6) AS score FROM scored
        QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term) <= 5
    """,
    # canonical a<b undirected triangle join: each triangle {x<y<z}
    # found once as (x,y)+(x,z)+(y,z); per-vertex counts explode the
    # three corners
    "triangle_counts": """
        WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        raw AS (
          SELECT doc_id AS s, (doc_id+1) % (SELECT n FROM nn) AS d FROM documents
          UNION ALL
          SELECT doc_id, (doc_id+2) % (SELECT n FROM nn) FROM documents
          UNION ALL
          SELECT doc_id, (doc_id*2) % (SELECT n FROM nn) FROM documents),
        e AS (SELECT DISTINCT LEAST(s,d) AS a, GREATEST(s,d) AS b
              FROM raw WHERE s <> d),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        corners AS (
          SELECT x AS v FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_triangles
        FROM documents d
        LEFT JOIN (SELECT v, COUNT(*) AS n FROM corners GROUP BY v) c
          ON c.v = d.doc_id
    """,
    # bucket = LAST 4 hex chars of md5(gram) == stages/dsir.py's
    # digest[-2:]; rcnt always matches (raw includes every doc)
    "dsir_select": r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        g AS (
          SELECT doc_id, unnest(w) AS g FROM toks
          UNION ALL
          SELECT doc_id, unnest(list_transform(range(GREATEST(len(w)-1, 0)),
                          j -> w[j+1] || ' ' || w[j+2])) AS g FROM toks),
        gb AS (SELECT doc_id, substr(md5(g), 29, 4) AS b FROM g),
        tcnt AS (SELECT b, COUNT(*) AS c FROM gb WHERE doc_id % 7 = 0 GROUP BY b),
        rcnt AS (SELECT b, COUNT(*) AS c FROM gb GROUP BY b),
        tot AS (SELECT
                 (SELECT COUNT(*) FROM gb WHERE doc_id % 7 = 0) AS tt,
                 (SELECT COUNT(*) FROM gb) AS tr),
        scored AS (
          SELECT gb.doc_id,
                 SUM(ln(COALESCE(t.c, 0) + 1.0) - ln(r.c + 1.0)
                     + ln((SELECT tr FROM tot) + 65536.0)
                     - ln((SELECT tt FROM tot) + 65536.0)) AS lw
          FROM gb
          LEFT JOIN tcnt t ON t.b = gb.b
          JOIN rcnt r ON r.b = gb.b
          GROUP BY gb.doc_id)
        SELECT doc_id, ROUND(lw, 3) AS lw FROM scored
        ORDER BY ROUND(lw, 3) DESC, doc_id LIMIT 50
    """,
    "grouped_bottomk_sample": """
        SELECT doc_id, lang FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42')
        ) <= 8
    """,
    "bm25_topk": r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        stats AS (SELECT COUNT(*) AS n, AVG(len(w)) AS avgdl FROM toks),
        tf AS (SELECT doc_id, g AS term, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
               FROM (SELECT doc_id, unnest(w) AS g, len(w) AS dl FROM toks)
               GROUP BY doc_id, g),
        q AS (SELECT unnest(['vector', 'hash', 'stream']) AS term),
        df AS (SELECT term, COUNT(*) AS df FROM tf JOIN q USING (term) GROUP BY term),
        sc AS (SELECT t.doc_id,
                 SUM(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                     * t.tf * (1.2 + 1)
                     / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / s.avgdl))) AS s
               FROM tf t JOIN df d USING (term) CROSS JOIN stats s
               GROUP BY t.doc_id)
        SELECT doc_id, ROUND(s, 4) AS score FROM sc
        QUALIFY row_number() OVER (ORDER BY ROUND(s, 4) DESC, doc_id) <= 10
    """,
    "lm_perplexity": _LM_SCORED_CTE + """
        SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
               ROUND(EXP(-lp / n_bigrams), 2) AS ppl
        FROM scored
    """,
    "ccnet_buckets": _LM_SCORED_CTE + """
        , pp AS (
          SELECT s.doc_id, d.lang,
                 ROUND(EXP(-s.lp / s.n_bigrams), 2) AS ppl
          FROM scored s JOIN documents d ON d.doc_id = s.doc_id),
        thr AS (
          SELECT lang, quantile_disc(ppl, 0.25) AS p25,
                 quantile_disc(ppl, 0.75) AS p75
          FROM pp GROUP BY lang)
        SELECT pp.doc_id, pp.lang, pp.ppl,
               CASE WHEN pp.ppl <= t.p25 THEN 'head'
                    WHEN pp.ppl <= t.p75 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM pp JOIN thr t ON t.lang = pp.lang
    """,
    "grouped_quantiles": """
        SELECT lang,
               quantile_disc(n_chars, 0.25) AS p25,
               quantile_disc(n_chars, 0.50) AS p50,
               quantile_disc(n_chars, 0.75) AS p75,
               quantile_disc(n_chars, 0.95) AS p95
        FROM documents GROUP BY lang
    """,
    "bottomk_sample": """
        SELECT doc_id, lang FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42') LIMIT 40
    """,
    "heavy_hitters_words": r"""
        SELECT word AS value, COUNT(*) AS est_count
        FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY word ORDER BY est_count DESC, value LIMIT 20
    """,
    # full-probe IVF degenerates to exact knn — same oracle shape as
    # knn_bruteforce
    "ivf_knn_fullprobe": """
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM embeddings a, embeddings b
        WHERE a.vec_id < 3 AND b.vec_id <> a.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY a.vec_id
            ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id
        ) <= 5
    """,
    "cosine_pairs_exact": """
        WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_transform(embedding,
                                (x, i) -> x * (1 + 0.002 * (((vec_id + i) % 5) - 2)))
          FROM embeddings WHERE vec_id % 10 = 0)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
    """,
    "pii_scrub": r"""
        WITH corpus AS (
          SELECT doc_id,
            text
            || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
            || CASE WHEN doc_id % 9 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-4567 today' ELSE '' END
            || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 200 + 1 AS VARCHAR) || ' logged' ELSE '' END
            AS text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
          CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
          regexp_replace(
            regexp_replace(
              regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
              '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS clean_text
        FROM corpus
    """,
    "paragraph_dedup": f"""
        WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        paras AS (
          SELECT doc_id,
            (CASE WHEN doc_id % 7 = 0 THEN ['{_BP1}'] ELSE [] END)
            || list_transform(range(CAST(ceil(len(w) / 12.0) AS BIGINT)),
                              j -> array_to_string(list_slice(w, j*12 + 1, j*12 + 12), ' '))
            || (CASE WHEN doc_id % 13 = 0 THEN ['{_BP2}'] ELSE [] END) AS ps
          FROM base),
        ex AS (SELECT doc_id, unnest(ps) AS para, unnest(range(len(ps))) AS idx FROM paras),
        hot AS (SELECT para FROM ex GROUP BY para HAVING COUNT(DISTINCT doc_id) >= 2),
        kept AS (SELECT e.* FROM ex e LEFT JOIN hot h USING (para) WHERE h.para IS NULL)
        SELECT p.doc_id,
               CAST(len(p.ps) AS BIGINT) AS n_paras,
               CAST(len(p.ps) - COUNT(k.para) AS BIGINT) AS n_removed,
               COALESCE(string_agg(k.para, chr(10) ORDER BY k.idx), '') AS clean_text
        FROM paras p LEFT JOIN kept k USING (doc_id)
        GROUP BY p.doc_id, len(p.ps)
    """,
    "host_boilerplate": f"""
        WITH base AS (SELECT doc_id, 'h' || CAST(doc_id % 23 AS VARCHAR) AS host,
                             string_split(text, ' ') AS w FROM documents),
        paras AS (
          SELECT doc_id, host,
            (CASE WHEN doc_id % 2 = 0
                  THEN ['HOSTBP ' || host || ' navigation menu follow links']
                  ELSE [] END)
            || list_transform(range(CAST(ceil(len(w) / 12.0) AS BIGINT)),
                              j -> array_to_string(list_slice(w, j*12 + 1, j*12 + 12), ' '))
            || (CASE WHEN doc_id % 29 = 0 THEN ['{_RARE_PROMO}'] ELSE [] END) AS ps
          FROM base),
        ex AS (SELECT doc_id, host, unnest(ps) AS para,
                      unnest(range(len(ps))) AS idx FROM paras),
        host_tot AS (SELECT host, COUNT(*) AS host_docs FROM paras GROUP BY host),
        freq AS (SELECT host, para, COUNT(DISTINCT doc_id) AS n_docs
                 FROM ex GROUP BY host, para),
        hot AS (SELECT f.host, f.para
                FROM freq f JOIN host_tot t USING (host)
                WHERE 1000 * f.n_docs >= 400 * t.host_docs AND f.n_docs >= 2),
        kept AS (SELECT e.* FROM ex e
                 LEFT JOIN hot h ON e.host = h.host AND e.para = h.para
                 WHERE h.para IS NULL)
        SELECT p.doc_id,
               CAST(len(p.ps) AS BIGINT) AS n_paras,
               CAST(len(p.ps) - COUNT(k.para) AS BIGINT) AS n_removed,
               COALESCE(string_agg(k.para, chr(10) ORDER BY k.idx), '') AS clean_text
        FROM paras p LEFT JOIN kept k USING (doc_id)
        GROUP BY p.doc_id, len(p.ps)
    """,
    "repetition_stats": """
        WITH base AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        lines AS (SELECT doc_id,
            list_transform(range(CAST(ceil(len(w)/8.0) AS BIGINT)),
                           j -> array_to_string(list_slice(w, j*8+1, j*8+8), ' ')) AS ls
          FROM base),
        topw AS (SELECT doc_id, MAX(c) AS mc FROM
           (SELECT doc_id, word, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(w) AS word FROM base) GROUP BY doc_id, word)
          GROUP BY doc_id)
        SELECT b.doc_id,
          CAST(len(b.w) AS BIGINT) AS n_words,
          CAST(len(list_distinct(b.w)) AS BIGINT) AS n_distinct_words,
          CAST(len(l.ls) AS BIGINT) AS n_lines,
          CAST(len(list_distinct(l.ls)) AS BIGINT) AS n_distinct_lines,
          CAST(t.mc AS BIGINT) AS top_word_n
        FROM base b JOIN lines l USING (doc_id) JOIN topw t USING (doc_id)
    """,
    "warc_roundtrip": """
        SELECT doc_id,
               'http://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
               CAST(strlen(text) AS BIGINT) AS payload_length,
               md5(text) AS payload_md5
        FROM documents
    """,
    "substring_dedup": f"""
        WITH corpus AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 5 = 0 THEN ' {_DUP_SLOGAN}' ELSE '' END
                 || CASE WHEN doc_id % 11 = 0
                         THEN ' ' || array_to_string(
                                list_slice(string_split(text, ' '), 1, 8), ' ')
                         ELSE '' END AS text
          FROM documents),
        base AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
        wins AS (
          SELECT doc_id,
                 unnest(range(GREATEST(len(w) - 7, 0))) AS pos,
                 unnest(list_transform(range(GREATEST(len(w) - 7, 0)),
                        j -> array_to_string(list_slice(w, j + 1, j + 8), ' '))) AS win
          FROM base),
        dup_occ AS (
          SELECT DISTINCT w1.doc_id, w1.pos
          FROM wins w1 JOIN wins w2 ON w1.win = w2.win
           AND (w2.doc_id < w1.doc_id
                OR (w2.doc_id = w1.doc_id AND w2.pos < w1.pos))),
        rem AS (SELECT DISTINCT doc_id, ti FROM
                (SELECT doc_id, pos + unnest(range(8)) AS ti FROM dup_occ)),
        toks AS (SELECT doc_id, unnest(w) AS tok, unnest(range(len(w))) AS ti FROM base),
        kept AS (SELECT t.doc_id, t.tok, t.ti FROM toks t LEFT JOIN rem r
                 ON t.doc_id = r.doc_id AND t.ti = r.ti WHERE r.ti IS NULL)
        SELECT b.doc_id,
               CAST(len(b.w) AS BIGINT) AS n_tokens,
               CAST(len(b.w) - COUNT(k.ti) AS BIGINT) AS n_removed_tokens,
               COALESCE(string_agg(k.tok, ' ' ORDER BY k.ti), '') AS clean_text
        FROM base b LEFT JOIN kept k USING (doc_id)
        GROUP BY b.doc_id, len(b.w)
    """,
    "decontaminate_ngrams": """
        WITH bench AS (
          SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rk,
                 array_to_string(list_slice(string_split(text, ' '), 1, 6), ' ') AS gram
          FROM documents WHERE doc_id % 97 = 0),
        nb AS (SELECT COUNT(*) AS n FROM bench),
        corpus AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 31 = 0
                      THEN d.text || ' ' ||
                           (SELECT gram FROM bench b
                            WHERE b.rk = (d.doc_id // 31) % (SELECT n FROM nb))
                      ELSE d.text END AS text
          FROM documents d WHERE d.doc_id % 97 <> 0),
        wins AS (
          SELECT doc_id,
                 list_transform(range(GREATEST(len(string_split(text,' ')) - 5, 0)),
                                j -> array_to_string(list_slice(string_split(text,' '), j+1, j+6), ' ')) AS ws
          FROM corpus),
        grams AS (SELECT DISTINCT gram FROM bench WHERE len(string_split(gram,' ')) = 6)
        SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM wins w JOIN grams g ON list_contains(w.ws, g.gram)
        GROUP BY w.doc_id
    """,
    "decontaminate": """
        WITH bench AS (
          SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rk,
                 array_to_string(list_slice(string_split(text, ' '), 1, 6), ' ') AS gram
          FROM documents WHERE doc_id % 97 = 0),
        nb AS (SELECT COUNT(*) AS n FROM bench),
        corpus AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 31 = 0
                      THEN d.text || ' ' ||
                           (SELECT gram FROM bench b
                            WHERE b.rk = (d.doc_id // 31) % (SELECT n FROM nb))
                      ELSE d.text END AS text
          FROM documents d WHERE d.doc_id % 97 <> 0),
        grams AS (SELECT DISTINCT gram FROM bench)
        SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM corpus c JOIN grams g ON contains(c.text, g.gram)
        GROUP BY c.doc_id
    """,
})


# --------------------------------------------------------------------------
# URL/domain curation family (stages/urls.py) — messy-URL fixture derived
# from doc_id arithmetic; oracles REPARSE the same constructed string with
# DuckDB's own RE2 + list kernels (independent implementation, not replay).
# --------------------------------------------------------------------------

def _messy_url(i: int) -> str:
    """Deterministic Common-Crawl-messy URL for doc_id ``i``: mixed-case
    scheme/host, multi-level public suffixes, explicit default and
    non-default ports, tracking params, unsorted params, fragments,
    empty paths — every branch the canonicalizer must handle."""
    scheme = ("HTTP", "https", "Https", "http", "https")[i % 5]
    m4 = i % 4
    if m4 == 0:
        host = f"WWW.Site{i % 53}.Example.COM"
    elif m4 == 1:
        host = f"sub{i % 7}.site{i % 53}.co.uk"
    elif m4 == 2:
        host = f"site{i % 53}.com.br"
    else:
        host = f"Site{i % 53}.ORG"
    port = ":443" if i % 11 == 0 else (":8080" if i % 13 == 0 else (":80" if i % 17 == 0 else ""))
    path = "" if i % 19 == 0 else f"/p{i % 6}/page{i}"
    params = []
    if i % 2 == 0:
        params.append("utm_source=feed")
    if i % 9 != 0:
        params.append(f"id={i}")
    if i % 3 == 0:
        params.append("ref=tw")
    if i % 4 == 0:
        params.append(f"b={i % 7}")
    if i % 5 == 0:
        params.append("a=1")
    q = "&".join(params)
    frag = f"#sec{i % 4}" if i % 6 == 0 else ""
    return f"{scheme}://{host}{port}{path}" + (f"?{q}" if q else "") + frag


def _messy_url_ds(sf_dir: str, extra_cols: tuple = ()):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", *extra_cols])

    def build(t: pa.Table) -> pa.Table:
        urls = [_messy_url(int(x)) for x in t["doc_id"].to_pylist()]
        cols = {"doc_id": t["doc_id"], "url": pa.array(urls, pa.string())}
        for c in extra_cols:
            cols[c] = t[c]
        return pa.table(cols)

    return ds.map_batches(build, batch_format="pyarrow")


def q_url_parse(sf_dir: str):
    """Vectorized URL decomposition (stages/urls.py parse_urls): one RE2
    pass per column, absent port encoded -1, eTLD+1 via the
    public-suffix-lite alternation. No shuffle."""
    from .stages.urls import parse_urls

    out = parse_urls(_messy_url_ds(sf_dir))
    return out.select_columns(
        ["doc_id", "scheme", "host", "port", "path", "query", "fragment",
         "registered_domain"]
    )


def q_url_canonicalize(sf_dir: str):
    """Crawl-frontier canonicalization (stages/urls.py
    canonicalize_urls): lowercase scheme/host, default-port strip,
    tracking-param removal, param sort, fragment drop."""
    from .stages.urls import canonicalize_urls

    out = canonicalize_urls(_messy_url_ds(sf_dir))
    return out.select_columns(["doc_id", "canonical_url"])


def q_domain_cap(sf_dir: str):
    """Per-registered-domain quota (stages/urls.py domain_cap): ≤3 docs
    per eTLD+1, lowest doc_id wins. The fixture plants one hot domain
    (every 4th page is a subdomain of example.com) — the cap bounds it
    like any other."""
    from .stages.urls import domain_cap, parse_urls

    parsed = parse_urls(_messy_url_ds(sf_dir))
    capped = domain_cap(parsed, k=3, priority_col="doc_id")
    return capped.select_columns(["doc_id", "registered_domain"])


def q_host_quality(sf_dir: str):
    """CCNet-style host-level curation (stages/urls.py
    host_quality_filter): keep docs whose registered domain averages
    ≥300 chars over ≥2 docs. One narrow count+sum groupby on the
    domain, passing-domain keyset applied by distributed semi-join —
    no driver key set; integer cross-multiplication mean test keeps it
    bit-exact vs SQL."""
    from .stages.urls import host_quality_filter, parse_urls

    parsed = parse_urls(_messy_url_ds(sf_dir, extra_cols=("n_chars",)))
    kept = host_quality_filter(parsed, "n_chars", threshold=300, min_docs=2,
                               num_partitions=8)
    return kept.select_columns(["doc_id", "registered_domain", "n_chars"])


def q_host_lang_profile(sf_dir: str):
    """Per-host language-mix profile (stages/urls.host_lang_profile):
    n_docs / n_langs / majority lang (ties → smallest lang) / Shannon
    entropy (bits, round-6) / exact-integer mixed flag (majority share
    < 80%). Blocks pre-compress to (host, lang, n) partials, one narrow
    grouped exchange, partition-grouped vectorized finisher — documents
    never shuffle, host count never drives Python dispatch."""
    from .stages.urls import host_lang_profile, parse_urls

    parsed = parse_urls(_messy_url_ds(sf_dir, extra_cols=("lang",)))
    return host_lang_profile(parsed, host_col="host", lang_col="lang",
                             mixed_share_permille=800, num_partitions=8)


def q_host_mirror_pairs(sf_dir: str):
    """Mirror-host detection (stages/links.host_mirror_pairs): host
    pairs sharing distinct page fingerprints, with exact-set Jaccard
    and an exact-integer mirror flag. The fixture plants mirrors by
    doc-id arithmetic — every run of 3 consecutive doc_ids shares one
    md5 fingerprint, so their (distinct) hosts pair up. One
    fingerprint-keyed partition-grouped triu exchange + two armored
    joins against per-host totals; only digests/hosts shuffle."""
    from .stages.links import host_mirror_pairs
    from .stages.urls import parse_urls

    parsed = parse_urls(_messy_url_ds(sf_dir))

    def add_fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        fp = [hashlib.md5(str(int(i) - int(i) % 3).encode()).hexdigest()
              for i in ids]
        return pa.table({"host": t["host"],
                         "fp": pa.array(fp, pa.string())})

    ds = parsed.map_batches(add_fp, batch_format="pyarrow")
    return host_mirror_pairs(ds, min_shared=1, max_hosts_per_fp=1000,
                             mirror_permille=500)


def q_mirror_keep_list(sf_dir: str):
    """Composed mirror-routing table: host_mirror_pairs → is_mirror
    edges → connected components (stages/dedup.cluster_pairs — string
    ids ride the union-find/min-label machinery unchanged) → one row
    per mirror-cluster member ``(host, canonical_host, is_canonical)``.
    This is the decision a pipeline applies BEFORE page-level dedup:
    drop every non-canonical mirror host once, instead of paying a
    near-dup verdict per page. Mirror graphs are host-cardinality-
    bounded and Jaccard-pruned, so the component pass runs on an
    aggregate-sized pair table."""
    import pyarrow.compute as pc2

    from .stages.dedup import cluster_pairs
    from .stages.links import host_mirror_pairs
    from .stages.urls import parse_urls

    parsed = parse_urls(_messy_url_ds(sf_dir))

    def add_fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        fp = [hashlib.md5(str(int(i) - int(i) % 3).encode()).hexdigest()
              for i in ids]
        return pa.table({"host": t["host"],
                         "fp": pa.array(fp, pa.string())})

    pairs = host_mirror_pairs(
        parsed.map_batches(add_fp, batch_format="pyarrow"),
        min_shared=1, max_hosts_per_fp=1000, mirror_permille=500)

    def edges(t: pa.Table) -> pa.Table:
        t = t.filter(t["is_mirror"])
        return pa.table({"id_a": t["host_a"], "id_b": t["host_b"]})

    clusters = cluster_pairs(pairs.map_batches(edges,
                                               batch_format="pyarrow"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["doc_id"],
            "canonical_host": t["cluster_id"],
            "is_canonical": pc2.equal(t["doc_id"], t["cluster_id"]),
        })

    return clusters.map_batches(fin, batch_format="pyarrow")


def q_resolve_redirects(sf_dir: str):
    """Redirect-chain resolution by pointer jumping (ops/pointer.py):
    every non-multiple-of-10 doc redirects to doc_id-1, forming chains
    up to 9 hops; 4 path-doubling rounds (reach 16) resolve all of
    them. Each round is ONE armored left-outer self-join over a
    constant-size two-int64 mapping table (dst' = coalesce(jumped,
    dst)) — log(L) exchanges instead of L. Oracle: DuckDB
    recursive-CTE chain chase."""
    from .ops.pointer import resolve_pointers_auto

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = [int(i) for i in t["doc_id"].to_pylist() if i % 10 != 0]
        return pa.table({"src": pa.array(ids, pa.int64()),
                         "dst": pa.array([i - 1 for i in ids], pa.int64())})

    edges = ds.map_batches(build, batch_format="pyarrow")
    # hybrid: a redirect table this small does its doubling rounds as
    # driver dict sweeps (ops/pointer.resolve_pointers_auto); beyond the
    # bound the armored-join rounds run unchanged
    return resolve_pointers_auto(edges, rounds=4, num_partitions=8)


def _pc_mod(arr, m: int):
    """Vectorized non-negative int64 modulo (pyarrow lacks a mod kernel)."""
    ms = pa.scalar(m, pa.int64())
    return pc.subtract(arr, pc.multiply(pc.divide(arr, ms), ms))


_PCN_ROUNDS = 5


def q_perceptron_quality(sf_dir: str):
    """Distributed batch-perceptron training (ops/perceptron.py): learn
    the ≥300-char quality boundary from (n_chars-300, doc_id%7) integer
    features, 5 rounds. Weights broadcast per round, one streaming
    corpus pass emitting a single partial row per block, O(blocks·d)
    Sum reduce — no shuffle, integer-exact ⇒ bit-reproducible vs the
    unrolled-CTE SQL oracle."""
    from .ops.perceptron import train_perceptron

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def feat(t: pa.Table) -> pa.Table:
        n = pc.subtract(pc.cast(t["n_chars"], pa.int64()),
                        pa.scalar(300, pa.int64()))
        return pa.table({
            "x1": n,
            "x2": _pc_mod(pc.cast(t["doc_id"], pa.int64()), 7),
            "y": pc.if_else(pc.greater_equal(n, 0),
                            pa.scalar(1, pa.int64()), pa.scalar(-1, pa.int64())),
        })

    feats = ds.map_batches(feat, batch_format="pyarrow")
    hist, _ = train_perceptron(feats, ["x1", "x2"], "y", rounds=_PCN_ROUNDS)
    return hist


def q_perceptron_filter(sf_dir: str):
    """Learned-quality-filter inference (the CCNet deployment shape):
    train the batch perceptron (q_perceptron_quality), then ONE
    streaming pass scores every doc with the final weights riding in
    the task closure and keeps predicted-positive rows. Train cost is
    O(rounds) narrow passes; inference adds no shuffle."""
    from .ops.perceptron import classify, train_perceptron

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def feat(t: pa.Table) -> pa.Table:
        n = pc.subtract(pc.cast(t["n_chars"], pa.int64()),
                        pa.scalar(300, pa.int64()))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "x1": n,
            "x2": _pc_mod(pc.cast(t["doc_id"], pa.int64()), 7),
            "y": pc.if_else(pc.greater_equal(n, 0),
                            pa.scalar(1, pa.int64()), pa.scalar(-1, pa.int64())),
        })

    feats = ds.map_batches(feat, batch_format="pyarrow").materialize()
    _, w = train_perceptron(feats, ["x1", "x2"], "y", rounds=_PCN_ROUNDS)
    scored = classify(feats.select_columns(["doc_id", "x1", "x2"]),
                      ["x1", "x2"], w)
    return scored.filter(expr="score > 0").select_columns(["doc_id", "score"])


def _perceptron_ctes(rounds: int) -> str:
    """WITH-chain shared by the training-history and filter oracles:
    f = integer features, wr{r} = post-round-r weights, u{r} = round-r
    update sums + miss count."""
    score = "y * (w.w0 + w.w1 * x1 + w.w2 * x2)"
    parts = ["""WITH f AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(n_chars AS BIGINT) - 300 AS x1,
                 CAST(doc_id % 7 AS BIGINT) AS x2,
                 CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS y
          FROM documents),
        wr0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                       CAST(0 AS BIGINT) AS w2)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
        u{r} AS (
          SELECT
            CAST(COALESCE(SUM(CASE WHEN {score} <= 0 THEN y END), 0) AS BIGINT) AS d0,
            CAST(COALESCE(SUM(CASE WHEN {score} <= 0 THEN y * x1 END), 0) AS BIGINT) AS d1,
            CAST(COALESCE(SUM(CASE WHEN {score} <= 0 THEN y * x2 END), 0) AS BIGINT) AS d2,
            CAST(COUNT(CASE WHEN {score} <= 0 THEN 1 END) AS BIGINT) AS miss
          FROM f, wr{r - 1} w),
        wr{r} AS (
          SELECT w.w0 + u.d0 AS w0, w.w1 + u.d1 AS w1, w.w2 + u.d2 AS w2
          FROM wr{r - 1} w, u{r} u)""")
    return "".join(parts)


def _perceptron_sql(rounds: int) -> str:
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, w0, w1, w2, (SELECT miss FROM u{r}) AS miss"
        f" FROM wr{r}"
        for r in range(1, rounds + 1))
    return _perceptron_ctes(rounds) + "\n        " + sel


def _perceptron_filter_sql(rounds: int) -> str:
    return _perceptron_ctes(rounds) + f"""
        SELECT doc_id, w.w0 + w.w1 * x1 + w.w2 * x2 AS score
        FROM f, wr{rounds} w
        WHERE w.w0 + w.w1 * x1 + w.w2 * x2 > 0"""


def q_anchor_text(sf_dir: str):
    """Anchor-text aggregation (ops/anchors.py): per target page, the
    inlink count and the source-ordered concatenated anchor string, over
    a deterministic synthetic link graph (every non-multiple-of-4 doc i
    links to (3i) mod N with anchor 'link-{i%5}'). One partition-grouped
    exchange carrying only (src, dst, anchor)."""
    from .ops.anchors import aggregate_anchors

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_docs = ds.count()

    def build(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        keep = pc.not_equal(_pc_mod(ids, 4), 0)
        ids = ids.filter(keep)
        return pa.table({
            "src": ids,
            "dst": _pc_mod(pc.multiply(ids, pa.scalar(3, pa.int64())), n_docs),
            "anchor": pc.binary_join_element_wise(
                pa.array(["link"] * len(ids)),
                pc.cast(_pc_mod(ids, 5), pa.string()), "-"),
        })

    edges = ds.map_batches(build, batch_format="pyarrow")
    return aggregate_anchors(edges)


def q_incremental_new(sf_dir: str):
    """Crawl-delta dedup (ops/bloom.py incremental_new): which docs are
    NEW vs a prior-crawl key table (here: every doc_id % 3 == 0, keyed
    by source#doc_id strings)? Bloom filter built in one distributed
    pass (per-block partial bitmaps, bounded OR-reduce), broadcast via
    ray.put; definitely-new rows skip the exchange entirely (no false
    negatives), only the maybe-seen sliver pays the armored anti-join."""
    from .ops.bloom import incremental_new

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t["source"], pc.cast(t["doc_id"], pa.string()), "#")
        return pa.table({"key": key,
                         "doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_chars": pc.cast(t["n_chars"], pa.int64())})

    new = ds.map_batches(keyed, batch_format="pyarrow")
    seen = new.map_batches(
        lambda t: t.filter(pc.equal(_pc_mod(t["doc_id"], 3), 0)),
        batch_format="pyarrow",
    ).select_columns(["key"]).materialize()
    new_schema = pa.schema([("key", pa.string()), ("doc_id", pa.int64()),
                            ("n_chars", pa.int64())])
    out = incremental_new(new, seen, "key", n_seen_hint=seen.count(),
                          new_schema=new_schema,
                          seen_schema=pa.schema([("key", pa.string())]))
    return out.select_columns(["doc_id", "key", "n_chars"])


_URL_BLOCKED = ("example.com", "site7.co.uk")


def _robots_rules() -> list:
    """Deterministic robots Disallow rules over the messy-URL hosts:
    every .com.br site disallows /p1, every www.site{k}.example.com
    disallows /p{k%3}."""
    rules = []
    for k in range(53):
        rules.append((f"site{k}.com.br", "/p1"))
        rules.append((f"www.site{k}.example.com", f"/p{k % 3}"))
    return rules


def q_robots_filter(sf_dir: str):
    """Robots.txt politeness filter (stages/urls.py robots_filter):
    drop pages whose path falls under a disallow prefix for their
    exact host. Broadcast path (rules ship once via ray.put, one
    vectorized starts_with per (host,prefix) pair present in the
    batch, zero shuffles); the distributed join fallback is asserted
    identical in tests."""
    from .stages.urls import parse_urls, robots_filter

    parsed = parse_urls(_messy_url_ds(sf_dir))
    out = robots_filter(parsed, _robots_rules())
    return out.select_columns(["doc_id", "host", "path"])


def q_url_blocklist(sf_dir: str):
    """Domain blocklist (stages/urls.py blocklist_filter): drops a host
    equal to OR under any blocked domain via one broadcast RE2
    alternation — no shuffle, no join."""
    from .stages.urls import blocklist_filter, parse_urls

    parsed = parse_urls(_messy_url_ds(sf_dir))
    out = blocklist_filter(parsed, list(_URL_BLOCKED), host_col="host")
    return out.select_columns(["doc_id", "host"])


# CTE reconstructing _messy_url in SQL, then reparsing it with DuckDB's
# RE2 — field expressions are DuckDB-native, not transliterations of the
# pyarrow kernels.
_MESSY_URL_CTE = """
    WITH uq AS (
      SELECT doc_id,
             array_to_string([
               CASE WHEN doc_id % 2 = 0 THEN 'utm_source=feed' END,
               CASE WHEN doc_id % 9 <> 0 THEN 'id=' || CAST(doc_id AS VARCHAR) END,
               CASE WHEN doc_id % 3 = 0 THEN 'ref=tw' END,
               CASE WHEN doc_id % 4 = 0 THEN 'b=' || CAST(doc_id % 7 AS VARCHAR) END,
               CASE WHEN doc_id % 5 = 0 THEN 'a=1' END], '&') AS q
      FROM documents),
    u AS (
      SELECT doc_id,
        CASE doc_id % 5 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
             WHEN 2 THEN 'Https' WHEN 3 THEN 'http' ELSE 'https' END
        || '://'
        || CASE doc_id % 4
             WHEN 0 THEN 'WWW.Site' || CAST(doc_id % 53 AS VARCHAR) || '.Example.COM'
             WHEN 1 THEN 'sub' || CAST(doc_id % 7 AS VARCHAR) || '.site'
                        || CAST(doc_id % 53 AS VARCHAR) || '.co.uk'
             WHEN 2 THEN 'site' || CAST(doc_id % 53 AS VARCHAR) || '.com.br'
             ELSE 'Site' || CAST(doc_id % 53 AS VARCHAR) || '.ORG' END
        || CASE WHEN doc_id % 11 = 0 THEN ':443'
                WHEN doc_id % 13 = 0 THEN ':8080'
                WHEN doc_id % 17 = 0 THEN ':80' ELSE '' END
        || CASE WHEN doc_id % 19 = 0 THEN ''
                ELSE '/p' || CAST(doc_id % 6 AS VARCHAR) || '/page'
                     || CAST(doc_id AS VARCHAR) END
        || CASE WHEN q = '' THEN '' ELSE '?' || q END
        || CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id % 4 AS VARCHAR)
                ELSE '' END AS url
      FROM uq),
    p AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        regexp_extract(url, '\\?([^#]*)', 1) AS query,
        regexp_extract(url, '#(.*)$', 1) AS fragment
      FROM u),
    h AS (
      SELECT *,
        lower(regexp_replace(hostport, ':[0-9]+$', '')) AS host,
        COALESCE(TRY_CAST(regexp_extract(hostport, ':([0-9]+)$', 1) AS BIGINT),
                 -1) AS port
      FROM p),
    hd AS (
      SELECT *,
        COALESCE(NULLIF(regexp_extract(host,
          '([^.]+\\.(?:co\\.uk|org\\.uk|ac\\.uk|gov\\.uk|com\\.br|net\\.br|com\\.au|co\\.jp|co\\.in|com\\.cn)$|[^.]+\\.[^.]+$)',
          1), ''), host) AS registered_domain
      FROM h)
"""

ORACLE_SQL.update({
    "url_parse": _MESSY_URL_CTE + """
        SELECT doc_id, scheme, host, port, path, query, fragment,
               registered_domain
        FROM hd
    """,
    "url_canonicalize": _MESSY_URL_CTE + """
        , qq AS (
          SELECT doc_id, scheme, host, port, path,
            COALESCE(array_to_string(list_sort(list_filter(
              string_split(query, '&'),
              x -> x <> ''
                   AND NOT starts_with(split_part(x, '=', 1), 'utm_')
                   AND NOT list_contains(['fbclid','gclid','msclkid','ref'],
                                         split_part(x, '=', 1)))), '&'),
              '') AS q2
          FROM hd)
        SELECT doc_id,
          scheme || '://' || host
          || CASE WHEN port = -1 OR (scheme = 'http' AND port = 80)
                       OR (scheme = 'https' AND port = 443) THEN ''
                  ELSE ':' || CAST(port AS VARCHAR) END
          || CASE WHEN path = '' THEN '/' ELSE path END
          || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canonical_url
        FROM qq
    """,
    "domain_cap": _MESSY_URL_CTE + """
        SELECT doc_id, registered_domain FROM hd
        QUALIFY row_number() OVER (PARTITION BY registered_domain
                                   ORDER BY doc_id) <= 3
    """,
    "url_blocklist": _MESSY_URL_CTE + """
        SELECT doc_id, host FROM hd
        WHERE NOT EXISTS (
          SELECT 1 FROM (VALUES ('example.com'), ('site7.co.uk')) b(d)
          WHERE host = d OR host LIKE '%.' || d)
    """,
    "robots_filter": _MESSY_URL_CTE + """
        , rules AS (
          SELECT 'site' || CAST(i AS VARCHAR) || '.com.br' AS rhost,
                 '/p1' AS prefix
          FROM range(53) t(i)
          UNION ALL
          SELECT 'www.site' || CAST(i AS VARCHAR) || '.example.com',
                 '/p' || CAST(i % 3 AS VARCHAR)
          FROM range(53) t(i))
        SELECT doc_id, host, path FROM hd
        WHERE NOT EXISTS (
          SELECT 1 FROM rules r
          WHERE r.rhost = hd.host AND starts_with(hd.path, r.prefix))
    """,
    "perceptron_quality": _perceptron_sql(_PCN_ROUNDS),
    "perceptron_filter": _perceptron_filter_sql(_PCN_ROUNDS),
    "anchor_text": """
        WITH e AS (
          SELECT CAST(doc_id AS BIGINT) AS src,
                 CAST((doc_id * 3) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst,
                 'link-' || CAST(doc_id % 5 AS VARCHAR) AS anchor
          FROM documents WHERE doc_id % 4 <> 0)
        SELECT dst, CAST(COUNT(*) AS BIGINT) AS n_inlinks,
               string_agg(anchor, '|' ORDER BY src) AS anchors
        FROM e GROUP BY dst
    """,
    "incremental_new": """
        WITH keyed AS (
          SELECT source || '#' || CAST(doc_id AS VARCHAR) AS key,
                 CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(n_chars AS BIGINT) AS n_chars
          FROM documents)
        SELECT doc_id, key, n_chars FROM keyed n
        WHERE NOT EXISTS (
          SELECT 1 FROM keyed s
          WHERE s.doc_id % 3 = 0 AND s.key = n.key)
    """,
    "resolve_redirects": """
        WITH RECURSIVE e AS (
          SELECT doc_id AS src, doc_id - 1 AS dst
          FROM documents WHERE doc_id % 10 <> 0),
        chase AS (
          SELECT src, dst AS cur FROM e
          UNION ALL
          SELECT c.src, e.dst FROM chase c JOIN e ON e.src = c.cur)
        SELECT src, cur AS dst FROM chase c
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = c.cur)
    """,
    "host_quality": _MESSY_URL_CTE + """
        , dd AS (
          SELECT hd.doc_id, hd.registered_domain, d.n_chars
          FROM hd JOIN documents d USING (doc_id)),
        g AS (
          SELECT registered_domain FROM dd GROUP BY registered_domain
          HAVING CAST(SUM(n_chars) AS BIGINT) >= 300 * COUNT(*)
             AND COUNT(*) >= 2)
        SELECT doc_id, registered_domain, n_chars FROM dd
        WHERE registered_domain IN (SELECT registered_domain FROM g)
    """,
    "host_lang_profile": _MESSY_URL_CTE + """
        , dl AS (
          SELECT hd.host, d.lang
          FROM hd JOIN documents d USING (doc_id)
          WHERE hd.host IS NOT NULL AND d.lang IS NOT NULL),
        c AS (
          SELECT host, lang, CAST(COUNT(*) AS BIGINT) AS n
          FROM dl GROUP BY host, lang),
        tot AS (
          SELECT host, CAST(SUM(n) AS BIGINT) AS n_docs,
                 CAST(COUNT(*) AS BIGINT) AS n_langs
          FROM c GROUP BY host),
        maj AS (
          SELECT host, lang AS majority_lang, n AS majority_n
          FROM c
          QUALIFY row_number() OVER (
            PARTITION BY host ORDER BY n DESC, lang) = 1),
        ent AS (
          SELECT c.host,
                 ROUND(SUM(-(CAST(c.n AS DOUBLE) / t.n_docs)
                           * log2(CAST(c.n AS DOUBLE) / t.n_docs)), 6)
                 + 0.0 AS lang_entropy
          FROM c JOIN tot t USING (host) GROUP BY c.host)
        SELECT t.host, t.n_docs, t.n_langs, m.majority_lang,
               m.majority_n, e.lang_entropy,
               (m.majority_n * 1000 < 800 * t.n_docs) AS is_mixed
        FROM tot t JOIN maj m USING (host) JOIN ent e USING (host)
    """,
    "host_mirror_pairs": _MESSY_URL_CTE + """
        , fh AS (
          SELECT DISTINCT
                 md5(CAST(doc_id - doc_id % 3 AS VARCHAR)) AS fp, host
          FROM hd),
        tot AS (
          SELECT host, CAST(COUNT(*) AS BIGINT) AS n
          FROM fh GROUP BY host),
        ok AS (
          SELECT fp FROM fh GROUP BY fp
          HAVING COUNT(*) BETWEEN 2 AND 1000),
        pr AS (
          SELECT a.host AS host_a, b.host AS host_b,
                 CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM fh a JOIN fh b ON a.fp = b.fp AND a.host < b.host
          WHERE a.fp IN (SELECT fp FROM ok)
          GROUP BY a.host, b.host
          HAVING COUNT(*) >= 1)
        SELECT p.host_a, p.host_b, p.n_shared,
               ta.n AS n_a, tb.n AS n_b,
               ROUND(CAST(p.n_shared AS DOUBLE)
                     / (ta.n + tb.n - p.n_shared), 6) AS jaccard,
               (p.n_shared * 1000 >= 500 * (ta.n + tb.n - p.n_shared))
                 AS is_mirror
        FROM pr p
        JOIN tot ta ON ta.host = p.host_a
        JOIN tot tb ON tb.host = p.host_b
    """,
    # RECURSIVE must lead the WITH chain — rebuild the mirror edges
    # inside it (same CTEs as host_mirror_pairs) then take components
    "mirror_keep_list": _MESSY_URL_CTE.replace(
        "WITH uq AS", "WITH RECURSIVE uq AS") + """
        , fh AS (
          SELECT DISTINCT
                 md5(CAST(doc_id - doc_id % 3 AS VARCHAR)) AS fp, host
          FROM hd),
        tot AS (
          SELECT host, CAST(COUNT(*) AS BIGINT) AS n
          FROM fh GROUP BY host),
        ok AS (
          SELECT fp FROM fh GROUP BY fp
          HAVING COUNT(*) BETWEEN 2 AND 1000),
        pr AS (
          SELECT a.host AS host_a, b.host AS host_b,
                 CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM fh a JOIN fh b ON a.fp = b.fp AND a.host < b.host
          WHERE a.fp IN (SELECT fp FROM ok)
          GROUP BY a.host, b.host),
        me AS (
          SELECT p.host_a, p.host_b
          FROM pr p
          JOIN tot ta ON ta.host = p.host_a
          JOIN tot tb ON tb.host = p.host_b
          WHERE p.n_shared * 1000 >= 500 * (ta.n + tb.n - p.n_shared)),
        und AS (
          SELECT host_a AS s, host_b AS d FROM me
          UNION ALL
          SELECT host_b, host_a FROM me),
        reach(s, d) AS (
          SELECT s, d FROM und
          UNION
          SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s),
        comp AS (
          SELECT s AS host, LEAST(s, MIN(d)) AS canonical_host
          FROM reach GROUP BY s)
        SELECT host, canonical_host,
               (host = canonical_host) AS is_canonical
        FROM comp
    """,
})


ORACLE_SQL.update({
    # round-3 oracles for previously rows-only operators (verdict item #6)
    "embedding_near_dups": """
        SELECT CAST(vec_id AS BIGINT) AS id_a,
               CAST(vec_id + 1000000 AS BIGINT) AS id_b
        FROM embeddings WHERE vec_id % 20 = 0
    """,
    "hll_bigrams_check": """
        SELECT CAST(COUNT(DISTINCT bg) AS BIGINT) AS n_exact,
               TRUE AS within_2pct
        FROM (
            SELECT unnest(list_transform(
                       range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
            FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS w
                  FROM documents WHERE trim(text) <> '')
        )
    """,
    "party_histogram_golden": f"""
        SELECT party, COUNT(*) AS n_mentions FROM (
            SELECT client_name AS party FROM '{_GOLDENS_PARQUET}'
            WHERE client_name IS NOT NULL AND client_name NOT IN ('', 'N/A')
            UNION ALL
            SELECT vendor_name FROM '{_GOLDENS_PARQUET}'
            WHERE vendor_name IS NOT NULL AND vendor_name NOT IN ('', 'N/A')
        ) GROUP BY party
    """,
    "link_graph": """
        WITH targets AS (
            SELECT '/s/' || CAST(j AS VARCHAR) AS path,
                   'Category ' || CAST(j AS VARCHAR) AS anchor,
                   CAST(j AS BIGINT) AS nav_j
            FROM range(12) t(j)
            UNION ALL
            SELECT '/p/' || CAST(j AS VARCHAR),
                   'Related page ' || CAST(j AS VARCHAR) || ' long teaser text',
                   NULL
            FROM range(8) t(j)
            UNION ALL SELECT '/about', 'About', NULL
            UNION ALL SELECT '/privacy', 'Privacy', NULL
        ),
        cls AS (
            SELECT doc_id % 97 AS site,
                   CASE WHEN doc_id % 20 = 13 AND doc_id % 6 = 3 THEN 'none'
                        WHEN doc_id % 20 = 13 THEN 'partial'
                        WHEN doc_id % 6 = 3 THEN 'none'
                        WHEN doc_id % 7 = 3 THEN 'none'
                        ELSE 'full' END AS linkset
            FROM documents),
        counts AS (
            SELECT site,
                   SUM(CASE WHEN linkset = 'full' THEN 1 ELSE 0 END) AS n_full,
                   SUM(CASE WHEN linkset = 'partial' THEN 1 ELSE 0 END) AS n_partial
            FROM cls GROUP BY site),
        agg AS (
            SELECT c.site, t.path, t.anchor,
                   c.n_full + CASE WHEN t.nav_j IS NOT NULL AND t.nav_j < 3
                                   THEN c.n_partial ELSE 0 END AS n
            FROM counts c CROSS JOIN targets t)
        SELECT 'https://site' || CAST(site AS VARCHAR) || '.example' || path
                   AS dst_url,
               CAST(n AS BIGINT) AS n_inlinks,
               CASE WHEN n > 1 THEN repeat(anchor || '|', CAST(n - 1 AS INT)) || anchor
                    ELSE anchor END AS anchors
        FROM agg WHERE n > 0
    """,
})


# The composed curate_full chain: ONE WITH-chain mirroring every stage of
# pipelines/curate_full.py in order. Fragments reuse the already-green
# stage oracles (latest_by_url winner arithmetic, paragraph_dedup hot-set,
# _JACCARD_EDGES shingle jaccard + recursive components, decontaminate
# plants, pii_scrub regexes, sequence_pack window cumsum, shard_shuffle
# md5 rank) so the composition — not just the pieces — is value-gated.
ORACLE_SQL.update({
    "curate_full": f"""
        WITH RECURSIVE
        ptx AS (
          SELECT doc_id,
            text
            || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
            || CASE WHEN doc_id % 9 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-4567 today' ELSE '' END
            || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 200 + 1 AS VARCHAR) || ' logged' ELSE '' END
            || CASE WHEN doc_id % 17 = 0 THEN ' darn17' ELSE '' END
            AS t0
          FROM documents),
        corpus0 AS (
          SELECT doc_id,
                 t0 || CASE WHEN doc_id % 3 = 0 THEN ' rev2' ELSE '' END AS text
          FROM ptx
          UNION ALL
          SELECT doc_id + 1000000, t0 || ' extra' FROM ptx WHERE doc_id % 10 = 0),
        unblocked AS (
          SELECT * FROM corpus0
          WHERE 'src' || CAST((doc_id % 1000000) % 20 AS VARCHAR)
                NOT IN ('src7', 'src13')),
        unbad AS (
          SELECT * FROM unblocked
          WHERE NOT regexp_matches(text, '(?i)\\b(?:darn17|heck23)\\b')),
        qual AS (
          SELECT doc_id, text, string_split(text, ' ') AS w FROM unbad),
        qual2 AS (
          SELECT doc_id, w FROM qual
          WHERE len(w) >= 25 AND 1000 * len(list_distinct(w)) >= 300 * len(w)),
        paras AS (
          SELECT doc_id,
            (CASE WHEN doc_id % 7 = 0 THEN ['{_BP1}'] ELSE [] END)
            || list_transform(range(CAST(ceil(len(w) / 12.0) AS BIGINT)),
                              j -> array_to_string(list_slice(w, j*12 + 1, j*12 + 12), ' '))
            || (CASE WHEN doc_id % 13 = 0 THEN ['{_BP2}'] ELSE [] END) AS ps
          FROM qual2),
        ex AS (SELECT doc_id, unnest(ps) AS para, unnest(range(len(ps))) AS idx FROM paras),
        hot AS (SELECT para FROM ex GROUP BY para HAVING COUNT(DISTINCT doc_id) >= 3),
        kept AS (SELECT e.* FROM ex e LEFT JOIN hot h USING (para) WHERE h.para IS NULL),
        pd AS (
          SELECT p.doc_id,
                 CAST(len(p.ps) AS BIGINT) AS n_paras,
                 CAST(len(p.ps) - COUNT(k.para) AS BIGINT) AS n_removed,
                 COALESCE(string_agg(k.para, chr(10) ORDER BY k.idx), '') AS clean_text
          FROM paras p LEFT JOIN kept k USING (doc_id)
          GROUP BY p.doc_id, len(p.ps)),
        words2 AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(clean_text)), '\\s+') AS w
          FROM pd WHERE trim(clean_text) <> ''),
        sets AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= 3
                      THEN list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                      ELSE [array_to_string(w, ' ')] END AS ws
          FROM words2),
        edges AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sets a JOIN sets b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.ws, b.ws)) * 1.0
                / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.8),
        und AS (SELECT id_a AS s, id_b AS d FROM edges
                UNION ALL SELECT id_b, id_a FROM edges),
        reach(s, d) AS (
          SELECT s, d FROM und
          UNION
          SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s),
        comp AS (SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
                 FROM reach GROUP BY s),
        losers AS (SELECT doc_id FROM comp WHERE doc_id <> cluster_id),
        uniq AS (SELECT pd.* FROM pd LEFT JOIN losers l USING (doc_id)
                 WHERE l.doc_id IS NULL),
        bench AS (
          SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rk,
                 array_to_string(list_slice(string_split(text, ' '), 1, 6), ' ') AS gram
          FROM documents WHERE doc_id % 97 = 0),
        nb AS (SELECT COUNT(*) AS n FROM bench),
        planted AS (
          SELECT u.doc_id, u.n_paras, u.n_removed, u.clean_text,
                 u.clean_text || CASE WHEN u.doc_id % 31 = 0
                      THEN ' ' || (SELECT gram FROM bench b
                                   WHERE b.rk = (u.doc_id // 31) % (SELECT n FROM nb))
                      ELSE '' END AS text2
          FROM uniq u
          WHERE NOT (u.doc_id % 97 = 0 AND u.doc_id < 1000000)),
        decon AS (
          SELECT doc_id, n_paras, n_removed, clean_text FROM planted p
          WHERE NOT EXISTS (SELECT 1 FROM bench b WHERE contains(p.text2, b.gram))),
        pii AS (
          SELECT doc_id, n_paras, n_removed,
            CAST(len(regexp_extract_all(clean_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_emails,
            CAST(len(regexp_extract_all(clean_text, '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS BIGINT) AS n_phones,
            CAST(len(regexp_extract_all(clean_text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ips,
            regexp_replace(
              regexp_replace(
                regexp_replace(clean_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
                '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', '[PHONE]', 'g'),
              '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '[IP]', 'g') AS sc
          FROM decon),
        tok AS (
          SELECT doc_id, n_paras, n_removed, n_emails, n_phones, n_ips,
                 CAST(len(string_split_regex(trim(sc), '\\s+')) AS BIGINT) AS n_tokens
          FROM pii WHERE trim(sc) <> ''),
        ofs AS (
          SELECT *,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS start_offset
          FROM tok),
        sh AS (
          SELECT *, md5(CAST(doc_id AS VARCHAR) || ':shard42') AS prio,
                 CAST(concat('0x',
                   substr(md5(CAST(doc_id AS VARCHAR) || ':shard42'), 1, 8))
                   AS BIGINT) % 8 AS shard_id
          FROM ofs)
        SELECT doc_id,
               'http://src' || CAST((doc_id % 1000000) % 20 AS VARCHAR)
                 || '/doc/' || CAST(doc_id % 1000000 AS VARCHAR)
                 || CASE WHEN doc_id >= 1000000 THEN '-copy' ELSE '' END AS url,
               n_paras, n_removed, n_emails, n_phones, n_ips, n_tokens,
               start_offset,
               CAST(start_offset // 2048 AS BIGINT) AS first_seq,
               CAST((start_offset + n_tokens - 1) // 2048 AS BIGINT) AS last_seq,
               CAST(shard_id AS BIGINT) AS shard_id,
               row_number() OVER (PARTITION BY shard_id
                                  ORDER BY prio, doc_id) - 1 AS shard_pos
        FROM sh
    """,
})


NOSQL_QUERIES = {
    "validate": q_validate,
    "media_frames": q_media_frames,
    "entity_type_histogram": q_entity_type_histogram,
    "pattern_probe": q_pattern_probe,
    "unique_filenames": q_unique_filenames,
    "random_sample": q_random_sample,
    "blocks_parse": q_blocks_parse,
    "training_rows": q_training_rows,
    "csv_projection": q_csv_projection,
    "extraction_docs": q_extraction_docs,
    "extraction_accuracy": q_extraction_accuracy,
    "extraction_status": q_extraction_status,
    "party_histogram": q_party_histogram,
    "organize": q_organize,
    "sanitize_names": q_sanitize_names,
    "ivf_knn": q_ivf_knn,
    "text_analysis": q_text_analysis,
    "translate_names": q_translate_names,
    "clean_corpus": q_clean_corpus,
    "hll_distinct_bigrams": q_hll_distinct_bigrams,
    "phash_near_dups": q_phash_near_dups,
    "video_near_dups": q_video_near_dups,
    "audio_near_dups": q_audio_near_dups,
    "profile_table_approx": q_profile_table_approx,
}




SQL_QUERIES = {
    "event_histogram": q_event_histogram,
    "lineitem_pricing": q_lineitem_pricing,
    "lang_counts": q_lang_counts,
    "distinct_sources": q_distinct_sources,
    "events_hourly": q_events_hourly,
    "docs_filter_project": q_docs_filter_project,
    "ascii_docs": q_ascii_docs,
    "token_counts": q_token_counts,
    "top_docs": q_top_docs,
    "stratified_sample": q_stratified_sample,
    "grouped_topk": q_grouped_topk,
    "mktsegment_revenue": q_mktsegment_revenue,
    "orderstatus_lineitem": q_orderstatus_lineitem,
    "nation_region": q_nation_region,
    "customers_without_orders": q_customers_without_orders,
    "customers_with_orders": q_customers_with_orders,
    "dedup_exact": q_dedup_exact,
    "knn_bruteforce": q_knn_bruteforce,
    "user_sessions": q_user_sessions,
    "regex_extract": q_regex_extract,
    "wordcount_top": q_wordcount_top,
    "sliding_windows": q_sliding_windows,
    "asof_latest_order": q_asof_latest_order,
    "range_join_windows": q_range_join_windows,
    "props_json": q_props_json,
    "jaccard_verify": q_jaccard_verify,
    "cumulative_hourly": q_cumulative_hourly,
    # round-2 newly-oracled operators (planted-fixture arithmetic oracles)
    "minhash_near_dups": q_minhash_near_dups,
    "dedup_keep_list": q_dedup_keep_list,
    "simhash_near_dups": q_simhash_near_dups,
    "contract_edges": q_contract_edges,
    "hierarchy_orphans": q_hierarchy_orphans,
    "key_clause_histogram": q_key_clause_histogram,
    "contract_type_histogram": q_contract_type_histogram,
    "latest_by_url": q_latest_by_url,
    "salted_user_value": q_salted_user_value,
    "validate_documents": q_validate_documents,
    "validate_hierarchy": q_validate_hierarchy,
    "table_cells": q_table_cells,
    # round-2 web-corpus curation family (stages/webclean.py)
    "paragraph_dedup": q_paragraph_dedup,
    "host_boilerplate": q_host_boilerplate,
    "repetition_stats": q_repetition_stats,
    "decontaminate": q_decontaminate,
    "substring_dedup": q_substring_dedup,
    "warc_roundtrip": q_warc_roundtrip,
    "decontaminate_ngrams": q_decontaminate_ngrams,
    "pii_scrub": q_pii_scrub,
    "cosine_pairs_exact": q_cosine_pairs_exact,
    "ivf_knn_fullprobe": q_ivf_knn_fullprobe,
    "heavy_hitters_words": q_heavy_hitters_words,
    "bottomk_sample": q_bottomk_sample,
    "grouped_quantiles": q_grouped_quantiles,
    "lm_perplexity": q_lm_perplexity,
    "ccnet_buckets": q_ccnet_buckets,
    "bm25_topk": q_bm25_topk,
    "grouped_bottomk_sample": q_grouped_bottomk_sample,
    "pagerank": q_pagerank,
    "hits": q_hits,
    "dsir_select": q_dsir_select,
    "triangle_counts": q_triangle_counts,
    "tfidf_keywords": q_tfidf_keywords,
    "snapshot_diff": q_snapshot_diff,
    "recrawl_priority": q_recrawl_priority,
    "split_assign": q_split_assign,
    "collocations_pmi": q_collocations_pmi,
    "chunk_documents": q_chunk_documents,
    "phrase_search": q_phrase_search,
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_clone_pairs": q_winnow_clone_pairs,
    "profile_table": q_profile_table,
    "grouped_top_words": q_grouped_top_words,
    "distinctive_terms": q_distinctive_terms,
    "corpus_drift": q_corpus_drift,
    "approx_quantiles": q_approx_quantiles,
    "sequence_pack": q_sequence_pack,
    "kmeans_clusters": q_kmeans_clusters,
    "semantic_dedup": q_semantic_dedup,
    "mixture_sample": q_mixture_sample,
    "shard_shuffle": q_shard_shuffle,
    "bpe_merges": q_bpe_merges,
    "bpe_token_counts": q_bpe_token_counts,
    "bpe_encode_ids": q_bpe_encode_ids,
    "grouped_zscore": q_grouped_zscore,
    # URL/domain curation family (stages/urls.py)
    "url_parse": q_url_parse,
    "url_canonicalize": q_url_canonicalize,
    "domain_cap": q_domain_cap,
    "url_blocklist": q_url_blocklist,
    "robots_filter": q_robots_filter,
    "host_quality": q_host_quality,
    "host_lang_profile": q_host_lang_profile,
    "host_mirror_pairs": q_host_mirror_pairs,
    "mirror_keep_list": q_mirror_keep_list,
    "resolve_redirects": q_resolve_redirects,
    "perceptron_quality": q_perceptron_quality,
    "perceptron_filter": q_perceptron_filter,
    "incremental_new": q_incremental_new,
    "anchor_text": q_anchor_text,
    # the composed end-to-end corpus job (round-2 verdict item #1)
    "curate_full": q_curate_full,
    # round-3: previously rows-only, now oracled (round-2 verdict item #6)
    "embedding_near_dups": q_embedding_near_dups,
    "hll_bigrams_check": q_hll_bigrams_check,
    "party_histogram_golden": q_party_histogram_golden,
    "link_graph": q_link_graph,
    # round-3 continuation: new first-class curation operators
    "semantic_decontaminate": q_semantic_decontaminate,
    "badwords_filter": q_badwords_filter,
    "profile_approx_check": q_profile_approx_check,
    "c4_line_filter": q_c4_line_filter,
    "gopher_quality_filter": q_gopher_quality_filter,
    "authority_rank": q_authority_rank,
    # cross-corpus incremental near-dedup against a persisted LSH index
    "minhash_against_index": q_minhash_against_index,
    # PQ ANN, lossless degenerate config over the persisted index
    "pq_knn_lossless": q_pq_knn_lossless,
    # BM25 over the persisted two-increment inverted index
    "bm25_index_topk": q_bm25_index_topk,
    # persisted mergeable HLL store: lossless merge + 2% band
    "hll_store_check": q_hll_store_check,
    # sketch-store inclusion-exclusion corpus overlap, banded vs exact
    "corpus_overlap_check": q_corpus_overlap_check,
    # edit-distance near-dup family member (SymSpell blocking, DP verify)
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "fuzzy_token_match": q_fuzzy_token_match,
    # persisted SymSpell index probe == broadcast lookup, shared oracle
    "fuzzy_index_match": q_fuzzy_index_match,
    # one-exchange ROLLUP vs DuckDB's native GROUP BY ROLLUP
    "rollup_revenue": q_rollup_revenue,
    # value-edge ntile vs quantile_disc edges + replayed tie rule
    "length_quartiles": q_length_quartiles,
    # join-free cohort retention vs the LEFT-JOIN SQL formulation
    "hourly_retention": q_hourly_retention,
    # ordered funnel vs the cascade-CTE formulation
    "purchase_funnel": q_purchase_funnel,
    # alpha-sampling: IEEE-exact sqrt rate chain + md5 Bernoulli
    "temperature_sample": q_temperature_sample,
    # wide crosstab vs the CASE-sum formulation
    "lang_pivot": q_lang_pivot,
    # fuzzy pairs -> components -> canonical names (entity resolution)
    "fuzzy_keep_list": q_fuzzy_keep_list,
    # JSONL sink -> source integrity vs parquet recompute
    "jsonl_roundtrip": q_jsonl_roundtrip,
    # grouped HDR quantiles, bit-exact vs quantile_disc over hdr edges
    "grouped_quantiles_approx": q_grouped_quantiles_approx,
    # CSV sink -> source integrity vs parquet recompute
    "csv_roundtrip": q_csv_roundtrip,
    # exact join size from key histograms, no join executed
    "join_cardinality": q_join_cardinality,
    # adaptive join picks the broadcast plan for the dimension table
    "brand_revenue": q_brand_revenue,
    # persisted additive-stats store == one-shot aggregate (shared oracle)
    "events_hourly_store": q_events_hourly_store,
    # persisted HDR store == one-shot sketch (shared bit-exact oracle)
    "stored_quantiles_check": q_stored_quantiles_check,
    # per-user lag() transition counts
    "event_transitions": q_event_transitions,
    # Efraimidis-Spirakis weighted sample, bit-exact hex-priority oracle
    "weighted_sample_docs": q_weighted_sample_docs,
    # per-group HLL distinct banded vs exact, both sides recomputed
    "grouped_distinct_check": q_grouped_distinct_check,
}

ORACLE_SQL.update({
    # persisted two-increment index == bm25_topk over the union corpus —
    # shares its oracle verbatim
    "bm25_index_topk": ORACLE_SQL["bm25_topk"],
    # brute-force levenshtein over the distinct-name cross join
    "fuzzy_name_pairs": """
        WITH n AS (SELECT p_name, COUNT(*) AS c FROM part GROUP BY p_name)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
               CAST(a.c * b.c AS BIGINT) AS n_id_pairs
        FROM n a JOIN n b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    # the global approx_quantiles hdr-edge oracle, GROUP BY lang
    "grouped_quantiles_approx": """
        WITH e AS (
          SELECT lang,
                 CASE WHEN n_chars < 64 THEN n_chars
                 ELSE ((64 | ((n_chars >> (length(printf('%b', n_chars)) - 7)) & 63))
                       << (length(printf('%b', n_chars)) - 7)) END AS edge
          FROM documents)
        SELECT lang,
               quantile_disc(edge, 0.25) AS p25,
               quantile_disc(edge, 0.50) AS p50,
               quantile_disc(edge, 0.75) AS p75
        FROM e GROUP BY lang
    """,
    # plain fact-dimension join + grouped revenue, shared rounding
    "brand_revenue": """
        SELECT p_brand,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    # the same histogram product, which equals the true join count
    "join_cardinality": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_join_rows
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
    # same parquet-truth integrity oracle as jsonl_roundtrip
    "csv_roundtrip": """
        SELECT doc_id, lang,
               CAST(length(text) AS BIGINT) AS n_chars_roundtrip,
               md5(text) AS text_md5
        FROM documents
    """,
    # expected integrity recomputed from the parquet source of truth
    "jsonl_roundtrip": """
        SELECT doc_id, lang,
               CAST(length(text) AS BIGINT) AS n_chars_roundtrip,
               md5(text) AS text_md5
        FROM documents
    """,
    # levenshtein edges + recursive-CTE closure, LEAST/MIN on VARCHAR
    "fuzzy_keep_list": """
        WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
        edges AS (
            SELECT a.p_name AS id_a, b.p_name AS id_b
            FROM n a JOIN n b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 2),
        und AS (
            SELECT id_a AS s, id_b AS d FROM edges
            UNION ALL
            SELECT id_b, id_a FROM edges),
        reach(s, d) AS (
            SELECT s, d FROM und
            UNION
            SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s),
        comp AS (
            SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
            FROM reach GROUP BY s)
        SELECT cluster_id, MIN(doc_id) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM comp GROUP BY cluster_id
    """,
    # the CASE-sum crosstab the operator restates
    "lang_pivot": """
        SELECT source,
               CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
               CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
               CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
               CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh
        FROM documents GROUP BY source
    """,
    # identical div->sqrt->mul->trunc rate chain + md5 coin in SQL
    "temperature_sample": """
        WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        m AS (SELECT MIN(n) AS nmin FROM c),
        t AS (SELECT lang,
                     CASE WHEN n <= nmin THEN 'gggggggg'
                          ELSE printf('%08x', CAST(FLOOR(
                              sqrt(CAST(nmin AS DOUBLE) / n)
                              * 4294967296.0) AS BIGINT)) END AS thr
              FROM c, m)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN t USING (lang)
        WHERE substr(md5(d.doc_id || ':alpha42'), 1, 8) < t.thr
    """,
    # MIN-ts cascade with strict >, one CTE per step
    "purchase_funnel": """
        WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts) AS t
               FROM events e JOIN s1 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > s1.t
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, MIN(e.ts) AS t
               FROM events e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > s2.t
               GROUP BY e.user_id)
        SELECT 'view' AS step,
               CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
        UNION ALL SELECT 'click',
               CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
        UNION ALL SELECT 'purchase',
               CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    """,
    # the lag() window the operator restates distributed
    "event_transitions": """
        WITH o AS (SELECT user_id, event_type,
                          lag(event_type) OVER (
                              PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT prev AS prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM o WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    """,
    # the textbook self-join formulation the operator restates
    "hourly_retention": """
        WITH uh AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
                    FROM events)
        SELECT a.h AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained
        FROM uh a LEFT JOIN uh b
          ON a.user_id = b.user_id AND b.h = a.h + INTERVAL 1 HOUR
        GROUP BY a.h
    """,
    # quantile_disc edges + the stay-low tie rule replayed
    "length_quartiles": """
        WITH e AS (SELECT quantile_disc(n_chars, 0.25) AS e1,
                          quantile_disc(n_chars, 0.50) AS e2,
                          quantile_disc(n_chars, 0.75) AS e3
                   FROM documents)
        SELECT doc_id, n_chars,
               CAST(1 + CAST(n_chars > e1 AS INT)
                      + CAST(n_chars > e2 AS INT)
                      + CAST(n_chars > e3 AS INT) AS BIGINT) AS bucket
        FROM documents, e
    """,
    # native ROLLUP; identical 2-decimal rounding both sides
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    # identical max-of-w-md5 priority replayed in SQL — bit-exact hex
    "weighted_sample_docs": """
        SELECT doc_id, lang, CAST(1 + doc_id % 4 AS BIGINT) AS weight
        FROM documents
        ORDER BY list_max(list_transform(
            range(0, CAST(1 + doc_id % 4 AS BIGINT)),
            j -> md5(doc_id || ':ws42:' || j))) DESC
        LIMIT 100
    """,
    # exact per-language distinct words; band booleans pinned TRUE
    "grouped_distinct_check": r"""
        SELECT lang, CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_exact,
               TRUE AS within_2p5pct
        FROM (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY lang
    """,
    # nearest-dictionary-entry rule replayed with ROW_NUMBER ties
    "fuzzy_token_match": """
        WITH toks AS (
            SELECT p_partkey, string_split(p_name, ' ')[1] AS tok FROM part),
        d(w) AS (VALUES ('red'), ('blue'), ('cold'), ('small'), ('new')),
        best AS (
            SELECT t.p_partkey, d.w,
                   CAST(levenshtein(t.tok, d.w) AS BIGINT) AS dist,
                   ROW_NUMBER() OVER (
                       PARTITION BY t.p_partkey
                       ORDER BY levenshtein(t.tok, d.w), d.w) AS rn
            FROM toks t CROSS JOIN d
            WHERE levenshtein(t.tok, d.w) <= 1)
        SELECT t.p_partkey, t.tok, b.w AS tok_match,
               COALESCE(b.dist, -1) AS tok_match_dist
        FROM toks t LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        USING (p_partkey)
    """,
    # exact side/union/intersection recomputed in SQL; bands pinned TRUE
    "corpus_overlap_check": r"""
        WITH wa AS (
            SELECT DISTINCT word FROM (
                SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
                FROM documents WHERE doc_id % 2 = 0)
            WHERE word <> ''),
        wb AS (
            SELECT DISTINCT word FROM (
                SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
                FROM documents WHERE doc_id % 3 = 0)
            WHERE word <> ''),
        inter AS (SELECT COUNT(*) AS n FROM wa JOIN wb USING (word))
        SELECT CAST((SELECT COUNT(*) FROM wa) + (SELECT COUNT(*) FROM wb)
                    - (SELECT n FROM inter) AS BIGINT) AS n_union_exact,
               CAST((SELECT n FROM inter) AS BIGINT) AS n_inter_exact,
               TRUE AS union_within_3pct,
               TRUE AS inter_within_5pct_of_union,
               TRUE AS jaccard_within_5pct
    """,
    # the SQL side recomputes the exact distinct-word anchor and pins
    # the lossless-merge + band booleans TRUE
    "hll_store_check": r"""
        SELECT CAST(2 AS BIGINT) AS n_increments,
               TRUE AS registers_equal_union,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_exact,
               TRUE AS within_2pct
        FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
              FROM documents)
        WHERE word <> ''
    """,
    # lossless-degenerate PQ over the persisted index == exact knn —
    # same oracle shape as knn_bruteforce / ivf_knn_fullprobe
    "pq_knn_lossless": """
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM embeddings a, embeddings b
        WHERE a.vec_id < 3 AND b.vec_id <> a.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY a.vec_id
            ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id
        ) <= 5
    """,
    "minhash_against_index": """
        WITH
        old_words AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ),
        old_sets AS (
            SELECT doc_id,
                   CASE WHEN len(w) >= 3
                        THEN list_distinct(list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                        ELSE [array_to_string(w, ' ')] END AS ws
            FROM old_words
        ),
        new_corpus AS (
            SELECT doc_id + 2000000 AS doc_id, text || ' updated' AS text
            FROM documents WHERE doc_id % 7 = 0
            UNION ALL
            SELECT doc_id + 3000000,
                   'fresh page about topic ' || CAST(doc_id AS VARCHAR)
            FROM documents WHERE doc_id % 11 = 0
        ),
        new_words AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
            FROM new_corpus WHERE trim(text) <> ''
        ),
        new_sets AS (
            SELECT doc_id,
                   CASE WHEN len(w) >= 3
                        THEN list_distinct(list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                        ELSE [array_to_string(w, ' ')] END AS ws
            FROM new_words
        )
        SELECT n.doc_id AS new_id, o.doc_id AS old_id
        FROM new_sets n JOIN old_sets o
          ON len(list_intersect(n.ws, o.ws)) * 1.0
             / (len(n.ws) + len(o.ws) - len(list_intersect(n.ws, o.ws))) >= 0.8
    """,
    "profile_approx_check": """
        SELECT 'doc_id' AS col_name,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_exact,
               TRUE AS within_2pct FROM documents
        UNION ALL
        SELECT 'lang', CAST(COUNT(DISTINCT lang) AS BIGINT), TRUE FROM documents
        UNION ALL
        SELECT 'source', CAST(COUNT(DISTINCT source) AS BIGINT), TRUE FROM documents
        UNION ALL
        SELECT 'n_chars', CAST(COUNT(DISTINCT n_chars) AS BIGINT), TRUE FROM documents
    """,
    "authority_rank": f"""
        WITH kinds(j, k) AS (
          SELECT * FROM (VALUES (0,'contract'), (1,'plain'), (2,'relation'),
                                (3,'pdf'), (4,'dates'), (5,'cjk')) v(j, k)),
        cls AS (
          SELECT doc_id,
            'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example/'
              || k.k || '/' || CAST(doc_id AS VARCHAR) AS url,
            CASE WHEN doc_id % 20 = 13 AND doc_id % 6 = 3 THEN 'none'
                 WHEN doc_id % 20 = 13 THEN 'partial'
                 WHEN doc_id % 6 = 3 THEN 'none'
                 WHEN doc_id % 7 = 3 THEN 'none'
                 ELSE 'full' END AS linkset
          FROM documents JOIN kinds k ON doc_id % 6 = k.j),
        targets AS (
          SELECT '/s/' || CAST(j AS VARCHAR) AS path, CAST(j AS BIGINT) AS nav_j
          FROM range(12) t(j)
          UNION ALL
          SELECT '/p/' || CAST(j AS VARCHAR), NULL FROM range(8) t(j)
          UNION ALL SELECT '/about', NULL
          UNION ALL SELECT '/privacy', NULL),
        edges AS (
          SELECT d.url AS src,
                 'https://site' || CAST(d.doc_id % 97 AS VARCHAR)
                   || '.example' || t.path AS dst
          FROM cls d CROSS JOIN targets t
          WHERE d.linkset = 'full'
             OR (d.linkset = 'partial' AND t.nav_j IS NOT NULL AND t.nav_j < 3)),
        nodes AS (SELECT DISTINCT src AS node FROM edges
                  UNION SELECT DISTINCT dst FROM edges),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        od AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
        ew AS (SELECT e.src, e.dst, od.od FROM edges e JOIN od USING (src)),
        r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes)
        {{_PR_URL_ROUNDS}}
        SELECT node AS url, ROUND(r, 8) AS pagerank FROM r3
    """.replace("{_PR_URL_ROUNDS}", "".join(
        f''',
        r{i} AS (SELECT nd.node,
                   0.15/(SELECT n FROM nn)
                   + 0.85*COALESCE(SUM(r{i-1}.r/ew.od), 0) AS r
                 FROM nodes nd
                 LEFT JOIN ew ON ew.dst = nd.node
                 LEFT JOIN r{i-1} ON r{i-1}.node = ew.src
                 GROUP BY nd.node)'''
        for i in range(1, 4))),
    "semantic_decontaminate": """
        WITH bench AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 = 0),
        corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 2000000,
                 list_transform(embedding,
                                (x, i) -> x * (1 + 0.002 * (((vec_id + i) % 5) - 2)))
          FROM bench WHERE vec_id % 2 = 0)
        SELECT c.vec_id
        FROM corpus c
        WHERE NOT EXISTS (
          SELECT 1 FROM bench b
          -- norm guards: zero vectors give NaN cosine, and DuckDB
          -- orders NaN greatest (NaN >= 0.9 is TRUE) — the operator
          -- treats zero-norm rows as no-evidence instead
          WHERE list_dot_product(c.embedding, c.embedding) > 0
            AND list_dot_product(b.embedding, b.embedding) > 0
            AND list_cosine_similarity(c.embedding, b.embedding) >= 0.9)
    """,
    "gopher_quality_filter": """
        WITH corpus AS (
          SELECT doc_id,
            CASE WHEN doc_id % 23 = 0 THEN t1 || ' ' || trim(repeat('#h ', 40))
                 ELSE t1 END AS text
          FROM (
            SELECT doc_id,
              CASE WHEN doc_id % 19 = 0
                   THEN array_to_string(list_slice(string_split(t0, ' '), 1, 10), ' ')
                   ELSE t0 END AS t1
            FROM (
              SELECT doc_id,
                CASE WHEN doc_id % 41 = 0 THEN trim(repeat('zz ', 60))
                     ELSE text END AS t0
              FROM documents))),
        stats AS (
          SELECT doc_id,
            CAST(len(w) AS BIGINT) AS n_words,
            CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS n_word_chars,
            CAST(len(list_filter(['the', 'a', 'to', 'of'],
                                 s -> list_contains(w, s))) AS BIGINT) AS n_stopwords,
            CAST(len(list_filter(w, x -> x LIKE '#%')) AS BIGINT) AS n_hashtag_words
          FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus))
        SELECT doc_id, n_words, n_word_chars, n_stopwords, n_hashtag_words
        FROM stats
        WHERE n_words BETWEEN 50 AND 100000
          AND 3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
          AND n_stopwords >= 2
          AND 1000 * n_hashtag_words <= 100 * n_words
    """,
    "c4_line_filter": r"""
        WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        lined AS (
          SELECT doc_id,
            list_transform(range(CAST(ceil(len(w) / 6.0) AS BIGINT)),
              j -> array_to_string(list_slice(w, j*6 + 1, j*6 + 6), ' ')
                   || CASE WHEN (doc_id + j) % 17 = 0 THEN ' javascript' ELSE '' END
                   || CASE WHEN (doc_id + j) % 4 <> 0 THEN '.' ELSE '' END)
            || (CASE WHEN doc_id % 29 = 0
                THEN ['these lines look like Lorem Ipsum dolor text.'] ELSE [] END)
            || (CASE WHEN doc_id % 31 = 0
                THEN ['var cfg = { mode: fast }.'] ELSE [] END) AS ls
          FROM base),
        pages AS (
          SELECT doc_id, ls FROM lined
          WHERE NOT regexp_matches(array_to_string(ls, chr(10)), '(?i)lorem ipsum')
            AND NOT contains(array_to_string(ls, chr(10)), '{')),
        ex AS (SELECT doc_id, unnest(ls) AS line, unnest(range(len(ls))) AS idx
               FROM pages),
        kept AS (
          SELECT * FROM ex
          WHERE regexp_matches(line, '[.!?"]\s*$')
            AND len(regexp_split_to_array(trim(line), '\s+')) >= 5
            AND NOT regexp_matches(line, '(?i)javascript')),
        agg AS (
          SELECT p.doc_id,
                 CAST(COUNT(k.line) AS BIGINT) AS n_lines_kept,
                 COALESCE(string_agg(k.line, chr(10) ORDER BY k.idx), '') AS clean_text
          FROM pages p LEFT JOIN kept k USING (doc_id)
          GROUP BY p.doc_id)
        SELECT doc_id, n_lines_kept, clean_text FROM agg WHERE n_lines_kept >= 3
    """,
    "badwords_filter": r"""
        WITH corpus AS (
          SELECT doc_id, lang,
            text
            || CASE WHEN doc_id % 17 = 0 THEN ' Darn17 extra' ELSE '' END
            || CASE WHEN doc_id % 23 = 0 THEN ' heck23' ELSE '' END
            || CASE WHEN doc_id % 41 = 0 THEN ' xdarn17y' ELSE '' END AS text
          FROM documents)
        SELECT doc_id, lang FROM corpus
        WHERE NOT regexp_matches(text, '(?i)\b(?:darn17|frig31|heck23)\b')
    """,
})

# the persisted-index probe reproduces fuzzy_token_match exactly —
# shares its oracle verbatim (must follow the update that defines it)
ORACLE_SQL["fuzzy_index_match"] = ORACLE_SQL["fuzzy_token_match"]

# the merged stats store equals events_hourly over the union of its
# increments — shares that oracle verbatim
ORACLE_SQL["events_hourly_store"] = ORACLE_SQL["events_hourly"]
# HDR histograms add exactly, so the merged store equals the one-shot
# sketch — shares approx_quantiles' bit-exact hdr-edge oracle
ORACLE_SQL["stored_quantiles_check"] = ORACLE_SQL["approx_quantiles"]


# --- ordered-window wave (ops/window.py): sessionization, running ---
# aggregates, top-k per group, grouped z-score outliers — the SQL
# window-function family restated as one-hash-exchange Dataset scans.

def q_session_summaries(sf_dir: str):
    """Gap-based sessionization (ops/window.sessionize): one row per
    (user, session) under a 12-hour inactivity gap — lag()/cumulative-
    sum window cascade restated as a per-user sorted scan; session
    summaries (not per-event rows) leave the group task."""
    from .ops.window import sessionize

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    return sessionize(ds, "user_id", "ts", 12 * 3600, "event_id")


def q_running_value(sf_dir: str):
    """Per-event running + trailing-5 sums of integer cents per user
    (ops/window.running_window): SUM() OVER (PARTITION BY user ORDER BY
    ts, event_id ROWS …) with exact int64 math (floor(value*100)), so
    the cumulative aggregates are bit-identical to the SQL window."""
    from .ops.window import running_window

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    return running_window(ds, "user_id", "ts", "value", 5, "event_id")



def q_value_outliers(sf_dir: str):
    """Grouped z-score outliers (ops/window.zscore_outliers): events
    whose value sits > 2 sample-stddevs from its event_type mean. One
    narrow (n, Σv, Σv²) aggregate broadcasts; the corpus rides no
    exchange. Boundary margin measured ≥ 4e-5 relative at sf0.1 vs the
    ~1e-12 float divergence between the two sides."""
    from .ops.window import zscore_outliers

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return zscore_outliers(ds, "event_type", "value", 2.0)


SQL_QUERIES.update({
    "session_summaries": q_session_summaries,
    "running_value": q_running_value,
    "value_outliers": q_value_outliers,
})

ORACLE_SQL.update({
    "session_summaries": """
        WITH o AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL 12 HOUR
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts,
                 SUM(brk) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM o)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, session_idx
    """,
    "running_value": """
        SELECT event_id, user_id,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS moving_cents
        FROM events
    """,
    # same closed-form (n, Σv, Σv²) the operator broadcasts
    "value_outliers": """
        WITH st AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                           SUM(value) AS s, SUM(value * value) AS s2
                    FROM events GROUP BY event_type),
        x AS (SELECT e.event_id, e.event_type, e.value,
                     s.s / s.n AS m,
                     sqrt(greatest((s.s2 - s.n * (s.s/s.n) * (s.s/s.n))
                                   / greatest(s.n - 1, 1), 0)) AS sd
              FROM events e JOIN st s USING (event_type))
        SELECT event_id, event_type, value
        FROM x WHERE abs(value - m) > 2.0 * sd
    """,
})


def q_segment_balance_fullouter(sf_dir: str):
    """FULL OUTER join surface (ops/joins.hash_join join_type=
    'full_outer', both sides armored, both sentinel sets stripped from
    the coalesced key): per-customer order totals (exact integer cents)
    ⟗ BUILDING-segment membership — unmatched rows survive from BOTH
    sides (orders by non-BUILDING customers; BUILDING customers with no
    orders). Left side is an aggregate lineage, so its schema is passed
    to keep the armor probe from re-executing it; partitions track the
    KNOWN key cardinality (≤ |customer|, metadata-cheap) instead of
    spinning 32 aggregators for a keyset-sized exchange — the
    CLAUDE.md adaptive_partitions pattern."""
    from ray.data.aggregate import Count, Sum

    from .ops.joins import adaptive_partitions, hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(
            pc.cast(t["o_totalprice"], pa.float64()), 100.0)), pa.int64())
        return pa.table({"o_custkey": t["o_custkey"], "_c": c})

    agg = (orders.map_batches(cents, batch_format="pyarrow")
           .groupby("o_custkey")
           .aggregate(Sum("_c", alias_name="total_cents"),
                      Count(alias_name="n_orders")))

    def seg_fn(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        return pa.table({
            "c_custkey": f["c_custkey"],
            "in_segment": pa.array([True] * len(f), pa.bool_()),
        })

    seg = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
           .map_batches(seg_fn, batch_format="pyarrow"))

    n_cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"]).count()
    out = hash_join(
        agg, seg, on="o_custkey", right_on="c_custkey",
        join_type="full_outer",
        num_partitions=adaptive_partitions(n_cust),
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("total_cents", pa.int64()),
                               ("n_orders", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("in_segment", pa.bool_())]))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": t["o_custkey"],
            "total_cents": pc.fill_null(t["total_cents"], 0),
            "n_orders": pc.fill_null(t["n_orders"], 0),
            "in_segment": pc.fill_null(t["in_segment"], False),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_QUERIES.update({
    "segment_balance_fullouter": q_segment_balance_fullouter,
})

ORACLE_SQL.update({
    "segment_balance_fullouter": """
        WITH agg AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS total_cents,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY o_custkey),
        seg AS (
          SELECT c_custkey, TRUE AS in_segment
          FROM customer WHERE c_mktsegment = 'BUILDING')
        SELECT COALESCE(a.o_custkey, s.c_custkey) AS custkey,
               COALESCE(a.total_cents, 0) AS total_cents,
               COALESCE(a.n_orders, 0) AS n_orders,
               COALESCE(s.in_segment, FALSE) AS in_segment
        FROM agg a FULL OUTER JOIN seg s ON a.o_custkey = s.c_custkey
    """,
})


def q_incremental_refresh(sf_dir: str):
    """Composed incremental-refresh flagship (pipelines/refresh.
    incremental_refresh): day-1 recrawl (every %3 doc edited, %7 urls
    missing, %13 genuinely new pages) diffed against the day-0 corpus →
    added/changed work-list → token counts → near-dup match against the
    day-0 corpus's PERSISTED MinHash index (the base corpus is never
    re-read) → (url, status, n_tokens, base_dup) manifest. Every
    exchange is increment-sized; ONE WITH-chain oracle value-gates the
    whole composition."""
    from .pipelines.refresh import incremental_refresh

    index_dir = _minhash_index_dir(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def as_old(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "url": pa.array([f"u{d}" for d in ids], pa.string()),
            "doc_id": t["doc_id"],
            "text": t["text"],
        })

    def as_new(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        urls, out_ids, out_txt = [], [], []
        for d, x in zip(ids, texts):
            if d % 7 != 0:
                urls.append(f"u{d}")
                out_ids.append(int(d))
                out_txt.append((x or "") + (" updated v2" if d % 3 == 0
                                            else ""))
            if d % 13 == 0:
                urls.append(f"a{d}")
                out_ids.append(int(d) + 4_000_000)
                out_txt.append(f"fresh page about topic {d} "
                               f"with deterministic content {d * 7}")
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "doc_id": pa.array(out_ids, pa.int64()),
            "text": pa.array(out_txt, pa.string()),
        })

    return incremental_refresh(
        docs.map_batches(as_old, batch_format="pyarrow"),
        docs.map_batches(as_new, batch_format="pyarrow"),
        index_dir)


SQL_QUERIES.update({
    "incremental_refresh": q_incremental_refresh,
})

ORACLE_SQL.update({
    "incremental_refresh": r"""
        WITH oldc AS (
          SELECT doc_id, 'u' || CAST(doc_id AS VARCHAR) AS url, text
          FROM documents),
        newc AS (
          SELECT doc_id, 'u' || CAST(doc_id AS VARCHAR) AS url,
                 text || CASE WHEN doc_id % 3 = 0
                              THEN ' updated v2' ELSE '' END AS text
          FROM documents WHERE doc_id % 7 <> 0
          UNION ALL
          SELECT doc_id + 4000000, 'a' || CAST(doc_id AS VARCHAR),
                 'fresh page about topic ' || CAST(doc_id AS VARCHAR)
                   || ' with deterministic content '
                   || CAST(doc_id * 7 AS VARCHAR)
          FROM documents WHERE doc_id % 13 = 0),
        work AS (
          SELECT n.doc_id, n.url, n.text,
                 CASE WHEN o.url IS NULL THEN 'added'
                      ELSE 'changed' END AS status
          FROM newc n LEFT JOIN oldc o USING (url)
          WHERE o.url IS NULL OR o.text <> n.text),
        old_words AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
          FROM oldc WHERE trim(text) <> ''),
        old_sets AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= 3
                      THEN list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                      ELSE [array_to_string(w, ' ')] END AS ws
          FROM old_words),
        new_words AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
          FROM work WHERE trim(text) <> ''),
        new_sets AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= 3
                      THEN list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                      ELSE [array_to_string(w, ' ')] END AS ws
          FROM new_words),
        dups AS (
          SELECT DISTINCT n.doc_id
          FROM new_sets n JOIN old_sets o
            ON len(list_intersect(n.ws, o.ws)) * 1.0
               / (len(n.ws) + len(o.ws) - len(list_intersect(n.ws, o.ws)))
               >= 0.8)
        SELECT w.url, w.status,
               CASE WHEN trim(w.text) = '' THEN 0
                    ELSE CAST(len(regexp_split_to_array(trim(w.text), '\s+'))
                              AS BIGINT) END AS n_tokens,
               (w.doc_id IN (SELECT doc_id FROM dups)) AS base_dup
        FROM work w
    """,
})


def q_user_active_time(sf_dir: str):
    """Interval-union coverage (ops/window.interval_union): each event
    opens a [ts, ts + (floor(value)+1) min) activity interval; overlaps
    and touches merge; output = exact covered µs per user. The SQL
    islands technique (windowed running MAX + gap flags) replayed as a
    per-user sorted scan — integer µs end to end."""
    from .ops.window import interval_union

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def iv(t: pa.Table) -> pa.Table:
        s = pc.cast(t["ts"], pa.int64())
        dur = pc.multiply(
            pc.add(pc.cast(pc.floor(t["value"]), pa.int64()), 1),
            pa.scalar(60_000_000, pa.int64()))
        return pa.table({"user_id": t["user_id"], "s": s,
                         "e": pc.add(s, dur)})

    return interval_union(ds.map_batches(iv, batch_format="pyarrow"),
                          "user_id", "s", "e")


def q_url_versions(sf_dir: str):
    """SCD2 crawl version history (ops/window.scd2_history): a 4-capture
    stream per url (content changes at capture 2 for every 4th doc;
    repeat captures compact away) → (url, version, valid_from,
    valid_to, digest) validity intervals, open end pinned to a sentinel
    timestamp so current versions value-hash stably. Oracle = the
    lag()/lead() window formulation."""
    from .ops.window import scd2_history

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def captures(t: pa.Table) -> pa.Table:
        base = np.datetime64("2024-01-01", "us")
        urls, ts, cap, dig = [], [], [], []
        for d in t["doc_id"].to_pylist():
            for k in range(4):
                urls.append(f"u{d}")
                ts.append(base + np.timedelta64(d % 11, "h")
                          + np.timedelta64(k, "D"))
                cap.append(d * 10 + k)
                dig.append(f"v1-{d}" if k >= 2 and d % 4 == 0
                           else f"v0-{d}")
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "ts": pa.array(np.array(ts, "datetime64[us]"),
                           pa.timestamp("us")),
            "cap_id": pa.array(cap, pa.int64()),
            "digest": pa.array(dig, pa.string()),
        })

    caps = docs.map_batches(captures, batch_format="pyarrow")
    return scd2_history(caps, "url", "ts", "digest", "cap_id",
                        open_end=pd.Timestamp("2200-01-01"))


SQL_QUERIES.update({
    "user_active_time": q_user_active_time,
    "url_versions": q_url_versions,
})

ORACLE_SQL.update({
    "user_active_time": """
        WITH i AS (
          SELECT user_id, epoch_us(ts) AS s,
                 epoch_us(ts)
                   + (CAST(FLOOR(value) AS BIGINT) + 1) * 60000000 AS e
          FROM events),
        m AS (
          SELECT user_id, s, e,
                 MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pm
          FROM i),
        g AS (
          SELECT user_id, s, e,
                 SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY s, e
                         ROWS UNBOUNDED PRECEDING) AS isl
          FROM m),
        a AS (SELECT user_id, isl, MAX(e) - MIN(s) AS len
              FROM g GROUP BY user_id, isl)
        SELECT user_id, CAST(SUM(len) AS BIGINT) AS covered_us
        FROM a GROUP BY user_id
    """,
    "url_versions": """
        WITH caps AS (
          SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
                 TIMESTAMP '2024-01-01' + to_hours(doc_id % 11)
                   + to_days(CAST(k AS INT)) AS ts,
                 doc_id * 10 + k AS cap_id,
                 CASE WHEN k >= 2 AND doc_id % 4 = 0
                      THEN 'v1-' || CAST(doc_id AS VARCHAR)
                      ELSE 'v0-' || CAST(doc_id AS VARCHAR) END AS digest
          FROM documents, range(4) r(k)),
        o AS (
          SELECT url, ts, digest,
                 lag(digest) OVER (PARTITION BY url
                                   ORDER BY ts, cap_id) AS pd
          FROM caps),
        v AS (SELECT url, ts AS valid_from, digest
              FROM o WHERE pd IS NULL OR digest <> pd),
        w AS (
          SELECT url, valid_from, digest,
                 COALESCE(lead(valid_from) OVER (PARTITION BY url
                                                 ORDER BY valid_from),
                          TIMESTAMP '2200-01-01') AS valid_to,
                 row_number() OVER (PARTITION BY url
                                    ORDER BY valid_from) AS version
          FROM v)
        SELECT url, CAST(version AS BIGINT) AS version,
               valid_from, valid_to, digest
        FROM w
    """,
})


def q_webdataset_roundtrip(sf_dir: str):
    """WebDataset tar-shard interchange end-to-end (io/webdataset.py):
    documents → content-keyed deterministic tar shards (md5(key) mod S
    membership, pinned tar metadata — re-runs are byte-identical) →
    streamed tar source → per-doc integrity row. Oracle recomputes
    length + md5 straight from parquet, so any sample-grouping,
    encoding or ordering drift in the tar path hash-mismatches."""
    import hashlib as _hl
    import os

    from .io.webdataset import read_webdataset, write_webdataset

    out = _tmp_cache("wds", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

        def keyed(t: pa.Table) -> pa.Table:
            return pa.table({
                "key": pa.array([f"{d:010d}" for d in
                                 t["doc_id"].to_pylist()], pa.string()),
                "text": t["text"],
                "lang": t["lang"],
            })

        manifest = write_webdataset(
            docs.map_batches(keyed, batch_format="pyarrow"), out,
            "key", text_cols=("text", "lang"))
        assert manifest.count() > 0
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass

    shards = [os.path.join(out, f) for f in sorted(os.listdir(out))
              if f.endswith(".tar")]
    ds = read_webdataset(shards, "key", text_cols=("text", "lang"))

    def integrity(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": pa.array([int(k) for k in t["key"].to_pylist()],
                               pa.int64()),
            "lang": t["lang"],
            "n_chars_roundtrip": pc.cast(pc.utf8_length(t["text"]),
                                         pa.int64()),
            "text_md5": pa.array(
                [_hl.md5((x or "").encode()).hexdigest() for x in texts],
                pa.string()),
        })

    return ds.map_batches(integrity, batch_format="pyarrow")


SQL_QUERIES.update({
    "webdataset_roundtrip": q_webdataset_roundtrip,
})

ORACLE_SQL.update({
    "webdataset_roundtrip": """
        SELECT doc_id, lang,
               CAST(length(text) AS BIGINT) AS n_chars_roundtrip,
               md5(text) AS text_md5
        FROM documents
    """,
})


def q_jsonl_gz_roundtrip(sf_dir: str):
    """Gzip JSONL interchange (io/export.write_jsonl_gz): documents →
    content-keyed deterministic .jsonl.gz shards (canonical JSON, gzip
    mtime pinned, atomic-rename resume) → parallel gz-aware source →
    per-doc integrity row; shares the jsonl_roundtrip parquet-truth
    oracle verbatim."""
    import hashlib as _hl
    import os

    from .io.export import read_jsonl, write_jsonl_gz

    out = _tmp_cache("jlgz", sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
        assert write_jsonl_gz(docs, out, "doc_id").count() > 0
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass

    files = [os.path.join(out, f) for f in sorted(os.listdir(out))
             if f.endswith(".jsonl.gz")]
    ds = read_jsonl(files)

    def integrity(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_chars_roundtrip": pc.cast(pc.utf8_length(t["text"]),
                                         pa.int64()),
            "text_md5": pa.array(
                [_hl.md5((x or "").encode()).hexdigest() for x in texts],
                pa.string()),
        })

    return ds.map_batches(integrity, batch_format="pyarrow")


SQL_QUERIES.update({
    "jsonl_gz_roundtrip": q_jsonl_gz_roundtrip,
})
ORACLE_SQL["jsonl_gz_roundtrip"] = ORACLE_SQL["jsonl_roundtrip"]


def q_value_mad_outliers(sf_dir: str):
    """Robust grouped outliers (ops/stats.mad_outliers): events whose
    integer-cents value deviates from its event_type MEDIAN by > 5×
    the group MAD — the mean-proof sibling of value_outliers. Two
    narrow distinct-value exchanges + broadcasts; the corpus rides no
    exchange; integer math end to end (bit-exact vs quantile_disc)."""
    from .ops.stats import mad_outliers

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", pc.cast(
            pc.floor(pc.multiply(pc.cast(t["value"], pa.float64()), 100.0)),
            pa.int64()))

    flagged = mad_outliers(ds.map_batches(cents, batch_format="pyarrow"),
                           "event_type", "cents", k=5)
    return flagged.map_batches(
        lambda t: t.select(["event_id", "event_type", "value"]),
        batch_format="pyarrow")


def q_value_trend(sf_dir: str):
    """Per-group least-squares trend (ops/stats.grouped_linreg): cents
    regressed on hours-since-corpus-epoch per event_type, from ONE
    narrow exact-int64 (n, Σx, Σy, Σxy, Σx²) aggregate; slope and
    intercept derive via one pinned float64 expression so even the
    float outputs value-hash against SQL."""
    from .ops.stats import grouped_linreg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    origin = np.datetime64("2024-01-01", "us").astype(np.int64)

    def xy(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = (us - origin) // 3_600_000_000
        y = np.floor(t["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pa.table({"event_type": t["event_type"],
                         "x": pa.array(x, pa.int64()),
                         "y": pa.array(y, pa.int64())})

    return grouped_linreg(ds.map_batches(xy, batch_format="pyarrow"),
                          "event_type", "x", "y")


SQL_QUERIES.update({
    "value_mad_outliers": q_value_mad_outliers,
    "value_trend": q_value_trend,
})

ORACLE_SQL.update({
    "value_mad_outliers": """
        WITH c AS (SELECT event_id, event_type, value,
                          CAST(FLOOR(value * 100) AS BIGINT) AS cents
                   FROM events),
        m AS (SELECT event_type, quantile_disc(cents, 0.5) AS med
              FROM c GROUP BY event_type),
        d AS (SELECT c.event_id, c.event_type, c.value,
                     abs(c.cents - m.med) AS dev
              FROM c JOIN m USING (event_type)),
        md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
               FROM d GROUP BY event_type)
        SELECT d.event_id, d.event_type, d.value
        FROM d JOIN md USING (event_type)
        WHERE d.dev > 5 * md.mad
    """,
    "value_trend": """
        WITH c AS (
          SELECT event_type,
                 (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
                   // 3600000000 AS x,
                 CAST(FLOOR(value * 100) AS BIGINT) AS y
          FROM events),
        s AS (
          SELECT event_type,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(x) AS DOUBLE) AS sx,
                 CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(x * y) AS DOUBLE) AS sxy,
                 CAST(SUM(x * x) AS DOUBLE) AS sxx
          FROM c GROUP BY event_type)
        SELECT event_type,
               CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                    ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx)
                    END AS slope,
               CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                    ELSE (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                          * sx) / n END AS intercept,
               CAST(n AS BIGINT) AS n
        FROM s
    """,
})


def q_length_mode(sf_dir: str):
    """Grouped mode (ops/stats.grouped_mode): each language's most
    frequent doc length — blocks pre-compress to (lang, n_chars, count)
    partials, one narrow exchange, partition-grouped vectorized argmax
    with the ties→smallest rule pinned both sides."""
    from .ops.stats import grouped_mode

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "n_chars"])
    return grouped_mode(docs, "lang", "n_chars")


SQL_QUERIES.update({"length_mode": q_length_mode})
ORACLE_SQL.update({
    "length_mode": """
        WITH c AS (SELECT lang, n_chars AS v, COUNT(*) AS n
                   FROM documents WHERE n_chars IS NOT NULL
                   GROUP BY lang, n_chars),
        r AS (SELECT lang, v, n,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n DESC, v) AS rk
              FROM c)
        SELECT lang, v AS mode_value, CAST(n AS BIGINT) AS n
        FROM r WHERE rk = 1
    """,
})


def q_pdf_extract_roundtrip(sf_dir: str):
    """REAL-PDF extraction round trip (functions/pdfreal.py → the shared
    layout geometry in functions/layout.py): every document is serialized
    as genuine PDF 1.4 bytes (text objects, Flate-compressed streams, one
    8-word line per text object, 4 body lines per page, a repeated
    'Corpus Report Page' header planted on every page of multi-page docs)
    and re-extracted through the full is_pdf_payload dispatch. Geometry
    places each line in its own 24-pt furniture band (y = 40+24·(5i+p)),
    so the header — identical text in band 0 on every page — is the ONLY
    furniture; every body line exits as its own block, so the extracted
    text is exactly the source text with every 8th space turned into a
    newline, which the oracle reproduces with one regexp_replace. Any
    drift in the PDF tokenizer, Flate path, furniture detector or
    reading order hash-mismatches."""
    from .functions.layout import extract_pdf_text
    from .functions.pdfreal import build_pdf

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def roundtrip(t: pa.Table) -> pa.Table:
        out = []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            words = (x or "").split(" ")
            chunks = [" ".join(words[j:j + 8])
                      for j in range(0, len(words), 8)]
            npages = (len(chunks) + 3) // 4
            pages = []
            for p in range(npages):
                lines = []
                if npages >= 2:
                    lines.append({"x": 50, "y": 10, "h": 10,
                                  "text": "Corpus Report Page"})
                for i, c in enumerate(chunks[p * 4:(p + 1) * 4]):
                    lines.append({"x": 50, "y": 40 + 24 * (5 * i + p),
                                  "h": 10, "text": c})
                pages.append({"width": 612, "height": 792, "lines": lines})
            text, _, status, err = extract_pdf_text(
                build_pdf(pages, compress=True))
            out.append((d, text if status == "converted" else ""))
        return pa.table({
            "doc_id": pa.array([d for d, _ in out], pa.int64()),
            "text": pa.array([s for _, s in out], pa.string()),
        })

    return docs.map_batches(roundtrip, batch_format="pyarrow")


SQL_QUERIES.update({"pdf_extract_roundtrip": q_pdf_extract_roundtrip})
ORACLE_SQL.update({
    "pdf_extract_roundtrip": r"""
        SELECT doc_id,
               regexp_replace(text, '((\S+ ){7}\S+) ',
                              '\1' || chr(10), 'g') AS text
        FROM documents
    """,
})


def q_hamming_near_dups_planted(sf_dir: str):
    """Hash-level oracle for the phash near-dup machinery (round-3
    verdict #6): SQL can't decode BMPs, but it CAN xor/bit_count 64-bit
    integers — so the fingerprints are planted by doc-id arithmetic
    (md5 first-8-bytes, big-endian; every 10th doc gains a companion
    one bit-flip away) and `stages/multimodal.hamming_near_dup_pairs`
    (the band-explode / bucket / popcount-verify / min-dedup core that
    phash_near_dups feeds after decode) runs the full distributed path.
    Recall is EXACT for max_hamming < bands, so the pair set — organic
    md5 collisions included, if any — equals DuckDB's brute-force
    bit_count(xor(...)) join verbatim."""
    import hashlib as _hl

    from .stages.multimodal import hamming_near_dup_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.array([int.from_bytes(
            _hl.md5(str(int(d)).encode()).digest()[:8], "big")
            for d in ids], dtype=np.uint64)
        twins = ids % 10 == 0
        tid = ids[twins] + 100_000
        th = h[twins] ^ (np.uint64(1) << (ids[twins] % 64).astype(np.uint64))
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, tid]), pa.int64()),
            "h": pa.array(np.concatenate([h, th]), pa.uint64()),
        })

    hashed = docs.map_batches(plant, batch_format="pyarrow")
    return hamming_near_dup_pairs(hashed, id_col="doc_id", hash_col="h",
                                  max_hamming=3, bands=4)


def q_ivf_knn_recall_check(sf_dir: str):
    """Band oracle for the APPROXIMATE IVF path (round-3 verdict #6) on
    a PLANTED-CLUSTER corpus — IVF's designed regime (the embeddings
    table is near-uniform, where pruning loses neighbors by
    construction; measured 1-5/5 across n_probe there). Vectors are
    doc-id arithmetic (8-dim: 10·onehot(doc_id%8) + 0.01·((doc_id·(j+1))%7)
    jitter), so DuckDB reconstructs them VERBATIM and its exact cosine
    window is the truth; Ray runs BOTH the exact scatter-gather kNN
    (id-sum value-hash-gated) and the pruned ivf_knn (n_probe=4 of 16)
    whose recall ≥ 0.8 boolean the oracle pins TRUE — cluster margins
    (~1 vs ~0.01 cosine) make the band robust at every sf."""
    from .stages.similarity import ivf_knn, knn_scatter_gather

    def vecs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.arange(8)
        v = (10.0 * (ids[:, None] % 8 == j[None, :])
             + 0.01 * ((ids[:, None] * (j[None, :] + 1)) % 7))
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float64())),
        })

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    ds = docs.map_batches(vecs, batch_format="pyarrow")
    qids = np.array([0, 1, 2], dtype=np.int64)
    j = np.arange(8)
    Q = (10.0 * (qids[:, None] % 8 == j[None, :])
         + 0.01 * ((qids[:, None] * (j[None, :] + 1)) % 7))
    exact = {}
    for r in knn_scatter_gather(ds, Q, qids, k=5).take_all():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in ivf_knn(ds, Q, qids, k=5, n_centroids=16,
                     n_probe=4).take_all():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rows = []
    for q in sorted(exact):
        hits = len(exact[q] & approx.get(q, set()))
        rows.append((q, sum(exact[q]), hits >= 4))  # recall ≥ 0.8 of k=5
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "exact_id_sum": pa.array([r[1] for r in rows], pa.int64()),
        "recall_ok": pa.array([r[2] for r in rows], pa.bool_()),
    })


def q_random_sample_check(sf_dir: str):
    """Count-band oracle for T5's seeded ``random_sample`` (round-3
    verdict #6): the realized sample fraction must sit within ±0.05 of
    the requested 0.1 (≫ 3σ of Binomial(n, 0.1) at every sf); DuckDB
    pins (COUNT(*), TRUE). The sampled ROWS stay engine-defined — this
    gates the contract a sampler actually promises, the rate."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    total = ds.count()
    n = ds.random_sample(0.1, seed=42).count()
    ok = abs(n / total - 0.1) <= 0.05
    return pa.table({
        "n_total": pa.array([total], pa.int64()),
        "frac_ok": pa.array([bool(ok)], pa.bool_()),
    })


def q_shared_hash_pairs_planted(sf_dir: str):
    """Hash-level oracle for the video/audio near-dup pair core
    (stages/multimodal._shared_hash_pairs — the partition-grouped
    triu-run exchange both operators feed after decode): SQL cannot
    decode RVID/WAV, but the pair machinery works on (fhash, id) rows,
    so the hashes are planted by doc-id arithmetic — every run of 3
    consecutive doc_ids shares 4 'frame hashes', and every 50th doc
    additionally carries storm hashes {0, 1} so the ``max_hash_ids``
    cap (64) is EXERCISED at sf ≥ 0.01 (>64 carriers → the run is
    skipped and those pairs vanish) and idle below it. DuckDB mirrors
    the plant, the cap (HAVING ≤ 64) and the min_shared=2 threshold
    verbatim, so the pair set value-hash-gates the distributed
    exchange end to end."""
    from .stages.multimodal import _shared_hash_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.arange(4, dtype=np.int64)
        gh = ((ids // 3) * 16)[:, None] + j[None, :] + 1000
        gid = np.repeat(ids, 4)
        storm = ids[ids % 50 == 0]
        sh = np.concatenate([np.zeros(len(storm), np.int64),
                             np.ones(len(storm), np.int64)])
        sid = np.concatenate([storm, storm])
        return pa.table({
            "fhash": pa.array(
                np.concatenate([gh.ravel(), sh]).astype(np.uint64),
                pa.uint64()),
            "media_id": pa.array(np.concatenate([gid, sid]), pa.int64()),
        })

    hashed = docs.map_batches(plant, batch_format="pyarrow")
    return _shared_hash_pairs(hashed, "media_id", min_shared=2,
                              max_hash_ids=64)


def q_training_rows_golden(sf_dir: str):
    """Oracled S10 twin (golden-twin pattern, like party_histogram_
    golden): io/export.training_rows — the status filter + label/
    metadata struct assembly — runs over the golden-frozen extraction
    parquet, struct fields flattened for the value-hash compare; the
    DuckDB oracle projects the SAME file. lang / n_chars are absent
    from the goldens, so both sides derive them deterministically
    (md5(url) 2-char prefix; char length). The live-extraction variant
    stays rows-only (``training_rows``)."""
    import hashlib as _hl

    from .io.export import training_rows

    g = rd.read_parquet(_GOLDENS_PARQUET,
                        columns=["url", "extracted_text", "status",
                                 "contract_number", "contract_type",
                                 "client_name", "vendor_name", "currency"])

    def to_docs(t: pa.Table) -> pa.Table:
        langs = [_hl.md5(u.encode()).hexdigest()[:2]
                 for u in t["url"].to_pylist()]
        return pa.table({
            "url": t["url"],
            "text": t["extracted_text"],
            "status": t["status"],
            "contract_number": t["contract_number"],
            "contract_type": t["contract_type"],
            "client_name": t["client_name"],
            "vendor_name": t["vendor_name"],
            "currency": t["currency"],
            "lang": pa.array(langs, pa.string()),
            "n_chars": pc.cast(pc.utf8_length(t["extracted_text"]),
                               pa.int64()),
        })

    rows = training_rows(g.map_batches(to_docs, batch_format="pyarrow"))

    def flat(t: pa.Table) -> pa.Table:
        lb, mt = t["labels"], t["metadata"]
        return pa.table({
            "text": t["text"],
            "contract_type": pc.struct_field(lb, "contract_type"),
            "contract_number": pc.struct_field(lb, "contract_number"),
            "client_name": pc.struct_field(lb, "client_name"),
            "vendor_name": pc.struct_field(lb, "vendor_name"),
            "currency": pc.struct_field(lb, "currency"),
            "url": pc.struct_field(mt, "url"),
            "lang": pc.struct_field(mt, "lang"),
            "n_chars": pc.struct_field(mt, "n_chars"),
        })

    return rows.map_batches(flat, batch_format="pyarrow")


SQL_QUERIES.update({
    "hamming_near_dups_planted": q_hamming_near_dups_planted,
    "ivf_knn_recall_check": q_ivf_knn_recall_check,
    "random_sample_check": q_random_sample_check,
    "shared_hash_pairs_planted": q_shared_hash_pairs_planted,
    "training_rows_golden": q_training_rows_golden,
})

ORACLE_SQL.update({
    "hamming_near_dups_planted": """
        WITH h AS (
          SELECT doc_id AS id,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                          1, 16)) AS UBIGINT) AS h
          FROM documents
          UNION ALL
          SELECT doc_id + 100000,
                 xor(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                              1, 16)) AS UBIGINT),
                     CAST(1 AS UBIGINT) << (doc_id % 64))
          FROM documents WHERE doc_id % 10 = 0)
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
        FROM h a JOIN h b ON a.id < b.id
        WHERE bit_count(xor(a.h, b.h)) <= 3
    """,
    "ivf_knn_recall_check": """
        WITH v AS (
          SELECT doc_id AS id,
                 [10.0 * (CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END) + 0.01 * ((doc_id * 1) % 7),
                  10.0 * (CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 0 END) + 0.01 * ((doc_id * 2) % 7),
                  10.0 * (CASE WHEN doc_id % 8 = 2 THEN 1 ELSE 0 END) + 0.01 * ((doc_id * 3) % 7),
                  10.0 * (CASE WHEN doc_id % 8 = 3 THEN 1 ELSE 0 END) + 0.01 * ((doc_id * 4) % 7),
                  10.0 * (CASE WHEN doc_id % 8 = 4 THEN 1 ELSE 0 END) + 0.01 * ((doc_id * 5) % 7),
                  10.0 * (CASE WHEN doc_id % 8 = 5 THEN 1 ELSE 0 END) + 0.01 * ((doc_id * 6) % 7),
                  10.0 * (CASE WHEN doc_id % 8 = 6 THEN 1 ELSE 0 END) + 0.01 * ((doc_id * 7) % 7),
                  10.0 * (CASE WHEN doc_id % 8 = 7 THEN 1 ELSE 0 END) + 0.01 * ((doc_id * 8) % 7)]
                 AS emb
          FROM documents),
        exact AS (
          SELECT a.id AS query_id, b.id AS neighbor_id
          FROM v a, v b
          WHERE a.id < 3 AND b.id <> a.id
          QUALIFY row_number() OVER (
              PARTITION BY a.id
              ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, b.id
          ) <= 5)
        SELECT query_id, CAST(SUM(neighbor_id) AS BIGINT) AS exact_id_sum,
               TRUE AS recall_ok
        FROM exact GROUP BY query_id
    """,
    "random_sample_check": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total, TRUE AS frac_ok
        FROM documents
    """,
    "training_rows_golden": f"""
        SELECT extracted_text AS text, contract_type, contract_number,
               client_name, vendor_name, currency, url,
               substr(md5(url), 1, 2) AS lang,
               CAST(length(extracted_text) AS BIGINT) AS n_chars
        FROM '{_GOLDENS_PARQUET}'
        WHERE status = 'converted'
    """,
    "shared_hash_pairs_planted": """
        WITH h AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 (doc_id // 3) * 16 + j + 1000 AS fhash
          FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
          UNION ALL
          SELECT CAST(doc_id AS BIGINT), s
          FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS s)
          WHERE doc_id % 50 = 0),
        eligible AS (
          SELECT fhash FROM h GROUP BY fhash
          HAVING count(DISTINCT id) BETWEEN 2 AND 64),
        p AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM h a
          JOIN h b ON a.fhash = b.fhash AND a.id < b.id
          JOIN eligible e ON e.fhash = a.fhash
          GROUP BY 1, 2)
        SELECT id_a, id_b, n_shared FROM p WHERE n_shared >= 2
    """,
})


# --------------------------------------------------------------------------
# Text-analysis value gate (functions/quality.py batch kernels)
# --------------------------------------------------------------------------


def q_text_metrics_check(sf_dir: str):
    """Value-hash gate for the text-analysis family (the SQL-expressible
    core of q:text_analysis, which stays rows-only for its FNV
    fingerprint): per-doc token/BPE/punct/upper/stopword counters as
    exact integers, the language-ID verdict, and the UNROUNDED quality
    composite (one pinned IEEE expression over exact integer counters on
    both sides — the grouped_linreg float pattern; the scalar path's
    round(x, 6) is skipped here because DuckDB rounds half-away while
    Python rounds half-even). Exactness precondition (verified for all
    sf tiers): the documents corpus is pure ASCII, where Python re and
    DuckDB RE2 agree on \\w/\\s/\\d and the CJK branch is unreachable."""
    from .functions.quality import detect_language_batch, text_metrics_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def metrics(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t["text"].to_pylist()]
        m = text_metrics_batch(texts)
        n = m["n_chars"].astype(np.float64)
        ntok = m["n_tokens"].astype(np.float64)
        valid = (m["n_chars"] > 0) & (m["n_tokens"] > 0)
        safe_n = np.where(valid, n, 1.0)
        safe_t = np.where(valid, ntok, 1.0)
        length_c = np.minimum(n / 500.0, 1.0)
        mwl = m["n_nonws"] / safe_t
        mwl_c = ((mwl >= 3.0) & (mwl <= 12.0)).astype(np.float64)
        punct_c = (m["n_punct"] / safe_n <= 0.25).astype(np.float64)
        stop_c = np.minimum(4.0 * m["stop_hits"] / safe_t, 1.0)
        upper_c = (m["n_upper"] / safe_n <= 0.3).astype(np.float64)
        qraw = np.where(
            valid, (length_c + mwl_c + punct_c + stop_c + upper_c) / 5.0, 0.0)
        return pa.table({
            "doc_id": t["doc_id"],
            "pred_lang": pa.array(detect_language_batch(texts), pa.string()),
            "n_tokens": pa.array(m["n_tokens"], pa.int64()),
            "n_bpe_tokens": pa.array(m["n_bpe_tokens"], pa.int64()),
            "n_punct": pa.array(m["n_punct"], pa.int64()),
            "n_upper": pa.array(m["n_upper"], pa.int64()),
            "stop_hits": pa.array(m["stop_hits"], pa.int64()),
            "quality_raw": pa.array(qraw, pa.float64()),
        })

    return ds.map_batches(metrics, batch_format="pyarrow")


SQL_QUERIES.update({"text_metrics_check": q_text_metrics_check})

# Generated from the kernel's own union so the SQL mirror can never
# drift from functions/quality._STOPWORDS (a hand-kept copy once lost
# 'en' — es/fr — which diverged stop_hits on any doc containing it).
# None of the words contain a quote, so bare '...' literals are safe.
from .functions.quality import _STOP_UNION as _STOP_UNION_PY

_STOP_SQL = ",".join(f"'{w}'" for w in sorted(_STOP_UNION_PY))


def _lang_hits_sql(lang_words: str) -> str:
    return ("len(list_filter(words, w -> w IN (" + lang_words + ")))")


_LW = {
    "de": "'der','die','und','in','den','von','zu','das','mit','sich','des','auf','für','ist','im','dem','nicht','ein'",
    "en": "'the','and','of','to','a','in','is','it','you','that','he','was','for','on','are','with','as','i','his','they','be','at'",
    "es": "'de','la','que','el','en','y','a','los','del','se','las','por','un','para','con','no','una','su','al','lo','como'",
    "fr": "'de','la','le','et','les','des','en','un','du','une','que','est','pour','qui','dans','a','par','plus','pas','au'",
    "pt": "'de','a','o','que','e','do','da','em','um','para','é','com','não','uma','os','no','se','na','por','mais','as','dos'",
}

ORACLE_SQL.update({
    "text_metrics_check": rf"""
        WITH base AS (
          SELECT doc_id, COALESCE(text, '') AS text FROM documents),
        w AS (
          SELECT doc_id, text,
            regexp_extract_all(lower(substr(text, 1, 1000)),
                               '[a-zà-ÿäöüß]+') AS words
          FROM base),
        sc AS (
          SELECT doc_id, text,
            len(words) AS nw,
            {_lang_hits_sql(_LW["de"])} / len(words) AS s_de,
            {_lang_hits_sql(_LW["en"])} / len(words) AS s_en,
            {_lang_hits_sql(_LW["es"])} / len(words) AS s_es,
            {_lang_hits_sql(_LW["fr"])} / len(words) AS s_fr,
            {_lang_hits_sql(_LW["pt"])} / len(words) AS s_pt
          FROM w),
        m AS (
          SELECT doc_id, text,
            CASE WHEN nw = 0 THEN 'unknown'
                 WHEN greatest(s_de, s_en, s_es, s_fr, s_pt) <= 0.02
                   THEN 'unknown'
                 WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_pt) THEN 'de'
                 WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_pt) THEN 'en'
                 WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_pt) THEN 'es'
                 WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_pt) THEN 'fr'
                 ELSE 'pt' END AS pred_lang,
            CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
            CAST(len(regexp_extract_all(text,
                 '[A-Za-z]+|\d+|[^\sA-Za-z\d]')) AS BIGINT) AS n_bpe_tokens,
            CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct,
            CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
            CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                 t -> t <> '' AND lower(t) IN ({_STOP_SQL}))) AS BIGINT)
                 AS stop_hits,
            CAST(len(regexp_extract_all(text, '\S')) AS BIGINT) AS n_nonws,
            CAST(length(text) AS BIGINT) AS n_chars
          FROM sc)
        SELECT doc_id, pred_lang, n_tokens, n_bpe_tokens, n_punct, n_upper,
               stop_hits,
               CASE WHEN n_chars = 0 OR n_tokens = 0 THEN 0.0
                    ELSE (least(n_chars / 500.0, 1.0)
                          + (CASE WHEN n_nonws / CAST(n_tokens AS DOUBLE)
                                       BETWEEN 3.0 AND 12.0
                                  THEN 1.0 ELSE 0.0 END)
                          + (CASE WHEN n_punct / CAST(n_chars AS DOUBLE)
                                       <= 0.25 THEN 1.0 ELSE 0.0 END)
                          + least(4.0 * stop_hits / CAST(n_tokens AS DOUBLE),
                                  1.0)
                          + (CASE WHEN n_upper / CAST(n_chars AS DOUBLE)
                                       <= 0.3 THEN 1.0 ELSE 0.0 END)) / 5.0
               END AS quality_raw
        FROM m
    """,
})


def q_extraction_status_golden(sf_dir: str):
    """Oracled status report (A3 tally + A5 mean): status_report over the
    golden-frozen extraction outputs, n_chars recomputed from the frozen
    text so the oracle (same parquet, COUNT + AVG(length)) mirrors it
    exactly — integer char sums stay < 2^53, so Ray's float64 Mean and
    DuckDB's HUGEINT AVG agree bit-exactly. The live-extraction variant
    stays rows-only (``extraction_status``)."""
    from .pipelines.reports import status_report

    ds = rd.read_parquet(_GOLDENS_PARQUET,
                         columns=["url", "status", "extracted_text"])

    def with_chars(t: pa.Table) -> pa.Table:
        return t.append_column(
            "n_chars",
            pc.cast(pc.utf8_length(t["extracted_text"]), pa.int64()))

    return status_report(ds.map_batches(with_chars, batch_format="pyarrow"))


SQL_QUERIES.update({"extraction_status_golden": q_extraction_status_golden})

ORACLE_SQL.update({
    "extraction_status_golden": f"""
        SELECT status, COUNT(*) AS n_docs,
               AVG(length(extracted_text)) AS avg_chars
        FROM '{_GOLDENS_PARQUET}'
        GROUP BY status
    """,
})


def _columnar_roundtrip(sf_dir: str, fmt: str):
    """Shared body for the IPC/ORC interchange gates (io/ipc.py):
    documents → content-keyed deterministic columnar shards → streamed
    source → per-doc integrity row; shares the jsonl_roundtrip
    parquet-truth oracle verbatim, so any shard-membership, encoding,
    dtype-drift or ordering bug hash-mismatches."""
    import hashlib as _hl
    import os

    from .io.ipc import read_ipc, read_orc, write_ipc_shards, write_orc_shards

    write, read, ext = {
        "ipc": (write_ipc_shards, read_ipc, ".arrow"),
        "orc": (write_orc_shards, read_orc, ".orc"),
    }[fmt]
    out = _tmp_cache(fmt, sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
        assert write(docs, out, "doc_id").count() > 0
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass

    files = [os.path.join(out, f) for f in sorted(os.listdir(out))
             if f.endswith(ext)]
    ds = read(files)

    def integrity(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_chars_roundtrip": pc.cast(pc.utf8_length(t["text"]),
                                         pa.int64()),
            "text_md5": pa.array(
                [_hl.md5((x or "").encode()).hexdigest() for x in texts],
                pa.string()),
        })

    return ds.map_batches(integrity, batch_format="pyarrow")


def q_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather v2, zstd-compressed) shard interchange
    end-to-end — the Arrow-native hand-off format (io/ipc.py)."""
    return _columnar_roundtrip(sf_dir, "ipc")


def q_orc_roundtrip(sf_dir: str):
    """ORC shard interchange end-to-end — the Hive/Trino warehouse
    ingest format (io/ipc.py)."""
    return _columnar_roundtrip(sf_dir, "orc")


SQL_QUERIES.update({
    "ipc_roundtrip": q_ipc_roundtrip,
    "orc_roundtrip": q_orc_roundtrip,
})
ORACLE_SQL["ipc_roundtrip"] = ORACLE_SQL["jsonl_roundtrip"]
ORACLE_SQL["orc_roundtrip"] = ORACLE_SQL["jsonl_roundtrip"]


def q_validate_golden(sf_dir: str):
    """Oracled business-rule validation (§3.3): validate_contracts_batch
    over the golden-frozen parse outputs, with ``contract_name`` adapted
    from ``client_name`` (the goldens freeze the parsed fields, not the
    derived display name — the adapter is mirrored verbatim in SQL).
    Every reference rule string (validation/schema.py:169-230) is
    value-hash-gated: the error-branch messages on the 20 frozen error
    rows and the four name/number/party rules on the 186 rows with
    missing parties. The live-extraction variant stays rows-only
    (``validate``)."""
    from .stages.validate import validate_contracts_batch

    ds = rd.read_parquet(_GOLDENS_PARQUET, columns=[
        "url", "status", "error", "contract_number", "client_name",
        "vendor_name", "effective_date", "expiration_date",
        "total_value", "currency"])

    def adapt(t: pa.Table) -> pa.Table:
        return t.append_column("contract_name", t["client_name"])

    out = ds.map_batches(adapt, batch_format="pyarrow").map_batches(
        validate_contracts_batch, batch_format="pyarrow")

    def stringify(t: pa.Table) -> pa.Table:
        errs = ["; ".join(e or []) for e in t["validation_errors"].to_pylist()]
        return pa.table({"url": t["url"], "is_valid": t["is_valid"],
                         "validation_errors": pa.array(errs, pa.string())})

    return out.map_batches(stringify, batch_format="pyarrow")


def _plant_names_batch(t: pa.Table) -> pa.Table:
    """Deterministic CJK-name fixture shared by translate_names_check:
    lang/name derive from doc_id alone (mirrored 1:1 in the oracle's
    WITH-clause). Stems contain NO split_filename delimiters, so
    map_cjk_terms reduces to the pure ordered replace chain — the part
    the oracle can express as nested replace() calls."""
    did = t["doc_id"].to_numpy(zero_copy_only=False)
    langs = np.array(["ja", "zh", "en"], dtype=object)[did % 3]
    stems = np.array(["御見積書システム", "契約書運用", "报价系统支持", "Plain"],
                     dtype=object)[did % 4]
    names = [s + str(d) for s, d in zip(stems, did)]
    return pa.table({
        "doc_id": t["doc_id"],
        "lang": pa.array(langs, pa.string()),
        "contract_name": pa.array(names, pa.string()),
    })


def q_translate_names_check(sf_dir: str):
    """Oracled cached-translator gate (M21/ST5): CachedTranslator (the
    per-actor-LRU stage, same callable as ``translate_names``) over a
    deterministic planted-name table; the oracle rebuilds the identical
    names in SQL and mirrors functions/naming.CJK_TERM_MAP as a nested
    replace() chain in exact insertion order, plus the ja/zh gate and
    the passthrough semantics. The live-extraction variant stays
    rows-only (``translate_names``)."""
    from .stages.translate import CachedTranslator

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = ds.map_batches(_plant_names_batch, batch_format="pyarrow").map_batches(
        CachedTranslator, batch_format="pyarrow", batch_size=1024, concurrency=2,
    )
    return out.select_columns(["doc_id", "lang", "translated_name",
                               "was_translated"])


def _cjk_replace_chain_sql(expr: str) -> str:
    """expr → nested replace() calls mirroring CJK_TERM_MAP insertion
    order (Python str.replace and DuckDB replace() both replace ALL
    occurrences, so the chains are equivalent)."""
    from .functions.naming import CJK_TERM_MAP

    for k, v in CJK_TERM_MAP.items():
        expr = f"replace({expr}, '{k}', '{v}')"
    return expr


SQL_QUERIES.update({
    "validate_golden": q_validate_golden,
    "translate_names_check": q_translate_names_check,
})

ORACLE_SQL.update({
    "validate_golden": f"""
        WITH g AS (
            SELECT url, status, error, contract_number,
                   client_name AS contract_name, client_name, vendor_name,
                   effective_date, expiration_date, total_value, currency
            FROM '{_GOLDENS_PARQUET}'
        ),
        v AS (
            SELECT url,
                   CASE WHEN status = 'error' THEN
                       CASE WHEN error IS NULL OR error = ''
                            THEN 'Document must have a positive file size'
                            ELSE 'Document conversion failed: ' || error END
                   ELSE COALESCE(array_to_string(list_filter([
                       CASE WHEN contract_name IS NULL
                                 OR contract_name IN ('', 'N/A')
                            THEN 'Contract must have a valid name' END,
                       CASE WHEN contract_number IS NULL
                                 OR contract_number IN ('', 'N/A')
                            THEN 'Contract must have a valid contract number' END,
                       CASE WHEN client_name IS NULL
                                 OR client_name IN ('', 'N/A')
                            THEN 'Contract must have a valid client name' END,
                       CASE WHEN vendor_name IS NULL
                                 OR vendor_name IN ('', 'N/A')
                            THEN 'Contract must have a valid vendor name' END,
                       CASE WHEN effective_date IS NOT NULL
                                 AND expiration_date IS NOT NULL
                                 AND effective_date >= expiration_date
                            THEN 'Effective date must be before expiration date' END,
                       CASE WHEN total_value IS NOT NULL AND total_value <= 0
                            THEN 'Contract total value must be positive' END,
                       CASE WHEN total_value IS NOT NULL
                                 AND (currency IS NULL OR currency = '')
                            THEN 'Contract must have currency when value is specified' END
                   ], x -> x IS NOT NULL), '; '), '') END AS validation_errors
            FROM g
        )
        SELECT url, validation_errors = '' AS is_valid, validation_errors
        FROM v
    """,
    "translate_names_check": f"""
        WITH n AS (
            SELECT doc_id,
                   CASE doc_id % 3 WHEN 0 THEN 'ja' WHEN 1 THEN 'zh'
                        ELSE 'en' END AS lang,
                   (CASE doc_id % 4 WHEN 0 THEN '御見積書システム'
                         WHEN 1 THEN '契約書運用'
                         WHEN 2 THEN '报价系统支持'
                         ELSE 'Plain' END)
                       || CAST(doc_id AS VARCHAR) AS name
            FROM documents
        ),
        t AS (
            SELECT doc_id, lang, name,
                   CASE WHEN lang IN ('ja', 'zh')
                        THEN {{CJK_CHAIN}}
                        ELSE name END AS translated_name
            FROM n
        )
        SELECT doc_id, lang, translated_name,
               translated_name <> name AS was_translated
        FROM t
    """.replace("{CJK_CHAIN}", _cjk_replace_chain_sql("name")),
})


def _range_export_cached(sf_dir: str):
    """Shared range-sorted lineitem export for the two rangesort gates:
    (manifest pyarrow Table, out_dir). Cached under a FIXTURES_VERSION-
    keyed /tmp dir with a _SUCCESS marker (the _tmp_cache pattern);
    the manifest itself persists as manifest.parquet so re-runs never
    re-shuffle."""
    import os

    import pyarrow.parquet as _pq

    from .ops.rangesort import range_edges, range_sorted_export

    out = _tmp_cache("rangesort2", sf_dir)
    mpath = os.path.join(out, "manifest.parquet")
    epath = os.path.join(out, "edges.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey",
                                      "l_linenumber"])
        edges = range_edges(ds, "l_orderkey", 8)
        manifest = range_sorted_export(ds, "l_orderkey", out, edges=edges)
        batches = list(manifest.iter_batches(batch_size=65536,
                                             batch_format="pyarrow"))
        _pq.write_table(pa.concat_tables(batches), mpath)
        _pq.write_table(pa.table({"edge": pa.array(edges)}), epath)
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass
    return _pq.read_table(mpath), out


def q_range_sorted_export(sf_dir: str):
    """Range-partitioned sorted export (ops/rangesort.py, the TeraSort
    shape): lineitem sorted by l_orderkey into 8 ranges, one internally-
    sorted Parquet file each; the returned manifest (range_id, n_rows,
    key_min, key_max) is value-hash-gated against a quantile_disc edge
    reconstruction in SQL — any boundary-rule, assignment or loss bug
    mismatches. File-level sortedness and resume are pinned in
    tests/test_rangesort.py."""
    manifest, _ = _range_export_cached(sf_dir)
    return manifest.select(["range_id", "n_rows", "key_min", "key_max"])


def q_range_scan_check(sf_dir: str):
    """Manifest-pruned range scan over the sorted export: open ONLY the
    files whose [key_min, key_max] intersects the probe range, trim the
    boundary files, and return the surviving rows — gated against the
    plain SQL BETWEEN over the source table (membership equality proves
    the pruning read loses and invents nothing)."""
    from .ops.rangesort import read_sorted_range

    manifest, _ = _range_export_cached(sf_dir)
    rows = {r["range_id"]: r for r in manifest.to_pylist()}
    # probe = exactly ranges 2..4: scale-independent, and equal-key
    # straddling is impossible (one key value -> one range), so the SQL
    # mirror is range_id BETWEEN 2 AND 4 over the same edge CTE
    lo, hi = rows[2]["key_min"], rows[4]["key_max"]
    return read_sorted_range(manifest.to_pylist(), lo, hi,
                             key_col="l_orderkey")


SQL_QUERIES.update({
    "range_sorted_export": q_range_sorted_export,
    "range_scan_check": q_range_scan_check,
})

ORACLE_SQL.update({
    "range_sorted_export": """
        WITH e AS (
            SELECT unnest(quantile_disc(l_orderkey,
                [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])) AS edge
            FROM lineitem
        ),
        a AS (
            SELECT l_orderkey AS key,
                   (SELECT COUNT(*) FROM e WHERE e.edge < l.l_orderkey)
                       AS range_id
            FROM lineitem l
            WHERE l_orderkey IS NOT NULL
        )
        SELECT range_id, COUNT(*) AS n_rows,
               MIN(key) AS key_min, MAX(key) AS key_max
        FROM a GROUP BY range_id
    """,
    "range_scan_check": """
        WITH e AS (
            SELECT unnest(quantile_disc(l_orderkey,
                [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])) AS edge
            FROM lineitem
        ),
        a AS (
            SELECT l_orderkey, l_partkey, l_linenumber,
                   (SELECT COUNT(*) FROM e WHERE e.edge < l.l_orderkey)
                       AS range_id
            FROM lineitem l
            WHERE l_orderkey IS NOT NULL
        )
        SELECT l_orderkey, l_partkey, l_linenumber
        FROM a WHERE range_id BETWEEN 2 AND 4
    """,
})


def q_lsm_merge_check(sf_dir: str):
    """LSM-style incremental merge of a deterministic increment (every
    l_linenumber=1 row re-keyed to l_orderkey+3, marked linenumber 99)
    into the cached sorted lineitem layout (ops/rangesort.
    merge_sorted_layout). Only the ranges the increment touches are
    rewritten; the merged manifest is value-hash-gated against the SQL
    union re-assigned by the SAME base edges — any assignment, loss,
    duplication or base-file-read bug mismatches. Layout invariants and
    untouched-path reuse are pinned in tests/test_rangesort.py."""
    import pyarrow.parquet as _pq

    from .ops.rangesort import merge_sorted_layout

    manifest, out = _range_export_cached(sf_dir)
    edges = _pq.read_table(f"{out}/edges.parquet")["edge"].to_pylist()

    inc = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_orderkey", "l_partkey",
                                   "l_linenumber"])

    def rekey(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_linenumber"], 1))
        return pa.table({
            "l_orderkey": pc.add(t["l_orderkey"], 3),
            "l_partkey": t["l_partkey"],
            "l_linenumber": pa.array(
                np.full(t.num_rows, 99, np.int32), pa.int32()),
        })

    merged = merge_sorted_layout(
        manifest.to_pylist(), edges,
        inc.map_batches(rekey, batch_format="pyarrow"),
        "l_orderkey", _tmp_cache("lsmmerge", sf_dir))
    return merged.map_batches(
        lambda t: t.select(["range_id", "n_rows", "key_min", "key_max"]),
        batch_format="pyarrow")


def q_compaction_check(sf_dir: str):
    """Small-file compaction over the cached sorted layout
    (ops/rangesort.compact_layout): adjacent ranges coalesce into
    ~25k-row files by the window-cumsum rule
    ``out_id = floor(cum_rows_before / target)`` — mirrored in SQL as a
    window over the per-range counts the export oracle already
    reconstructs. Order preservation (concatenation, never a re-sort)
    is pinned in tests/test_rangesort.py."""
    from .ops.rangesort import compact_layout

    manifest, _ = _range_export_cached(sf_dir)
    out = compact_layout(manifest.to_pylist(),
                         _tmp_cache("compact", sf_dir), 25_000)
    return out.map_batches(
        lambda t: t.select(["out_id", "n_rows", "n_inputs"]),
        batch_format="pyarrow")


SQL_QUERIES.update({
    "lsm_merge_check": q_lsm_merge_check,
    "compaction_check": q_compaction_check,
})

ORACLE_SQL.update({
    "lsm_merge_check": """
        WITH e AS (
            SELECT unnest(quantile_disc(l_orderkey,
                [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])) AS edge
            FROM lineitem
        ),
        u AS (
            SELECT l_orderkey FROM lineitem
            UNION ALL
            SELECT l_orderkey + 3 FROM lineitem WHERE l_linenumber = 1
        ),
        a AS (
            SELECT l_orderkey AS key,
                   (SELECT COUNT(*) FROM e WHERE e.edge < u.l_orderkey)
                       AS range_id
            FROM u WHERE l_orderkey IS NOT NULL
        )
        SELECT range_id, COUNT(*) AS n_rows,
               MIN(key) AS key_min, MAX(key) AS key_max
        FROM a GROUP BY range_id
    """,
    "compaction_check": """
        WITH e AS (
            SELECT unnest(quantile_disc(l_orderkey,
                [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])) AS edge
            FROM lineitem
        ),
        a AS (
            SELECT (SELECT COUNT(*) FROM e WHERE e.edge < l.l_orderkey)
                       AS range_id
            FROM lineitem l WHERE l_orderkey IS NOT NULL
        ),
        m AS (
            SELECT range_id, COUNT(*) AS n FROM a GROUP BY range_id
        ),
        w AS (
            SELECT range_id, n,
                   CAST(COALESCE(SUM(n) OVER (
                       ORDER BY range_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum
            FROM m
        )
        SELECT cum // 25000 AS out_id, CAST(SUM(n) AS BIGINT) AS n_rows,
               COUNT(*) AS n_inputs
        FROM w GROUP BY out_id
    """,
})


_ORG_GOLDEN_COLS = ["url", "vendor_name", "contract_type",
                    "effective_date", "expiration_date", "contract_number"]

# Shared SQL mirror of pipelines/organize.add_organize_columns over the
# goldens (ASCII vendor/type/number values, so Python's unicode isalnum
# reduces to [A-Za-z0-9] exactly): normalize_supplier_name,
# canonical_contract_filename, extract_year (str(datetime) ==
# CAST(ts AS VARCHAR) in DuckDB) and the ascii operation router.
_ORG_GOLDEN_CTE = f"""
    g AS (
        SELECT url, vendor_name, contract_type,
               effective_date AS eff, expiration_date AS exp,
               contract_number
        FROM '{{GOLDENS}}'
    ),
    c AS (
        SELECT url,
            CASE WHEN vendor_name IS NULL OR vendor_name = ''
                 THEN 'Unknown'
                 ELSE substr(regexp_replace(
                          replace(replace(vendor_name, ' ', '_'), '-', '_'),
                          '[^A-Za-z0-9_]', '', 'g'), 1, 50) END AS sup,
            CASE WHEN vendor_name IS NULL OR vendor_name IN ('', 'N/A')
                 THEN 'Unknown'
                 ELSE substr(regexp_replace(
                          replace(replace(vendor_name, ' ', '_'), '-', '_'),
                          '[^A-Za-z0-9_]', '', 'g'), 1, 50) END AS supplier_dir,
            CASE WHEN contract_type IS NULL OR contract_type = ''
                 THEN 'UNKNOWN' ELSE upper(contract_type) END AS ctyp,
            CASE WHEN eff IS NULL THEN ''
                 ELSE regexp_extract(CAST(eff AS VARCHAR),
                                     '\\b(19|20)[0-9][0-9]\\b') END AS sy,
            CASE WHEN exp IS NULL THEN ''
                 ELSE regexp_extract(CAST(exp AS VARCHAR),
                                     '\\b(19|20)[0-9][0-9]\\b') END AS ey0,
            replace(replace(replace(COALESCE(contract_number, ''),
                ' ', '_'), '/', '_'), '-', '_') AS cid0,
            CASE WHEN regexp_matches(regexp_extract(url, '[^/]*$'),
                                     '^[\\x00-\\x7f]*$')
                 THEN 'rename' ELSE 'translate' END AS operation
        FROM g
    ),
    d AS (
        SELECT url, sup, supplier_dir, ctyp, operation,
               CASE WHEN ey0 = '' THEN sy ELSE ey0 END AS ey, sy,
               CASE WHEN cid0 = '' OR cid0 = 'null'
                    THEN 'UNKNOWN_ID' ELSE cid0 END AS cid
        FROM c
    ),
    f AS (
        SELECT url, supplier_dir, operation,
               regexp_replace(
                   sup || '_' || ctyp || '_'
                   || (CASE WHEN sy = ey THEN sy
                            ELSE sy || '_' || ey END)
                   || '_' || cid || '.pdf',
                   '[^A-Za-z0-9._-]', '', 'g') AS canonical_filename
        FROM d
    )
""".replace("{GOLDENS}", _GOLDENS_PARQUET)


def q_organize_golden(sf_dir: str):
    """Oracled organize projection (M27-M30): canonical filename +
    supplier partition + rename/translate routing over the golden-frozen
    parse outputs; the oracle mirrors normalize_supplier_name /
    canonical_contract_filename / extract_year / the ascii router
    character-class for character-class. The live-extraction variant
    stays rows-only (``organize``)."""
    from .pipelines.organize import organize

    ds = rd.read_parquet(_GOLDENS_PARQUET, columns=_ORG_GOLDEN_COLS)
    return organize(ds).select_columns(
        ["url", "canonical_filename", "supplier_dir", "operation"])


def q_unique_filenames_golden(sf_dir: str):
    """Oracled D4 collision-free filenames: partition-grouped
    enumeration (ordered by url within each canonical-name collision
    group, ``_k`` before the extension) over the goldens, mirrored by a
    SQL window row_number + backreference regexp. The live variant
    stays rows-only (``unique_filenames``)."""
    from .pipelines.organize import disambiguate_filenames, organize

    ds = rd.read_parquet(_GOLDENS_PARQUET, columns=_ORG_GOLDEN_COLS)
    return disambiguate_filenames(organize(ds)).select_columns(
        ["url", "canonical_filename", "final_filename"])


SQL_QUERIES.update({
    "organize_golden": q_organize_golden,
    "unique_filenames_golden": q_unique_filenames_golden,
})

ORACLE_SQL.update({
    "organize_golden": f"""
        WITH {_ORG_GOLDEN_CTE}
        SELECT url, canonical_filename, supplier_dir, operation FROM f
    """,
    "unique_filenames_golden": f"""
        WITH {_ORG_GOLDEN_CTE},
        r AS (
            SELECT url, canonical_filename,
                   ROW_NUMBER() OVER (PARTITION BY canonical_filename
                                      ORDER BY url) - 1 AS rn
            FROM f
        )
        SELECT url, canonical_filename,
               CASE WHEN rn = 0 THEN canonical_filename
                    ELSE regexp_replace(canonical_filename,
                        '\\.([^.]*)$',
                        '_' || CAST(rn AS VARCHAR) || '.\\1') END
                   AS final_filename
        FROM r
    """,
})


def q_compression_filter_check(sf_dir: str):
    """Compression-ratio quality filter (stages/webclean.
    compression_quality_filter — the RedPajama-v2/Dolma repetition
    proxy): even doc_ids get a planted 120×-repeated token (deflate
    ratio ≈ 0.03), odd ones a planted md5-hex stream (≈ 0.57); the
    filter at min_ratio=0.25 must keep exactly the odd class. The
    oracle mirrors the PLANT (class from doc_id), which is what makes
    the zlib side gateable without SQL zlib; ratio ordering and
    threshold behavior are pinned in tests/test_webclean_more.py."""
    import hashlib as _hl

    from .stages.webclean import compression_quality_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts, cls = [], []
        for did in ids:
            if did % 2 == 0:
                texts.append(f"tok{did % 7} " * 120)
                cls.append("repeat")
            else:
                texts.append("".join(
                    _hl.md5(f"{did}:{i}".encode()).hexdigest()
                    for i in range(20)))
                cls.append("random")
        return pa.table({"doc_id": t["doc_id"],
                         "doc_class": pa.array(cls, pa.string()),
                         "text": pa.array(texts, pa.string())})

    out = compression_quality_filter(
        ds.map_batches(plant, batch_format="pyarrow"), "text",
        min_ratio=0.25)
    return out.select_columns(["doc_id", "doc_class"])


SQL_QUERIES.update({"compression_filter_check": q_compression_filter_check})
ORACLE_SQL.update({
    "compression_filter_check": """
        SELECT doc_id, 'random' AS doc_class
        FROM documents WHERE doc_id % 2 = 1
    """,
})


def q_sanitize_names_check(sf_dir: str):
    """Oracled M14/M17 sanitization gate: sanitize_url_names (the
    rfind-extension split + ascii passthrough + CJK fallback map +
    clean_translated_text cleanup) over planted names whose CJK is
    FULLY consumed by the term map — so the post-map text is pure ASCII
    and Python's unicode \\w classes coincide with RE2's ASCII ones,
    making every branch SQL-mirrorable: success passthrough, mapped+
    cleaned, and the unmapped-CJK 'failed unchanged' branch. The
    live-extraction variant stays rows-only (``sanitize_names``)."""
    from .pipelines.organize import sanitize_url_names

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def plant(t: pa.Table) -> pa.Table:
        stems = np.array(["PlainName", '"契約書"', "契約書!システム",
                          "見積サポート", "日本"], dtype=object)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        names = [s + str(d) for s, d in zip(stems[did % 5], did)]
        return pa.table({"doc_id": t["doc_id"],
                         "contract_name": pa.array(names, pa.string())})

    out = sanitize_url_names(ds.map_batches(plant, batch_format="pyarrow"))
    return out.select_columns(["doc_id", "sanitized_name",
                               "sanitize_status"])


SQL_QUERIES.update({"sanitize_names_check": q_sanitize_names_check})

ORACLE_SQL.update({
    "sanitize_names_check": """
        WITH n AS (
            SELECT doc_id,
                   (CASE doc_id % 5 WHEN 0 THEN 'PlainName'
                         WHEN 1 THEN '"契約書"'
                         WHEN 2 THEN '契約書!システム'
                         WHEN 3 THEN '見積サポート'
                         ELSE '日本' END)
                       || CAST(doc_id AS VARCHAR) AS base
            FROM documents
        ),
        m AS (
            SELECT doc_id, base, {CJK_CHAIN} AS mapped FROM n
        )
        SELECT doc_id,
               CASE WHEN regexp_matches(base, '^[\\x00-\\x7f]*$')
                    THEN base || '.pdf'
                    WHEN mapped <> base THEN
                        trim(regexp_replace(regexp_replace(
                            regexp_replace(mapped, '["''`]', '', 'g'),
                            '[^A-Za-z0-9_ \t-]', '_', 'g'),
                            '[ \t]+', '_', 'g'), '_') || '.pdf'
                    ELSE base || '.pdf' END AS sanitized_name,
               CASE WHEN regexp_matches(base, '^[\\x00-\\x7f]*$')
                    THEN 'success' ELSE 'failed' END AS sanitize_status
        FROM m
    """.replace("{CJK_CHAIN}", _cjk_replace_chain_sql("base")),
})


def q_pattern_probe_check(sf_dir: str):
    """Oracled J4 probe gate: PatternProbe (broadcast hashed-BoW
    pattern matrix × docs, argmax segment) over planted docs — each
    pattern phrase verbatim plus noise docs — at threshold 0.99, where
    ONLY identical word-bags survive (max cross-phrase cosine measured
    0.817; min self-cosine 1.0 - 2e-16). The oracle enumerates the
    expected (url, entity_type, pattern, 1.0, phrase) rows from the
    same BASE_PATTERNS constants, so a similarity, thresholding,
    argmax-segment or false-positive bug mismatches. The full-corpus
    variant stays rows-only (``pattern_probe``)."""
    from .functions.spans import BASE_PATTERNS
    from .stages.patternprobe import PatternProbe

    rows = []
    j = 0
    for etype, phrases in BASE_PATTERNS.items():
        for p in phrases:
            rows.append({"url": f"pattern:{j}", "text": p})
            j += 1
    for i in range(10):
        rows.append({"url": f"noise:{i}",
                     "text": f"zxq{i} wvu{i} unrelated nonsense tokens"})

    docs = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    ref = ray.put(BASE_PATTERNS)
    return docs.map_batches(
        PatternProbe, batch_format="pyarrow", batch_size=16, concurrency=2,
        fn_constructor_kwargs={"patterns_ref": ref, "threshold": 0.99},
    )


def _pattern_probe_check_sql() -> str:
    from .functions.spans import BASE_PATTERNS

    vals, j = [], 0
    for etype, phrases in BASE_PATTERNS.items():
        for p in phrases:
            vals.append(f"('pattern:{j}', '{etype}', '{p}', 1.0, '{p}')")
            j += 1
    return ("SELECT * FROM (VALUES " + ", ".join(vals)
            + ") AS t(url, entity_type, pattern, similarity, best_segment)")


SQL_QUERIES.update({"pattern_probe_check": q_pattern_probe_check})
ORACLE_SQL.update({"pattern_probe_check": _pattern_probe_check_sql()})


def _orders_export_cached(sf_dir: str):
    """Orders exported with the SAME edges as the lineitem layout (the
    co-partitioned contract layout_merge_join requires); cached like
    _range_export_cached."""
    import os

    import pyarrow.parquet as _pq

    from .ops.rangesort import range_sorted_export

    _, li_dir = _range_export_cached(sf_dir)
    edges = _pq.read_table(f"{li_dir}/edges.parquet")["edge"].to_pylist()
    out = _tmp_cache("rangesort_orders", sf_dir)
    mpath = os.path.join(out, "manifest.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
        manifest = range_sorted_export(ds, "o_orderkey", out, edges=edges)
        batches = list(manifest.iter_batches(batch_size=65536,
                                             batch_format="pyarrow"))
        _pq.write_table(pa.concat_tables(batches), mpath)
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass
    return _pq.read_table(mpath), out


def q_layout_join_check(sf_dir: str):
    """Co-partitioned bucketed merge join (ops/rangesort.
    layout_merge_join): lineitem and orders both exported on the SAME
    edges, joined per range_id with ZERO exchange — each task reads one
    file pair and joins locally (the warehouse bucketed-join contract;
    at 100 TB this replaces the all-to-all hash join for layouted
    corpora). Value-hash-gated against the plain SQL inner join."""
    from .ops.rangesort import layout_merge_join

    li_manifest, _ = _range_export_cached(sf_dir)
    o_manifest, _ = _orders_export_cached(sf_dir)
    out = layout_merge_join(li_manifest.to_pylist(),
                            o_manifest.to_pylist(),
                            "l_orderkey", "o_orderkey")
    return out.map_batches(
        lambda t: t.select(["l_orderkey", "l_partkey", "l_linenumber",
                            "o_custkey"]),
        batch_format="pyarrow")


SQL_QUERIES.update({"layout_join_check": q_layout_join_check})
ORACLE_SQL.update({
    "layout_join_check": """
        SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, o.o_custkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
})


def q_url_layout_check(sf_dir: str):
    """String-key sorted layout: documents exported by a derived
    source/doc_id url-style key (the crawl layout — range scans over
    key prefixes, co-located sources) through the exact quantile_disc
    edge path; manifest value-hash-gated like range_sorted_export
    (VARCHAR edges, binary collation on both sides — keys are ASCII).
    Exercises the string-key branch of assign/sort/manifest the int
    gate cannot."""
    import os

    import pyarrow.parquet as _pq

    from .ops.rangesort import range_sorted_export

    out = _tmp_cache("rangesort_url", sf_dir)
    mpath = os.path.join(out, "manifest.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["source", "doc_id"])

        def skey(t: pa.Table) -> pa.Table:
            k = pc.binary_join_element_wise(
                t["source"], pc.cast(t["doc_id"], pa.string()), "/")
            return pa.table({"skey": k, "doc_id": t["doc_id"]})

        ds = ds.map_batches(skey, batch_format="pyarrow")
        manifest = range_sorted_export(ds, "skey", out, partitions=6)
        batches = list(manifest.iter_batches(batch_size=65536,
                                             batch_format="pyarrow"))
        _pq.write_table(pa.concat_tables(batches), mpath)
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass
    return _pq.read_table(mpath).select(
        ["range_id", "n_rows", "key_min", "key_max"])


SQL_QUERIES.update({"url_layout_check": q_url_layout_check})
ORACLE_SQL.update({
    "url_layout_check": f"""
        WITH s AS (
            SELECT source || '/' || CAST(doc_id AS VARCHAR) AS skey
            FROM documents
        ),
        e AS (
            SELECT unnest(quantile_disc(skey,
                [{", ".join(repr(k / 6) for k in range(1, 6))}])) AS edge
            FROM s
        ),
        a AS (
            SELECT skey AS key,
                   (SELECT COUNT(*) FROM e WHERE e.edge < d.skey)
                       AS range_id
            FROM s d WHERE skey IS NOT NULL
        )
        SELECT range_id, COUNT(*) AS n_rows,
               MIN(key) AS key_min, MAX(key) AS key_max
        FROM a GROUP BY range_id
    """,
})


def q_head_metadata(sf_dir: str):
    """HTML head-metadata extraction (stages/headmeta.html_head_metadata):
    title / meta description / rel=canonical / robots directives /
    html lang parsed from crawl page heads by compiled-RE2 pyarrow
    kernels over a 64 KiB head slice. The corpus plants ten deterministic
    head variants keyed on doc_id%10 — quote styles, attribute order,
    uppercase tags, unquoted lang/href, whitespace-collapsed titles,
    raw-entity capture, duplicate tags (first wins), robots combos and
    all-absent pages — and DuckDB reconstructs the expected fields by
    the same doc-id arithmetic, so pair equality gates the parser, the
    normalization contract and the crawler-default robots flags at once.
    One stateless map_batches pass; zero exchanges."""
    from .stages.headmeta import html_head_metadata

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        urls, htmls = [], []
        for i in ids:
            m = i % 10
            if m == 0:
                h = (f'<html lang="en"><head><title>Page {i} report</title>'
                     f'<meta name="description" content="Summary {i} of the page">'
                     f'<link rel="canonical" href="https://canon.example/p/{i}">'
                     f'</head><body>b</body></html>')
            elif m == 1:
                h = (f"<html lang=pt><head><title>Pagina {i}</title>"
                     f"<meta content='Resumo {i}' name='description'>"
                     f'<link href="https://canon.example/q/{i}" rel="canonical">'
                     f"</head><body>b</body></html>")
            elif m == 2:
                h = (f'<HTML LANG="DE"><HEAD><TITLE>Seite {i}</TITLE>'
                     f'<META NAME="DESCRIPTION" CONTENT="Inhalt {i}"></HEAD>'
                     f'<body>b</body></HTML>')
            elif m == 3:
                h = ('<html><head><meta name="robots" content="noindex">'
                     '</head><body>b</body></html>')
            elif m == 4:
                h = (f"<html><head><title>\n  Multi   line\ttitle {i}\n "
                     f"</title></head><body>b</body></html>")
            elif m == 5:
                h = ('<html><head>'
                     '<meta content="noindex, nofollow" name="robots">'
                     f'<title>Blocked {i}</title></head><body>b</body></html>')
            elif m == 6:
                h = (f"<html><head><meta content='First {i}' name='description'>"
                     f'<link rel="canonical" href=https://c.example/{i}>'
                     f'</head><body>b</body></html>')
            elif m == 7:
                h = '<html><head></head><body>no head fields</body></html>'
            elif m == 8:
                h = (f'<html lang="pt-BR"><head><title>A &amp; B {i}</title>'
                     f'</head><body>b</body></html>')
            else:
                h = (f'<html><head><title>First {i}</title>'
                     f'<title>Second</title>'
                     f'<meta name="description" content="D1 {i}">'
                     f'<meta name="description" content="D2">'
                     f'</head><body>b</body></html>')
            urls.append(f"https://pages.example/{i}")
            htmls.append(h.encode("utf-8"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    out = html_head_metadata(docs.map_batches(pages, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        # absent → '' for the hash compare only (the operator keeps nulls)
        cols = {"url": t["url"]}
        for c in ("title", "meta_description", "canonical_url"):
            cols[c] = pc.fill_null(t[c], "")
        cols["robots_noindex"] = t["robots_noindex"]
        cols["robots_nofollow"] = t["robots_nofollow"]
        cols["html_lang"] = pc.fill_null(t["html_lang"], "")
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


SQL_QUERIES.update({"head_metadata": q_head_metadata})
ORACLE_SQL.update({
    "head_metadata": """
        WITH m AS (
          SELECT doc_id, CAST(doc_id AS VARCHAR) AS i, doc_id % 10 AS k
          FROM documents)
        SELECT
          'https://pages.example/' || i AS url,
          CASE k WHEN 0 THEN 'Page ' || i || ' report'
                 WHEN 1 THEN 'Pagina ' || i
                 WHEN 2 THEN 'Seite ' || i
                 WHEN 4 THEN 'Multi line title ' || i
                 WHEN 5 THEN 'Blocked ' || i
                 WHEN 8 THEN 'A &amp; B ' || i
                 WHEN 9 THEN 'First ' || i
                 ELSE '' END AS title,
          CASE k WHEN 0 THEN 'Summary ' || i || ' of the page'
                 WHEN 1 THEN 'Resumo ' || i
                 WHEN 2 THEN 'Inhalt ' || i
                 WHEN 6 THEN 'First ' || i
                 WHEN 9 THEN 'D1 ' || i
                 ELSE '' END AS meta_description,
          CASE k WHEN 0 THEN 'https://canon.example/p/' || i
                 WHEN 1 THEN 'https://canon.example/q/' || i
                 WHEN 6 THEN 'https://c.example/' || i
                 ELSE '' END AS canonical_url,
          k IN (3, 5) AS robots_noindex,
          k = 5 AS robots_nofollow,
          CASE k WHEN 0 THEN 'en' WHEN 1 THEN 'pt' WHEN 2 THEN 'DE'
                 WHEN 8 THEN 'pt-BR' ELSE '' END AS html_lang
        FROM m
    """,
})


def q_follow_edges(sf_dir: str):
    """Endorsement-only link harvest (stages/links.extract_links with
    respect_nofollow=True): anchors whose rel carries the nofollow token
    (all three quoting forms planted) drop, and pages whose robots meta
    says nofollow contribute no edges at all — the crawl-graph hygiene
    rule PageRank-grade graphs need. Each planted page carries one
    followable link and one nofollow ad link; every 7th page is
    robots-nofollow; DuckDB emits the surviving edge set directly from
    the same doc-id arithmetic. Streaming map, zero exchanges."""
    from .stages.links import extract_links

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        urls, htmls = [], []
        for i in ids:
            rel = ('rel="nofollow sponsored"', "rel='nofollow'",
                   "rel=nofollow")[i % 3]
            robots = ('<meta name="robots" content="index, nofollow">'
                      if i % 7 == 0 else "")
            h = (f"<html><head>{robots}</head><body>"
                 f'<a href="https://s{(i + 1) % 50}.example/p/{i + 1}">'
                 f"next {i}</a>"
                 f'<a href="https://spam.example/{i}" {rel}>ad {i}</a>'
                 f"</body></html>")
            urls.append(f"https://s{i % 50}.example/p/{i}")
            htmls.append(h.encode("utf-8"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    return extract_links(docs.map_batches(pages, batch_format="pyarrow"),
                         respect_nofollow=True)


SQL_QUERIES.update({"follow_edges": q_follow_edges})
ORACLE_SQL.update({
    "follow_edges": """
        SELECT 'https://s' || CAST(doc_id % 50 AS VARCHAR) ||
                   '.example/p/' || CAST(doc_id AS VARCHAR) AS src_url,
               'https://s' || CAST((doc_id + 1) % 50 AS VARCHAR) ||
                   '.example/p/' || CAST(doc_id + 1 AS VARCHAR) AS dst_url,
               'next ' || CAST(doc_id AS VARCHAR) AS anchor
        FROM documents
        WHERE doc_id % 7 <> 0
    """,
})


def q_canonical_consolidate(sf_dir: str):
    """Canonical-URL consolidation — the composition the crawl dedup
    story needs: rel=canonical pointers are PARSED from page heads
    (stages/headmeta), pages pointing elsewhere become (src → canonical)
    string edges, and pointer jumping (ops/pointer.resolve_pointers_auto)
    chases canonical-of-canonical chains (planted up to 9 hops; both
    link-attribute orders exercised) to the terminal representative each
    page's signals consolidate onto. log(L) exchanges via path doubling
    — or driver dict sweeps under the broadcast bound (mapping is
    crawl-delta-sized, not corpus-sized). Oracle: DuckDB recursive-CTE
    chain chase over the identically-planted pointers."""
    from .ops.pointer import resolve_pointers_auto
    from .stages.headmeta import html_head_metadata

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def pages(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for i in t["doc_id"].to_pylist():
            if i % 10 != 0:
                link = (
                    f'<link rel="canonical" href="https://c.example/{i - 1}">'
                    if i % 2 else
                    f'<link href="https://c.example/{i - 1}" rel="canonical">')
            else:
                link = ""  # chain terminal: no canonical pointer
            h = (f"<html><head><title>p{i}</title>{link}</head>"
                 f"<body>b</body></html>")
            urls.append(f"https://c.example/{i}")
            htmls.append(h.encode("utf-8"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    meta = html_head_metadata(docs.map_batches(pages, batch_format="pyarrow"))

    def edges(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t["canonical_url"]),
                       pc.not_equal(t["canonical_url"], t["url"]))
        f = t.filter(keep)
        return pa.table({"src": f["url"], "dst": f["canonical_url"]})

    return resolve_pointers_auto(
        meta.map_batches(edges, batch_format="pyarrow"), rounds=4)


SQL_QUERIES.update({"canonical_consolidate": q_canonical_consolidate})
ORACLE_SQL.update({
    "canonical_consolidate": """
        WITH RECURSIVE e AS (
          SELECT 'https://c.example/' || CAST(doc_id AS VARCHAR) AS src,
                 'https://c.example/' || CAST(doc_id - 1 AS VARCHAR) AS dst
          FROM documents WHERE doc_id % 10 <> 0),
        chase AS (
          SELECT src, dst AS cur FROM e
          UNION ALL
          SELECT c.src, e.dst FROM chase c JOIN e ON e.src = c.cur)
        SELECT src, cur AS dst FROM chase c
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = c.cur)
    """,
})


def q_html_tables(sf_dir: str):
    """Structured-table harvest from crawl HTML (stages/htmltables) —
    the HTML-side analog of the PDF cell model (M34/M35,
    functions/layout.table_cells): one row per <th>/<td> with
    (table_id, row_id, col_id, is_header, cell). Planted grids vary
    column count by parity, every 5th doc's first body cell spans two
    column slots (colspan advances the next slot), every 7th doc adds
    a second table, and header cells carry padding whitespace the
    cleaner must collapse; DuckDB rebuilds the exact cell set with
    lateral range unnests over the same arithmetic. Stateless
    streaming map, zero exchanges."""
    from .stages.htmltables import html_tables

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def pages(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for i in t["doc_id"].to_pylist():
            n_cols = 2 + i % 2
            rows = ["<tr>" + "".join(
                f"<th> h{c} </th>" for c in range(n_cols)) + "</tr>"]
            for r in (1, 2):
                if i % 5 == 0 and r == 1:
                    tds = [f'<td colspan="2">s{i}</td>']
                    if n_cols == 3:
                        tds.append(f"<td>v{i} 1 2</td>")
                else:
                    tds = [f"<td>v{i} {r} {c}</td>" for c in range(n_cols)]
                rows.append("<tr>" + "".join(tds) + "</tr>")
            h = "<html><body><table>" + "".join(rows) + "</table>"
            if i % 7 == 0:
                h += f"<table><tr><td>t2 {i}</td></tr></table>"
            h += "</body></html>"
            urls.append(f"https://t.example/{i}")
            htmls.append(h.encode("utf-8"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    return html_tables(docs.map_batches(pages, batch_format="pyarrow"))


SQL_QUERIES.update({"html_tables": q_html_tables})
ORACLE_SQL.update({
    "html_tables": """
        WITH d AS (
          SELECT doc_id AS i, CAST(doc_id AS VARCHAR) AS s,
                 2 + doc_id % 2 AS n_cols
          FROM documents),
        cells AS (
          SELECT i, 0 AS table_id, 0 AS row_id, u.c AS col_id,
                 TRUE AS is_header, 'h' || u.c AS cell
          FROM d, UNNEST(range(0, n_cols)) AS u(c)
          UNION ALL
          SELECT i, 0, r.r, u.c, FALSE, 'v' || s || ' ' || r.r || ' ' || u.c
          FROM d, UNNEST([1, 2]) AS r(r), UNNEST(range(0, n_cols)) AS u(c)
          WHERE NOT (i % 5 = 0 AND r.r = 1)
          UNION ALL
          SELECT i, 0, 1, 0, FALSE, 's' || s FROM d WHERE i % 5 = 0
          UNION ALL
          SELECT i, 0, 1, 2, FALSE, 'v' || s || ' 1 2'
          FROM d WHERE i % 5 = 0 AND n_cols = 3
          UNION ALL
          SELECT i, 1, 0, 0, FALSE, 't2 ' || s FROM d WHERE i % 7 = 0)
        SELECT 'https://t.example/' || CAST(i AS VARCHAR) AS url,
               CAST(table_id AS BIGINT) AS table_id,
               CAST(row_id AS BIGINT) AS row_id,
               CAST(col_id AS BIGINT) AS col_id,
               is_header, cell
        FROM cells
    """,
})


def q_sitemap_parse(sf_dir: str):
    """Sitemap-protocol parsing (stages/sitemaps.parse_sitemaps): every
    11th doc is a <sitemapindex> (two child-sitemap entries, kind=
    'sitemap' so a frontier loop can recurse), the rest are <urlset>
    pages with three <url> entries each — entity-escaped query strings
    in <loc>, lastmod/changefreq/priority present on two of the three
    (binary-exact 0.25/0.75 priorities; the k=1 entry omits the
    optionals → nulls). DuckDB rebuilds the entry set from the same
    doc-id arithmetic. Stateless streaming map, zero exchanges."""
    from .stages.sitemaps import parse_sitemaps

    return parse_sitemaps(_sitemap_fixture_ds(sf_dir)) \
        .map_batches(_sitemap_finish, batch_format="pyarrow")


def _sitemap_fixture_ds(sf_dir: str):
    """The planted sitemap corpus shared by q_sitemap_parse and
    q_frontier_gap (see q_sitemap_parse's docstring for the layout)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def pages(t: pa.Table) -> pa.Table:
        urls, xmls = [], []
        for i in t["doc_id"].to_pylist():
            if i % 11 == 0:
                body = "".join(
                    f"<sitemap><loc> https://s.example/sm/{i}/{j}.xml </loc>"
                    f"<lastmod>2026-0{j + 1}-01</lastmod></sitemap>"
                    for j in (0, 1))
                xml = f'<?xml version="1.0"?><sitemapindex>{body}</sitemapindex>'
            else:
                parts = []
                for k in range(3):
                    loc = f"https://s.example/{i}/{k}?a=1&amp;b=2"
                    if k == 1:  # optionals absent
                        parts.append(f"<url><loc>{loc}</loc></url>")
                    else:
                        parts.append(
                            f"<url><loc>{loc}</loc>"
                            f"<lastmod>2026-0{k + 1}-15</lastmod>"
                            f"<changefreq>{('daily', '', 'monthly')[k]}</changefreq>"
                            f"<priority>0.{(25, 0, 75)[k]}</priority></url>")
                xml = f'<?xml version="1.0"?><urlset>{"".join(parts)}</urlset>'
            urls.append(f"https://s.example/sitemap/{i}.xml")
            xmls.append(xml.encode("utf-8"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "xml": pa.array(xmls, pa.binary())})

    return docs.map_batches(pages, batch_format="pyarrow")


def _sitemap_finish(t: pa.Table) -> pa.Table:
    return pa.table({
        "sitemap_url": t["sitemap_url"], "kind": t["kind"],
        "loc": t["loc"],
        "lastmod": pc.fill_null(t["lastmod"], ""),
        "changefreq": pc.fill_null(t["changefreq"], ""),
        "priority": t["priority"],  # float nulls hash as blank on both sides
    })


SQL_QUERIES.update({"sitemap_parse": q_sitemap_parse})
ORACLE_SQL.update({
    "sitemap_parse": """
        WITH d AS (
          SELECT doc_id AS i, CAST(doc_id AS VARCHAR) AS s FROM documents),
        idx AS (
          SELECT i, s, 'sitemap' AS kind,
                 'https://s.example/sm/' || s || '/' || j || '.xml' AS loc,
                 '2026-0' || (j + 1) || '-01' AS lastmod,
                 '' AS changefreq, CAST(NULL AS DOUBLE) AS priority
          FROM d, UNNEST([0, 1]) AS u(j) WHERE i % 11 = 0),
        urls AS (
          SELECT i, s, 'url' AS kind,
                 'https://s.example/' || s || '/' || k || '?a=1&b=2' AS loc,
                 CASE WHEN k = 1 THEN ''
                      ELSE '2026-0' || (k + 1) || '-15' END AS lastmod,
                 CASE k WHEN 0 THEN 'daily' WHEN 2 THEN 'monthly'
                        ELSE '' END AS changefreq,
                 CASE k WHEN 0 THEN 0.25 WHEN 2 THEN 0.75
                        ELSE CAST(NULL AS DOUBLE) END AS priority
          FROM d, UNNEST([0, 1, 2]) AS u(k) WHERE i % 11 <> 0)
        SELECT 'https://s.example/sitemap/' || s || '.xml' AS sitemap_url,
               kind, loc, lastmod, changefreq,
               CAST(priority AS DOUBLE) AS priority
        FROM (SELECT * FROM idx UNION ALL SELECT * FROM urls)
    """,
})


# --------------------------------------------------------------------------
# SURT keys + CDX sorted-layout lookup (stages/urls.surt_key_batch,
# stages/cdx.py). The oracle re-derives the SURT transform with DuckDB's
# own list kernels (string_split → list_reverse → array_to_string) over
# the SAME messy-url fixture — an independent implementation, not replay.
# --------------------------------------------------------------------------

_SURT_SQL_CTE = """
    , surt_q AS (
      SELECT doc_id, scheme, port, path,
        array_to_string(list_reverse(string_split(
          regexp_replace(host, '^www\\.', ''), '.')), ',') AS rhost,
        COALESCE(array_to_string(list_sort(list_filter(
          string_split(query, '&'),
          x -> x <> ''
               AND NOT starts_with(split_part(x, '=', 1), 'utm_')
               AND NOT list_contains(['fbclid','gclid','msclkid','ref'],
                                     split_part(x, '=', 1)))), '&'),
          '') AS q2
      FROM hd),
    surt_t AS (
      SELECT doc_id,
        lower(rhost
          || CASE WHEN port = -1 OR (scheme = 'http' AND port = 80)
                       OR (scheme = 'https' AND port = 443) THEN ''
                  ELSE ':' || CAST(port AS VARCHAR) END
          || ')'
          || CASE WHEN path = '' THEN '/' ELSE path END
          || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END) AS surt
      FROM surt_q)
"""

_CDX_TS_EXPR = ("TIMESTAMP '2026-01-01 00:00:00' + "
                "to_seconds(doc_id * 37 % 777013)")
_CDX_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z


def _capture_ts_ds(sf_dir: str):
    """Messy-url fixture + planted capture timestamp (doc-id
    arithmetic, mirrored by ``_CDX_TS_EXPR``)."""
    ds = _messy_url_ds(sf_dir)

    def add_ts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        us = _CDX_EPOCH_US + (ids * 37 % 777013) * 1_000_000
        return t.append_column(
            "warc_ts", pa.array(us, pa.int64()).cast(pa.timestamp("us")))

    return ds.map_batches(add_ts, batch_format="pyarrow")


def q_surt_keys(sf_dir: str):
    """SURT index keys (stages/urls.surt_key_batch): host labels
    reversed + comma-joined, one leading www stripped, default ports
    dropped, tracking params removed + rest sorted, fragment dropped,
    lowercased. Stateless vectorized map, no exchange."""
    from .stages.urls import surt_keys

    out = surt_keys(_messy_url_ds(sf_dir))
    return out.select_columns(["doc_id", "surt"])


def _cdx_layout_cached(sf_dir: str):
    """Sorted CDX layout over the capture fixture: (manifest rows,
    out_dir), cached under a FIXTURES_VERSION-keyed /tmp dir (the
    _range_export_cached pattern). sample_mod exercises the TeraSort
    hash-sample cut — the at-scale edge path for unbounded-distinct
    string keys."""
    import os

    import pyarrow.parquet as _pq

    from .stages.cdx import build_cdx_index

    out = _tmp_cache("cdx", sf_dir)
    mpath = os.path.join(out, "manifest.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        manifest = build_cdx_index(_capture_ts_ds(sf_dir), out,
                                   partitions=8, sample_mod=4)
        batches = list(manifest.iter_batches(batch_size=65536,
                                             batch_format="pyarrow"))
        _pq.write_table(pa.concat_tables(batches), mpath)
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass
    return _pq.read_table(mpath).to_pylist(), out


def q_cdx_lookup(sf_dir: str):
    """Manifest-pruned CDX prefix scan (stages/cdx.cdx_prefix_lookup):
    every capture of the ``com,example,`` site family, read from the
    sorted layout by opening only intersecting range files. Gated
    against the SQL that recomputes surt+ts keys and filters by
    starts_with — a lost, duplicated or misplaced capture mismatches."""
    from .stages.cdx import cdx_prefix_lookup

    manifest, _ = _cdx_layout_cached(sf_dir)
    hits = cdx_prefix_lookup(manifest, "com,example,")
    return hits.select_columns(["doc_id", "cdx_key"])


SQL_QUERIES.update({
    "surt_keys": q_surt_keys,
    "cdx_lookup": q_cdx_lookup,
})
ORACLE_SQL.update({
    "surt_keys": _MESSY_URL_CTE + _SURT_SQL_CTE + """
        SELECT doc_id, surt FROM surt_t
    """,
    "cdx_lookup": _MESSY_URL_CTE + _SURT_SQL_CTE + """
        , k AS (
          SELECT doc_id,
                 surt || ' ' || strftime({TS}, '%Y%m%d%H%M%S') AS cdx_key
          FROM surt_t)
        SELECT doc_id, cdx_key FROM k
        WHERE starts_with(cdx_key, 'com,example,')
    """.replace("{TS}", _CDX_TS_EXPR),
})


def q_frontier_schedule(sf_dir: str):
    """Politeness frontier scheduling (stages/urls.frontier_schedule):
    ≤2 urls per host per fetch wave, best planted priority first,
    doc_id tiebreak. One partition-grouped exchange on the host;
    per-partition Cython cumcount, no per-host groups."""
    from .stages.urls import frontier_schedule, parse_urls

    parsed = parse_urls(_messy_url_ds(sf_dir))

    def prio(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return t.append_column(
            "priority", pa.array(ids * 7 % 23, pa.int64()))

    cand = parsed.map_batches(prio, batch_format="pyarrow")
    sched = frontier_schedule(cand, per_wave=2,
                              order_cols=("priority", "doc_id"))
    return sched.select_columns(
        ["doc_id", "host", "priority", "wave", "slot"])


SQL_QUERIES.update({"frontier_schedule": q_frontier_schedule})
ORACLE_SQL.update({
    "frontier_schedule": _MESSY_URL_CTE + """
        , f AS (
          SELECT doc_id, host,
                 CAST(doc_id * 7 % 23 AS BIGINT) AS priority
          FROM hd),
        r AS (
          SELECT doc_id, host, priority,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY priority, doc_id) - 1 AS rk
          FROM f)
        SELECT doc_id, host, priority,
               CAST(rk // 2 AS BIGINT) AS wave,
               CAST(rk % 2 AS BIGINT) AS slot
        FROM r
    """,
})


def q_feed_parse(sf_dir: str):
    """RSS/Atom feed parsing (stages/feeds.parse_feeds): every 3rd doc
    is an Atom feed (two entries — one full, one href-only so the
    optionals come back null), the rest are RSS channels (one full
    item with entity-escaped link/title, one link-only item, one
    linkless item that DROPS, plus a channel-level <link> that must
    NOT parse as an entry). DuckDB rebuilds the surviving entry set
    from the same doc-id arithmetic. Stateless map, zero exchanges."""
    from .stages.feeds import parse_feeds

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def pages(t: pa.Table) -> pa.Table:
        urls, xmls = [], []
        for i in t["doc_id"].to_pylist():
            if i % 3 == 0:
                body = (
                    f'<entry><title type="text">E{i}-0</title>'
                    f'<link rel="alternate" '
                    f'href="https://f.example/{i}/0?a=1&amp;b=2"/>'
                    f"<id>urn:{i}:0</id>"
                    f"<updated>2026-03-01T00:00:0{i % 6}Z</updated></entry>"
                    f'<entry><link href="https://f.example/{i}/1"/></entry>')
                xml = f'<feed xmlns="http://www.w3.org/2005/Atom">{body}</feed>'
            else:
                items = (
                    f"<item><title>T {i} &amp; co</title>"
                    f"<link> https://f.example/{i}/r0?x=1&amp;y=2 </link>"
                    f"<guid>g:{i}</guid>"
                    f"<pubDate>Mon, 0{i % 7 + 1} Jan 2026</pubDate></item>"
                    f"<item><link>https://f.example/{i}/r1</link></item>"
                    f"<item><title>dropped</title></item>")
                xml = (f"<rss><channel><link>https://f.example/</link>"
                       f"{items}</channel></rss>")
            urls.append(f"https://f.example/feed/{i}.xml")
            xmls.append(xml.encode("utf-8"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "xml": pa.array(xmls, pa.binary())})

    out = parse_feeds(docs.map_batches(pages, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "feed_url": t["feed_url"], "kind": t["kind"],
            "title": pc.fill_null(t["title"], ""),
            "link": t["link"],
            "guid": pc.fill_null(t["guid"], ""),
            "pubdate": pc.fill_null(t["pubdate"], ""),
        })

    return out.map_batches(finish, batch_format="pyarrow")


SQL_QUERIES.update({"feed_parse": q_feed_parse})
ORACLE_SQL.update({
    "feed_parse": """
        WITH d AS (
          SELECT doc_id AS i, CAST(doc_id AS VARCHAR) AS s FROM documents),
        atom AS (
          SELECT 'https://f.example/feed/' || s || '.xml' AS feed_url,
                 'atom' AS kind,
                 CASE j WHEN 0 THEN 'E' || s || '-0' ELSE '' END AS title,
                 CASE j WHEN 0
                   THEN 'https://f.example/' || s || '/0?a=1&b=2'
                   ELSE 'https://f.example/' || s || '/1' END AS link,
                 CASE j WHEN 0 THEN 'urn:' || s || ':0' ELSE '' END AS guid,
                 CASE j WHEN 0
                   THEN '2026-03-01T00:00:0' || (i % 6) || 'Z'
                   ELSE '' END AS pubdate
          FROM d, UNNEST([0, 1]) AS u(j) WHERE i % 3 = 0),
        rss AS (
          SELECT 'https://f.example/feed/' || s || '.xml' AS feed_url,
                 'rss' AS kind,
                 CASE k WHEN 0 THEN 'T ' || s || ' & co' ELSE '' END AS title,
                 CASE k WHEN 0
                   THEN 'https://f.example/' || s || '/r0?x=1&y=2'
                   ELSE 'https://f.example/' || s || '/r1' END AS link,
                 CASE k WHEN 0 THEN 'g:' || s ELSE '' END AS guid,
                 CASE k WHEN 0
                   THEN 'Mon, 0' || (i % 7 + 1) || ' Jan 2026'
                   ELSE '' END AS pubdate
          FROM d, UNNEST([0, 1]) AS u(k) WHERE i % 3 <> 0)
        SELECT * FROM atom UNION ALL SELECT * FROM rss
    """,
})


def _host_edges_ds(sf_dir: str):
    """Planted page-level link edges shared by q_host_graph and
    q_host_authority (the _sitemap_fixture_ds pattern): each doc links
    to docs (3i+1)%n and (7i+2)%n over the messy-url corpus. ONE
    builder so the two oracles can never silently desynchronize."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    n = docs.count()

    def edges(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for i in t["doc_id"].to_pylist():
            u = _messy_url(i)
            for d in ((i * 3 + 1) % n, (i * 7 + 2) % n):
                src.append(u)
                dst.append(_messy_url(d))
        return pa.table({"src_url": pa.array(src, pa.string()),
                         "dst_url": pa.array(dst, pa.string())})

    return docs.map_batches(edges, batch_format="pyarrow")


def q_host_graph(sf_dir: str):
    """Host-level web-graph rollup (stages/links.host_graph): planted
    page edges (_host_edges_ds) rolled to (src_host, dst_host, n_links,
    n_src_pages-distinct) with intra-host navigation edges dropped.
    Two narrow grouped exchanges, no joins."""
    from .stages.links import host_graph

    return host_graph(_host_edges_ds(sf_dir))


SQL_QUERIES.update({"host_graph": q_host_graph})
ORACLE_SQL.update({
    "host_graph": _MESSY_URL_CTE + """
        , nn AS (SELECT COUNT(*) AS n FROM documents),
        e AS (
          SELECT s.host AS src_host, d.host AS dst_host, s.url AS src_url
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 3 + 1) % nn.n
          UNION ALL
          SELECT s.host, d.host, s.url
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 7 + 2) % nn.n)
        SELECT src_host, dst_host,
               CAST(COUNT(*) AS BIGINT) AS n_links,
               CAST(COUNT(DISTINCT src_url) AS BIGINT) AS n_src_pages
        FROM e WHERE src_host <> dst_host
        GROUP BY src_host, dst_host
    """,
})


def q_host_authority(sf_dir: str):
    """Composed host-authority flagship: planted page edges → host_graph
    rollup (intra-host navigation dropped, multiplicity collapsed to
    distinct host pairs) → 3 PageRank rounds via pagerank_auto's
    dictionary-encoded dense path. The whole composition is value-gated
    by the SQL that rebuilds the host edge set and unrolls the same 3
    rounds. Host graphs are node-bounded (hosts ≪ pages) — exactly the
    regime the dense path exists for."""
    from ray.data.aggregate import Count as _Count

    from .ops.pagerank import pagerank_auto
    from .stages.links import host_graph

    # host-pair table is aggregate-sized (hosts^2 sparse); pin it — it
    # has three consumers (two node-side scans + the rank lineage)
    g = host_graph(_host_edges_ds(sf_dir)) \
        .select_columns(["src_host", "dst_host"]).materialize()

    def side(col: str):
        return g.select_columns([col]).map_batches(
            lambda t, c=col: pa.table({"node": t[c]}),
            batch_format="pyarrow")

    nodes = side("src_host").union(side("dst_host")) \
        .groupby("node").aggregate(_Count()) \
        .select_columns(["node"]).materialize()
    ranked = pagerank_auto(nodes, g, node_col="node", src_col="src_host",
                           dst_col="dst_host", iters=3, round_to=8)
    return ranked.map_batches(
        lambda t: pa.table({"host": t["node"], "pagerank": t["pagerank"]}),
        batch_format="pyarrow")


SQL_QUERIES.update({"host_authority": q_host_authority})
ORACLE_SQL.update({
    "host_authority": _MESSY_URL_CTE + """
        , nn0 AS (SELECT COUNT(*) AS n FROM documents),
        pe AS (
          SELECT s.host AS src_host, d.host AS dst_host
          FROM hd s CROSS JOIN nn0
          JOIN hd d ON d.doc_id = (s.doc_id * 3 + 1) % nn0.n
          UNION ALL
          SELECT s.host, d.host
          FROM hd s CROSS JOIN nn0
          JOIN hd d ON d.doc_id = (s.doc_id * 7 + 2) % nn0.n),
        edges AS (
          SELECT DISTINCT src_host AS src, dst_host AS dst
          FROM pe WHERE src_host <> dst_host),
        nodes AS (SELECT DISTINCT src AS node FROM edges
                  UNION SELECT DISTINCT dst FROM edges),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        od AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
        ew AS (SELECT e.src, e.dst, od.od FROM edges e JOIN od USING (src)),
        r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes)
        {_PR_HOST_ROUNDS}
        SELECT node AS host, ROUND(r, 8) AS pagerank FROM r3
    """.replace("{_PR_HOST_ROUNDS}", "".join(
        f''',
        r{i} AS (SELECT nd.node,
                   0.15/(SELECT n FROM nn)
                   + 0.85*COALESCE(SUM(r{i-1}.r/ew.od), 0) AS r
                 FROM nodes nd
                 LEFT JOIN ew ON ew.dst = nd.node
                 LEFT JOIN r{i-1} ON r{i-1}.node = ew.src
                 GROUP BY nd.node)'''
        for i in range(1, 4))),
})


def q_robots_parse(sf_dir: str):
    """robots.txt parsing (stages/robots.parse_robots): per-doc planted
    bodies exercise group accrual (two consecutive UA lines share one
    group), comments, empty-value disallow, agent-null sitemap rows and
    unknown-directive drops. DuckDB replants the expected rows from the
    same doc-id arithmetic. Stateless map, zero exchanges."""
    from .stages.robots import parse_robots

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def bodies(t: pa.Table) -> pa.Table:
        hosts, bs = [], []
        for i in t["doc_id"].to_pylist():
            body = f"# robots for {i}\nUser-Agent: *\nDisallow: /p{i % 6}   # tail\n"
            if i % 3 == 0:
                body += (f"User-agent: GoodBot\nUser-agent: OtherBot\n"
                         f"Disallow: /tmp{i % 4}\nAllow: /tmp{i % 4}/ok\n")
            if i % 5 == 0:
                body += f"Sitemap: https://r{i}.example/sm.xml\n"
            body += "Crawl-delay: 5\n"
            hosts.append(f"r{i}.example")
            bs.append(body.encode("utf-8"))
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "body": pa.array(bs, pa.binary())})

    out = parse_robots(docs.map_batches(bodies, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["host"],
            "agent": pc.fill_null(t["agent"], ""),
            "directive": t["directive"], "value": t["value"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def q_robots_gate(sf_dir: str):
    """Composed politeness pipeline: parse_robots over planted per-host
    robots bodies → rules_for_agent('*') (own-group-beats-star
    selection) → robots_filter over the messy-url crawl. Gates the
    whole parse→select→filter loop; the SQL mirror rebuilds the
    effective '*' rule set (specialbot's own group must NOT leak into
    it) and re-applies the prefix rule."""
    from .stages.robots import parse_robots, rules_for_agent
    from .stages.urls import parse_urls, robots_filter

    bodies = []
    for j in range(53):
        bodies.append({
            "host": f"site{j}.com.br",
            "body": b"User-agent: *\nDisallow: /p1\n"})
        bodies.append({
            "host": f"www.site{j}.example.com",
            "body": (f"User-agent: SpecialBot\nDisallow: /\n"
                     f"User-agent: *\nDisallow: /p{j % 3}\n"
                     ).encode("utf-8")})
    parsed = parse_robots(rd.from_items(bodies))
    rules = rules_for_agent(parsed, "*")
    pages = parse_urls(_messy_url_ds(sf_dir))
    kept = robots_filter(pages, rules)
    return kept.select_columns(["doc_id", "host", "path"])


SQL_QUERIES.update({
    "robots_parse": q_robots_parse,
    "robots_gate": q_robots_gate,
})
ORACLE_SQL.update({
    "robots_parse": """
        WITH d AS (
          SELECT doc_id AS i, CAST(doc_id AS VARCHAR) AS s FROM documents),
        star AS (
          SELECT 'r' || s || '.example' AS host, '*' AS agent,
                 'disallow' AS directive, '/p' || (i % 6) AS value
          FROM d),
        bots AS (
          SELECT 'r' || s || '.example' AS host, a.agent,
                 dd.directive,
                 CASE dd.directive WHEN 'disallow' THEN '/tmp' || (i % 4)
                      ELSE '/tmp' || (i % 4) || '/ok' END AS value
          FROM d,
               UNNEST(['goodbot', 'otherbot']) AS a(agent),
               UNNEST(['disallow', 'allow']) AS dd(directive)
          WHERE i % 3 = 0),
        sm AS (
          SELECT 'r' || s || '.example' AS host, '' AS agent,
                 'sitemap' AS directive,
                 'https://r' || s || '.example/sm.xml' AS value
          FROM d WHERE i % 5 = 0)
        SELECT * FROM star
        UNION ALL SELECT * FROM bots
        UNION ALL SELECT * FROM sm
    """,
    "robots_gate": _MESSY_URL_CTE + """
        , rules AS (
          SELECT 'site' || CAST(j AS VARCHAR) || '.com.br' AS rhost,
                 '/p1' AS prefix
          FROM range(53) t(j)
          UNION ALL
          SELECT 'www.site' || CAST(j AS VARCHAR) || '.example.com',
                 '/p' || CAST(j % 3 AS VARCHAR)
          FROM range(53) t(j))
        SELECT doc_id, host, path FROM hd
        WHERE NOT EXISTS (
          SELECT 1 FROM rules r
          WHERE r.rhost = hd.host AND starts_with(hd.path, r.prefix))
    """,
})


def q_frontier_gap(sf_dir: str):
    """Discovered-but-uncrawled frontier: sitemap url entries
    (parse_sitemaps over the planted sitemap corpus) anti-joined
    against the crawled set (even docs fetched pages k=0 and k=2) via
    the armored distributed anti_join. The composition sitemap parse →
    kind filter → anti-join is what a crawl scheduler runs daily."""
    from .ops.joins import adaptive_partitions, anti_join
    from .stages.sitemaps import parse_sitemaps

    entries = parse_sitemaps(_sitemap_fixture_ds(sf_dir)).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "url")),
        batch_format="pyarrow")

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def crawled(t: pa.Table) -> pa.Table:
        locs = []
        for i in t["doc_id"].to_pylist():
            if i % 2 == 0 and i % 11 != 0:
                for k in (0, 2):
                    locs.append(f"https://s.example/{i}/{k}?a=1&b=2")
        return pa.table({"loc": pa.array(locs, pa.string())})

    seen = docs.map_batches(crawled, batch_format="pyarrow")
    gap = anti_join(entries, seen, on="loc",
                    num_partitions=adaptive_partitions(4096))
    return gap.select_columns(["sitemap_url", "loc"])


SQL_QUERIES.update({"frontier_gap": q_frontier_gap})
ORACLE_SQL.update({
    "frontier_gap": """
        WITH d AS (
          SELECT doc_id AS i, CAST(doc_id AS VARCHAR) AS s FROM documents),
        urls AS (
          SELECT 'https://s.example/sitemap/' || s || '.xml' AS sitemap_url,
                 'https://s.example/' || s || '/' || k || '?a=1&b=2' AS loc
          FROM d, UNNEST([0, 1, 2]) AS u(k) WHERE i % 11 <> 0),
        crawled AS (
          SELECT 'https://s.example/' || s || '/' || k || '?a=1&b=2' AS loc
          FROM d, UNNEST([0, 2]) AS u(k)
          WHERE i % 2 = 0 AND i % 11 <> 0)
        SELECT sitemap_url, loc FROM urls
        WHERE loc NOT IN (SELECT loc FROM crawled)
    """,
})


def q_url_traps(sf_dir: str):
    """Crawl-trap detection (stages/urls.url_pattern_traps): digit runs
    in the path collapse to 'N' and (host, pattern) pairs fanning out
    to ≥2 distinct urls flag as traps. The messy fixture's /pK/pageI
    paths all collapse to /pN/pageN per host, so counts mirror the
    per-host doc distribution (2-3 per host at sf0.01 — the threshold
    sits inside that band so the flag set is non-trivial; the
    trap_filter gate uses 3 so rows actually drop). Two narrow
    grouped exchanges."""
    from .stages.urls import url_pattern_traps

    return url_pattern_traps(_messy_url_ds(sf_dir), min_urls=2)


def q_trap_filter(sf_dir: str):
    """Composed trap hygiene: detect traps (≥8 distinct urls per
    digit-collapsed pattern) then anti-join the frontier against them
    via the armored distributed join — the daily frontier-cleaning
    pass. SQL re-derives the trap set with NOT EXISTS."""
    from .stages.urls import trap_filter, url_pattern_traps

    pages = _messy_url_ds(sf_dir)
    traps = url_pattern_traps(pages, min_urls=3)
    return trap_filter(pages, traps).select_columns(["doc_id", "url"])


SQL_QUERIES.update({
    "url_traps": q_url_traps,
    "trap_filter": q_trap_filter,
})
ORACLE_SQL.update({
    "url_traps": _MESSY_URL_CTE + """
        , pats AS (
          SELECT host, regexp_replace(path, '[0-9]+', 'N', 'g') AS pattern,
                 url
          FROM hd)
        SELECT host, pattern,
               CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls
        FROM pats GROUP BY host, pattern
        HAVING COUNT(DISTINCT url) >= 2
    """,
    "trap_filter": _MESSY_URL_CTE + """
        , pats AS (
          SELECT doc_id, url, host,
                 regexp_replace(path, '[0-9]+', 'N', 'g') AS pattern
          FROM hd),
        traps AS (
          SELECT host, pattern FROM pats
          GROUP BY host, pattern HAVING COUNT(DISTINCT url) >= 3)
        SELECT doc_id, url FROM pats p
        WHERE NOT EXISTS (
          SELECT 1 FROM traps t
          WHERE t.host = p.host AND t.pattern = p.pattern)
    """,
})


def q_crawl_budget(sf_dir: str):
    """Exact crawl-budget apportionment (ops/apportion.py
    largest_remainder): split a 997-page fetch budget across
    registered domains proportionally to their page counts, quotas
    summing to the budget EXACTLY (Hamilton / largest-remainder). The
    selection never sorts the domain table: a bucket histogram of the
    remainders (≤4096 rows to the driver) pins the boundary bucket,
    one filtered value-count inside it pins the cut remainder, and
    ties at the cut resolve by key ascending — mirrored by the SQL
    row_number() OVER (ORDER BY rem DESC, key) window. The messy-url
    fixture's domain counts repeat heavily, so the tie path is
    genuinely exercised."""
    from .ops.apportion import largest_remainder
    from .stages.urls import parse_urls

    parsed = parse_urls(_messy_url_ds(sf_dir))
    scores = parsed.groupby("registered_domain").count().map_batches(
        lambda t: pa.table({
            "registered_domain": t["registered_domain"],
            "score": pc.cast(t["count()"], pa.int64()),
        }),
        batch_format="pyarrow")
    return largest_remainder(scores, budget=997,
                             key_col="registered_domain",
                             score_col="score", out_col="quota")


SQL_QUERIES.update({"crawl_budget": q_crawl_budget})
ORACLE_SQL.update({
    "crawl_budget": _MESSY_URL_CTE + """
        , scores AS (
          SELECT registered_domain, CAST(COUNT(*) AS BIGINT) AS score
          FROM hd GROUP BY registered_domain),
        tot AS (SELECT CAST(SUM(score) AS BIGINT) AS s FROM scores),
        parts AS (
          SELECT registered_domain, score,
                 (997 * score) // s AS base,
                 (997 * score) % s AS rem
          FROM scores, tot),
        rr AS (SELECT 997 - CAST(SUM(base) AS BIGINT) AS r FROM parts)
        SELECT registered_domain, score,
               CAST(base + CASE WHEN row_number() OVER
                      (ORDER BY rem DESC, registered_domain)
                      <= (SELECT r FROM rr)
                    THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM parts
    """,
})


def q_crawl_plan(sf_dir: str):
    """Composed crawl-planning flagship (pipelines/crawl_plan.py):
    parse → robots gate → trap hygiene → exact largest-remainder
    budget split (200 pages) → per-domain quota head → politeness
    waves (≤2 fetches per domain per wave). EXACTLY 200 rows out; the
    single WITH-chain oracle re-derives every stage (NOT EXISTS robots
    + trap anti-joins, the apportionment window, per-domain
    row_number selection and wave arithmetic)."""
    from .pipelines.crawl_plan import plan_crawl

    # npart=8: the frontier here is corpus-table-sized, so partition
    # the chain's exchanges for the input, not the cluster (the
    # host_quality adaptive-partitions rule)
    return plan_crawl(_messy_url_ds(sf_dir), _robots_rules(),
                      budget=200, per_wave=2, trap_min_urls=3, npart=8)


SQL_QUERIES.update({"crawl_plan": q_crawl_plan})
ORACLE_SQL.update({
    "crawl_plan": _MESSY_URL_CTE + """
        , rules AS (
          SELECT 'site' || CAST(i AS VARCHAR) || '.com.br' AS rhost,
                 '/p1' AS prefix
          FROM range(53) t(i)
          UNION ALL
          SELECT 'www.site' || CAST(i AS VARCHAR) || '.example.com',
                 '/p' || CAST(i % 3 AS VARCHAR)
          FROM range(53) t(i)),
        gated AS (
          SELECT doc_id, url, host, path, registered_domain FROM hd
          WHERE NOT EXISTS (
            SELECT 1 FROM rules r
            WHERE r.rhost = hd.host AND starts_with(hd.path, r.prefix))),
        pats AS (
          SELECT doc_id, url, host, registered_domain,
                 regexp_replace(path, '[0-9]+', 'N', 'g') AS pattern
          FROM gated),
        traps AS (
          SELECT host, pattern FROM pats
          GROUP BY host, pattern HAVING COUNT(DISTINCT url) >= 3),
        clean AS (
          SELECT doc_id, url, registered_domain FROM pats p
          WHERE NOT EXISTS (
            SELECT 1 FROM traps t
            WHERE t.host = p.host AND t.pattern = p.pattern)),
        scores AS (
          SELECT registered_domain, CAST(COUNT(*) AS BIGINT) AS score
          FROM clean GROUP BY registered_domain),
        tot AS (SELECT CAST(SUM(score) AS BIGINT) AS s FROM scores),
        parts AS (
          SELECT registered_domain, score,
                 (200 * score) // s AS base,
                 (200 * score) % s AS rem
          FROM scores, tot),
        rr AS (SELECT 200 - CAST(SUM(base) AS BIGINT) AS r FROM parts),
        quotas AS (
          SELECT registered_domain,
                 base + CASE WHEN row_number() OVER
                          (ORDER BY rem DESC, registered_domain)
                          <= (SELECT r FROM rr)
                        THEN 1 ELSE 0 END AS quota
          FROM parts),
        ranked AS (
          SELECT c.doc_id, c.url, c.registered_domain,
                 row_number() OVER (PARTITION BY c.registered_domain
                                    ORDER BY c.doc_id) - 1 AS rk,
                 q.quota
          FROM clean c JOIN quotas q USING (registered_domain))
        SELECT doc_id, url, registered_domain,
               CAST(rk // 2 AS BIGINT) AS wave,
               CAST(rk % 2 AS BIGINT) AS slot
        FROM ranked WHERE rk < quota
    """,
})


def _robots_rules_rfc() -> list:
    """Deterministic (host, prefix, allow) rules exercising every RFC
    9309 precedence branch: a longer Allow carving pages back out of a
    Disallow subtree, an equal-length Allow/Disallow tie (Allow wins),
    and a plain Disallow with no override."""
    rules = []
    for k in range(53):
        rules.append((f"site{k}.com.br", "/p1", False))
        rules.append((f"site{k}.com.br", "/p1/page1", True))
        rules.append((f"www.site{k}.example.com", f"/p{k % 3}", False))
        rules.append((f"www.site{k}.example.com", f"/p{k % 3}/page2", True))
        rules.append((f"site{k}.org", "/p4", False))
        rules.append((f"site{k}.org", "/p4", True))
        rules.append((f"site{k}.org", "/p5", False))
    return rules


def q_robots_precedence(sf_dir: str):
    """RFC 9309 longest-match precedence gate (stages/urls.py
    robots_filter_rfc): Allow rules carve pages back out of Disallow
    subtrees, equal-length ties go to Allow, unmatched pages pass. One
    integer-max fold (score = 2·len+allow, allowed iff best is odd),
    mirrored by the SQL scalar-subquery MAX; the distributed join tier
    is asserted identical in tests."""
    from .stages.urls import parse_urls, robots_filter_rfc

    pages = parse_urls(_messy_url_ds(sf_dir))
    kept = robots_filter_rfc(pages, _robots_rules_rfc())
    return kept.select_columns(["doc_id", "host", "path"])


SQL_QUERIES.update({"robots_precedence": q_robots_precedence})
ORACLE_SQL.update({
    "robots_precedence": _MESSY_URL_CTE + """
        , rules AS (
          SELECT 'site' || CAST(i AS VARCHAR) || '.com.br' AS rhost,
                 '/p1' AS prefix, FALSE AS allow
          FROM range(53) t(i)
          UNION ALL
          SELECT 'site' || CAST(i AS VARCHAR) || '.com.br',
                 '/p1/page1', TRUE FROM range(53) t(i)
          UNION ALL
          SELECT 'www.site' || CAST(i AS VARCHAR) || '.example.com',
                 '/p' || CAST(i % 3 AS VARCHAR), FALSE FROM range(53) t(i)
          UNION ALL
          SELECT 'www.site' || CAST(i AS VARCHAR) || '.example.com',
                 '/p' || CAST(i % 3 AS VARCHAR) || '/page2', TRUE
          FROM range(53) t(i)
          UNION ALL
          SELECT 'site' || CAST(i AS VARCHAR) || '.org', '/p4', FALSE
          FROM range(53) t(i)
          UNION ALL
          SELECT 'site' || CAST(i AS VARCHAR) || '.org', '/p4', TRUE
          FROM range(53) t(i)
          UNION ALL
          SELECT 'site' || CAST(i AS VARCHAR) || '.org', '/p5', FALSE
          FROM range(53) t(i))
        SELECT doc_id, host, path FROM hd
        WHERE COALESCE((
          SELECT MAX(2 * length(r.prefix)
                     + CASE WHEN r.allow THEN 1 ELSE 0 END)
          FROM rules r
          WHERE r.rhost = hd.host AND r.prefix <> ''
            AND starts_with(hd.path, r.prefix)), 1) % 2 = 1
    """,
})


def q_shard_rebalance(sf_dir: str):
    """Rendezvous-hash ownership rebalance (ops/rendezvous.py): HRW
    owners of every url over a 4-node fleet and again after adding a
    5th, with the per-key moved flag — minimal-movement placement
    (only keys the new node wins move; asserted in tests). One
    streaming pass, zero exchange; the SQL mirror recomputes both
    argmax windows from the same md5-UBIGINT weights."""
    from .ops.rendezvous import rendezvous_rebalance

    old = [f"node{i}" for i in range(4)]
    out = rendezvous_rebalance(_messy_url_ds(sf_dir), old,
                               old + ["node4"], key_col="url")
    return out.select_columns(["url", "old_owner", "new_owner", "moved"])


SQL_QUERIES.update({"shard_rebalance": q_shard_rebalance})
ORACLE_SQL.update({
    "shard_rebalance": _MESSY_URL_CTE + """
        , nodes_old AS (
          SELECT 'node' || CAST(i AS VARCHAR) AS node FROM range(4) t(i)),
        nodes_new AS (
          SELECT 'node' || CAST(i AS VARCHAR) AS node FROM range(5) t(i)),
        oo AS (
          SELECT url, node AS old_owner FROM (
            SELECT hd.url, n.node,
                   row_number() OVER (PARTITION BY hd.url ORDER BY
                     CAST(concat('0x',
                          substr(md5(hd.url || '|' || n.node), 1, 16))
                          AS UBIGINT) DESC,
                     n.node) AS rn
            FROM hd CROSS JOIN nodes_old n) WHERE rn = 1),
        nn AS (
          SELECT url, node AS new_owner FROM (
            SELECT hd.url, n.node,
                   row_number() OVER (PARTITION BY hd.url ORDER BY
                     CAST(concat('0x',
                          substr(md5(hd.url || '|' || n.node), 1, 16))
                          AS UBIGINT) DESC,
                     n.node) AS rn
            FROM hd CROSS JOIN nodes_new n) WHERE rn = 1)
        SELECT o.url, o.old_owner, n.new_owner,
               o.old_owner <> n.new_owner AS moved
        FROM oo o JOIN nn n USING (url)
    """,
})


def _zorder_layout_cached(sf_dir: str):
    """Z-ordered (x, y) point layout for the zorder gate: 16 z-sorted
    range files + manifest, cached under a FIXTURES_VERSION-keyed /tmp
    dir (the _tmp_cache pattern). Points are doc-id arithmetic both
    engines reconstruct."""
    import os

    import pyarrow.parquet as _pq

    from .ops.zorder import zorder_export

    out = _tmp_cache("zorder", sf_dir)
    mpath = os.path.join(out, "manifest.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])

        def pts(t: pa.Table) -> pa.Table:
            i = pc.cast(t["doc_id"], pa.int64())
            return pa.table({
                "doc_id": i,
                "x": _pc_mod(pc.multiply(i, pa.scalar(13, pa.int64())), 128),
                "y": _pc_mod(pc.multiply(i, pa.scalar(29, pa.int64())), 128),
            })

        manifest = zorder_export(ds.map_batches(pts, batch_format="pyarrow"),
                                 "x", "y", out, partitions=16)
        batches = list(manifest.iter_batches(batch_size=65536,
                                             batch_format="pyarrow"))
        _pq.write_table(pa.concat_tables(batches), mpath)
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass
    return _pq.read_table(mpath).to_pylist(), out


def q_zorder_scan_check(sf_dir: str):
    """Z-order clustered layout + box scan (ops/zorder.py): Morton-
    interleave (x, y) doc-id points, export via the rangesort layout,
    then answer the box query x∈[16,47] × y∈[32,95] by ONE z-interval
    manifest prune + a vectorized trim of the curve's excursions. The
    oracle recomputes the 5-step bit spread with DuckDB's native
    <<//&/| operators — the z KEY is value-gated bit for bit, so a
    wrong interleave, a lossy export or an over-eager prune all
    mismatch. File-level pruning effectiveness is pinned in tests."""
    from .ops.zorder import zorder_box_scan

    manifest, _ = _zorder_layout_cached(sf_dir)
    out = zorder_box_scan(manifest, (16, 47), (32, 95), "x", "y")
    return out.select_columns(["doc_id", "x", "y", "zkey"])


SQL_QUERIES.update({"zorder_scan_check": q_zorder_scan_check})
ORACLE_SQL.update({
    "zorder_scan_check": """
        WITH pts AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CAST((doc_id * 13) % 128 AS BIGINT) AS x,
                 CAST((doc_id * 29) % 128 AS BIGINT) AS y
          FROM documents),
        s1 AS (SELECT doc_id, x, y,
                 (x | (x << 16)) & 281470681808895 AS a,
                 (y | (y << 16)) & 281470681808895 AS b FROM pts),
        s2 AS (SELECT doc_id, x, y,
                 (a | (a << 8)) & 71777214294589695 AS a,
                 (b | (b << 8)) & 71777214294589695 AS b FROM s1),
        s3 AS (SELECT doc_id, x, y,
                 (a | (a << 4)) & 1085102592571150095 AS a,
                 (b | (b << 4)) & 1085102592571150095 AS b FROM s2),
        s4 AS (SELECT doc_id, x, y,
                 (a | (a << 2)) & 3689348814741910323 AS a,
                 (b | (b << 2)) & 3689348814741910323 AS b FROM s3),
        s5 AS (SELECT doc_id, x, y,
                 (a | (a << 1)) & 6148914691236517205 AS a,
                 (b | (b << 1)) & 6148914691236517205 AS b FROM s4)
        SELECT doc_id, x, y, 2 * a + b AS zkey FROM s5
        WHERE x BETWEEN 16 AND 47 AND y BETWEEN 32 AND 95
    """,
})


# --------------------------------------------------------------------------
# Greedy subset selection (stages/select.py): MMR diverse top-k + k-center
# coreset. Both are sequential-greedy chains, so the oracle UNROLLS the k
# steps into CTEs (the pagerank unrolled-iteration pattern): step i scores
# every unpicked row against the UNION of picks 1..i-1 and takes the
# score-desc / id-asc argmax — a wrong fold, a missed exclusion or an
# unstable tie-break all mismatch on the very first divergent pick.
# --------------------------------------------------------------------------

_SELECT_K = 8
_SELECT_LAM = 0.7


def q_mmr_select(sf_dir: str, k: int = _SELECT_K, lam: float = _SELECT_LAM):
    """Maximal-Marginal-Relevance diverse top-k over the embeddings table
    (query = vec 0's embedding, which is excluded from candidacy).
    Zero-shuffle k-scan greedy: see stages/select.py."""
    import pyarrow.parquet as _pq

    from .stages.select import mmr_select

    qt = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "=", 0)])
    qv = np.array(qt["embedding"].to_pylist(), dtype=np.float64)[0]
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = mmr_select(ds, qv, k=k, lam=lam, exclude_ids=[0])
    return out.select(["rank", "vec_id"])


def q_kcenter_select(sf_dir: str, k: int = _SELECT_K):
    """Greedy farthest-point (k-center) traversal over the embeddings
    table, seeded at the smallest vec_id. Same k-scan mechanism."""
    from .stages.select import kcenter_select

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = kcenter_select(ds, k=k)
    return out.select(["rank", "vec_id"])


def _greedy_select_sql(mode: str, k: int = _SELECT_K,
                       lam: float = _SELECT_LAM) -> str:
    """Unrolled k-step greedy chain as a WITH-CTE string. Every CTE is
    MATERIALIZED: DuckDB inlines plain CTEs, and a chain where s_i
    references s_{i-1} and p_{i-1} re-expands exponentially (measured:
    ~3 min at k=8 inlined, <1 s materialized)."""
    parts = ["WITH e AS MATERIALIZED (SELECT vec_id, "
             "CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"]
    if mode == "mmr":
        parts.append(
            "q AS MATERIALIZED (SELECT v FROM e WHERE vec_id = 0)")
        parts.append(
            "rel AS MATERIALIZED (SELECT vec_id, v, "
            "list_cosine_similarity(v, (SELECT v FROM q)) AS rel "
            "FROM e WHERE vec_id <> 0)")
        parts.append(
            f"p1 AS MATERIALIZED (SELECT vec_id, v FROM rel "
            f"ORDER BY {lam!r} * rel DESC, vec_id LIMIT 1)")
        cand = "rel"
    else:
        parts.append(
            "p1 AS MATERIALIZED (SELECT vec_id, v FROM e "
            "WHERE vec_id = (SELECT MIN(vec_id) FROM e))")
        cand = "e"
    parts.append("s1 AS MATERIALIZED (SELECT vec_id, v FROM p1)")
    for i in range(2, k + 1):
        if mode == "mmr":
            # repr() of the RUNTIME coefficient: the Ray fold multiplies
            # by (1.0 - lam) = 0.30000000000000004 at lam=0.7, and a
            # rounded 0.3 literal is 1 ulp away — enough to flip an
            # argmax between near-tied candidates and desync the chain
            score = (f"{lam!r} * r.rel - {(1.0 - lam)!r} * "
                     "MAX(list_cosine_similarity(r.v, s.v))")
            grp = "GROUP BY r.vec_id, r.rel"
        else:
            score = "MIN(1 - list_cosine_similarity(r.v, s.v))"
            grp = "GROUP BY r.vec_id"
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT r.vec_id, {score} AS score "
            f"FROM {cand} r CROSS JOIN s{i-1} s "
            f"WHERE r.vec_id NOT IN (SELECT vec_id FROM s{i-1}) {grp})")
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT e.vec_id, e.v FROM c{i} JOIN e USING (vec_id) "
            f"ORDER BY c{i}.score DESC, c{i}.vec_id LIMIT 1)")
        if i < k:
            parts.append(
                f"s{i} AS MATERIALIZED (SELECT * FROM s{i-1} "
                f"UNION ALL SELECT vec_id, v FROM p{i})")
    sel = " UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id FROM p{i}" for i in range(1, k + 1))
    return ",\n".join(parts) + f"\nSELECT * FROM ({sel}) ORDER BY rank"


SQL_QUERIES.update({
    "mmr_select": q_mmr_select,
    "kcenter_select": q_kcenter_select,
})
ORACLE_SQL.update({
    "mmr_select": _greedy_select_sql("mmr"),
    "kcenter_select": _greedy_select_sql("kcenter"),
})


# --------------------------------------------------------------------------
# Label-propagation communities (ops/lpa.py): synchronous frequency-vote
# rounds unroll into SQL (JOIN + GROUP BY + QUALIFY argmax per round), the
# pagerank unrolled-iteration pattern. The planted graph (blocks of 8 with
# star+chain edges, sparse cross links) is doc-id arithmetic both engines
# rebuild.
# --------------------------------------------------------------------------

_LPA_ITERS = 3


def q_lpa_communities(sf_dir: str, iters: int = _LPA_ITERS):
    """Community labels over the planted block graph after ``iters``
    synchronous LPA rounds (most-frequent neighbor label, ties → min)."""
    from .ops.lpa import label_propagation_auto

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    m = docs.count()

    def edges(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for i in t["doc_id"].to_pylist():
            if i % 8 != 0:
                src.append(i)
                dst.append(i - i % 8)          # star to block head
            if (i + 1) % 8 != 0 and i + 1 < m:
                src.append(i)
                dst.append(i + 1)              # chain within block
            if i % 64 == 0 and i + 8 < m:
                src.append(i)
                dst.append(i + 8)              # sparse cross link
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    e = docs.map_batches(edges, batch_format="pyarrow")
    return label_propagation_auto(nodes, e, iters=iters)


def _lpa_sql(iters: int = _LPA_ITERS) -> str:
    parts = [
        "WITH n AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS node "
        "FROM documents)",
        "cnt AS MATERIALIZED (SELECT COUNT(*) AS m FROM n)",
        "e0 AS MATERIALIZED ("
        " SELECT node AS src, node - node % 8 AS dst FROM n"
        "  WHERE node % 8 <> 0"
        " UNION ALL SELECT node, node + 1 FROM n, cnt"
        "  WHERE (node + 1) % 8 <> 0 AND node + 1 < cnt.m"
        " UNION ALL SELECT node, node + 8 FROM n, cnt"
        "  WHERE node % 64 = 0 AND node + 8 < cnt.m)",
        "e AS MATERIALIZED (SELECT src, dst FROM e0 "
        "UNION ALL SELECT dst, src FROM e0)",
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM n)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT e.dst AS node, l.label, "
            f"COUNT(*) AS c FROM e JOIN l{i-1} l ON l.node = e.src "
            f"GROUP BY e.dst, l.label)")
        parts.append(
            f"w{i} AS MATERIALIZED (SELECT node, label FROM v{i} "
            f"QUALIFY row_number() OVER (PARTITION BY node "
            f"ORDER BY c DESC, label) = 1)")
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT l.node, "
            f"COALESCE(w.label, l.label) AS label "
            f"FROM l{i-1} l LEFT JOIN w{i} w USING (node))")
    return ",\n".join(parts) + f"\nSELECT node, label FROM l{iters}"


SQL_QUERIES.update({"lpa_communities": q_lpa_communities})
ORACLE_SQL.update({"lpa_communities": _lpa_sql()})


# --------------------------------------------------------------------------
# Crawl depth (ops/bfs.py): multi-source BFS from the seed list over a
# planted directed graph both engines rebuild by doc-id arithmetic. The
# fixed max_depth unrolls into SQL (JOIN + DISTINCT + NOT IN per round);
# unreached nodes are absent by contract.
# --------------------------------------------------------------------------

_BFS_DEPTH = 4


def q_crawl_depth(sf_dir: str, max_depth: int = _BFS_DEPTH):
    """Min-hop depth from the seed set (doc_id % 97 == 0) over a planted
    directed graph: chain i→i+1 plus jump i→(2i+3)%m on i%11==0. Per
    round ONE key-only frontier join + a narrow distinct + one armored
    anti-join against the visited table; early exit on an empty
    frontier is output-identical to the full unroll."""
    from .ops.bfs import bfs_depth

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    m = docs.count()

    def edges(t: pa.Table) -> pa.Table:
        i = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chain_src = i[i + 1 < m]
        jump_src = i[i % 11 == 0]
        return pa.table({
            "src": pa.array(np.concatenate([chain_src, jump_src]), pa.int64()),
            "dst": pa.array(np.concatenate(
                [chain_src + 1, (jump_src * 2 + 3) % m]), pa.int64()),
        })

    seeds = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow").filter(
        lambda r: r["node"] % 97 == 0)
    e = docs.map_batches(edges, batch_format="pyarrow")
    return bfs_depth(seeds, e, max_depth=max_depth)


def _bfs_sql(max_depth: int = _BFS_DEPTH) -> str:
    parts = [
        "WITH n AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS node "
        "FROM documents)",
        "cnt AS MATERIALIZED (SELECT COUNT(*) AS m FROM n)",
        "e AS MATERIALIZED ("
        " SELECT node AS src, node + 1 AS dst FROM n, cnt"
        "  WHERE node + 1 < cnt.m"
        " UNION ALL SELECT node, (node * 2 + 3) % cnt.m FROM n, cnt"
        "  WHERE node % 11 = 0)",
        "v0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS depth "
        "FROM n WHERE node % 97 = 0)",
        "f0 AS MATERIALIZED (SELECT node FROM v0)",
    ]
    for d in range(1, max_depth + 1):
        parts.append(
            f"c{d} AS MATERIALIZED (SELECT DISTINCT e.dst AS node "
            f"FROM e JOIN f{d-1} f ON e.src = f.node)")
        parts.append(
            f"f{d} AS MATERIALIZED (SELECT node FROM c{d} "
            f"WHERE node NOT IN (SELECT node FROM v{d-1}))")
        parts.append(
            f"v{d} AS MATERIALIZED (SELECT * FROM v{d-1} "
            f"UNION ALL SELECT node, CAST({d} AS BIGINT) FROM f{d})")
    return ",\n".join(parts) + f"\nSELECT node, depth FROM v{max_depth}"


SQL_QUERIES.update({"crawl_depth": q_crawl_depth})
ORACLE_SQL.update({"crawl_depth": _bfs_sql()})


# --------------------------------------------------------------------------
# k-core peeling (ops/kcore.py): planted clique+tail blocks (6-clique and a
# 4-node tail per 50-id block) peel gradually — one tail node per round —
# and converge within the unrolled SQL rounds, so the bounded-round output
# IS the 2-core. Degrees count distinct neighbors over the symmetrized
# distinct edge set.
# --------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 5


def q_kcore_hosts(sf_dir: str, k: int = _KCORE_K,
                  rounds: int = _KCORE_ROUNDS):
    """2-core of the planted clique+tail graph: per 50-id block, ids
    r<6 form a clique and ids r in 6..9 hang as a chain tail off the
    clique. The tail peels one node per round (k_core's bounded-round
    semantics exercised for real), the cliques survive at degree 5.
    Per round: ONE narrow degree groupby + two armored key-only
    semi-joins; early exit on the fixpoint."""
    from .ops.kcore import k_core

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    m = docs.count()

    def edges(t: pa.Table) -> pa.Table:
        i = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = i % 50
        b = i - r
        src, dst = [], []
        cl = i[r < 6]
        for j in range(1, 6):
            pick = (cl % 50 + j <= 5) & (cl - cl % 50 + cl % 50 + j < m)
            s = cl[pick]
            src.append(s)
            dst.append(s + j)
        tail = i[(r >= 6) & (r <= 9)]
        src.append(tail - 1)
        dst.append(tail)
        return pa.table({
            "src": pa.array(np.concatenate(src), pa.int64()),
            "dst": pa.array(np.concatenate(dst), pa.int64()),
        })

    e = docs.map_batches(edges, batch_format="pyarrow")
    return k_core(e, k=k, rounds=rounds)


def _kcore_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    parts = [
        "WITH n AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS node "
        "FROM documents)",
        "e0d AS MATERIALIZED ("
        " SELECT a.node AS src, b.node AS dst FROM n a JOIN n b"
        "  ON b.node - b.node % 50 = a.node - a.node % 50"
        "  AND a.node % 50 < 6 AND b.node % 50 < 6 AND a.node < b.node"
        " UNION ALL SELECT node - 1, node FROM n"
        "  WHERE node % 50 BETWEEN 6 AND 9)",
        "e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM e0d UNION ALL SELECT dst, src FROM e0d) "
        "WHERE src <> dst)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT src AS node, COUNT(*) AS c "
            f"FROM e{r-1} GROUP BY src)")
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE c >= {k})")
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT src, dst FROM e{r-1} "
            f"WHERE src IN (SELECT node FROM s{r}) "
            f"AND dst IN (SELECT node FROM s{r}))")
    return (",\n".join(parts) +
            f"\nSELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree "
            f"FROM e{rounds} GROUP BY src")


SQL_QUERIES.update({"kcore_hosts": q_kcore_hosts})
ORACLE_SQL.update({"kcore_hosts": _kcore_sql()})


def q_host_reciprocity(sf_dir: str):
    """Link-exchange signals (stages/links.host_reciprocity) over the
    planted host graph: per host, distinct out/in degree, mutual-edge
    count and reciprocity ratio — the link-farm hygiene pass that runs
    BEFORE host authority. Composed over host_graph's rollup; one
    distinct exchange, one reversed-pair semi-join, one tagged-union
    count merge."""
    from .stages.links import host_graph, host_reciprocity

    g = host_graph(_host_edges_ds(sf_dir)) \
        .select_columns(["src_host", "dst_host"])
    return host_reciprocity(g)


SQL_QUERIES.update({"host_reciprocity": q_host_reciprocity})
ORACLE_SQL.update({
    "host_reciprocity": _MESSY_URL_CTE + """
        , nn AS (SELECT COUNT(*) AS n FROM documents),
        pe AS (
          SELECT s.host AS src_host, d.host AS dst_host
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 3 + 1) % nn.n
          UNION ALL
          SELECT s.host, d.host
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 7 + 2) % nn.n),
        d AS (SELECT DISTINCT src_host AS src, dst_host AS dst
              FROM pe WHERE src_host <> dst_host),
        o AS (SELECT src AS host, COUNT(*) AS od FROM d GROUP BY src),
        i AS (SELECT dst AS host, COUNT(*) AS idg FROM d GROUP BY dst),
        r AS (SELECT a.src AS host, COUNT(*) AS rc FROM d a
              JOIN d b ON b.src = a.dst AND b.dst = a.src
              GROUP BY a.src),
        allh AS (SELECT src AS host FROM d UNION SELECT dst FROM d)
        SELECT allh.host,
               CAST(COALESCE(o.od, 0) AS BIGINT) AS out_deg,
               CAST(COALESCE(i.idg, 0) AS BIGINT) AS in_deg,
               CAST(COALESCE(r.rc, 0) AS BIGINT) AS recip_out,
               ROUND(CASE WHEN COALESCE(o.od, 0) > 0
                          THEN COALESCE(r.rc, 0) * 1.0 / o.od
                          ELSE 0.0 END, 6) AS recip_ratio
        FROM allh LEFT JOIN o USING (host) LEFT JOIN i USING (host)
        LEFT JOIN r USING (host)
    """,
})


def q_snapshot_change_rate(sf_dir: str):
    """Content-granular change rate between consecutive captures
    (ops/snapshot.content_change_rate): per url, word-set Jaccard
    distance over a planted 5-snapshot history — url observed in snap
    s iff (doc_id+s)%5≠0, capture text = the doc's words with
    (length(w)+s)%4≠0 — so the change cadence varies per url and both
    engines rebuild identical captures. The text payload never rides
    an exchange: word counts and distinct word rows are in-batch, the
    pair skeleton is one partition-grouped lead, intersections come
    from two narrow (url, snap, word) joins."""
    from .ops.snapshot import content_change_rate

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    n_snaps = 5

    def observations(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        urls, snaps, caps = [], [], []
        for d, txt in zip(ids, texts):
            words = txt.split()
            for s in range(n_snaps):
                if (d + s) % 5 == 0:
                    continue
                urls.append(f"u{d}")
                snaps.append(s)
                caps.append(" ".join(
                    w for w in words if (len(w) + s) % 4 != 0))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "snap": pa.array(snaps, pa.int64()),
            "text": pa.array(caps, pa.string()),
        })

    obs = docs.map_batches(observations, batch_format="pyarrow")
    return content_change_rate(obs)


SQL_QUERIES.update({"snapshot_change_rate": q_snapshot_change_rate})
ORACLE_SQL.update({
    "snapshot_change_rate": r"""
        WITH obs AS MATERIALIZED (
          SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, sn.s AS snap,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             w -> w <> '' AND (length(w) + sn.s) % 4 <> 0)
                   AS wl
          FROM documents, (SELECT unnest(range(5)) AS s) sn
          WHERE (doc_id + sn.s) % 5 <> 0),
        w AS MATERIALIZED (
          SELECT DISTINCT url, snap, unnest(wl) AS word FROM obs),
        sz AS MATERIALIZED (
          SELECT url, snap,
                 CAST(len(list_distinct(wl)) AS BIGINT) AS nw FROM obs),
        pr AS MATERIALIZED (
          SELECT url, snap AS snap_prev,
                 LEAD(snap) OVER (PARTITION BY url ORDER BY snap)
                   AS snap_next,
                 nw AS nw_prev,
                 LEAD(nw) OVER (PARTITION BY url ORDER BY snap) AS nw_next
          FROM sz QUALIFY snap_next IS NOT NULL),
        it AS MATERIALIZED (
          SELECT p.url, p.snap_prev, COUNT(*) AS n_inter
          FROM pr p
          JOIN w a ON a.url = p.url AND a.snap = p.snap_prev
          JOIN w b ON b.url = p.url AND b.snap = p.snap_next
                  AND b.word = a.word
          GROUP BY p.url, p.snap_prev)
        SELECT p.url, p.snap_prev, p.snap_next, p.nw_prev, p.nw_next,
               CAST(COALESCE(it.n_inter, 0) AS BIGINT) AS n_inter,
               ROUND(CASE
                 WHEN p.nw_prev + p.nw_next - COALESCE(it.n_inter, 0) > 0
                 THEN 1.0 - COALESCE(it.n_inter, 0) * 1.0
                      / (p.nw_prev + p.nw_next - COALESCE(it.n_inter, 0))
                 ELSE 0.0 END, 6) AS change
        FROM pr p LEFT JOIN it
          ON it.url = p.url AND it.snap_prev = p.snap_prev
    """,
})


_TR_ITERS = 3
_TR_DAMP = 0.85


def q_trustrank(sf_dir: str, iters: int = _TR_ITERS):
    """TrustRank (ops/pagerank.trustrank): teleport mass concentrated on
    the trusted seed list (doc_id % 97 == 0) over the planted 3-formula
    link graph — trust decays with link distance from the seeds, the
    ranking-side spam signal next to kcore_hosts / host_reciprocity.
    Seeds broadcast via ray.put (teleport is an is_in inside the update
    map, never a join); otherwise pagerank's BSP shape: one edges×ranks
    join + one narrow inflow groupby-sum per round."""
    from .ops.pagerank import trustrank

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    m = docs.count()

    def mk_edges(t: pa.Table) -> pa.Table:
        i = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([i, i, i]), pa.int64()),
            "dst": pa.array(np.concatenate(
                [(i * 7 + 1) % m, (i * 11 + 3) % m, (i * 13 + 5) % m]),
                pa.int64()),
        })

    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow")
    seeds = nodes.filter(lambda r: r["node"] % 97 == 0)
    e = docs.map_batches(mk_edges, batch_format="pyarrow")
    return trustrank(nodes, e, seeds, iters=iters, damping=_TR_DAMP,
                     round_to=8)


def _trustrank_sql(iters: int = _TR_ITERS, damping: float = _TR_DAMP) -> str:
    # repr() of the RUNTIME coefficient (1.0 - 0.85 is one ulp off a
    # 0.15 literal — the MMR-oracle lesson)
    coef = repr(1.0 - damping)
    tele = ("CASE WHEN {col} % 97 = 0 THEN 1.0/(SELECT s FROM ns) "
            "ELSE 0.0 END")
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS n FROM documents)",
        "ns AS (SELECT COUNT(*) AS s FROM documents WHERE doc_id % 97 = 0)",
        "edges AS ("
        " SELECT doc_id AS src, (doc_id*7+1) % (SELECT n FROM nn) AS dst"
        " FROM documents"
        " UNION ALL SELECT doc_id, (doc_id*11+3) % (SELECT n FROM nn)"
        " FROM documents"
        " UNION ALL SELECT doc_id, (doc_id*13+5) % (SELECT n FROM nn)"
        " FROM documents)",
        "od AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)",
        "ew AS (SELECT e.src, e.dst, od.od FROM edges e JOIN od USING (src))",
        "r0 AS (SELECT doc_id AS node, "
        + tele.format(col="doc_id") + " AS r FROM documents)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT d.doc_id AS node, "
            f"{coef}*" + tele.format(col="d.doc_id") +
            f" + {damping!r}*COALESCE(SUM(r{i-1}.r/ew.od), 0) AS r "
            f"FROM documents d "
            f"LEFT JOIN ew ON ew.dst = d.doc_id "
            f"LEFT JOIN r{i-1} ON r{i-1}.node = ew.src "
            f"GROUP BY d.doc_id)")
    return (",\n".join(parts) +
            f"\nSELECT node, ROUND(r, 8) AS trustrank FROM r{iters}")


SQL_QUERIES.update({"trustrank": q_trustrank})
ORACLE_SQL.update({"trustrank": _trustrank_sql()})


def q_co_citation(sf_dir: str):
    """Co-citation similarity (stages/links.co_citation) over the
    planted host graph: host pairs endorsed by ≥2 common in-linking
    hosts — the link-structure relatedness signal next to the embedding
    near-dups. One distinct exchange + ONE partition-grouped triu
    exchange (max_fanout storm cap mirrored in SQL) + one narrow pair
    groupby-sum."""
    from .stages.links import co_citation, host_graph

    g = host_graph(_host_edges_ds(sf_dir)) \
        .select_columns(["src_host", "dst_host"])
    return co_citation(g, min_shared=2, max_fanout=10_000)


SQL_QUERIES.update({"co_citation": q_co_citation})
ORACLE_SQL.update({
    "co_citation": _MESSY_URL_CTE + """
        , nn AS (SELECT COUNT(*) AS n FROM documents),
        pe AS (
          SELECT s.host AS src_host, d.host AS dst_host
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 3 + 1) % nn.n
          UNION ALL
          SELECT s.host, d.host
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 7 + 2) % nn.n),
        d AS (SELECT DISTINCT src_host AS src, dst_host AS dst
              FROM pe WHERE src_host <> dst_host),
        fan AS (SELECT src, COUNT(*) AS c FROM d GROUP BY src),
        ok AS (SELECT src FROM fan WHERE c <= 10000)
        SELECT a.dst AS host_a, b.dst AS host_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM d a JOIN d b ON b.src = a.src AND a.dst < b.dst
        WHERE a.src IN (SELECT src FROM ok)
        GROUP BY a.dst, b.dst
        HAVING COUNT(*) >= 2
    """,
})


def q_host_hygiene(sf_dir: str):
    """Composed host-hygiene flagship (stages/links.host_hygiene): the
    three spam lenses joined per host — reciprocity (link-exchange
    rings), bounded-round 2-core degree (dense cliques) and TrustRank
    from the 'sub*' seed hosts (distance from trust) — over the planted
    host graph. ONE WITH-chain oracle gates the whole composition."""
    from .stages.links import host_graph, host_hygiene

    g = host_graph(_host_edges_ds(sf_dir)) \
        .select_columns(["src_host", "dst_host"]).materialize()

    def side(col):
        return g.map_batches(lambda t, c=col: pa.table({"node": t[c]}),
                             batch_format="pyarrow")

    seeds = side("src_host").union(side("dst_host")) \
        .filter(lambda r: r["node"].startswith("sub"))
    return host_hygiene(g, seeds, k=2, kcore_rounds=3, trust_iters=3)


def _host_hygiene_sql(k: int = 2, kcore_rounds: int = 3,
                      trust_iters: int = 3, damping: float = 0.85) -> str:
    coef = repr(1.0 - damping)
    parts = [
        _MESSY_URL_CTE + """
        , nn AS (SELECT COUNT(*) AS n FROM documents),
        pe AS (
          SELECT s.host AS src_host, d.host AS dst_host
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 3 + 1) % nn.n
          UNION ALL
          SELECT s.host, d.host
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 7 + 2) % nn.n),
        d AS (SELECT DISTINCT src_host AS src, dst_host AS dst
              FROM pe WHERE src_host <> dst_host),
        o AS (SELECT src AS host, COUNT(*) AS od FROM d GROUP BY src),
        i AS (SELECT dst AS host, COUNT(*) AS idg FROM d GROUP BY dst),
        rr AS (SELECT a.src AS host, COUNT(*) AS rc FROM d a
               JOIN d b ON b.src = a.dst AND b.dst = a.src
               GROUP BY a.src),
        allh AS (SELECT src AS host FROM d UNION SELECT dst FROM d),
        e0 AS (SELECT DISTINCT src, dst FROM (
               SELECT src, dst FROM d UNION ALL SELECT dst, src FROM d))
        """.strip(),
    ]
    for r in range(1, kcore_rounds + 1):
        parts.append(
            f"kd{r} AS (SELECT src AS node, COUNT(*) AS c "
            f"FROM e{r-1} GROUP BY src)")
        parts.append(
            f"ks{r} AS (SELECT node FROM kd{r} WHERE c >= {k})")
        parts.append(
            f"e{r} AS (SELECT src, dst FROM e{r-1} "
            f"WHERE src IN (SELECT node FROM ks{r}) "
            f"AND dst IN (SELECT node FROM ks{r}))")
    parts.append(
        f"kcore AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) "
        f"AS degree FROM e{kcore_rounds} GROUP BY src)")
    parts.append(
        "ns AS (SELECT COUNT(*) AS s FROM allh WHERE host LIKE 'sub%')")
    tele = ("CASE WHEN {col} LIKE 'sub%' THEN 1.0/(SELECT s FROM ns) "
            "ELSE 0.0 END")
    parts.append(
        "tr0 AS (SELECT host AS node, " + tele.format(col="host") +
        " AS r FROM allh)")
    parts.append("odk AS (SELECT src, COUNT(*) AS od FROM d GROUP BY src)")
    parts.append(
        "ewk AS (SELECT d.src, d.dst, odk.od FROM d JOIN odk USING (src))")
    for t in range(1, trust_iters + 1):
        parts.append(
            f"tr{t} AS (SELECT a.host AS node, "
            f"{coef}*" + tele.format(col="a.host") +
            f" + {damping!r}*COALESCE(SUM(tr{t-1}.r/ewk.od), 0) AS r "
            f"FROM allh a "
            f"LEFT JOIN ewk ON ewk.dst = a.host "
            f"LEFT JOIN tr{t-1} ON tr{t-1}.node = ewk.src "
            f"GROUP BY a.host)")
    final = f"""
        SELECT allh.host,
               CAST(COALESCE(o.od, 0) AS BIGINT) AS out_deg,
               CAST(COALESCE(i.idg, 0) AS BIGINT) AS in_deg,
               CAST(COALESCE(rr.rc, 0) AS BIGINT) AS recip_out,
               ROUND(CASE WHEN COALESCE(o.od, 0) > 0
                          THEN COALESCE(rr.rc, 0) * 1.0 / o.od
                          ELSE 0.0 END, 6) AS recip_ratio,
               CAST(COALESCE(kcore.degree, 0) AS BIGINT) AS core_degree,
               ROUND(tr{trust_iters}.r, 8) AS trustrank
        FROM allh
        LEFT JOIN o USING (host) LEFT JOIN i USING (host)
        LEFT JOIN rr USING (host)
        LEFT JOIN kcore ON kcore.node = allh.host
        JOIN tr{trust_iters} ON tr{trust_iters}.node = allh.host
    """
    return ",\n".join(parts) + final


SQL_QUERIES.update({"host_hygiene": q_host_hygiene})
ORACLE_SQL.update({"host_hygiene": _host_hygiene_sql()})


def q_page_templates(sf_dir: str):
    """Page-structure template fingerprints
    (stages/headmeta.template_fingerprints): md5 of each page's
    lowercase tag-name sequence over four planted site templates
    rendered around the real document texts (attributes and casing
    vary per page; structure does not) — the skeleton-level member of
    the boilerplate family. Zero exchanges; hosts come from the shared
    vectorized url decompose; DuckDB rebuilds the identical pages and
    extracts + hashes the same sequences."""
    from .stages.headmeta import template_fingerprints

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        urls, htmls = [], []
        for i, txt in zip(ids, texts):
            urls.append(_messy_url(int(i)))
            v = i % 4
            if v == 0:
                h = (f'<html><head><title>t</title></head><body>'
                     f'<div class="c{i % 7}"><p>{txt}</p></div>'
                     f'</body></html>')
            elif v == 1:
                h = (f'<html><head><title>t</title></head><body>'
                     f'<nav><a href="/x">n</a></nav>'
                     f'<ARTICLE><p>{txt}</p><p>tail</p></ARTICLE>'
                     f'</body></html>')
            elif v == 2:
                h = (f'<html><body><table><tr><td>{txt}</td></tr>'
                     f'</table></body></html>')
            else:
                h = (f'<html><head><meta charset="utf-8"></head><body>'
                     f'<section><h1>h</h1><p>{txt}</p></section>'
                     f'</body></html>')
            htmls.append(h)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.string())})

    return template_fingerprints(docs.map_batches(pages,
                                                  batch_format="pyarrow"))


SQL_QUERIES.update({"page_templates": q_page_templates})
ORACLE_SQL.update({
    "page_templates": _MESSY_URL_CTE + r"""
        , pg AS (
          SELECT hd.url, hd.host,
                 CASE hd.doc_id % 4
                   WHEN 0 THEN '<html><head><title>t</title></head><body>'
                     || '<div class="c' || CAST(hd.doc_id % 7 AS VARCHAR)
                     || '"><p>' || d.text || '</p></div></body></html>'
                   WHEN 1 THEN '<html><head><title>t</title></head><body>'
                     || '<nav><a href="/x">n</a></nav><ARTICLE><p>'
                     || d.text || '</p><p>tail</p></ARTICLE></body></html>'
                   WHEN 2 THEN '<html><body><table><tr><td>' || d.text
                     || '</td></tr></table></body></html>'
                   ELSE '<html><head><meta charset="utf-8"></head><body>'
                     || '<section><h1>h</h1><p>' || d.text
                     || '</p></section></body></html>'
                 END AS html
          FROM hd JOIN documents d ON d.doc_id = hd.doc_id)
        SELECT url, host,
               md5(array_to_string(regexp_extract_all(
                   lower(html), '<([a-z][a-z0-9]*)', 1), ' '))
                 AS template_id
        FROM pg
    """,
})


def q_link_prediction(sf_dir: str):
    """Adamic–Adar link prediction (stages/links.co_citation
    weighted=True) over the planted host graph: pairs scored by
    Σ 1/ln(fanout(shared citer)) — selective citers count, mega-hubs
    barely do. Same single partition-grouped triu exchange as
    co_citation with the weight summed alongside the count."""
    from .stages.links import co_citation, host_graph

    g = host_graph(_host_edges_ds(sf_dir)) \
        .select_columns(["src_host", "dst_host"])
    return co_citation(g, min_shared=2, max_fanout=10_000, weighted=True)


SQL_QUERIES.update({"link_prediction": q_link_prediction})
ORACLE_SQL.update({
    "link_prediction": _MESSY_URL_CTE + """
        , nn AS (SELECT COUNT(*) AS n FROM documents),
        pe AS (
          SELECT s.host AS src_host, d.host AS dst_host
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 3 + 1) % nn.n
          UNION ALL
          SELECT s.host, d.host
          FROM hd s CROSS JOIN nn
          JOIN hd d ON d.doc_id = (s.doc_id * 7 + 2) % nn.n),
        d AS (SELECT DISTINCT src_host AS src, dst_host AS dst
              FROM pe WHERE src_host <> dst_host),
        fan AS (SELECT src, COUNT(*) AS c FROM d GROUP BY src),
        ok AS (SELECT src, c FROM fan WHERE c <= 10000)
        SELECT a.dst AS host_a, b.dst AS host_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared,
               ROUND(SUM(1.0 / ln(ok.c)), 6) AS aa_score
        FROM d a JOIN d b ON b.src = a.src AND a.dst < b.dst
        JOIN ok ON ok.src = a.src
        GROUP BY a.dst, b.dst
        HAVING COUNT(*) >= 2
    """,
})


def q_structured_data(sf_dir: str):
    """Structured-data extraction (stages/headmeta.structured_data):
    OpenGraph og:title/og:type/og:image (first-wins, any attribute
    order/quote style/case), JSON-LD block count + sorted distinct
    @type values, microdata itemprop count + first itemtype — the WAT
    page-metadata layer. Five planted page shapes rendered around the
    real document texts (full OG card + Article JSON-LD; content-first
    OG + two ld blocks; microdata Product; bare page; uppercase
    single-quoted OG + unquoted itemprop). Zero exchanges; the oracle
    states the planted expectations directly from doc_id arithmetic."""
    from .stages.headmeta import structured_data

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        urls, htmls = [], []
        for i, txt in zip(ids, texts):
            i = int(i)
            urls.append(f"https://h{i % 23}.example/p/{i}")
            w0 = (txt or "").split(" ")[0]
            v = i % 5
            if v == 0:
                h = ('<html><head>'
                     f'<meta property="og:title" content="OG {w0}"/>'
                     '<meta property="og:type" content="article"/>'
                     f'<meta property="og:image" content="https://img.example/{i}.jpg"/>'
                     '<script type="application/ld+json">{"@type": "Article"}</script>'
                     '</head><body itemscope itemtype="https://schema.org/Article">'
                     '<span itemprop="headline">x</span>'
                     f'<span itemprop="author">y</span><p>{txt}</p></body></html>')
            elif v == 1:
                h = ('<html><head>'
                     f'<meta content="T{i % 31}" property="og:title">'
                     '<script type="application/ld+json">{"@type": "NewsArticle"}</script>'
                     '<script type="application/ld+json">{"@type": "Organization"}</script>'
                     f'</head><body><p>{txt}</p></body></html>')
            elif v == 2:
                h = ('<html><head></head>'
                     '<body itemscope itemtype="https://schema.org/Product">'
                     '<span itemprop="name">n</span>'
                     '<script type="application/ld+json">'
                     f'{{"@type": "Product", "sku": "{i}"}}</script>'
                     f'<p>{txt}</p></body></html>')
            elif v == 3:
                h = f'<html><head><title>t</title></head><body><p>{txt}</p></body></html>'
            else:
                h = ('<html><head>'
                     f"<META PROPERTY='og:title' CONTENT='U{i % 13}'>"
                     f"<META PROPERTY='og:image' CONTENT='https://img.example/u{i % 13}.png'>"
                     '<script type="application/ld+json">{"@type" : "WebPage"}</script>'
                     '</head><body><div itemprop=genre>g</div>'
                     f'<p>{txt}</p></body></html>')
            htmls.append(h)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.string())})

    return structured_data(docs.map_batches(pages, batch_format="pyarrow"))


SQL_QUERIES.update({"structured_data": q_structured_data})
ORACLE_SQL.update({
    "structured_data": """
        SELECT
          'https://h' || CAST(doc_id % 23 AS VARCHAR) || '.example/p/'
            || CAST(doc_id AS VARCHAR) AS url,
          CASE doc_id % 5
            WHEN 0 THEN 'OG ' || split_part(text, ' ', 1)
            WHEN 1 THEN 'T' || CAST(doc_id % 31 AS VARCHAR)
            WHEN 4 THEN 'U' || CAST(doc_id % 13 AS VARCHAR)
            ELSE '' END AS og_title,
          CASE doc_id % 5 WHEN 0 THEN 'article' ELSE '' END AS og_type,
          CASE doc_id % 5
            WHEN 0 THEN 'https://img.example/' || CAST(doc_id AS VARCHAR) || '.jpg'
            WHEN 4 THEN 'https://img.example/u' || CAST(doc_id % 13 AS VARCHAR) || '.png'
            ELSE '' END AS og_image,
          CAST(CASE doc_id % 5 WHEN 1 THEN 2 WHEN 3 THEN 0 ELSE 1 END
               AS BIGINT) AS n_ld_blocks,
          CASE doc_id % 5
            WHEN 0 THEN 'Article'
            WHEN 1 THEN 'NewsArticle,Organization'
            WHEN 2 THEN 'Product'
            WHEN 4 THEN 'WebPage'
            ELSE '' END AS ld_types,
          CAST(CASE doc_id % 5 WHEN 0 THEN 2 WHEN 2 THEN 1 WHEN 4 THEN 1
               ELSE 0 END AS BIGINT) AS n_itemprops,
          CASE doc_id % 5
            WHEN 0 THEN 'https://schema.org/Article'
            WHEN 2 THEN 'https://schema.org/Product'
            ELSE '' END AS itemtype
        FROM documents
    """,
})


def q_structured_adoption(sf_dir: str):
    """Per-host structured-data adoption rollup (composed over
    stages/headmeta.structured_data): how much of each host's crawl
    carries OG cards / JSON-LD / microdata — the signal that decides
    whether page-type routing can trust host-level metadata. ONE
    narrow groupby over (host, 3 bit flags); page payloads never
    shuffle."""
    from ray.data.aggregate import Count, Sum

    sd = q_structured_data(sf_dir)

    def flags(t: pa.Table) -> pa.Table:
        host = pc.extract_regex(t["url"], pattern=r"https://(?P<v>[^/]+)/")
        return pa.table({
            "host": pc.struct_field(host, "v"),
            "has_og": pc.cast(pc.not_equal(t["og_title"], ""), pa.int64()),
            "has_ld": pc.cast(pc.greater(t["n_ld_blocks"], 0), pa.int64()),
            "has_micro": pc.cast(pc.greater(t["n_itemprops"], 0), pa.int64()),
        })

    return (sd.map_batches(flags, batch_format="pyarrow")
              .groupby("host")
              .aggregate(Count(alias_name="n_pages"),
                         Sum("has_og", alias_name="n_og"),
                         Sum("has_ld", alias_name="n_ld"),
                         Sum("has_micro", alias_name="n_micro")))


SQL_QUERIES.update({"structured_adoption": q_structured_adoption})
ORACLE_SQL.update({
    "structured_adoption": """
        SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS host,
               COUNT(*) AS n_pages,
               CAST(SUM(CASE WHEN doc_id % 5 IN (0, 1, 4) THEN 1 ELSE 0 END) AS BIGINT) AS n_og,
               CAST(SUM(CASE WHEN doc_id % 5 <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_ld,
               CAST(SUM(CASE WHEN doc_id % 5 IN (0, 2, 4) THEN 1 ELSE 0 END) AS BIGINT) AS n_micro
        FROM documents GROUP BY 1
    """,
})


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining (stages/similarity.hard_negative_topk):
    per query vector, the top-5 most-similar embeddings with a
    DIFFERENT label (label = vec_id % 7 planted) — the contrastive
    training negatives that are similar but wrong-class. Query block
    broadcast once; one matmul + vectorized label mask per batch;
    global merge over ≤ blocks·k partials per query."""
    import pyarrow.parquet as pq

    from .stages.similarity import hard_negative_topk

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qtab = qt.filter(pc.less(qt["vec_id"], 4))
    Q = np.array(qtab["embedding"].to_pylist(), dtype=np.float64)
    q_ids = np.asarray(qtab["vec_id"].to_pylist(), dtype=np.int64)
    q_labels = q_ids % 7

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def with_label(t: pa.Table) -> pa.Table:
        # no modulo kernel in Arrow 14: x % 7 = x - (x // 7) * 7 (ints ≥ 0)
        lab = pc.subtract(t["vec_id"],
                          pc.multiply(pc.divide(t["vec_id"], 7),
                                      pa.scalar(7, pa.int64())))
        return t.append_column("label", pc.cast(lab, pa.int64()))

    labeled = ds.map_batches(with_label, batch_format="pyarrow")
    out = hard_negative_topk(labeled, Q, q_ids, q_labels, k=5)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[["query_id", "neighbor_id"]]

    return out.map_batches(project, batch_format="pandas")


SQL_QUERIES.update({"hard_negatives": q_hard_negatives})
ORACLE_SQL.update({
    "hard_negatives": """
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM embeddings a, embeddings b
        WHERE a.vec_id < 4 AND b.vec_id % 7 <> a.vec_id % 7
        QUALIFY row_number() OVER (
            PARTITION BY a.vec_id
            ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                     b.vec_id
        ) <= 5
    """,
})


def q_embedding_covariance(sf_dir: str):
    """Distributed covariance of the embedding table
    (ops/linalg.embedding_covariance): per block ONE float64 XᵀX
    matmul + column sum, flattened d²+d+1 partials reduced through the
    bounded dense_vector_sum contract (driver transit O(d²), never
    O(blocks·d²)); upper-triangle (i, j, cov) rows out. The one-pass
    moment statistics whitening / PCA start from."""
    from .ops.linalg import embedding_covariance

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    return embedding_covariance(ds, d=64, round_to=6)


SQL_QUERIES.update({"embedding_covariance": q_embedding_covariance})
ORACLE_SQL.update({
    "embedding_covariance": """
        WITH idx AS (
          SELECT i.i AS i, j.j AS j
          FROM generate_series(1, 64) i(i), generate_series(1, 64) j(j)
          WHERE i.i <= j.j),
        s AS (
          SELECT idx.i, idx.j,
                 SUM(CAST(embedding[idx.i] AS DOUBLE)
                     * CAST(embedding[idx.j] AS DOUBLE)) AS sxy,
                 SUM(CAST(embedding[idx.i] AS DOUBLE)) AS si,
                 SUM(CAST(embedding[idx.j] AS DOUBLE)) AS sj,
                 COUNT(*) AS n
          FROM embeddings, idx GROUP BY idx.i, idx.j)
        SELECT CAST(i - 1 AS BIGINT) AS i, CAST(j - 1 AS BIGINT) AS j,
               ROUND(sxy / n - (si / n) * (sj / n), 6) AS cov
        FROM s
    """,
})


def q_whitening_stats(sf_dir: str):
    """Per-dimension whitening state (ops/linalg.whitening_diagonal):
    mean + 1/√(var+eps) from the same one-pass moment reduce as
    embedding_covariance — the broadcastable diagonal-whitening state
    a normalization map stage consumes."""
    from .ops.linalg import whitening_diagonal

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    return whitening_diagonal(ds, d=64, round_to=6)


SQL_QUERIES.update({"whitening_stats": q_whitening_stats})
ORACLE_SQL.update({
    "whitening_stats": """
        WITH s AS (
          SELECT i.i AS i,
                 SUM(CAST(embedding[i.i] AS DOUBLE)
                     * CAST(embedding[i.i] AS DOUBLE)) AS sxx,
                 SUM(CAST(embedding[i.i] AS DOUBLE)) AS si,
                 COUNT(*) AS n
          FROM embeddings, generate_series(1, 64) i(i) GROUP BY i.i)
        SELECT CAST(i - 1 AS BIGINT) AS dim,
               ROUND(si / n, 6) AS mean,
               ROUND(1.0 / sqrt(sxx / n - (si / n) * (si / n) + 1e-9), 6)
                 AS whiten_scale
        FROM s
    """,
})


def q_readability(sf_dir: str):
    """Flesch reading-ease + FK grade (stages/quality.readability_batch)
    over documents with planted sentence punctuation (doc_id%3 picks a
    suffix) so the sentence counter exercises real variation. All-Arrow
    RE2 count kernels, zero exchanges; DuckDB recomputes every count
    with regexp_extract_all and the identical clamp/formula."""
    from .stages.quality import readability_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sufs = [('. End one. And two!', '. Quick?', '')[int(i) % 3]
                for i in ids]
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pc.binary_join_element_wise(
                pc.cast(t["text"], pa.string()),
                pa.array(sufs, pa.string()), ""),
        })

    out = readability_scores(ds.map_batches(plant, batch_format="pyarrow"))
    return out.drop_columns(["text"])


SQL_QUERIES.update({"readability": q_readability})
ORACLE_SQL.update({
    "readability": r"""
        WITH t AS (
          SELECT doc_id,
                 text || CASE doc_id % 3 WHEN 0 THEN '. End one. And two!'
                                         WHEN 1 THEN '. Quick?'
                                         ELSE '' END AS text
          FROM documents),
        c AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '\S+')) AS n_words,
                 len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
                 len(regexp_extract_all(text, '(?i)[aeiouy]+')) AS n_syllables
          FROM t)
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               floor((206.835
                      - 1.015 * (GREATEST(n_words, 1)::DOUBLE
                                 / GREATEST(n_sentences, 1))
                      - 84.6 * (n_syllables::DOUBLE / GREATEST(n_words, 1)))
                     * 1e4 + 0.5) / 1e4 AS flesch,
               floor((0.39 * (GREATEST(n_words, 1)::DOUBLE
                              / GREATEST(n_sentences, 1))
                      + 11.8 * (n_syllables::DOUBLE / GREATEST(n_words, 1))
                      - 15.59) * 1e4 + 0.5) / 1e4 AS fk_grade
        FROM c
    """,
})


def q_search_snippets(sf_dir: str):
    """KWIC snippets (stages/search.search_snippets): ±4-token context
    around the first exact-token occurrence of 'window' per matching
    doc. Vectorized RE2 match gate; only the matching minority
    tokenizes; zero exchanges."""
    from .stages.search import search_snippets

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return search_snippets(ds, "window", window=4)


SQL_QUERIES.update({"search_snippets": q_search_snippets})
ORACLE_SQL.update({
    "search_snippets": r"""
        WITH w AS (
          SELECT doc_id,
                 regexp_split_to_array(text, '\s+') AS words
          FROM documents),
        hit AS (
          SELECT doc_id, words,
                 list_position(words, 'window') AS i1
          FROM w WHERE COALESCE(list_position(words, 'window'), 0) > 0)
        SELECT doc_id,
               CAST(i1 - 1 AS BIGINT) AS pos,
               array_to_string(words[GREATEST(i1 - 4, 1): i1 + 4], ' ')
                 AS snippet
        FROM hit
    """,
})


def q_covariance_store_check(sf_dir: str):
    """Incremental moment store (ops/linalg.save_moment_increment /
    stored_covariance): the embedding table lands as TWO increments
    (vec_id split at the median) whose d²+d+1 moment rows merge
    additively at read time — covariance over the union corpus without
    re-reading the first increment. Oracled against the one-pass
    full-corpus SQL (identical to q:embedding_covariance), so the gate
    proves increment-merge ≡ full-pass."""
    import os

    from .ops.linalg import save_moment_increment, stored_covariance

    store = _tmp_cache("momstore", sf_dir)
    marker = os.path.join(store, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(store, ignore_errors=True)
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        lo = ds.filter(expr="vec_id < 250")
        hi = ds.filter(expr="vec_id >= 250")
        save_moment_increment(lo.select_columns(["embedding"]), store, d=64)
        save_moment_increment(hi.select_columns(["embedding"]), store, d=64)
        open(marker, "w").close()
    return stored_covariance(store, d=64, round_to=6)


SQL_QUERIES.update({"covariance_store_check": q_covariance_store_check})
ORACLE_SQL.update({
    "covariance_store_check": ORACLE_SQL["embedding_covariance"],
})


def q_whiten_apply(sf_dir: str):
    """Whitening state CONSUMED (ops/linalg.whiten_embeddings): the
    diagonal (mean, 1/σ) state from one moment pass is broadcast via
    ray.put and applied ``(x−mean)·scale`` per batch; the gate projects
    the first 4 dims to (vec_id, dim, value) rows so DuckDB can rebuild
    the same arithmetic from the raw table."""
    from .ops.linalg import covariance_stats, whiten_embeddings

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    gram, col_sum, n = covariance_stats(ds.select_columns(["embedding"]),
                                        d=64)
    mean = col_sum / n
    var = np.diag(gram) / n - mean * mean
    scale = 1.0 / np.sqrt(var + 1e-9)
    white = whiten_embeddings(ds, mean, scale)

    def long4(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
        x = np.array(t["embedding"].to_pylist(), np.float64)[:, :4]
        k = x.shape[0]
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, 4)),
            "dim": pa.array(np.tile(np.arange(4, dtype=np.int64), k)),
            "value": pa.array(np.round(x.ravel(), 6), pa.float64()),
        })

    return white.map_batches(long4, batch_format="pyarrow")


SQL_QUERIES.update({"whiten_apply": q_whiten_apply})
ORACLE_SQL.update({
    "whiten_apply": """
        WITH m AS (
          SELECT i.i AS i,
                 SUM(CAST(embedding[i.i] AS DOUBLE)) / COUNT(*) AS mu,
                 SUM(CAST(embedding[i.i] AS DOUBLE)
                     * CAST(embedding[i.i] AS DOUBLE)) / COUNT(*) AS ex2
          FROM embeddings, generate_series(1, 4) i(i) GROUP BY i.i)
        SELECT e.vec_id,
               CAST(m.i - 1 AS BIGINT) AS dim,
               ROUND((CAST(e.embedding[m.i] AS DOUBLE) - m.mu)
                     / sqrt(ex2 - mu * mu + 1e-9), 6) AS value
        FROM embeddings e, m
    """,
})


def q_zipf_slope(sf_dir: str):
    """Zipf power-law fit (stages/keywords.zipf_fit) over the documents
    word-frequency spectrum: partial wordcount combine → narrow
    (word, count) groupby → bounded top-1000 → closed-form log-log
    least squares. Corpus text never rides an exchange."""
    from .stages.keywords import zipf_fit

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return zipf_fit(ds, top_k=1000)


SQL_QUERIES.update({"zipf_slope": q_zipf_slope})
ORACLE_SQL.update({
    "zipf_slope": r"""
        WITH c AS (
          SELECT token, COUNT(*) AS cnt FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents WHERE trim(text) <> ''
          ) t GROUP BY token),
        top AS (
          SELECT cnt,
                 row_number() OVER (ORDER BY cnt DESC, token) AS r
          FROM c ORDER BY cnt DESC, token LIMIT 1000),
        s AS (
          SELECT COUNT(*) AS k,
                 SUM(ln(r)) AS sx, SUM(ln(cnt)) AS sy,
                 SUM(ln(r) * ln(cnt)) AS sxy, SUM(ln(r) * ln(r)) AS sxx
          FROM top)
        SELECT CAST(k AS BIGINT) AS n_words_fit,
               ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
                 AS zipf_slope,
               ROUND((sy * sxx - sx * sxy) / (k * sxx - sx * sx), 6)
                 AS zipf_intercept
        FROM s
    """,
})


def q_contrastive_triplets(sf_dir: str):
    """Composed contrastive-training prep (the embedding-model sibling
    of curate_full's corpus prep): near-dup POSITIVES from the
    exact-verified MinHash pair machinery + one HARD NEGATIVE per
    anchor from cross-label cosine top-1 — the (anchor, positive,
    negative) triplet table a contrastive fine-tune consumes. Anchors
    per mining round are batch-bounded (the incremental-refresh
    contract), so the anchor query block broadcasts; the corpus side
    streams through one matmul+mask pass; pairs then pick up their
    negative from the aggregate-sized result via a broadcast dict."""
    import pyarrow.parquet as pq

    from .stages.dedup import minhash_pairs_exact_verified
    from .stages.similarity import hard_negative_topk

    # pin the aggregate-sized pair table ONCE: it has two consumers
    # (anchor harvest + the attach map) and without the pin the second
    # re-runs the whole shingle/LSH/verify lineage (the CLAUDE.md
    # multi-consumer rule; measured 11.4 → 10.0 s at sf0.1 — the
    # verify lineage itself dominates, but the re-run is gone)
    pairs = minhash_pairs_exact_verified(
        _docs_with_dups(sf_dir), "doc_id", "text", threshold=0.8
    ).select_columns(["id_a", "id_b"]).materialize()

    anchor_ids = sorted({r["id_a"] for r in pairs.take_all()})
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding", "label"])
    at = emb.filter(pc.is_in(emb["vec_id"],
                             value_set=pa.array(anchor_ids, pa.int64())))
    Q = np.array(at["embedding"].to_pylist(), dtype=np.float64)
    q_ids = np.asarray(at["vec_id"].to_pylist(), dtype=np.int64)
    q_labels = np.asarray(at["label"].to_pylist())

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    neg = {r["query_id"]: r["neighbor_id"]
           for r in hard_negative_topk(ds, Q, q_ids, q_labels, k=1,
                                       label_col="label").take_all()}
    neg_ref = ray.put(neg)

    def attach(t: pa.Table) -> pa.Table:
        n = ray.get(neg_ref)
        a = t["id_a"].to_pylist()
        keep = [i for i, x in enumerate(a) if x in n]
        tt = t.take(keep)
        return pa.table({
            "anchor_id": tt["id_a"],
            "positive_id": tt["id_b"],
            "negative_id": pa.array([n[x] for x in tt["id_a"].to_pylist()],
                                    pa.int64()),
        })

    return pairs.map_batches(attach, batch_format="pyarrow")


SQL_QUERIES.update({"contrastive_triplets": q_contrastive_triplets})
ORACLE_SQL.update({
    "contrastive_triplets": f"""WITH {_JACCARD_EDGES_SQL},
        neg AS (
          SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id
          FROM embeddings a JOIN embeddings b
            ON b.label <> a.label AND b.vec_id <> a.vec_id
          WHERE a.vec_id IN (SELECT id_a FROM edges)
          QUALIFY row_number() OVER (
            PARTITION BY a.vec_id
            ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                     b.vec_id) = 1)
        SELECT e.id_a AS anchor_id, e.id_b AS positive_id, n.negative_id
        FROM edges e JOIN neg n ON n.anchor_id = e.id_a
    """,
})


def q_pca_roundtrip_check(sf_dir: str):
    """Lossless-config PCA gate (ops/linalg.pca_model / pca_project):
    with k=d the projection is a rotation, so mean + CᵀC(x−mean)
    reconstructs x exactly (up to float error ≪ the round-6 compare) —
    the same lossless-twin discipline as q:pq_knn_lossless. The gate
    emits the first 4 reconstructed dims per vector; the oracle states
    the RAW table values — any eigh/projection/sign bug breaks
    equality."""
    from .ops.linalg import pca_model, pca_project

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mean, comps, _ = pca_model(ds.select_columns(["embedding"]), d=64, k=64)
    proj = pca_project(ds, mean, comps)
    mean_ref = ray.put((mean, comps))

    def recon4(t: pa.Table) -> pa.Table:
        m, C = ray.get(mean_ref)
        z = np.array(t["pca"].to_pylist(), np.float64)
        x_hat = (z @ C + m)[:, :4]
        ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
        k = len(ids)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, 4)),
            "dim": pa.array(np.tile(np.arange(4, dtype=np.int64), k)),
            "value": pa.array(np.round(x_hat.ravel(), 6), pa.float64()),
        })

    return proj.map_batches(recon4, batch_format="pyarrow")


def q_pca_variance_check(sf_dir: str):
    """Trace-invariance gate for the PCA eigensolve: Σ eigenvalues of
    the covariance ≡ Σ per-dimension variances (trace is basis-free),
    which DuckDB can state WITHOUT an eigensolver — any moment or eigh
    defect shifts the total."""
    from .ops.linalg import pca_model

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    _, _, vals = pca_model(ds, d=64, k=64)
    return pa.table({
        "k": pa.array([64], pa.int64()),
        "total_variance": pa.array([round(float(vals.sum()), 6)],
                                   pa.float64()),
    })


SQL_QUERIES.update({"pca_roundtrip_check": q_pca_roundtrip_check,
                    "pca_variance_check": q_pca_variance_check})
ORACLE_SQL.update({
    "pca_roundtrip_check": """
        SELECT vec_id,
               CAST(i.i - 1 AS BIGINT) AS dim,
               ROUND(CAST(embedding[i.i] AS DOUBLE), 6) AS value
        FROM embeddings, generate_series(1, 4) i(i)
    """,
    "pca_variance_check": """
        WITH s AS (
          SELECT i.i AS i,
                 SUM(CAST(embedding[i.i] AS DOUBLE)
                     * CAST(embedding[i.i] AS DOUBLE)) AS sxx,
                 SUM(CAST(embedding[i.i] AS DOUBLE)) AS si,
                 COUNT(*) AS n
          FROM embeddings, generate_series(1, 64) i(i) GROUP BY i.i)
        SELECT CAST(64 AS BIGINT) AS k,
               ROUND(SUM(sxx / n - (si / n) * (si / n)), 6)
                 AS total_variance
        FROM s
    """,
})


def q_corpus_card(sf_dir: str):
    """Dataset-card summary report (pipelines/reports.corpus_card):
    docs / language mix + entropy / word-length center+tail / exact-dup
    rate as (metric, value) rows from ONE tagged-union narrow exchange
    — the release-notes one-screener. The DuckDB oracle states every
    metric independently (quantile_disc, log2 entropy, md5 distinct)."""
    from .pipelines.reports import corpus_card

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang"])
    return corpus_card(ds)


SQL_QUERIES.update({"corpus_card": q_corpus_card})
ORACLE_SQL.update({
    "corpus_card": r"""
        WITH f AS (
          SELECT lang,
                 len(regexp_extract_all(text, '\S+')) AS nw,
                 md5(text) AS h
          FROM documents),
        tot AS (SELECT COUNT(*) AS n, SUM(nw) AS tw,
                       COUNT(DISTINCT h) AS dh FROM f),
        lc AS (SELECT lang, COUNT(*) AS c FROM f GROUP BY lang),
        ent AS (SELECT -SUM((c * 1.0 / n) * log2(c * 1.0 / n)) AS e,
                       COUNT(*) AS nl
                FROM lc CROSS JOIN tot GROUP BY n),
        q AS (SELECT quantile_disc(nw, 0.5) AS p50,
                     quantile_disc(nw, 0.9) AS p90 FROM f)
        SELECT 'n_docs' AS metric, CAST(n AS DOUBLE) AS value FROM tot
        UNION ALL SELECT 'n_langs', CAST(nl AS DOUBLE) FROM ent
        UNION ALL SELECT 'total_words', CAST(tw AS DOUBLE) FROM tot
        UNION ALL SELECT 'mean_words', ROUND(tw * 1.0 / n, 6) FROM tot
        UNION ALL SELECT 'p50_words', CAST(p50 AS DOUBLE) FROM q
        UNION ALL SELECT 'p90_words', CAST(p90 AS DOUBLE) FROM q
        UNION ALL SELECT 'lang_entropy_bits', ROUND(e, 6) FROM ent
        UNION ALL SELECT 'exact_dup_permille',
                         CAST(1000 * (n - dh) // n AS DOUBLE) FROM tot
    """,
})


def q_lexical_diversity(sf_dir: str):
    """Type-token ratio + Guiraud vocabulary-richness
    (stages/quality.lexical_diversity): ONE batch-wide factorize +
    unique-(doc, code) pass — no per-row Python; zero exchanges. The
    corpus is single-space tokenized, so split(' ') ≡ '\\s+' in SQL."""
    from .stages.quality import lexical_diversity

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return lexical_diversity(ds)


SQL_QUERIES.update({"lexical_diversity": q_lexical_diversity})
ORACLE_SQL.update({
    "lexical_diversity": r"""
        WITH w AS (
          SELECT doc_id,
                 regexp_split_to_array(text, ' ') AS words
          FROM documents)
        SELECT doc_id,
               CAST(CASE WHEN len(words) = 1 AND words[1] = ''
                    THEN 0 ELSE len(words) END AS BIGINT) AS n_tokens,
               CAST(CASE WHEN len(words) = 1 AND words[1] = ''
                    THEN 0 ELSE len(list_distinct(words)) END AS BIGINT)
                 AS n_types,
               ROUND(CASE WHEN len(words) = 1 AND words[1] = '' THEN 0.0
                     ELSE len(list_distinct(words)) * 1.0 / len(words) END,
                     6) AS ttr,
               ROUND(CASE WHEN len(words) = 1 AND words[1] = '' THEN 0.0
                     ELSE len(list_distinct(words)) / sqrt(len(words)) END,
                     6) AS guiraud
        FROM w
    """,
})


def q_char_entropy(sf_dir: str):
    """Per-doc character-distribution Shannon entropy
    (stages/quality.char_entropy): the gibberish/base64-blob detector.
    One flat-codepoint lexsort + segmented reduceat per batch — no
    Python row loop, zero exchanges."""
    from .stages.quality import char_entropy

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return char_entropy(ds)


SQL_QUERIES.update({"char_entropy": q_char_entropy})
ORACLE_SQL.update({
    "char_entropy": r"""
        WITH chars AS (
          -- (?s) so RE2 '.' matches newlines too: the kernel counts
          -- EVERY codepoint (utf-32), and without DOTALL a '\n' in any
          -- doc would silently shrink the oracle's n_chars (advisor)
          SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS ch
          FROM documents),
        runs AS (
          SELECT doc_id, ch, COUNT(*) AS k
          FROM chars GROUP BY doc_id, ch),
        per AS (
          SELECT doc_id, SUM(k) AS n, SUM(k * log2(k)) AS s
          FROM runs GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(p.n, 0) AS BIGINT) AS n_chars,
               ROUND(COALESCE(log2(p.n) - p.s / p.n, 0.0), 6)
                 AS char_entropy_bits
        FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
    """,
})


# --------------------------------------------------------------------------
# Round-5 promotions: formerly rows-only battery entries whose full value
# derivation is now stated in SQL (round-4 verdict #4).
# --------------------------------------------------------------------------

SQL_QUERIES.update({"doc_embeddings": q_doc_embeddings,
                    "media_features": q_media_features})
ORACLE_SQL.update({"doc_embeddings": _ORACLE_SQL_DOC_EMB,
                   "media_features": _ORACLE_SQL_MEDIA_FEATURES})
