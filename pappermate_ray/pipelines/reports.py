"""Report aggregations over extraction output (SURVEY.md §2.5 A1-A3, §2.6 T3).

The reference builds dict-counter histograms on the driver
(scripts/openai_contract_explorer.py:385-402, system_contract_organizer.py:465-509);
here each is a grouped aggregate over the streaming docs Dataset, with
list-column explosion done via ``flat``-style map_batches (A1 party counts).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Mean


def status_report(docs: "rd.Dataset") -> "rd.Dataset":
    """Success/failure tally (A3) + mean parse confidence (A5-shape)."""
    return docs.groupby("status").aggregate(
        Count(alias_name="n_docs"),
        Mean("n_chars", alias_name="avg_chars"),
    )


def contract_type_histogram(docs: "rd.Dataset") -> "rd.Dataset":
    """A1: histogram by contract_type over successfully parsed docs, sorted
    by count desc (T3 report ordering)."""
    import pyarrow.compute as pc

    parsed = docs.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "converted")).select(["contract_type"]),
        batch_format="pyarrow",
    )
    agg = parsed.groupby("contract_type").aggregate(Count(alias_name="n_docs"))
    return agg.sort(["n_docs", "contract_type"], descending=[True, False])


def party_histogram(docs: "rd.Dataset") -> "rd.Dataset":
    """A1 party counts: explode client+vendor names to party rows, then count.

    The reference counts parties after exploding the per-doc list
    (openai_contract_explorer.py:393-398); the explode here is a batch-local
    flat map (no per-row Python task)."""

    def explode(t: pa.Table) -> pa.Table:
        parties = []
        for c, v in zip(t["client_name"].to_pylist(), t["vendor_name"].to_pylist()):
            if c and c != "N/A":
                parties.append(c)
            if v and v != "N/A":
                parties.append(v)
        return pa.table({"party": pa.array(parties, pa.string())})

    exploded = docs.map_batches(explode, batch_format="pyarrow")
    return exploded.groupby("party").aggregate(Count(alias_name="n_mentions"))


def corpus_card(
    ds: "rd.Dataset",
    text_col: str = "text",
    lang_col: str = "lang",
) -> pa.Table:
    """Dataset-card summary — the one-screen corpus report every
    release ships (docs, language mix + entropy, word-length center
    and tail, exact-dup rate): ``(metric, value)`` rows.

    Scale shape: ONE per-batch partial pass emits tagged count rows —
    ``('lang', lang, n)``, ``('nw', n_words, n)`` (value-count
    compressed per batch), ``('h', md5(text), 1)`` — and ONE narrow
    tagged-union groupby merges them. The driver then reads back only
    the aggregate-sized slices (langs ≤ #languages, nw ≤ #distinct
    lengths) plus a COUNT over the digest slice; text and digests
    never reach the driver. Quantiles replay the exact discrete rule
    of ops/quantiles (rank = ceil(q·n)−1), entropy/means round to 6 —
    all stated by the q:corpus_card DuckDB oracle."""
    import hashlib
    import math

    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t[text_col], "")
        nw = pc.cast(pc.count_substring_regex(s, pattern=r"\S+"),
                     pa.int64()).to_pylist()
        langs = t[lang_col].to_pylist()
        kinds, keys, ns = [], [], []
        lc: dict = {}
        for v in langs:
            lc[v] = lc.get(v, 0) + 1
        for v, c in lc.items():
            kinds.append("lang"); keys.append(str(v)); ns.append(c)
        wc: dict = {}
        for v in nw:
            wc[v] = wc.get(v, 0) + 1
        for v, c in wc.items():
            kinds.append("nw"); keys.append(str(v)); ns.append(c)
        for x in s.to_pylist():
            kinds.append("h")
            keys.append(hashlib.md5(x.encode()).hexdigest())
            ns.append(1)
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "key": pa.array(keys, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(["kind", "key"])
                .aggregate(Sum("n", alias_name="c"))).materialize()

    small = [r for r in counts.filter(expr="kind != 'h'").take_all()]
    lang_rows = [(r["key"], r["c"]) for r in small if r["kind"] == "lang"]
    nw_rows = sorted((int(r["key"]), r["c"]) for r in small
                     if r["kind"] == "nw")
    dh = counts.filter(expr="kind == 'h'").count()

    n_docs = sum(c for _, c in lang_rows)
    total_words = sum(v * c for v, c in nw_rows)
    vals = np.array([v for v, _ in nw_rows], np.int64)
    cum = np.cumsum(np.array([c for _, c in nw_rows], np.int64))

    def q_disc(q: float) -> float:
        idx = max(0, int(math.ceil(q * n_docs)) - 1)
        return float(vals[np.searchsorted(cum, idx + 1, side="left")])

    ps = [c / n_docs for _, c in lang_rows]
    entropy = -sum(p * math.log2(p) for p in ps if p > 0)

    metrics = [
        ("n_docs", float(n_docs)),
        ("n_langs", float(len(lang_rows))),
        ("total_words", float(total_words)),
        ("mean_words", round(total_words / n_docs, 6)),
        ("p50_words", q_disc(0.5)),
        ("p90_words", q_disc(0.9)),
        ("lang_entropy_bits", round(entropy, 6)),
        ("exact_dup_permille", float(1000 * (n_docs - dh) // n_docs)),
    ]
    return pa.table({
        "metric": pa.array([m for m, _ in metrics], pa.string()),
        "value": pa.array([v for _, v in metrics], pa.float64()),
    })
