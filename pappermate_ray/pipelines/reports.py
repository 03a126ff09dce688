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
