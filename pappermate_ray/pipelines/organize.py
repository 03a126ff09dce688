"""Organize pipeline: canonical naming + supplier-partitioned layout.

Ray-native sibling of the reference's file organizer
(scripts/system_contract_organizer.py:237-336, SURVEY.md §2.2 M27-M30,
§2.1 S15): instead of ``shutil.move`` into supplier folders, rows get a
canonical filename + supplier partition column and are written as
Hive-partitioned Parquet.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..functions.dates import extract_year
from ..functions.naming import (
    canonical_contract_filename,
    normalize_supplier_name,
    operation_type,
    sanitize_filename,
)


def add_organize_columns(batch: pa.Table) -> pa.Table:
    """docs → + canonical_filename, supplier_dir, operation."""
    names, suppliers, ops = [], [], []
    for url, vendor, ctype, eff, exp, num in zip(
        batch["url"].to_pylist(),
        batch["vendor_name"].to_pylist(),
        batch["contract_type"].to_pylist(),
        batch["effective_date"].to_pylist(),
        batch["expiration_date"].to_pylist(),
        batch["contract_number"].to_pylist(),
    ):
        vendor = vendor or ""
        start_year = extract_year(str(eff) if eff else "")
        end_year = extract_year(str(exp) if exp else "") or start_year
        names.append(
            canonical_contract_filename(vendor, ctype or "", start_year, end_year, num or "")
        )
        suppliers.append(normalize_supplier_name(vendor if vendor != "N/A" else ""))
        # operation routed on the url tail (the reference routes on filename)
        ops.append(operation_type(url.rsplit("/", 1)[-1]))
    out = batch.append_column("canonical_filename", pa.array(names, pa.string()))
    out = out.append_column("supplier_dir", pa.array(suppliers, pa.string()))
    out = out.append_column("operation", pa.array(ops, pa.string()))
    return out


def organize(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(add_organize_columns, batch_format="pyarrow")


def disambiguate_filenames(docs: "rd.Dataset") -> "rd.Dataset":
    """D4 unique-output-filename: counter-suffix per collision group.

    Reference probes the filesystem in a loop (file_handler.py:416-425);
    distributed analog: hash-shuffle on the canonical name, deterministic
    enumeration (ordered by url) within each collision group — first keeps
    the name, later ones get ``_1``, ``_2``... before the extension.
    """
    import numpy as np
    import pandas as pd

    from ..ops.grouping import partition_grouped

    grouped, pkey_cols = partition_grouped(docs, ["canonical_filename"])

    def _enumerate(group: pd.DataFrame) -> pd.DataFrame:
        # partition-grouped: one sort, collision position = offset into
        # the name's run (per-name pandas groups would pay per-group
        # overhead on billions of mostly-singleton names)
        g = group.sort_values(["canonical_filename", "url"],
                              kind="mergesort").reset_index(drop=True)
        names = g["canonical_filename"].to_numpy()
        change = np.zeros(len(g), bool)
        change[0] = True
        change[1:] = names[1:] != names[:-1]
        starts = np.flatnonzero(change)
        lens = np.append(starts[1:], len(g)) - starts
        pos = np.arange(len(g)) - np.repeat(starts, lens)
        outs = list(names)
        for i in np.flatnonzero(pos > 0):
            name, k = names[i], pos[i]
            dot = name.rfind(".")
            outs[i] = f"{name[:dot]}_{k}{name[dot:]}" if dot > 0 else f"{name}_{k}"
        g["final_filename"] = outs
        return g.drop(columns=["_pkey"])

    return grouped.groupby(pkey_cols).map_groups(_enumerate, batch_format="pandas")


def sanitize_url_names(docs: "rd.Dataset") -> "rd.Dataset":
    """M14 filename sanitization over the contract_name column (the CJK
    term-map deterministic fallback path)."""

    def _san(batch: pa.Table) -> pa.Table:
        outs, statuses = [], []
        for name in batch["contract_name"].to_pylist():
            s, status, _err = sanitize_filename((name or "") + ".pdf")
            outs.append(s)
            statuses.append(status)
        out = batch.append_column("sanitized_name", pa.array(outs, pa.string()))
        return out.append_column("sanitize_status", pa.array(statuses, pa.string()))

    return docs.map_batches(_san, batch_format="pyarrow")
