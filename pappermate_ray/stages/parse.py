"""Contract-parse actor stage (SURVEY.md §2.2 M1-M13).

``ContractParse`` is a callable class for ``map_batches(Cls, concurrency=N)``
— the actor-pool pattern: regexes are module-level compiled once per process
(functions/contract.py), per-batch work loops over rows *inside* the batch
to amortize task overhead (SURVEY.md §1.3). Error rows pass through with
null contract fields (soft-fail, never raise).
"""

from __future__ import annotations

from typing import Any, Dict, List

import pyarrow as pa

from ..functions.contract import parse_contract

STR_LIST = pa.list_(pa.string())


class ContractParse:
    """docs(text, status, ...) → + contract metadata columns.

    Reference: ContractParser.parse_from_markdown + _create_contract_model
    (services/contract_parser.py:50-78, 501-542).
    """

    def __init__(self, text_cap: int = 500_000):
        # per-actor setup: nothing heavy today (regexes are module-level),
        # but the cap knob lives here like the reference's truncation caps
        self.text_cap = text_cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        statuses = batch["status"].to_pylist()
        urls = batch["url"].to_pylist()
        cols: Dict[str, List[Any]] = {
            k: []
            for k in (
                "contract_type", "contract_number", "contract_name", "client_name",
                "vendor_name", "effective_date", "expiration_date", "total_value",
                "currency", "n_sections", "emails", "cnpj_cpf", "n_table_lines",
                "key_clauses", "parse_confidence",
            )
        }
        for text, status, url in zip(texts, statuses, urls):
            if status == "error" or not text:
                for k in cols:
                    cols[k].append(None)
                continue
            try:
                rec = parse_contract(text[: self.text_cap], default_name=url)
            except Exception:  # soft-fail per row (SafeProcessor semantics)
                for k in cols:
                    cols[k].append(None)
                continue
            cols["contract_type"].append(rec["contract_type"])
            cols["contract_number"].append(rec["contract_number"])
            cols["contract_name"].append(rec["contract_name"])
            cols["client_name"].append(rec["client_name"])
            cols["vendor_name"].append(rec["vendor_name"])
            cols["effective_date"].append(rec["effective_date"])
            cols["expiration_date"].append(rec["expiration_date"])
            cols["total_value"].append(rec["total_value"])
            cols["currency"].append(rec["currency"])
            cols["n_sections"].append(rec["n_sections"])
            cols["emails"].append(rec["emails"])
            cols["cnpj_cpf"].append(rec["cnpj_cpf"])
            cols["n_table_lines"].append(rec["n_table_lines"])
            cols["key_clauses"].append(rec["key_clauses"])
            cols["parse_confidence"].append(rec["confidence"])

        out = batch
        out = out.append_column("contract_type", pa.array(cols["contract_type"], pa.string()))
        out = out.append_column("contract_number", pa.array(cols["contract_number"], pa.string()))
        out = out.append_column("contract_name", pa.array(cols["contract_name"], pa.string()))
        out = out.append_column("client_name", pa.array(cols["client_name"], pa.string()))
        out = out.append_column("vendor_name", pa.array(cols["vendor_name"], pa.string()))
        out = out.append_column("effective_date", pa.array(cols["effective_date"], pa.timestamp("us")))
        out = out.append_column("expiration_date", pa.array(cols["expiration_date"], pa.timestamp("us")))
        out = out.append_column("total_value", pa.array(cols["total_value"], pa.float64()))
        out = out.append_column("currency", pa.array(cols["currency"], pa.string()))
        out = out.append_column("n_sections", pa.array(cols["n_sections"], pa.int32()))
        out = out.append_column("emails", pa.array(cols["emails"], STR_LIST))
        out = out.append_column("cnpj_cpf", pa.array(cols["cnpj_cpf"], STR_LIST))
        out = out.append_column("n_table_lines", pa.array(cols["n_table_lines"], pa.int32()))
        out = out.append_column("key_clauses", pa.array(cols["key_clauses"], STR_LIST))
        out = out.append_column("parse_confidence", pa.array(cols["parse_confidence"], pa.float64()))
        return out
