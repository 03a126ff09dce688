"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline at sf0.001;
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 (plus the beyond-reference dedup/similarity/quality ops);
``oracle_sql()`` gives DuckDB equivalents for the SQL-expressible ones.

Ray is initialised by the driver BEFORE this module is imported — nothing
here (or in pappermate_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _quiet_data_context() -> None:
    from pappermate_ray.config import tune_context

    tune_context("default")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    _quiet_data_context()
    from pappermate_ray.pipelines.extract_pipeline import run_extraction

    docs = run_extraction("/root/testdata/sf0.001")
    # nested list columns (blocks/entities) convert poorly through the
    # driver's generic pandas conversion — project the flat summary
    return docs.select_columns(
        ["url", "warc_ts", "lang", "text", "n_chars", "status", "error",
         "contract_number", "contract_type", "contract_name", "client_name",
         "vendor_name", "effective_date", "expiration_date", "total_value",
         "currency", "n_sections", "n_table_lines", "parse_confidence",
         "n_entities", "span_confidence"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    _quiet_data_context()
    from pappermate_ray.queries import NOSQL_QUERIES, SQL_QUERIES

    return {**SQL_QUERIES, **NOSQL_QUERIES}


def oracle_sql() -> dict[str, str]:
    from pappermate_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
