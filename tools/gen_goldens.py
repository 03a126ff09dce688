"""Generate the frozen golden-extraction parquet (FIXTURES.md §2).

Runs the pure extractor functions SERIALLY over the deterministic fixture
corpus and freezes per-url outputs. Regenerate ONLY on an intentional
extractor-behavior change:

    python tools/gen_goldens.py

The pipeline golden test (tests/test_pipeline_e2e.py) asserts the Ray
pipeline matches these bytes per url.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from pappermate_ray.fixtures import build_pages_table
from pappermate_ray.functions.contract import parse_contract
from pappermate_ray.functions.htmlx import extract_main_text
from pappermate_ray.functions.spans import extract_spans

N_ROWS = 400
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "golden_extractions.parquet")


def main() -> None:
    pages = build_pages_table(N_ROWS)
    rows = []
    for row in pages.to_pylist():
        text, blocks, status, error = extract_main_text(row["html"], row["text"])
        rec = {
            "url": row["url"],
            "extracted_text": text,
            "status": status,
            "error": error,
            "n_blocks": len(blocks),
            "block_types": "|".join(b["type"] for b in blocks),
        }
        if status != "error" and text:
            parsed = parse_contract(text, default_name=row["url"])
            spans = extract_spans(text)
            rec.update(
                contract_number=parsed["contract_number"],
                contract_type=parsed["contract_type"],
                client_name=parsed["client_name"],
                vendor_name=parsed["vendor_name"],
                currency=parsed["currency"],
                total_value=parsed["total_value"],
                effective_date=parsed["effective_date"],
                expiration_date=parsed["expiration_date"],
                n_entities=len(spans),
                span_digest="|".join(
                    f"{s['entity_type']}:{s['start']}:{s['end']}" for s in spans
                ),
            )
        else:
            rec.update(contract_number=None, contract_type=None, client_name=None,
                       vendor_name=None, currency=None, total_value=None,
                       effective_date=None, expiration_date=None, n_entities=0,
                       span_digest="")
        rows.append(rec)
    table = pa.Table.from_pylist(rows)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} golden rows -> {OUT}")


if __name__ == "__main__":
    main()
