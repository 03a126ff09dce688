"""Flagship extraction pipeline (SURVEY.md §3.4 target shape).

pages → [extract main content] → [size bucket] → [contract parse] →
[entity spans] → docs. All stages stream; nothing materializes the corpus.

Stage sizing rationale (32-CPU node, 100 TB design point):
- extract: stateless tasks, Ray elastically schedules; batch_size bounds
  per-task memory (rows are multi-KB..MB html payloads).
- parse/spans: actor pools (regex/pattern state pinned per actor),
  autoscaling ``concurrency=(1, max)`` so the pools never starve the
  read/extract stages on small nodes but can fill large ones.
"""

from __future__ import annotations

from typing import Optional

import ray.data

from ..stages.extract import add_size_bucket, extract_pages_batch
from ..stages.parse import ContractParse
from ..stages.spans import EntitySpans


def build_extraction_pipeline(
    pages: "ray.data.Dataset",
    *,
    batch_size: int = 256,
    parse_actors: int = 8,
    span_actors: int = 8,
    skew_partition: bool = False,
) -> "ray.data.Dataset":
    """Compose the flagship docs pipeline over a ``pages`` Dataset."""
    ds = pages.map_batches(add_size_bucket, batch_format="pyarrow", batch_size=batch_size)
    if skew_partition:
        # group giant docs together so a block's memory footprint is
        # homogeneous; a sort by bucket is a cheap proxy for a
        # groupby-bucket shuffle on a single key byte (SURVEY.md §4 skew)
        ds = ds.sort("size_bucket")
    ds = ds.map_batches(extract_pages_batch, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(
        ContractParse,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, parse_actors),
    )
    ds = ds.map_batches(
        EntitySpans,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, span_actors),
    )
    return ds


def run_extraction(sf_dir: str, **kwargs) -> "ray.data.Dataset":
    """pages-from-documents at ``sf_dir`` → extracted docs Dataset."""
    from ..fixtures import read_pages

    return build_extraction_pipeline(read_pages(sf_dir), **kwargs)
