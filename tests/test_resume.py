"""Kill-and-resume semantics for the resumable sink (SURVEY.md §7 step 6):
run, 'kill' (complete only a subset of partitions), rerun — the resumed run
must skip completed partitions and the final output must be identical to a
single uninterrupted run."""

import shutil

import pyarrow as pa
import pytest

from pappermate_ray.fixtures import build_pages_table
from pappermate_ray.io.sink import (
    completed_parts,
    filter_completed,
    partition_of,
    read_manifest,
    read_output,
    write_resumable,
)
from pappermate_ray.pipelines.extract_pipeline import build_extraction_pipeline

N_PARTS = 8
N_ROWS = 200


def _flat_docs(ds):
    return ds.drop_columns(["blocks", "entities"])


@pytest.fixture()
def pages():
    return build_pages_table(N_ROWS)


def test_write_read_roundtrip(ray_session, pages, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "out")
    docs = _flat_docs(build_extraction_pipeline(rd.from_arrow(pages), batch_size=64))
    manifest = write_resumable(docs, out, n_parts=N_PARTS)
    assert len(completed_parts(out)) == manifest.num_rows
    assert sum(manifest["n_rows"].to_pylist()) == N_ROWS
    back = read_output(out)
    assert back.count() == N_ROWS
    assert sorted(r["url"] for r in back.select_columns(["url"]).take_all()) == sorted(
        pages["url"].to_pylist()
    )
    # lineage manifest readable and consistent
    lineage = read_manifest(out)
    assert sorted(lineage["part"].to_pylist()) == sorted(manifest["part"].to_pylist())


def test_kill_and_resume(ray_session, pages, tmp_path):
    import ray.data as rd

    out_full = str(tmp_path / "full")
    out_resume = str(tmp_path / "resumed")

    # uninterrupted reference run
    docs = _flat_docs(build_extraction_pipeline(rd.from_arrow(pages), batch_size=64))
    write_resumable(docs, out_full, n_parts=N_PARTS)
    want = sorted(
        (r["url"], r["text"], r["status"])
        for r in read_output(out_full).select_columns(["url", "text", "status"]).take_all()
    )

    # 'killed' run: only rows of partitions 0..3 were processed before death
    keep = {0, 1, 2, 3}
    partial_mask = [partition_of(u, N_PARTS) in keep for u in pages["url"].to_pylist()]
    partial = pages.filter(pa.array(partial_mask))
    docs1 = _flat_docs(build_extraction_pipeline(rd.from_arrow(partial), batch_size=64))
    m1 = write_resumable(docs1, out_resume, n_parts=N_PARTS)
    assert set(m1["part"].to_pylist()) == keep
    assert completed_parts(out_resume) == keep

    # resumed run over the FULL input: completed partitions are filtered out
    # BEFORE extraction (no recomputation), the rest written
    remaining_pages = filter_completed(rd.from_arrow(pages), out_resume, N_PARTS)
    n_remaining = remaining_pages.count()
    assert n_remaining == N_ROWS - partial.num_rows  # completed rows skipped pre-extraction
    docs2 = _flat_docs(build_extraction_pipeline(remaining_pages, batch_size=64))
    m2 = write_resumable(docs2, out_resume, n_parts=N_PARTS)
    assert set(m2["part"].to_pylist()).isdisjoint(keep)  # no re-extraction

    got = sorted(
        (r["url"], r["text"], r["status"])
        for r in read_output(out_resume).select_columns(["url", "text", "status"]).take_all()
    )
    assert got == want  # byte-identical final corpus


def test_rerun_after_completion_is_noop(ray_session, pages, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "out")
    docs = _flat_docs(build_extraction_pipeline(rd.from_arrow(pages), batch_size=64))
    write_resumable(docs, out, n_parts=N_PARTS)
    # full rerun: everything filtered, nothing written
    remaining = filter_completed(rd.from_arrow(pages), out, N_PARTS)
    assert remaining.count() == 0
    m = write_resumable(
        _flat_docs(build_extraction_pipeline(remaining, batch_size=64)), out, n_parts=N_PARTS
    )
    assert m.num_rows == 0
