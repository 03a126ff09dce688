"""CLI entry point — the ``ray job submit`` surface.

    python -m pappermate_ray extract --input <pages parquet dir|sf_dir> \
        --output /tmp/out [--n-parts 64] [--resume] [--skew]
    python -m pappermate_ray report --output /tmp/out
    python -m pappermate_ray manifest --output /tmp/out

``extract`` is resumable: rerunning with ``--resume`` after a kill skips
completed partitions (atomic-rename markers + lineage manifest,
io/sink.py). This script OWNS its Ray session (guarded init) — the only
places allowed to init are entry points like this one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from .config import tune_context

    tune_context("default")
    return ray


def cmd_extract(args) -> None:
    ray = _init_ray()
    import ray.data as rd

    from .fixtures import read_pages
    from .io.sink import filter_completed, write_resumable
    from .pipelines.extract_pipeline import build_extraction_pipeline

    t0 = time.perf_counter()
    if os.path.isfile(os.path.join(args.input, "documents.parquet")):
        pages = read_pages(args.input)  # sf_dir → synthesize pages
    else:
        pages = rd.read_parquet(args.input)
    if args.resume:
        pages = filter_completed(pages, args.output, args.n_parts)
    docs = build_extraction_pipeline(pages, skew_partition=args.skew)
    flat = docs.drop_columns(["blocks", "entities"])
    manifest = write_resumable(flat, args.output, n_parts=args.n_parts)
    dead_rows = None
    if args.dead_letter_dir:
        # derive the dead-letter table from the WRITTEN output (cheap
        # parquet re-read, no pipeline recompute)
        from .io.sink import read_output, split_dead_letter

        _, dead = split_dead_letter(read_output(args.output))
        dead_manifest = write_resumable(
            dead.select_columns(["url", "warc_ts", "lang", "status", "error"]),
            args.dead_letter_dir, n_parts=max(4, args.n_parts // 8),
        )
        dead_rows = sum(dead_manifest["n_rows"].to_pylist())
    dt = time.perf_counter() - t0
    out = {
        "written_partitions": manifest.num_rows,
        "written_rows": sum(manifest["n_rows"].to_pylist()),
        "sec": round(dt, 2),
        "output": args.output,
    }
    if dead_rows is not None:
        out["dead_letter_rows"] = dead_rows
    print(json.dumps(out))
    ray.shutdown()


def cmd_report(args) -> None:
    ray = _init_ray()
    from .io.sink import read_output
    from .pipelines.reports import contract_type_histogram, status_report

    docs = read_output(args.output)
    out = {
        "status": {r["status"]: r["n_docs"] for r in status_report(docs).take_all()},
        "contract_types": {
            r["contract_type"]: r["n_docs"] for r in contract_type_histogram(docs).take_all()
        },
    }
    print(json.dumps(out))
    ray.shutdown()


def cmd_manifest(args) -> None:
    from .io.sink import read_manifest

    m = read_manifest(args.output)
    out = {"partitions": m.num_rows, "rows": sum(m["n_rows"].to_pylist() or [0])}
    for col in ("n_error", "n_truncated", "sum_chars"):
        if col in m.column_names:
            out[col] = int(sum(x or 0 for x in m[col].to_pylist()))
    print(json.dumps(out))


def cmd_curate(args) -> None:
    """The training-corpus curation chain over raw pages: extract →
    [corpus-level boilerplate strip] → quality filter → near-dup
    keep-list → survivors written as partitioned parquet."""
    ray = _init_ray()
    import ray.data as rd

    from .fixtures import read_pages
    from .io.sink import write_resumable
    from .pipelines.curate import clean_corpus
    from .pipelines.extract_pipeline import build_extraction_pipeline

    t0 = time.perf_counter()
    if os.path.isfile(os.path.join(args.input, "documents.parquet")):
        pages = read_pages(args.input)
    else:
        pages = rd.read_parquet(args.input)
    docs = build_extraction_pipeline(pages)
    survivors = clean_corpus(
        docs, quality_min=args.quality_min, dup_threshold=args.dup_threshold,
        strip_boilerplate=args.strip_boilerplate,
    )
    manifest = write_resumable(survivors, args.output, n_parts=args.n_parts)
    print(json.dumps({
        "survivor_rows": sum(manifest["n_rows"].to_pylist()),
        "written_partitions": manifest.num_rows,
        "sec": round(time.perf_counter() - t0, 2),
        "output": args.output,
    }))
    ray.shutdown()


def cmd_curate_full(args) -> None:
    """The COMPOSED pretraining-corpus job (pipelines/curate_full.py):
    ingest → latest_by_url → blocklist → quality → paragraph_dedup →
    MinHash keep-list → decontaminate → PII → sequence packing → shard
    manifest, written through the resumable lineage sink (a killed run
    re-writes only incomplete partitions on rerun)."""
    ray = _init_ray()

    from .pipelines.curate_full import run_curate_full

    t0 = time.perf_counter()
    manifest = run_curate_full(args.input, args.output, n_parts=args.n_parts,
                               num_shards=args.num_shards)
    print(json.dumps({
        "manifest_rows": sum(manifest["n_rows"].to_pylist()),
        "written_partitions": manifest.num_rows,
        "sec": round(time.perf_counter() - t0, 2),
        "output": args.output,
    }))
    ray.shutdown()


def cmd_schemas(args) -> None:
    """Export the model JSON Schemas (reference validation/schema.py:63-104
    workflow) plus, when --output-dir holds extraction parquet, a
    JSON-Schema of its actual Arrow schema."""
    from .io.jsonschema import SchemaValidator, arrow_schema_to_json_schema

    files = SchemaValidator().export_schemas(args.output)
    if args.parquet_dir:
        import json as _json

        import pyarrow.dataset as pads

        sch = pads.dataset(args.parquet_dir).schema
        fp = os.path.join(args.output, "dataset_schema.json")
        with open(fp, "w", encoding="utf-8") as f:
            _json.dump(arrow_schema_to_json_schema(sch, "ExtractionOutput"), f, indent=2)
        files.append(fp)
    print(json.dumps({"exported": files}))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pappermate_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="run the extraction pipeline to a resumable sink")
    pe.add_argument("--input", required=True, help="pages parquet dir, or an sf_dir with documents.parquet")
    pe.add_argument("--output", required=True)
    pe.add_argument("--n-parts", type=int, default=64)
    pe.add_argument("--resume", action="store_true")
    pe.add_argument("--skew", action="store_true", help="size-bucket sort before extraction")
    pe.add_argument("--dead-letter-dir", default=None,
                    help="write error rows to this dir instead of the main output")
    pe.set_defaults(fn=cmd_extract)

    pr = sub.add_parser("report", help="aggregate reports over a completed output dir")
    pr.add_argument("--output", required=True)
    pr.set_defaults(fn=cmd_report)

    pm = sub.add_parser("manifest", help="print lineage manifest summary")
    pm.add_argument("--output", required=True)
    pm.set_defaults(fn=cmd_manifest)

    pc_ = sub.add_parser("curate", help="extract + quality filter + near-dup dedup → survivor parquet")
    pc_.add_argument("--input", required=True, help="pages parquet dir, or an sf_dir with documents.parquet")
    pc_.add_argument("--output", required=True)
    pc_.add_argument("--n-parts", type=int, default=64)
    pc_.add_argument("--quality-min", type=float, default=0.4)
    pc_.add_argument("--dup-threshold", type=float, default=0.8)
    pc_.add_argument("--strip-boilerplate", action="store_true",
                     help="corpus-level repeated-paragraph removal before scoring")
    pc_.set_defaults(fn=cmd_curate)

    pf = sub.add_parser(
        "curate-full",
        help="composed corpus job: ingest → url dedup → curation chain → training-shard manifest")
    pf.add_argument("--input", required=True, help="sf_dir with documents.parquet")
    pf.add_argument("--output", required=True)
    pf.add_argument("--n-parts", type=int, default=16)
    pf.add_argument("--num-shards", type=int, default=8)
    pf.set_defaults(fn=cmd_curate_full)

    ps = sub.add_parser("schemas", help="export model JSON Schemas (+ dataset schema)")
    ps.add_argument("--output", required=True, help="directory for *_schema.json files")
    ps.add_argument("--parquet-dir", default=None,
                    help="also export this extraction output's Arrow schema")
    ps.set_defaults(fn=cmd_schemas)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
