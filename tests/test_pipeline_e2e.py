"""End-to-end golden test: Ray pipeline output is byte-identical, per url,
to the same extractor functions executed serially (FIXTURES.md §2 —
"produced once by the pure-Python reference-behavior extractor functions ...
pytest asserts the pipeline output is byte-identical per url")."""

import pyarrow as pa
import pytest

from pappermate_ray.fixtures import build_pages_table
from pappermate_ray.functions.contract import parse_contract
from pappermate_ray.functions.htmlx import extract_main_text
from pappermate_ray.functions.spans import extract_spans
from pappermate_ray.pipelines.extract_pipeline import build_extraction_pipeline

N_ROWS = 400


def _serial_goldens(pages: pa.Table) -> dict:
    """Run the exact extractor functions serially → goldens keyed by url."""
    goldens = {}
    for row in pages.to_pylist():
        text, blocks, status, error = extract_main_text(row["html"], row["text"])
        rec = {"text": text, "status": status, "error": error, "blocks": blocks}
        if status != "error" and text:
            parsed = parse_contract(text, default_name=row["url"])
            rec.update(
                contract_number=parsed["contract_number"],
                contract_type=parsed["contract_type"],
                client_name=parsed["client_name"],
                effective_date=parsed["effective_date"],
                total_value=parsed["total_value"],
                currency=parsed["currency"],
            )
            rec["entities"] = extract_spans(text)
        goldens[row["url"]] = rec
    return goldens


@pytest.fixture(scope="module")
def pages() -> pa.Table:
    return build_pages_table(N_ROWS)


def test_pipeline_matches_serial_goldens(ray_session, pages):
    import ray.data as rd

    goldens = _serial_goldens(pages)
    ds = build_extraction_pipeline(rd.from_arrow(pages), batch_size=64)
    out = {}
    for batch in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        for row in batch.to_pylist():
            out[row["url"]] = row

    assert set(out) == set(goldens)
    mismatches = []
    for url, g in goldens.items():
        r = out[url]
        if r["text"] != g["text"]:  # BYTE-identical extracted text
            mismatches.append((url, "text"))
            continue
        if r["status"] != g["status"] or r["error"] != g["error"]:
            mismatches.append((url, "status"))
        if g["status"] != "error" and g["text"]:
            for k in ("contract_number", "contract_type", "client_name", "currency", "total_value"):
                if r[k] != g[k]:
                    mismatches.append((url, k))
            if r["effective_date"] != g["effective_date"]:
                mismatches.append((url, "effective_date"))
            # span identity: same ordered (type, start, end, text)
            got = [(e["entity_type"], e["start"], e["end"], e["text"]) for e in r["entities"]]
            want = [(e["entity_type"], e["start"], e["end"], e["text"]) for e in g["entities"]]
            if got != want:
                mismatches.append((url, "entities"))
            gb = [(b["type"], b["text"], b["order"]) for b in r["blocks"]]
            wb = [(b["type"], b["text"], b["order"]) for b in g["blocks"]]
            if gb != wb:
                mismatches.append((url, "blocks"))
    assert mismatches == []


def test_pipeline_matches_frozen_goldens(ray_session, pages):
    """The committed golden parquet (tools/gen_goldens.py) pins extractor
    behavior ACROSS sessions: any silent drift in extraction/parse/span
    semantics fails here even if pipeline and serial run drift together."""
    import os

    import pyarrow.parquet as pq

    import ray.data as rd

    golden_path = os.path.join(os.path.dirname(__file__), "goldens", "golden_extractions.parquet")
    frozen = {r["url"]: r for r in pq.read_table(golden_path).to_pylist()}
    ds = build_extraction_pipeline(rd.from_arrow(pages), batch_size=64)
    mismatches = []
    for batch in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        for row in batch.to_pylist():
            g = frozen[row["url"]]
            if row["text"] != g["extracted_text"]:
                mismatches.append((row["url"], "text"))
                continue
            if row["status"] != g["status"]:
                mismatches.append((row["url"], "status"))
            if g["status"] != "error" and g["extracted_text"]:
                digest = "|".join(
                    f"{s['entity_type']}:{s['start']}:{s['end']}" for s in row["entities"]
                )
                if digest != g["span_digest"]:
                    mismatches.append((row["url"], "spans"))
                if row["contract_number"] != g["contract_number"]:
                    mismatches.append((row["url"], "contract_number"))
                if "|".join(b["type"] for b in row["blocks"]) != g["block_types"]:
                    mismatches.append((row["url"], "block_types"))
    assert mismatches == []


def test_pipeline_error_rows_survive(ray_session, pages):
    import ray.data as rd

    ds = build_extraction_pipeline(rd.from_arrow(pages), batch_size=64)
    tbl = pa.concat_tables(list(ds.iter_batches(batch_size=1024, batch_format="pyarrow")))
    statuses = tbl["status"].to_pylist()
    # malformed fixture rows flow through as error rows (dead-letter path),
    # they never kill the task (SafeProcessor semantics)
    assert statuses.count("error") > 0
    assert len(statuses) == N_ROWS


def test_routed_big_docs_same_results(ray_session, pages):
    """Size-routed pipeline (in-batch big-doc slicing) is row-identical
    to the plain pipeline — routing is a physical-plan choice, not a
    semantic one — and the routed plan scans the input exactly ONCE
    (the round-1 version unioned two filtered branches, reading the
    corpus twice)."""
    import ray.data as rd

    from pappermate_ray.pipelines.extract_pipeline import build_routed_pipeline

    threshold = 1500  # ≈ median payload → both routes substantial
    plain = build_extraction_pipeline(rd.from_arrow(pages), batch_size=64)
    routed = build_routed_pipeline(rd.from_arrow(pages), big_doc_bytes=threshold)
    a = sorted((r["url"], r["text"], r["n_entities"])
               for r in plain.select_columns(["url", "text", "n_entities"]).take_all())
    b = sorted((r["url"], r["text"], r["n_entities"])
               for r in routed.select_columns(["url", "text", "n_entities"]).take_all())
    assert a == b
    # the threshold actually split the corpus (both routes non-trivial)
    import pyarrow.compute as pc

    sizes = pc.binary_length(pages["html"]).to_pylist()
    n_big = sum(1 for s in sizes if s and s > threshold)
    assert 0 < n_big < len(sizes)


def test_routed_pipeline_single_scan(ray_session):
    """The routed plan contains exactly one parquet read (single scan)."""
    from pappermate_ray.fixtures import read_pages
    from pappermate_ray.pipelines.extract_pipeline import build_routed_pipeline

    routed = build_routed_pipeline(read_pages("/root/testdata/sf0.001"),
                                   big_doc_bytes=1500)
    routed = routed.select_columns(["url", "status"]).materialize()
    assert routed.count() == 500
    stats = routed.stats()
    read_ops = [ln for ln in stats.splitlines()
                if "Operator" in ln and "ReadParquet" in ln]
    assert len(read_ops) == 1, stats
    assert "Union" not in stats


def test_compose_and_skip_spans(ray_session, pages, monkeypatch):
    """§2.10 extension surface: user-composed stage lists + the skip_spans
    env/constructor knob (the PAPPERMATE_SKIP_TABLES pattern)."""
    import pyarrow as pa

    import ray.data as rd

    from pappermate_ray.pipelines.extract_pipeline import compose_pipeline
    from pappermate_ray.stages.extract import add_size_bucket, extract_pages_batch

    sub = pages.slice(0, 60)

    # custom user stage replacing the span extractor
    def my_stage(t: pa.Table) -> pa.Table:
        return t.append_column("my_flag", pa.array([True] * len(t), pa.bool_()))

    ds = compose_pipeline(rd.from_arrow(sub), [add_size_bucket, extract_pages_batch, my_stage])
    rows = ds.take_all()
    assert all(r["my_flag"] for r in rows)
    assert "entities" not in rows[0]

    # skip_spans constructor arg: no entities column
    skipped = build_extraction_pipeline(rd.from_arrow(sub), batch_size=32, skip_spans=True)
    assert "entities" not in skipped.take(1)[0]

    # env knob path, constructor overrides
    monkeypatch.setenv("PAPPERMATE_RAY_SKIP_SPANS", "1")
    via_env = build_extraction_pipeline(rd.from_arrow(sub), batch_size=32)
    assert "entities" not in via_env.take(1)[0]
    forced = build_extraction_pipeline(rd.from_arrow(sub), batch_size=32, skip_spans=False)
    assert "entities" in forced.take(1)[0]


def test_actor_and_staged_modes_same_results(ray_session, pages):
    """compute='actors' and the staged (fused=False) layout must be
    row-identical to the default task-mode pipeline."""
    import ray.data as rd

    def key(ds):
        return sorted((r["url"], r["text"], r["n_entities"])
                      for r in ds.select_columns(["url", "text", "n_entities"]).take_all())

    sub = pages.slice(0, 120)
    base = key(build_extraction_pipeline(rd.from_arrow(sub), batch_size=32))
    actors = key(build_extraction_pipeline(rd.from_arrow(sub), batch_size=32, compute="actors"))
    staged = key(build_extraction_pipeline(
        rd.from_arrow(sub), batch_size=32, fused=False, parse_actors=2, span_actors=2))
    assert actors == base
    assert staged == base


def test_skew_partition_same_results(ray_session, pages):
    import ray.data as rd

    base = build_extraction_pipeline(rd.from_arrow(pages), batch_size=64)
    skew = build_extraction_pipeline(rd.from_arrow(pages), batch_size=64, skew_partition=True)
    a = sorted((r["url"], r["text"]) for r in base.select_columns(["url", "text"]).take_all())
    b = sorted((r["url"], r["text"]) for r in skew.select_columns(["url", "text"]).take_all())
    assert a == b


def test_extraction_accuracy_pinned(ray_session):
    """End-to-end extraction quality against planted ground truth:
    contract/relation kinds extract perfectly; pdf kind loses exactly the
    corrupted-payload rows (i%20==13 fixtures) — a drop below these floors
    means an extractor regression."""
    from pappermate_ray.queries import q_extraction_accuracy

    rows = {r["kind"]: r for r in q_extraction_accuracy("/root/testdata/sf0.001").take_all()}
    assert rows["contract"]["accuracy"] == 1.0
    assert rows["relation"]["accuracy"] == 1.0
    assert rows["pdf"]["accuracy"] >= 0.90


def test_corpus_card_planted_dups_and_mix(ray_session):
    import ray.data as rd

    from pappermate_ray.pipelines.reports import corpus_card

    rows = (
        [{"text": "one two three", "lang": "en"}] * 6     # 5 exact dups
        + [{"text": f"doc {i} words here now", "lang": "de"}
           for i in range(4)]
    )
    card = {r["metric"]: r["value"]
            for r in corpus_card(rd.from_items(rows)).to_pylist()}
    assert card["n_docs"] == 10.0
    assert card["n_langs"] == 2.0
    assert card["total_words"] == 6 * 3 + 4 * 5
    assert card["exact_dup_permille"] == 500.0  # 5 of 10 rows are copies
    assert card["p50_words"] == 3.0             # discrete rank ceil(.5*10)-1
    assert card["p90_words"] == 5.0
    import math
    want_ent = -(0.6 * math.log2(0.6) + 0.4 * math.log2(0.4))
    assert abs(card["lang_entropy_bits"] - round(want_ent, 6)) < 1e-9
