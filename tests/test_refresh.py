"""Composed incremental-refresh job (pipelines/refresh.py): snapshot
diff → work-list → token counts → persisted-index near-dup flag, on a
planted two-crawl fixture where every manifest field is load-bearing.
"""

import pyarrow as pa
import ray.data as rd

from pappermate_ray.pipelines.refresh import incremental_refresh
from pappermate_ray.stages.dedup import build_minhash_index

LONG = ("the quick brown fox jumps over the lazy dog near the old river "
        "bank while seventeen sleepy turtles watch the slow afternoon "
        "parade of clouds drifting past the quiet village square") * 2


def _pages(rows):
    return rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    }))


def test_incremental_refresh_manifest(ray_session, tmp_path):
    old = _pages([
        ("uA", 1, LONG),
        ("uB", 2, "completely different boilerplate sentence here"),
        ("uC", 3, "page that will be removed next crawl"),
    ])
    new = _pages([
        ("uA", 1, LONG + " updated v2"),   # changed, near-dups old self
        ("uB", 2, "completely different boilerplate sentence here"),  # same
        ("uD", 4, "fresh unrelated page about gardening tips"),       # added
    ])
    idx = str(tmp_path / "idx")
    build_minhash_index(old, idx)

    out = {r["url"]: r for r in
           incremental_refresh(old, new, idx).take_all()}
    # unchanged uB and removed uC never reach the manifest
    assert set(out) == {"uA", "uD"}
    assert out["uA"]["status"] == "changed"
    assert out["uA"]["base_dup"] is True       # >=0.8 jaccard vs old self
    assert out["uA"]["n_tokens"] == len((LONG + " updated v2").split())
    assert out["uD"]["status"] == "added"
    assert out["uD"]["base_dup"] is False
    assert out["uD"]["n_tokens"] == 6


def test_incremental_refresh_empty_worklist(ray_session, tmp_path):
    """An increment with nothing added/changed yields an empty manifest
    (and the match stage must tolerate the empty work-list)."""
    old = _pages([("uA", 1, LONG)])
    idx = str(tmp_path / "idx")
    build_minhash_index(old, idx)
    out = incremental_refresh(old, old, idx)
    assert out.count() == 0


def test_match_index_driver_and_join_verify_identical(ray_session, tmp_path):
    """Round-5 bounded driver-verify tier in match_against_index vs the
    dedupe-aggregate + two-join path."""
    import ray.data as rd

    from pappermate_ray.stages.dedup import (build_minhash_index,
                                             match_against_index)

    old_rows = [{"doc_id": i,
                 "text": f"document number {i} about distributed data "
                         f"processing with ray and arrow topic {i % 5}"}
                for i in range(30)]
    idx = str(tmp_path / "idx")
    build_minhash_index(rd.from_items(old_rows, override_num_blocks=3), idx)
    new_rows = [{"doc_id": 1000 + i,
                 "text": old_rows[i]["text"] + " updated"}
                for i in range(0, 30, 5)]
    new = rd.from_items(new_rows, override_num_blocks=2)
    drv = sorted((r["new_id"], r["old_id"], r["jaccard"])
                 for r in match_against_index(new, idx,
                                              threshold=0.8).take_all())
    dist = sorted((r["new_id"], r["old_id"], r["jaccard"])
                  for r in match_against_index(
                      new, idx, threshold=0.8,
                      verify_driver_bound=0).take_all())
    assert drv == dist
    assert len(drv) >= 6


def test_index_rebuild_is_idempotent(ray_session, tmp_path):
    """A partial/killed build followed by a re-run must not duplicate
    sets or band rows (write_parquet appends; the builder cleans its
    target dirs first)."""
    import ray.data as rd

    from pappermate_ray.stages.dedup import (build_minhash_index,
                                             match_against_index)

    rows = [{"doc_id": i,
             "text": f"document number {i} about data processing "
                     f"with ray topic {i % 3}"}
            for i in range(20)]
    old = rd.from_items(rows, override_num_blocks=2)
    idx = str(tmp_path / "idx")
    build_minhash_index(old, idx)      # simulate a completed first pass
    build_minhash_index(old, idx)      # rebuild into the same dir
    new = rd.from_items(
        [{"doc_id": 1000, "text": rows[0]["text"] + " updated"}])
    out = match_against_index(new, idx, threshold=0.8).take_all()
    # exactly one match row, not doubled
    assert [(r["new_id"], r["old_id"]) for r in out] == [(1000, 0)]
    # distributed verify path agrees (would double without the clean)
    out2 = match_against_index(new, idx, threshold=0.8,
                               verify_driver_bound=0).take_all()
    assert [(r["new_id"], r["old_id"]) for r in out2] == [(1000, 0)]


def test_write_increment_atomicity(ray_session, tmp_path):
    """A leftover .tmp increment (killed prior write) is cleaned on the
    next write, never read, and never disturbs increment numbering."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.stages.search import write_increment

    base = str(tmp_path / "store")
    t1 = rd.from_arrow(pa.table({"v": pa.array([1, 2], pa.int64())}))
    write_increment(t1, base, "stats")
    # simulate a killed second write: partial tmp dir left behind
    os.makedirs(f"{base}/stats/add_00001.tmp", exist_ok=True)
    with open(f"{base}/stats/add_00001.tmp/garbage", "w") as f:
        f.write("partial")
    t2 = rd.from_arrow(pa.table({"v": pa.array([3], pa.int64())}))
    write_increment(t2, base, "stats")
    names = sorted(os.listdir(f"{base}/stats"))
    assert names == ["add_00000", "add_00001"]
    import pyarrow.parquet as pqt
    got = sorted(pqt.read_table(f"{base}/stats")["v"].to_pylist())
    assert got == [1, 2, 3]


def test_pq_index_rebuild_is_idempotent(ray_session, tmp_path):
    import numpy as np
    import ray.data as rd

    from pappermate_ray.stages.similarity import build_pq_index

    rows = [{"vec_id": i,
             "embedding": [float(i % 7), float(i % 5), 1.0, 0.5]}
            for i in range(40)]
    ds = rd.from_items(rows, override_num_blocks=2)
    idx = str(tmp_path / "pq")
    build_pq_index(ds, idx, m=1, n_centroids=40, sample_size=40)
    build_pq_index(ds, idx, m=1, n_centroids=40, sample_size=40)  # rebuild
    import pyarrow.parquet as pqt
    # codes not doubled
    assert pqt.read_table(f"{idx}/codes").num_rows == 40


def test_match_index_no_routable_rows(ray_session, tmp_path):
    """A new batch whose buckets all miss the stored ranges returns a
    typed empty result through the sorted-probe path."""
    import ray.data as rd

    from pappermate_ray.stages.dedup import (build_minhash_index,
                                             match_against_index)

    idx = str(tmp_path / "idx")
    build_minhash_index(rd.from_items(
        [{"doc_id": i, "text": f"alpha beta gamma delta {i}"}
         for i in range(10)]), idx)
    new = rd.from_items(
        [{"doc_id": 99, "text": "totally different words entirely here"}])
    out = match_against_index(new, idx, threshold=0.8)
    assert out.count() == 0
    assert set(out.schema().names) == {"new_id", "old_id", "jaccard"}
