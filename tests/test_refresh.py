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
