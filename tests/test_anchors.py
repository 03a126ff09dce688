"""ops/anchors.py unit semantics (SQL equivalence is the oracle gate's
`anchor_text` row)."""

import pyarrow as pa

import ray.data as rd

from pappermate_ray.ops.anchors import aggregate_anchors


def _edges(rows, blocks=1):
    t = pa.table({
        "src": pa.array([r[0] for r in rows], pa.int64()),
        "dst": pa.array([r[1] for r in rows], pa.int64()),
        "anchor": pa.array([r[2] for r in rows], pa.string()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_counts_and_src_order(ray_session):
    rows = [(5, 1, "e"), (2, 1, "b"), (9, 1, "z"), (3, 2, "c")]
    out = {r["dst"]: r for r in aggregate_anchors(_edges(rows)).take_all()}
    assert out[1]["n_inlinks"] == 3
    assert out[1]["anchors"] == "b|e|z"  # ordered by src 2,5,9
    assert out[2] == {"dst": 2, "n_inlinks": 1, "anchors": "c"}


def test_block_count_invariant_and_hot_target(ray_session):
    # one mega-target with 500 inlinks plus singletons, many blocks
    rows = [(s, 7, f"a{s}") for s in range(500)]
    rows += [(1000 + s, s, "solo") for s in range(40) if s != 7]
    a = sorted(aggregate_anchors(_edges(rows, blocks=1)).take_all(),
               key=lambda r: r["dst"])
    b = sorted(aggregate_anchors(_edges(rows, blocks=11)).take_all(),
               key=lambda r: r["dst"])
    assert a == b
    hot = [r for r in a if r["dst"] == 7][0]
    assert hot["n_inlinks"] == 500
    assert hot["anchors"].split("|") == [f"a{s}" for s in range(500)]
