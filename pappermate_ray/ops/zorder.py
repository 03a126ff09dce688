"""Z-order (Morton) layout — the TWO-dimensional extension of
``ops/rangesort``'s sorted layout: interleave the bits of two integer
keys so that points close in BOTH dimensions are close on the single
sort key, then reuse the range-sorted export verbatim. A box query
(host-bucket range × time window, the CDX "this site, this month"
scan) prunes files by ONE interval on the z key — the idiom behind
Delta/Iceberg Z-ORDER clustering (Morton 1966; Orenstein-Merrett 1984).

Why the interval prune is CORRECT (not just heuristic): the bit-spread
is order-preserving per coordinate, and the z key is the SUM of the
two spread halves, so x0 ≤ x ≤ x1 ∧ y0 ≤ y ≤ y1 implies
``z(x0,y0) ≤ z(x,y) ≤ z(x1,y1)``. Files outside that interval cannot
hold a box point; files inside may hold non-box points (the z curve
wanders out and back), which the final vectorized row filter trims —
a conservative superset read, exactly the min/max-stats contract the
rangesort manifest already provides.

Scale shape: the z key is pure streaming int64 bit math (one
``map_batches``); the export inherits rangesort's three bounded costs
(sampled/exact edges, ONE range_id exchange, per-range local sort);
the scan opens only manifest-selected files. Coordinates must be in
``[0, 2^31)`` — bucket/scale upstream (hash mod 2^k, epoch seconds
fit until 2038; use minutes/hours beyond).

The spread is five mask-shift steps on int64 — DuckDB mirrors it
bit-exactly with its native ``<<``/``&``/``|`` operators, so the key
itself is oracle-checkable (q:zorder_scan_check), not just the scan.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_M16 = np.uint64(0x0000FFFF0000FFFF)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M2 = np.uint64(0x3333333333333333)
_M1 = np.uint64(0x5555555555555555)
_COORD_MAX = np.int64(2**31 - 1)


def _spread(v: np.ndarray) -> np.ndarray:
    """Insert a zero bit above every bit of the lower 32 (uint64 in,
    order-preserving)."""
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def morton_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """int64 z key for non-negative int coordinates < 2^31 (checked):
    x's bits land on odd positions, y's on even — z = 2·spread(x) +
    spread(y) < 2^63."""
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    for v in (x, y):
        if v.size and (v.min() < 0 or v.max() > _COORD_MAX):
            raise ValueError("morton_key: coordinates must be in [0, 2^31)")
    z = (_spread(x.astype(np.uint64)) << np.uint64(1)) \
        | _spread(y.astype(np.uint64))
    return z.astype(np.int64)


def add_zkey(
    ds: "rd.Dataset",
    x_col: str,
    y_col: str,
    out_col: str = "zkey",
) -> "rd.Dataset":
    """Append the Morton key column (streaming, zero exchange). Null
    coordinates yield a null key (and are dropped by the export, per
    the rangesort null-key rule)."""

    def tag(t: pa.Table) -> pa.Table:
        xv = t[x_col].to_numpy(zero_copy_only=False)
        yv = t[y_col].to_numpy(zero_copy_only=False)
        valid = (pc.and_(pc.is_valid(t[x_col]), pc.is_valid(t[y_col]))
                 .to_numpy(zero_copy_only=False))
        z = morton_key(np.where(valid, xv, 0), np.where(valid, yv, 0))
        arr = pa.array(z, pa.int64(), mask=~valid)
        return t.append_column(out_col, arr)

    return ds.map_batches(tag, batch_format="pyarrow")


def zorder_edges(
    ds: "rd.Dataset",
    x_col: str,
    y_col: str,
    partitions: int = 16,
    sample_mod: Optional[int] = None,
    zkey_col: str = "zkey",
) -> List[int]:
    """Range edges over the Morton key (persist them to pin the layout
    intervals across incremental merges — the rangesort edges rule)."""
    from .rangesort import range_edges

    return range_edges(add_zkey(ds, x_col, y_col, zkey_col), zkey_col,
                       partitions, sample_mod)


def zorder_export(
    ds: "rd.Dataset",
    x_col: str,
    y_col: str,
    out_dir: str,
    partitions: int = 16,
    sample_mod: Optional[int] = None,
    zkey_col: str = "zkey",
    edges: Optional[List] = None,
) -> "rd.Dataset":
    """Z-cluster ``ds`` on (x_col, y_col) into a range-sorted layout on
    the Morton key; returns the rangesort manifest (whose
    key_min/key_max are z values). Pass persisted ``edges`` to pin the
    intervals (required if the layout will take incremental merges)."""
    from .rangesort import range_sorted_export

    keyed = add_zkey(ds, x_col, y_col, zkey_col)
    return range_sorted_export(keyed, zkey_col, out_dir,
                               partitions=partitions, sample_mod=sample_mod,
                               edges=edges)


def zorder_merge(
    base_manifest: List[dict],
    edges,
    increment: "rd.Dataset",
    x_col: str,
    y_col: str,
    out_dir: str,
    zkey_col: str = "zkey",
) -> "rd.Dataset":
    """LSM-fold a crawl increment into an existing z layout: key the
    increment, then ``ops/rangesort.merge_sorted_layout`` does the
    rest — only the z ranges the increment's points land in are
    rewritten; the clustered base is never re-sorted. Daily z-clustered
    ingest for the CDX-style store."""
    from .rangesort import merge_sorted_layout

    keyed = add_zkey(increment, x_col, y_col, zkey_col)
    return merge_sorted_layout(base_manifest, edges, keyed, zkey_col,
                               out_dir)


def zbox_interval(x_range: Tuple[int, int],
                  y_range: Tuple[int, int]) -> Tuple[int, int]:
    """The containing z interval of a coordinate box."""
    lo = morton_key(np.array([x_range[0]]), np.array([y_range[0]]))[0]
    hi = morton_key(np.array([x_range[1]]), np.array([y_range[1]]))[0]
    return int(lo), int(hi)


def zorder_box_scan(
    manifest: List[dict],
    x_range: Tuple[int, int],
    y_range: Tuple[int, int],
    x_col: str,
    y_col: str,
) -> "rd.Dataset":
    """Box query over an exported z layout: manifest-prune to the
    files intersecting the box's z interval, then one vectorized row
    filter trims the curve's excursions to exactly the box."""
    from .rangesort import read_sorted_range

    zlo, zhi = zbox_interval(x_range, y_range)
    ds = read_sorted_range(manifest, zlo, zhi)
    if not ds.columns():
        return ds

    def trim(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(t[x_col], x_range[0]),
                    pc.less_equal(t[x_col], x_range[1])),
            pc.and_(pc.greater_equal(t[y_col], y_range[0]),
                    pc.less_equal(t[y_col], y_range[1])))
        return t.filter(pc.fill_null(keep, False))

    return ds.map_batches(trim, batch_format="pyarrow")


def zbox_files(
    manifest: List[dict],
    x_range: Tuple[int, int],
    y_range: Tuple[int, int],
) -> List[str]:
    """The file subset a box scan would open (for pruning assertions
    and planning)."""
    zlo, zhi = zbox_interval(x_range, y_range)
    return [r["path"] for r in manifest
            if r["key_max"] >= zlo and r["key_min"] <= zhi]
