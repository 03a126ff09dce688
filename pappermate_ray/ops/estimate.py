"""Join planning utilities: exact join cardinality without the join.

``|A ⋈_k B| = Σ_k c_A(k)·c_B(k)`` needs only the two per-key COUNT
aggregates — each a narrow exchange carrying (key, int64) — never the
payload join itself. The smaller count table broadcasts (``ray.put``
once, read per task) into a vectorized multiply over the larger one,
so the answer costs two aggregate exchanges + one streaming map: the
"how big would this join be" question answered at 1/1000th the price
of running it — which is what lets a pipeline pick broadcast vs
shuffle, pre-size partitions (``adaptive_partitions``), or refuse a
fan-out join before it happens.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count


def key_counts(ds: "rd.Dataset", key: str) -> "rd.Dataset":
    """(key, n) — the narrow per-key histogram both estimators ride."""
    return ds.groupby(key).aggregate(Count(alias_name="n"))


def join_cardinality(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    right_on: Optional[str] = None,
    broadcast_limit: int = 5_000_000,
) -> int:
    """EXACT inner-join output row count of ``left ⋈ right`` — computed
    from the two key histograms, not the join. The right histogram is
    collected and broadcast (refuse above ``broadcast_limit`` distinct
    keys — at that point run the join); the left histogram streams
    through a vectorized lookup-multiply whose partial sums are the
    only thing the driver sees."""
    import ray

    rkey = right_on or on
    rcounts = key_counts(right, rkey).take_all()
    if len(rcounts) > broadcast_limit:
        raise ValueError(
            f"right side has {len(rcounts)} distinct keys "
            f"(> broadcast_limit={broadcast_limit}); run the join instead")
    rmap_ref = ray.put({r[rkey]: int(r["n"]) for r in rcounts})

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        rmap = _ray.get(rmap_ref)
        ks = t[on].to_pylist()
        ns = t["n"].to_numpy(zero_copy_only=False)
        tot = int(sum(int(n) * rmap.get(k, 0) for k, n in zip(ks, ns)))
        return pa.table({"part": pa.array([tot], pa.int64())})

    parts = key_counts(left, on).map_batches(
        partial, batch_format="pyarrow").take_all()
    return int(sum(p["part"] for p in parts))
