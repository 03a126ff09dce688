"""Sampling operators (SURVEY.md §2.6 T5/T6).

``stratified_head`` is the deterministic stratified sample: per-stratum
first-k by sort key — the engine's sibling of the reference's proportional
``random.sample`` per stratum (scripts/openai_contract_explorer.py:229-310),
made reproducible (the reference seeds with wall-clock; determinism rules
forbid that, SURVEY.md §7).
"""

from __future__ import annotations

from typing import List, Union

import pandas as pd
import pyarrow as pa

import ray


def stratified_head(
    ds: "ray.data.Dataset",
    strata: Union[str, List[str]],
    sort_key: str,
    k: int,
) -> "ray.data.Dataset":
    """Per-(strata) groups, take the first ``k`` rows ordered by sort_key.

    One hash shuffle on the strata key; per-group work is a tiny sort+head.
    """
    strata_list = [strata] if isinstance(strata, str) else list(strata)

    from .grouping import partition_grouped

    def _head(g: pd.DataFrame) -> pd.DataFrame:
        # all strata of the partition in one sort + Cython group-head —
        # no per-key dispatch (ops/grouping.py contract)
        g = g.sort_values([*strata_list, sort_key], kind="mergesort")
        return (g.groupby(strata_list, sort=False, dropna=False).head(k)
                .drop(columns=["_pkey"]))

    pds, pcols = partition_grouped(ds, strata_list)
    return pds.groupby(pcols).map_groups(_head, batch_format="pandas")


def grouped_topk(
    ds: "ray.data.Dataset",
    group_cols: Union[str, List[str]],
    value_col: str,
    tiebreak_col: str,
    k: int,
) -> "ray.data.Dataset":
    """Per-group top-k by value desc (tie-break asc) — the grouped analog
    of T4's global top-k.

    Combiner push-down (round 3): every input block first trims to ITS
    OWN per-group top-k inside ``map_batches`` — a row outside its
    block's local top-k cannot be in the global top-k — so the single
    group-key exchange moves ≤ k rows per (block, group) instead of the
    corpus; the per-group finisher then re-sorts ≤ k·blocks rows.

    Null group keys survive the trim (``dropna=False``), and the single
    exchange groups on the int ``_pkey`` (partition_grouped), which
    also sidesteps Ray 2.49's null-string groupby sort crash for
    string group columns."""
    cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def _local_trim(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values([value_col, tiebreak_col],
                            ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby(cols, sort=False, dropna=False).head(k),
            preserve_index=False, schema=t.schema)

    from .grouping import partition_grouped

    def _top(g: pd.DataFrame) -> pd.DataFrame:
        # partition-grouped finisher: one sort + Cython group-head over
        # ALL groups in the partition — no per-key dispatch
        g = g.sort_values([*cols, value_col, tiebreak_col],
                          ascending=[True] * len(cols) + [False, True],
                          kind="mergesort")
        return (g.groupby(cols, sort=False, dropna=False).head(k)
                .drop(columns=["_pkey"]))

    trimmed = ds.map_batches(_local_trim, batch_format="pyarrow")
    pds, pcols = partition_grouped(trimmed, cols)
    return pds.groupby(pcols).map_groups(_top, batch_format="pandas")


def bottomk_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    k: int,
    salt: str = "42",
) -> "ray.data.Dataset":
    """EXACTLY-k uniform sample via bottom-k hashing — deterministic and
    engine-independent (Ray's ``random_sample`` is fraction-based and its
    row selection is an implementation detail of the block iterator).

    Every row gets priority ``md5(id || ':' || salt)``; the global k
    smallest priorities win. Uniformity: md5 orders the ids by a fixed
    pseudo-random permutation, so any k-subset is equally likely over
    salts. Distributed shape: per-batch local bottom-k (vectorized
    argpartition) → the tiny k-row partials concatenate and take the
    global bottom-k — a scatter-gather top-k, NO full sort of the
    corpus. Exactly reproducible in SQL (ORDER BY md5(...) LIMIT k),
    which makes the sampler oracle-checkable — seeded engine RNG never
    is.
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    def local_bottomk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        prios = [hashlib.md5(f"{i}:{salt}".encode()).hexdigest() for i in ids]
        order = np.argsort(np.array(prios, dtype=object), kind="stable")[:k]
        keep = t.take(pa.array(order, pa.int64()))
        return keep.append_column("_prio", pa.array([prios[i] for i in order], pa.string()))

    partials = ds.map_batches(local_bottomk, batch_format="pyarrow")
    # global merge: k rows per block → sort the tiny partial set
    merged = partials.sort("_prio").limit(k)
    return merged.map_batches(lambda t: t.drop_columns(["_prio"]), batch_format="pyarrow")


def grouped_bottomk_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "42",
) -> "ray.data.Dataset":
    """EXACTLY-k-per-group deterministic uniform sample — the stratified
    form of ``bottomk_sample`` ("k docs per language" over 100 TB).

    Same md5 hash-priority currency; the local prune keeps at most k
    rows per group PER BLOCK (vectorized lexsort + group-boundary
    slicing), so the one hash shuffle on the group key carries
    ``k × blocks`` rows per group, never the corpus; the per-group
    finish is a tiny sort+head. SQL-reproducible via
    ``row_number() OVER (PARTITION BY g ORDER BY md5(...)) <= k``.
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    def local(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        prios = np.array(
            [hashlib.md5(f"{i}:{salt}".encode()).hexdigest() for i in ids],
            dtype=object,
        )
        groups = np.array(t[group_col].to_pylist(), dtype=object)
        order = np.lexsort((prios, groups))
        sorted_groups = groups[order]
        _, starts = np.unique(sorted_groups, return_index=True)
        bounds = np.append(starts, len(order))
        keep = np.concatenate(
            [order[s:min(s + k, e)] for s, e in zip(bounds[:-1], bounds[1:])]
        ) if len(order) else np.array([], np.int64)
        out = t.take(pa.array(keep, pa.int64()))
        return out.append_column(
            "_prio", pa.array([prios[i] for i in keep], pa.string())
        )

    from .grouping import partition_grouped

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # all groups of the partition in one sort + Cython group-head
        g = g.sort_values([group_col, "_prio"], kind="mergesort")
        return (g.groupby(group_col, sort=False, dropna=False).head(k)
                .drop(columns=["_prio", "_pkey"]))

    partials = ds.map_batches(local, batch_format="pyarrow")
    pds, pcols = partition_grouped(partials, [group_col])
    return pds.groupby(pcols).map_groups(finish, batch_format="pandas")


def weighted_bottomk_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws42",
    max_weight: int = 64,
) -> "ray.data.Dataset":
    """EXACTLY-k weighted sample WITHOUT replacement (Efraimidis–
    Spirakis 2006): ES takes the k largest ``u_i^(1/w_i)``; for integer
    weights the MAX of ``w`` independent uniforms has exactly that
    distribution (CDF ``x^w``), so each row's priority is the max of
    ``w`` independent md5 draws and the global k LARGEST priorities are
    the weight-proportional sample. The hash is the coin: deterministic,
    stable under re-partitioning and retries, and bit-exact in SQL
    (``list_max(list_transform(range(w), j -> md5(id:salt:j)))`` —
    fixed-width hex compares as the uniform), which is what makes a
    WEIGHTED sampler oracle-checkable at all; float ``ln(u)/w`` keys
    would hinge on cross-engine libm ulps at the rank-k boundary.

    Weights are small-integer boosts (quality tiers, domain boosts),
    capped at ``max_weight`` — the draw count is O(w) per row; rows
    with weight ≤ 0 are excluded. Distributed shape = bottomk_sample's
    scatter-gather: per-batch local top-k, k-row partials, global
    sort+limit — no corpus sort, no exchange of payloads beyond the
    k winners.
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    def local(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        ws = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ws) and int(ws.max()) > max_weight:
            raise ValueError(
                f"weighted_bottomk_sample: weight {int(ws.max())} exceeds "
                f"max_weight={max_weight} (weights are small-integer boosts)")
        prios, keepidx = [], []
        for r, (i, w) in enumerate(zip(ids, ws)):
            if w <= 0:
                continue
            prios.append(max(
                hashlib.md5(f"{i}:{salt}:{j}".encode()).hexdigest()
                for j in range(int(w))))
            keepidx.append(r)
        order = np.argsort(np.array(prios, dtype=object),
                           kind="stable")[::-1][:k]
        sel = pa.array([keepidx[o] for o in order], pa.int64())
        out = t.take(sel)
        return out.append_column(
            "_prio", pa.array([prios[o] for o in order], pa.string()))

    partials = ds.map_batches(local, batch_format="pyarrow")
    merged = partials.sort("_prio", descending=True).limit(k)
    return merged.map_batches(lambda t: t.drop_columns(["_prio"]),
                              batch_format="pyarrow")


def weighted_mixture_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    weights: dict,
    salt: str = "mix42",
    default_weight: float = 0.0,
) -> "ray.data.Dataset":
    """Per-group Bernoulli sampling at deterministic hash rates — the
    domain-REWEIGHTING primitive of mixture construction (fixed source
    weights à la The Pile / DoReMi-style static mixtures): a row of
    group ``g`` survives iff ``md5(id:salt)``'s first 8 hex digits,
    read as a uniform in [0,1), fall below ``weights[g]``.

    Zero shuffles, zero state: one streaming filter pass, stable under
    re-partitioning and retries (the hash IS the coin), and exactly
    reproducible in SQL — fixed-width lowercase-hex string comparison
    equals numeric comparison, so the threshold ships as a hex literal
    (``'gggggggg'`` > every hex digit encodes weight ≥ 1 = keep-all).
    Groups absent from ``weights`` default to ``default_weight``.
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    def thr(w: float) -> str:
        return "gggggggg" if w >= 1.0 else format(int(w * 16**8), "08x")

    thresholds = {g: thr(w) for g, w in weights.items()}
    default_thr = thr(default_weight)

    def keep(t: pa.Table) -> pa.Table:
        prios = np.array(
            [hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:8]
             for i in t[id_col].to_pylist()], dtype=object)
        ts = np.array([thresholds.get(g, default_thr)
                       for g in t[group_col].to_pylist()], dtype=object)
        return t.filter(pa.array(prios < ts))

    return ds.map_batches(keep, batch_format="pyarrow")


def temperature_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    salt: str = "alpha42",
):
    """Temperature (alpha) sampling — the multilingual/domain REBALANCING
    standard (sample mass ∝ count^alpha, flattening head groups so tail
    languages survive): per-group keep rate ``r_g = (c_min / c_g)^(1-alpha)``
    (the smallest group keeps everything; expected kept mass per group is
    ∝ c_g^alpha). Returns (sampled_ds, rates_dict).

    Composition: one narrow group-count exchange (take_all of a
    #groups-row table), then the existing zero-shuffle hash-Bernoulli
    filter (``weighted_mixture_sample``) at the derived rates — so the
    corpus itself streams through a single filter pass.

    Determinism/oracle note: at alpha=0.5 the rate is ``sqrt(c_min/c_g)``
    and IEEE-754 sqrt/div/mul are CORRECTLY ROUNDED — bit-identical in
    numpy, CPython and DuckDB — so the hex threshold (and therefore the
    exact kept set) is SQL-replicable. General alpha uses ``pow``, whose
    last-ulp varies across libms; the operator allows it, the oracle
    gate pins 0.5."""
    import math

    from ray.data.aggregate import Count as _Count

    counts = {r[group_col]: int(r["n"]) for r in
              ds.groupby(group_col).aggregate(
                  _Count(alias_name="n")).take_all()}
    if not counts:
        return ds, {}
    c_min = min(counts.values())
    if alpha == 0.5:
        rates = {g: math.sqrt(c_min / c) for g, c in counts.items()}
    else:
        rates = {g: (c_min / c) ** (1.0 - alpha) for g, c in counts.items()}
    return (weighted_mixture_sample(ds, group_col, id_col, rates, salt=salt),
            rates)


def split_assign(
    ds: "ray.data.Dataset",
    id_col: str,
    splits=(("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split42",
    out_col: str = "split",
) -> "ray.data.Dataset":
    """Deterministic train/val/test partition: every row gets exactly
    one split label from ``md5(id:salt)``'s first 8 hex digits against
    cumulative hex thresholds — the same coin as
    ``weighted_mixture_sample``, so the assignment is zero-shuffle,
    stable under re-partitioning/retries, and SQL-reproducible
    (fixed-width lowercase-hex string comparison = numeric
    comparison). Fractions must sum to 1 (the last split absorbs the
    rounding tail of the hex grid).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    if abs(sum(f for _, f in splits) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    cum = 0.0
    bounds = []
    for name, frac in splits[:-1]:
        cum += frac
        bounds.append((name, format(int(cum * 16 ** 8), "08x")))
    last = splits[-1][0]

    def assign(t: pa.Table) -> pa.Table:
        prios = np.array(
            [hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:8]
             for i in t[id_col].to_pylist()], dtype=object)
        labels = np.full(t.num_rows, last, dtype=object)
        for name, b in reversed(bounds):
            labels[prios < b] = name
        return t.append_column(out_col, pa.array(labels, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def quota_head(
    ds: "ray.data.Dataset",
    key_col: str,
    sort_key: str,
    quotas: "ray.data.Dataset",
    quota_col: str = "quota",
    broadcast_bound: int = 2_000_000,
    npart=None,
):
    """Per-key VARIABLE-k head: keep the first ``quota[key]`` rows of
    each key ordered by ``sort_key`` — the apply side of
    ``ops/apportion.largest_remainder`` ("fetch exactly quota_h pages
    of host h, best first"). Keys absent from the quota table keep 0
    rows.

    Hybrid small-side shape (the robots_filter pattern): quota tables
    are key-level aggregates, so ≤ ``broadcast_bound`` rows they ship
    ONCE via ``ray.put`` as a key→quota dict consulted inside the
    grouped finisher; beyond the bound the quotas hash-join onto the
    rows through the armored ``ops/joins.hash_join`` instead. Either
    way the rows take ONE partition-grouped exchange and
    rank-within-key is a Cython ``cumcount`` per PARTITION-sized group
    (never per-key dispatch — ops/grouping.py contract)."""
    from .grouping import partition_grouped

    n_q = quotas.count()
    if n_q <= broadcast_bound:
        qmap = {r[key_col]: int(r[quota_col] or 0) for r in quotas.take_all()}
        ref = ray.put(qmap)

        def _head(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values([key_col, sort_key], kind="mergesort")
            rank = g.groupby(key_col, sort=False, dropna=False).cumcount()
            cap = (g[key_col].map(ray.get(ref)).fillna(0)
                   .to_numpy(dtype="int64"))
            return g[rank.to_numpy() < cap].drop(columns=["_pkey"])

        pds, pcols = partition_grouped(ds, [key_col], npart)
        return pds.groupby(pcols).map_groups(_head, batch_format="pandas")

    # distributed tier: rank within key, then join the quota on
    from .joins import adaptive_partitions, hash_join

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, sort_key], kind="mergesort")
        g["_rank"] = g.groupby(key_col, sort=False, dropna=False).cumcount()
        return g.drop(columns=["_pkey"])

    pds, pcols = partition_grouped(ds, [key_col], npart)
    ranked = pds.groupby(pcols).map_groups(_rank, batch_format="pandas")
    key_t = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    joined = hash_join(
        ranked, quotas.select_columns([key_col, quota_col]), on=key_col,
        num_partitions=npart or adaptive_partitions(n_q),
        right_schema=pa.schema([(key_col, key_t),
                                (quota_col, pa.int64())]),
    )

    def _apply(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.less(t["_rank"], pc.fill_null(t[quota_col], 0))
        return t.filter(pc.fill_null(keep, False)) \
                .drop_columns(["_rank", quota_col])

    return joined.map_batches(_apply, batch_format="pyarrow")
