"""Largest-remainder apportionment — split an integer budget across
keys proportionally to an integer score, EXACTLY (quotas sum to the
budget): the crawl-planning primitive ("this week we fetch B pages;
how many per host?") and the general quota splitter (shards per
tenant, samples per stratum at exact total).

Rule (Hamilton / largest remainder, the deterministic classic):

    base_i = floor(B * s_i / S),   rem_i = (B * s_i) mod S,  S = Σ s_i
    the r = B - Σ base_i keys with the LARGEST rem_i get +1
    (ties on rem broken by key ascending)

which equals the SQL window

    base + CASE WHEN row_number() OVER (ORDER BY rem DESC, key) <= r
           THEN 1 ELSE 0 END

— so the operator is oracle-checkable.

Scale shape (the selection is the only non-map step, and it never
sorts the table):

1. two Sum aggregates (S, Σ base) — narrow;
2. bucket histogram over ``rem // w`` (≤ ``n_buckets`` rows to the
   driver) finds the boundary bucket holding the r-th largest rem;
3. one filtered value-count pass INSIDE that bucket (distinct rems of
   ~1/n_buckets of the key space) pins the exact cut value c*;
4. ties at exactly c* resolve by key ascending via one more filtered
   pass that collects ONLY the tie keys (capped — a tie storm means
   scores are degenerate and the caller should salt or pre-round);
5. final streaming map assigns ``base + topup`` from the broadcast
   (c*, winner-set) — no exchange carries the table itself.

Overflow guard: requires ``B * max(s) < 2^63`` (checked; the
ops/hits.py guard pattern)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

_TIE_CAP = 100_000


def largest_remainder(
    ds: "rd.Dataset",
    budget: int,
    key_col: str = "host",
    score_col: str = "score",
    out_col: str = "quota",
    n_buckets: int = 4096,
    driver_bound: int = 1_000_000,
) -> "rd.Dataset":
    """(key, score, quota) with Σ quota == budget. Scores must be
    non-negative ints; null-score rows are dropped.

    Key tables ≤ ``driver_bound`` take a vectorized driver fast path
    (two numpy argsorts) instead of the 5-execution distributed
    selection — the ``resolve_pointers_auto`` bounded-sweep rule:
    planning tables are usually host-level and small, and the
    exchange spin-up floor dwarfs the math there. Both paths are
    asserted identical in tests. (Driver-path key tie-break compares
    numpy unicode, the distributed path Python str — identical
    orderings on ASCII keys; ties on the cut remainder only matter
    for degenerate score distributions.)"""

    src = ds.map_batches(
        lambda t: t.select([key_col, score_col])
                   .filter(pc.is_valid(t[score_col])),
        batch_format="pyarrow").materialize()  # consumed 4-5 times below

    if src.count() <= driver_bound:
        # empty blocks can carry a zero-column schema — drop before concat
        tabs = [t for t in ray.get(src.to_arrow_refs()) if t.num_rows]
        if not tabs:
            raise ValueError("largest_remainder: total score must be > 0")
        whole = pa.concat_tables(tabs)
        s = whole[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if int(s.sum()) <= 0:
            raise ValueError("largest_remainder: total score must be > 0")
        if s.min() < 0:
            raise ValueError("largest_remainder: scores must be non-negative")
        S = int(s.sum())
        if budget > (2**63 - 1) // max(1, int(s.max())):
            raise ValueError("largest_remainder: budget*max(score) overflows "
                             "int64 — pre-scale the scores")
        prod = budget * s
        base = prod // S
        rem = prod % S
        r = int(budget - base.sum())
        topup = np.zeros(len(s), np.int64)
        if r > 0:
            keys = np.asarray(whole[key_col].to_pylist())
            by_key = np.argsort(keys, kind="stable")
            order = by_key[np.argsort(-rem[by_key], kind="stable")]
            topup[order[:r]] = 1
        return rd.from_arrow(pa.table({
            key_col: whole[key_col],
            score_col: whole[score_col],
            out_col: pa.array(base + topup, pa.int64()),
        }))

    agg = src.aggregate(Sum(score_col, alias_name="S"),
                        Max(score_col, alias_name="mx"),
                        Min(score_col, alias_name="mn"))
    S = int(agg["S"] or 0) if agg else 0
    mx = int(agg["mx"] or 0) if agg else 0
    if S <= 0:
        raise ValueError("largest_remainder: total score must be > 0")
    if int(agg["mn"] or 0) < 0:
        raise ValueError("largest_remainder: scores must be non-negative")
    if mx and budget > (2**63 - 1) // mx:
        raise ValueError("largest_remainder: budget*max(score) overflows "
                         "int64 — pre-scale the scores")

    def with_parts(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        prod = budget * s
        return (t.append_column("_base", pa.array(prod // S, pa.int64()))
                 .append_column("_rem", pa.array(prod % S, pa.int64())))

    parts = src.map_batches(with_parts, batch_format="pyarrow")
    r = budget - int(parts.aggregate(Sum("_base", alias_name="b"))["b"] or 0)

    if r == 0:
        cut, winners = None, frozenset()
    else:
        w = max(1, S // n_buckets)
        hist = parts.map_batches(
            lambda t: pa.table({"_bk": pc.divide(t["_rem"], w)}),
            batch_format="pyarrow").groupby("_bk").count().take_all()
        hist.sort(key=lambda x: -x["_bk"])
        need, b_star = r, None
        for row in hist:
            if need <= row["count()"]:
                b_star = int(row["_bk"])
                break
            need -= row["count()"]
        # distinct rems inside the boundary bucket only
        vc = parts.map_batches(
            lambda t: t.filter(pc.equal(pc.divide(t["_rem"], w), b_star))
                       .select(["_rem"]),
            batch_format="pyarrow").groupby("_rem").count().take_all()
        vc.sort(key=lambda x: -x["_rem"])
        cut, take_at_cut = None, 0
        for row in vc:
            if need <= row["count()"]:
                cut, take_at_cut = int(row["_rem"]), need
                break
            need -= row["count()"]
        n_ties = next(x["count()"] for x in vc if x["_rem"] == cut)
        if take_at_cut == n_ties:
            winners = None  # every tie wins: no key set needed
        else:
            if n_ties > _TIE_CAP:
                raise ValueError(
                    f"largest_remainder: {n_ties} keys tie at the cut "
                    "remainder — degenerate scores; pre-round or salt")
            ties = parts.map_batches(
                lambda t: t.filter(pc.equal(t["_rem"], cut))
                           .select([key_col]),
                batch_format="pyarrow").take_all()
            winners = frozenset(
                sorted(x[key_col] for x in ties)[:take_at_cut])

    win_ref = ray.put(winners if r else frozenset())

    def finish(t: pa.Table) -> pa.Table:
        base = t["_base"].to_numpy(zero_copy_only=False)
        if r == 0:
            topup = np.zeros(len(base), np.int64)
        else:
            rem = t["_rem"].to_numpy(zero_copy_only=False)
            topup = (rem > cut).astype(np.int64)
            at_cut = rem == cut
            if at_cut.any():
                wset = ray.get(win_ref)
                if wset is None:
                    topup[at_cut] = 1
                else:
                    keys = t[key_col].to_pylist()
                    topup[at_cut] = [
                        1 if keys[i] in wset else 0
                        for i in np.flatnonzero(at_cut)]
        return pa.table({
            key_col: t[key_col],
            score_col: t[score_col],
            out_col: pa.array(base + topup, pa.int64()),
        })

    return parts.map_batches(finish, batch_format="pyarrow")
