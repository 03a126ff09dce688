"""Ordered-window analytics: sessionization, per-key running/moving
aggregates, top-k per group, and grouped z-score outliers.

The SQL-window-function family (``SUM() OVER (PARTITION BY … ORDER BY
… ROWS …)``, ``row_number()``, gap-based sessionization) restated for
a streaming Dataset. Shared scale shape with `ops/funnel.py` /
`ops/retention.py`: ONE hash exchange on the partition key, then a
per-key sorted scan where the key's history — thousands of rows, never
the corpus — is the unit of work. A hot key skews only its own group;
nothing joins; nothing collects on the driver.

(Per-group top-k lives in `ops/sample.grouped_topk`, which gained the
local-trim combiner push-down in the same round.)

`interval_union` (merged-coverage time) and `scd2_history` (validity-
interval version table from capture streams) extend the family to
interval analytics — same one-exchange, per-key-scan shape.

Money-valued running sums use integer cents (``floor(value·100)``) so
the cumulative aggregates are exact int64 and bit-identical to the
DuckDB window oracle — no float-accumulation-order hazard.

Beyond-reference scope (the reference has no event analytics); the
``events`` driver fixture is the target table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def sessionize(
    ds: "rd.Dataset",
    id_col: str,
    ts_col: str,
    gap_seconds: float,
    tiebreak_col: str,
) -> "rd.Dataset":
    """Gap-based session summaries: one row per (entity, session) with
    ``session_idx`` (1-based, in time order), ``session_start``,
    ``session_end`` and ``n_events``. A new session starts when the
    entity's gap since its previous event STRICTLY exceeds
    ``gap_seconds`` — the same rule as the oracle's
    ``lag(ts) OVER (PARTITION BY id ORDER BY ts, tiebreak)`` cascade.
    Equal-timestamp events can never open a session (gap 0), so the
    tiebreak only pins scan order, not membership.

    Output is session-grained (≪ input), computed inside the per-entity
    scan — per-event rows never leave the group task.
    """
    gap = pd.Timedelta(seconds=gap_seconds)

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tiebreak_col], kind="mergesort")
        ts = g[ts_col]
        brk = ts.diff().gt(gap).to_numpy()
        brk[0] = True
        sid = np.cumsum(brk)
        out = g.assign(_sid=sid).groupby("_sid", sort=True).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        ).reset_index()
        return pd.DataFrame({
            id_col: g[id_col].iloc[0],
            "session_idx": out["_sid"].astype(np.int64),
            "session_start": out["session_start"],
            "session_end": out["session_end"],
            "n_events": out["n_events"].astype(np.int64),
        })

    return (ds.groupby(id_col)
            .map_groups(summarize, batch_format="pandas"))


def running_window(
    ds: "rd.Dataset",
    id_col: str,
    ts_col: str,
    val_col: str,
    window: int,
    tiebreak_col: str,
) -> "rd.Dataset":
    """Per-row running aggregates over each entity's time-ordered
    history: ``running_cents`` = cumulative sum and ``moving_cents`` =
    sum of the trailing ``window`` rows (inclusive), both over
    ``floor(value·100)`` integer cents — exactly SQL's
    ``SUM() OVER (PARTITION BY id ORDER BY ts, tiebreak
    ROWS [UNBOUNDED | window-1] PRECEDING)`` with exact int64 math.

    Output is row-grained (same cardinality as input) but stays a
    streaming Dataset; the only exchange is the entity hash partition.
    """

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tiebreak_col], kind="mergesort")
        cents = np.floor(g[val_col].to_numpy() * 100.0).astype(np.int64)
        run = np.cumsum(cents)
        mov = run - np.concatenate(
            [np.zeros(min(window, len(run)), np.int64), run[:-window]])
        return pd.DataFrame({
            tiebreak_col: g[tiebreak_col].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "running_cents": run,
            "moving_cents": mov,
        })

    return (ds.groupby(id_col)
            .map_groups(scan, batch_format="pandas"))


def interval_union(
    ds: "rd.Dataset",
    id_col: str,
    start_col: str,
    end_col: str,
) -> "rd.Dataset":
    """Total covered length per entity of the UNION of its
    ``[start, end)`` intervals (epoch-µs int64 columns) — overlapping
    and touching intervals merge (an interval starting exactly at the
    running max end CONTINUES the island; only ``start > max_end_so_
    far`` opens a new one, the same rule as the SQL islands oracle).

    The dwell-time / uptime primitive: sessions overlap when a user has
    concurrent tabs, crawls overlap when fetch windows retry. Per-entity
    sorted scan under one hash exchange; output is entity-grained.
    """

    def cover(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([start_col, end_col], kind="mergesort")
        s = g[start_col].to_numpy(dtype=np.int64)
        e = g[end_col].to_numpy(dtype=np.int64)
        cm = np.maximum.accumulate(e)
        new_island = np.ones(len(g), bool)
        new_island[1:] = s[1:] > cm[:-1]
        isl = np.cumsum(new_island) - 1
        # per-island max end − min start; islands are contiguous runs
        starts = np.flatnonzero(new_island)
        ends = np.append(starts[1:], len(g))
        covered = sum(int(cm[hi - 1] - s[lo]) for lo, hi in zip(starts, ends))
        del isl
        return pd.DataFrame({
            id_col: [g[id_col].iloc[0]],
            "covered_us": np.array([covered], np.int64),
        })

    return ds.groupby(id_col).map_groups(cover, batch_format="pandas")


def scd2_history(
    ds: "rd.Dataset",
    key_col: str,
    ts_col: str,
    digest_col: str,
    tiebreak_col: str,
    open_end: "object" = None,
) -> "rd.Dataset":
    """Slowly-changing-dimension (type 2) version history from raw
    capture rows: consecutive captures with an unchanged digest
    compact away; each surviving version gets a 1-based ``version``,
    ``valid_from`` (its first capture ts) and ``valid_to`` (the next
    version's valid_from; ``open_end`` for the current version —
    a sentinel rather than NULL so the row value-hashes stably).

    The crawl-recency primitive behind latest_by_url: the same capture
    stream, kept as a queryable validity-interval table instead of a
    winner set. One hash exchange on the key; per-key sorted scan;
    output is version-grained (repeat captures — the crawl-scale
    majority — never leave the group task).
    """

    def versions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tiebreak_col], kind="mergesort")
        dig = g[digest_col].to_numpy()
        keep = np.ones(len(g), bool)
        keep[1:] = dig[1:] != dig[:-1]
        v = g[keep]
        vf = v[ts_col].to_numpy()
        vt = np.append(vf[1:], np.asarray([open_end], dtype=vf.dtype))
        return pd.DataFrame({
            key_col: v[key_col].to_numpy(),
            "version": np.arange(1, len(v) + 1, dtype=np.int64),
            "valid_from": vf,
            "valid_to": vt,
            digest_col: v[digest_col].to_numpy(),
        })

    return ds.groupby(key_col).map_groups(versions, batch_format="pandas")


def zscore_outliers(
    ds: "rd.Dataset",
    group_col: str,
    val_col: str,
    threshold: float = 2.0,
) -> "rd.Dataset":
    """Rows whose value is a grouped z-score outlier:
    ``|v − mean_g| > threshold · stddev_samp_g``. The float-input,
    sample-variance FILTER sibling of `ops/normalize.grouped_zscore`
    (which normalizes int-valued columns with exact integer sums and
    population variance). Two streaming passes:
    a narrow grouped (n, Σv, Σv²) aggregate — group-count-sized, so it
    broadcasts — then a corpus filter against the broadcast stats. The
    corpus itself rides NO exchange; only the tiny stats table does.

    The comparison is done in float64 on both sides; callers pick a
    ``threshold`` away from the data's z-mass (the oracle replays the
    identical inequality, so both sides flip together anywhere except
    within ~1e-12 relative of the boundary).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    stats = (ds.map_batches(
                lambda t: pa.table({
                    group_col: t[group_col],
                    "_v": pa.compute.cast(t[val_col], pa.float64()),
                    "_v2": pa.compute.multiply(
                        pa.compute.cast(t[val_col], pa.float64()),
                        pa.compute.cast(t[val_col], pa.float64())),
                }), batch_format="pyarrow")
             .groupby(group_col)
             .aggregate(Count(alias_name="n"),
                        Sum("_v", alias_name="s"),
                        Sum("_v2", alias_name="s2"))
             .to_pandas())
    n = stats["n"].to_numpy().astype(np.float64)
    s = stats["s"].to_numpy()
    s2 = stats["s2"].to_numpy()
    mean = s / n
    # sample variance via the two-pass-equivalent closed form
    var = np.where(n > 1, (s2 - n * mean * mean) / np.maximum(n - 1, 1), 0.0)
    mean_map = dict(zip(stats[group_col], mean))
    sd_map = {g: float(np.sqrt(max(v, 0.0)))
              for g, v in zip(stats[group_col], var)}
    ref = ray.put((mean_map, sd_map))

    def flag(t: pa.Table) -> pa.Table:
        mm, sm = ray.get(ref)
        ser = t[group_col].to_pandas()
        v = pa.compute.cast(t[val_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        m = ser.map(mm).to_numpy(dtype=np.float64)
        sd = ser.map(sm).to_numpy(dtype=np.float64)
        keep = np.abs(v - m) > threshold * sd
        return t.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow")
