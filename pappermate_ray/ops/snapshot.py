"""Crawl snapshot diff — which urls were added, removed, or changed
between two crawl snapshots (the CDX-index maintenance step that feeds
incremental recrawl queues and delta-dedup, next to ops/bloom.py's
incremental ingest).

ONE exchange total: both snapshots tag themselves (old=0 / new=1) in a
streaming pass, the tagged union hash-partitions by url
(ops/grouping.py — partition-sized groups, never a per-url pandas
group), and each partition classifies its url runs vectorized:

    run of 1, side 1  → added
    run of 1, side 0  → removed
    run of 2, digests differ → changed
    run of 2, digests equal  → unchanged (dropped — at crawl scale the
                               overwhelming majority, so the output is
                               delta-sized)

Only (url, side, digest) enter the exchange — payloads never move.
Each side must be url-unique (run ``latest_by_url`` first; a duplicated
url inside one snapshot raises in the group fn rather than
misclassifying).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .grouping import partition_grouped


def snapshot_diff(
    old: "rd.Dataset",
    new: "rd.Dataset",
    key_col: str = "url",
    digest_col: str = "digest",
    num_partitions: Optional[int] = None,
) -> "rd.Dataset":
    """``(key_col, status, old_digest, new_digest)`` for every url that
    is not bit-identical across the snapshots; status ∈ {'added',
    'removed', 'changed'} (absent digests are '')."""

    def tag(side: int):
        def _t(t: pa.Table) -> pa.Table:
            return pa.table({
                key_col: pa.compute.cast(t[key_col], pa.string()),
                "digest": pa.compute.cast(t[digest_col], pa.string()),
                "side": pa.array(np.full(t.num_rows, side, np.int64), pa.int64()),
            })
        return _t

    tagged = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow"))

    def classify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, "side"], kind="mergesort")
        keys = g[key_col].to_numpy()
        side = g["side"].to_numpy()
        dig = g["digest"].to_numpy()
        change = np.ones(len(g), bool)
        change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        runlen = np.diff(np.append(starts, len(g)))
        if (runlen > 2).any():
            bad = keys[starts[runlen > 2][0]]
            raise ValueError(
                f"snapshot_diff: url {bad!r} appears multiple times inside "
                "one snapshot — run latest_by_url per side first")
        out_k, out_s, out_od, out_nd = [], [], [], []
        singles = starts[runlen == 1]
        if len(singles):
            added = side[singles] == 1
            out_k.append(keys[singles])
            out_s.append(np.where(added, "added", "removed"))
            out_od.append(np.where(added, "", dig[singles]))
            out_nd.append(np.where(added, dig[singles], ""))
        pairs = starts[runlen == 2]
        if len(pairs):
            # sorted by side within the run: [old, new]
            od, nd = dig[pairs], dig[pairs + 1]
            if (side[pairs] != 0).any() or (side[pairs + 1] != 1).any():
                raise ValueError("snapshot_diff: duplicated url within one side")
            diff = od != nd
            out_k.append(keys[pairs][diff])
            out_s.append(np.full(int(diff.sum()), "changed", dtype=object))
            out_od.append(od[diff])
            out_nd.append(nd[diff])
        if not out_k:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="str"),
                "status": pd.Series([], dtype="str"),
                "old_digest": pd.Series([], dtype="str"),
                "new_digest": pd.Series([], dtype="str"),
            })
        return pd.DataFrame({
            key_col: np.concatenate(out_k),
            "status": np.concatenate(out_s),
            "old_digest": np.concatenate(out_od),
            "new_digest": np.concatenate(out_nd),
        })

    grouped, pkey = partition_grouped(tagged, [key_col], npart=num_partitions)
    return grouped.groupby(pkey).map_groups(classify, batch_format="pandas")


def recrawl_priority(
    obs: "rd.Dataset",
    key_col: str = "url",
    snap_col: str = "snap",
    digest_col: str = "digest",
    num_partitions: Optional[int] = None,
    hot_permille: int = 500,
    warm_permille: int = 200,
) -> "rd.Dataset":
    """Recrawl scheduling from a K-snapshot observation history — the
    change-rate policy (Cho & Garcia-Molina 2003: pages that changed
    often get refetched first): ``(key_col, n_obs, n_changes,
    priority)`` per url, priority ∈ {'new', 'hot', 'warm', 'cold'}.

    ``obs`` holds one row per (url, snapshot) OBSERVATION with the
    content digest at that snapshot (the CDX-index shape; gaps — urls
    absent from middle snapshots — are fine: changes are counted
    between consecutive OBSERVED appearances). ``n_changes`` = number
    of consecutive observed pairs whose digests differ. The priority
    rule is integer-exact so the SQL mirror cannot drift:

        n_obs == 1                                   → 'new'
        1000·n_changes ≥ hot_permille ·(n_obs − 1)   → 'hot'
        1000·n_changes ≥ warm_permille·(n_obs − 1)   → 'warm'
        else                                         → 'cold'

    Scale shape = snapshot_diff's: only (url, snap, digest) rows enter
    the ONE partition-grouped exchange (payloads never move; S
    snapshots cost one exchange, not S−1 pairwise diffs), and each
    partition scores all its url runs vectorized. A duplicated
    (url, snap) observation raises rather than miscounting."""

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: pa.compute.cast(t[key_col], pa.string()),
            snap_col: pa.compute.cast(t[snap_col], pa.int64()),
            "digest": pa.compute.cast(t[digest_col], pa.string()),
        })

    def score(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, snap_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        snaps = g[snap_col].to_numpy()
        dig = g["digest"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="str"),
                "n_obs": pd.Series([], dtype=np.int64),
                "n_changes": pd.Series([], dtype=np.int64),
                "priority": pd.Series([], dtype="str"),
            })
        new_run = np.ones(n, bool)
        new_run[1:] = keys[1:] != keys[:-1]
        same = ~new_run[1:]
        if (same & (snaps[1:] == snaps[:-1])).any():
            bad = keys[1:][same & (snaps[1:] == snaps[:-1])][0]
            raise ValueError(
                f"recrawl_priority: url {bad!r} observed twice in one "
                "snapshot — run latest_by_url per snapshot first")
        chg = np.zeros(n, np.int64)
        chg[1:] = (same & (dig[1:] != dig[:-1])).astype(np.int64)
        starts = np.flatnonzero(new_run)
        n_obs = np.diff(np.append(starts, n)).astype(np.int64)
        n_changes = np.add.reduceat(chg, starts).astype(np.int64)
        denom = n_obs - 1
        pr = np.where(
            denom == 0, "new",
            np.where(1000 * n_changes >= hot_permille * denom, "hot",
                     np.where(1000 * n_changes >= warm_permille * denom,
                              "warm", "cold")))
        return pd.DataFrame({
            key_col: keys[starts],
            "n_obs": n_obs,
            "n_changes": n_changes,
            "priority": pr,
        })

    tall = obs.map_batches(narrow, batch_format="pyarrow")
    grouped, pkey = partition_grouped(tall, [key_col], npart=num_partitions)
    return grouped.groupby(pkey).map_groups(score, batch_format="pandas")


def content_change_rate_joins(
    obs: "rd.Dataset",
    key_col: str = "url",
    snap_col: str = "snap",
    text_col: str = "text",
    round_to: int = 6,
    num_partitions: Optional[int] = None,
) -> "rd.Dataset":
    """Join-cascade formulation of :func:`content_change_rate` (the
    round-4 shape, kept as the cross-check twin — the single-exchange
    rewrite below is asserted identical in tests): pair skeleton via a
    partition-grouped lead, intersections via two armored hash joins
    over narrow (url, snap, word) rows plus one grouped count. Word
    rows ride exchanges twice here vs once in the rewrite."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .joins import hash_join

    def _word_df(t: pa.Table):
        words = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(pc.cast(t[text_col], pa.string())))
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(t.num_rows), lens)
        df = pd.DataFrame({
            key_col: pc.cast(t[key_col], pa.string())
                       .to_numpy(zero_copy_only=False)[parent],
            snap_col: t[snap_col].to_numpy(zero_copy_only=False)
                        .astype(np.int64)[parent],
            "word": pc.list_flatten(words).to_numpy(zero_copy_only=False),
            "_row": parent,
        })
        return df[df["word"] != ""]

    def wordify(t: pa.Table) -> pa.Table:
        df = _word_df(t).drop_duplicates([key_col, snap_col, "word"])
        return pa.table({
            key_col: pa.array(df[key_col].to_numpy(), pa.string()),
            snap_col: pa.array(df[snap_col].to_numpy(), pa.int64()),
            "word": pa.array(df["word"].to_numpy(), pa.string()),
        })

    def sized(t: pa.Table) -> pa.Table:
        df = _word_df(t)
        nw = np.zeros(t.num_rows, np.int64)
        if len(df):
            per = df.groupby("_row")["word"].nunique()
            nw[per.index.to_numpy()] = per.to_numpy()
        return pa.table({
            key_col: pc.cast(t[key_col], pa.string()),
            snap_col: pc.cast(t[snap_col], pa.int64()),
            "nw": pa.array(nw, pa.int64()),
        })

    words = obs.map_batches(wordify, batch_format="pyarrow")
    sizes = obs.map_batches(sized, batch_format="pyarrow")
    word_schema = pa.schema([(key_col, pa.string()),
                             (snap_col, pa.int64()),
                             ("word", pa.string())])
    pair_schema = pa.schema([
        (key_col, pa.string()), ("snap_prev", pa.int64()),
        ("snap_next", pa.int64()), ("nw_prev", pa.int64()),
        ("nw_next", pa.int64())])

    def lead(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, snap_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        snaps = g[snap_col].to_numpy()
        nw = g["nw"].to_numpy()
        n = len(g)
        same = np.zeros(n, bool)
        if n > 1:
            same[:-1] = keys[:-1] == keys[1:]
            dup = same[:-1] & (snaps[:-1] == snaps[1:])
            if dup.any():
                raise ValueError(
                    f"content_change_rate: url {keys[:-1][dup][0]!r} "
                    "observed twice in one snapshot — run latest_by_url "
                    "per snapshot first")
        idx = np.flatnonzero(same)
        return pd.DataFrame({
            key_col: keys[idx],
            "snap_prev": snaps[idx].astype(np.int64),
            "snap_next": snaps[idx + 1].astype(np.int64),
            "nw_prev": nw[idx].astype(np.int64),
            "nw_next": nw[idx + 1].astype(np.int64),
        })

    grouped, pkey = partition_grouped(sizes, [key_col],
                                      npart=num_partitions)
    pairs = grouped.groupby(pkey).map_groups(
        lead, batch_format="pandas").materialize()

    probe = hash_join(
        words,
        pairs.map_batches(
            lambda t: pa.table({key_col: t[key_col],
                                "snap_prev": t["snap_prev"],
                                "snap_next": t["snap_next"]}),
            batch_format="pyarrow"),
        on=(key_col, snap_col), right_on=(key_col, "snap_prev"),
        num_partitions=num_partitions,
        left_schema=word_schema,
        right_schema=pa.schema([(key_col, pa.string()),
                                ("snap_prev", pa.int64()),
                                ("snap_next", pa.int64())]),
    ).map_batches(
        lambda t: pa.table({key_col: t[key_col],
                            snap_col: t["snap_next"],
                            "word": t["word"],
                            "snap_prev": t[snap_col]}),
        batch_format="pyarrow")

    inter = hash_join(
        probe, words, on=(key_col, snap_col, "word"),
        num_partitions=num_partitions,
        left_schema=pa.schema([(key_col, pa.string()),
                               (snap_col, pa.int64()),
                               ("word", pa.string()),
                               ("snap_prev", pa.int64())]),
        right_schema=word_schema,
    ).groupby([key_col, "snap_prev"]).aggregate(
        Count(alias_name="n_inter"))

    joined = hash_join(
        pairs, inter, on=(key_col, "snap_prev"),
        join_type="left_outer", num_partitions=num_partitions,
        left_schema=pair_schema,
        right_schema=pa.schema([(key_col, pa.string()),
                                ("snap_prev", pa.int64()),
                                ("n_inter", pa.int64())]),
    )

    def fin(t: pa.Table) -> pa.Table:
        ni = pa.compute.fill_null(t["n_inter"], 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        nwp = t["nw_prev"].to_numpy(zero_copy_only=False).astype(np.int64)
        nwn = t["nw_next"].to_numpy(zero_copy_only=False).astype(np.int64)
        union = nwp + nwn - ni
        with np.errstate(divide="ignore", invalid="ignore"):
            change = np.where(
                union > 0,
                1.0 - ni / np.where(union > 0, union, 1).astype(np.float64),
                0.0)
        return pa.table({
            key_col: t[key_col],
            "snap_prev": t["snap_prev"],
            "snap_next": t["snap_next"],
            "nw_prev": t["nw_prev"],
            "nw_next": t["nw_next"],
            "n_inter": pa.array(ni, pa.int64()),
            "change": pa.array(np.round(change, round_to), pa.float64()),
        })

    return joined.map_batches(fin, batch_format="pyarrow")


def content_change_rate(
    obs: "rd.Dataset",
    key_col: str = "url",
    snap_col: str = "snap",
    text_col: str = "text",
    round_to: int = 6,
    num_partitions: Optional[int] = None,
) -> "rd.Dataset":
    """Content-granular change rate between consecutive crawl snapshots
    — the refinement of ``recrawl_priority``'s binary digest-changed
    signal (a fixed typo and a full rewrite both flip the digest; a
    scheduler wants to know WHICH): per consecutive observed pair of a
    url, the word-set Jaccard distance ``(key_col, snap_prev,
    snap_next, nw_prev, nw_next, n_inter, change)`` where ``change =
    1 − |W_prev ∩ W_next| / |W_prev ∪ W_next|`` over the DISTINCT
    whitespace words of each capture (two empty captures → 0.0).

    ``obs`` holds one row per (url, snapshot) observation with the
    captured text (gaps fine — pairs form between consecutive OBSERVED
    snapshots); a duplicated (url, snap) raises rather than mispairing.

    Scale shape (round-5 single-exchange rewrite; the join-cascade twin
    ``content_change_rate_joins`` is asserted identical in tests): the
    per-capture DISTINCT word rows and the (url, snap, nw) size rows —
    both computed in-batch, the text payload never rides any exchange —
    union into ONE partition-grouped exchange keyed on the url, so a
    url's every capture co-locates. Inside each partition, one
    vectorized pass builds the consecutive-pair skeleton from the size
    rows (observation RANK per url) and counts intersections by
    rank-adjacency: a word occurring at ranks r and r+1 of the same url
    contributes to pair r — a lexsort + run-diff, no joins anywhere.
    Word rows ride exactly one exchange (the join formulation shipped
    them twice plus three more exchanges for skeleton/count/attach)."""
    import pyarrow.compute as pc

    from .grouping import partition_grouped

    def _word_df(t: pa.Table):
        words = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(pc.cast(t[text_col], pa.string())))
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(t.num_rows), lens)
        df = pd.DataFrame({
            key_col: pc.cast(t[key_col], pa.string())
                       .to_numpy(zero_copy_only=False)[parent],
            snap_col: t[snap_col].to_numpy(zero_copy_only=False)
                        .astype(np.int64)[parent],
            "word": pc.list_flatten(words).to_numpy(zero_copy_only=False),
        })
        return df[df["word"] != ""]

    def tagged_rows(t: pa.Table) -> pa.Table:
        # word rows (distinct per capture) + one size row per capture;
        # size rows carry word='' (never a real word — filtered above)
        # and nw; word rows carry nw=-1
        wdf = _word_df(t).drop_duplicates([key_col, snap_col, "word"])
        per = wdf.groupby([key_col, snap_col]).size() if len(wdf) else None
        urls = pc.cast(t[key_col], pa.string()).to_pylist()
        snaps = t[snap_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nw = np.zeros(t.num_rows, np.int64)
        if per is not None and len(per):
            lut = per.to_dict()
            nw[:] = [lut.get((u, int(s)), 0) for u, s in zip(urls, snaps)]
        return pa.table({
            key_col: pa.array(list(wdf[key_col]) + urls, pa.string()),
            snap_col: pa.array(
                np.concatenate([wdf[snap_col].to_numpy(np.int64),
                                snaps]) if len(wdf)
                else snaps, pa.int64()),
            "word": pa.array(list(wdf["word"]) + [""] * t.num_rows,
                             pa.string()),
            "nw": pa.array(
                np.concatenate([np.full(len(wdf), -1, np.int64), nw])
                if len(wdf) else nw, pa.int64()),
        })

    tall = obs.map_batches(tagged_rows, batch_format="pyarrow")
    grouped, pkey = partition_grouped(tall, [key_col],
                                      npart=num_partitions)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key_col: pd.Series([], dtype="str"),
            "snap_prev": pd.Series([], dtype=np.int64),
            "snap_next": pd.Series([], dtype=np.int64),
            "nw_prev": pd.Series([], dtype=np.int64),
            "nw_next": pd.Series([], dtype=np.int64),
            "n_inter": pd.Series([], dtype=np.int64),
            "change": pd.Series([], dtype=np.float64),
        })
        if not len(g):
            return empty
        is_size = g["nw"].to_numpy() >= 0
        sz = g[is_size].sort_values([key_col, snap_col], kind="mergesort")
        u = sz[key_col].to_numpy()
        s = sz[snap_col].to_numpy(np.int64)
        nw = sz["nw"].to_numpy(np.int64)
        n = len(sz)
        new_url = np.ones(n, bool)
        new_url[1:] = u[1:] != u[:-1]
        same = ~new_url
        if n > 1 and (same[1:] & (s[1:] == s[:-1])).any():
            bad = u[1:][same[1:] & (s[1:] == s[:-1])][0]
            raise ValueError(
                f"content_change_rate: url {bad!r} observed twice in "
                "one snapshot — run latest_by_url per snapshot first")
        # observation rank within each url run
        starts = np.flatnonzero(new_url)
        rank = np.arange(n) - np.repeat(starts, np.diff(
            np.append(starts, n)))
        # pair skeleton: every (rank r, r+1) within a url run — the
        # prev-observation position of each consecutive pair
        prev_pos = (np.flatnonzero(~new_url) - 1 if n > 1
                    else np.array([], np.int64))
        # map (url, snap) -> global observation position for word rows
        wr = g[~is_size]
        n_inter = np.zeros(n, np.int64)  # indexed by prev observation pos
        if len(wr):
            upk = pd.MultiIndex.from_arrays([u, s])
            lut = pd.Series(np.arange(n), index=upk)
            wpos = lut.loc[pd.MultiIndex.from_arrays(
                [wr[key_col].to_numpy(), wr[snap_col].to_numpy(np.int64)]
            )].to_numpy()
            order = np.lexsort((rank[wpos],
                                wr["word"].to_numpy(),
                                wr[key_col].to_numpy()))
            ww = wr["word"].to_numpy()[order]
            wu = wr[key_col].to_numpy()[order]
            wrk = rank[wpos][order]
            wp = wpos[order]
            if len(ww) > 1:
                adj = (wu[1:] == wu[:-1]) & (ww[1:] == ww[:-1]) \
                    & (wrk[1:] == wrk[:-1] + 1)
                np.add.at(n_inter, wp[:-1][adj], 1)
        if not len(prev_pos):
            return empty
        ni = n_inter[prev_pos]
        nwp = nw[prev_pos]
        nwn = nw[prev_pos + 1]
        union = nwp + nwn - ni
        with np.errstate(divide="ignore", invalid="ignore"):
            change = np.where(
                union > 0,
                1.0 - ni / np.where(union > 0, union, 1).astype(np.float64),
                0.0)
        return pd.DataFrame({
            key_col: u[prev_pos],
            "snap_prev": s[prev_pos],
            "snap_next": s[prev_pos + 1],
            "nw_prev": nwp,
            "nw_next": nwn,
            "n_inter": ni,
            "change": np.round(change, round_to),
        })

    return grouped.groupby(pkey).map_groups(score, batch_format="pandas")
