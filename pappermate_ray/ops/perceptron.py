"""Distributed batch-perceptron training (quality-classifier primitive).

Web-corpus curation ends with a learned quality classifier (CCNet's
fastText LM filter, RefinedWeb's rule stack); the distributed-training
shape every such linear model uses is: broadcast the weight vector,
stream the corpus once per round computing per-block partial gradient
sums, reduce O(blocks × d) partials, update on the driver. This module
implements the integer-exact member of that family — Rosenblatt's batch
perceptron, ``w ← w + Σ_{misclassified} y·x`` — chosen because with
integer features the whole training trajectory is integer arithmetic:
bit-reproducible across block orders, partitionings, AND the SQL
oracle (no float summation-order drift, the same reason
ops/normalize.py uses integer moments).

Scale shape (the ops/kmeans.py pattern applied to model training):
- features are a narrow projected Dataset, materialized once and
  re-read per round — the corpus is never shuffled;
- the weight vector (d+1 ints) ships per round in the task closure;
- each block emits ONE partial row (d+1 update sums + misclassified
  count); the reduce is ``Dataset.aggregate(Sum...)`` over
  O(blocks) rows — no all-to-all, no driver materialization of data.

Updates are summed over ALL misclassified rows per round (batch
perceptron, lr = 1), which is what makes the round order-independent —
per-row sequential updates (online perceptron) would not be
reproducible under Ray's nondeterministic block order.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Sum


def train_perceptron(
    ds: "ray.data.Dataset",
    feature_cols: Sequence[str],
    label_col: str,
    rounds: int,
) -> Tuple[pa.Table, List[int]]:
    """Train for ``rounds`` batch updates over integer features.

    ``label_col`` must hold ±1. A bias feature (constant 1) is
    prepended automatically. Returns (history table with one row per
    round: ``round``, ``w0..wd`` post-update, ``miss`` = misclassified
    count under the PRE-update weights; final weight list).
    """
    cols = list(feature_cols)
    feats = ds.select_columns(cols + [label_col]).materialize()
    d = len(cols) + 1  # +1 bias
    w = [0] * d
    history = []
    for r in range(1, rounds + 1):
        w_now = list(w)  # freeze for the closure

        def partial(t: pa.Table, _w=w_now) -> pa.Table:
            x = np.column_stack(
                [np.ones(t.num_rows, np.int64)]
                + [t[c].to_numpy(zero_copy_only=False).astype(np.int64)
                   for c in cols]
            )
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
            scores = x @ np.asarray(_w, np.int64)
            bad = (y * scores) <= 0
            upd = (y[bad, None] * x[bad]).sum(axis=0, dtype=np.int64)
            out = {f"d{j}": pa.array([int(upd[j])], pa.int64())
                   for j in range(d)}
            out["miss"] = pa.array([int(bad.sum())], pa.int64())
            return pa.table(out)

        agg = feats.map_batches(partial, batch_format="pyarrow").aggregate(
            *[Sum(f"d{j}", alias_name=f"d{j}") for j in range(d)],
            Sum("miss", alias_name="miss"),
        )
        miss = int(agg["miss"])
        w = [w[j] + int(agg[f"d{j}"]) for j in range(d)]
        history.append((r, *w, miss))
        if miss == 0:
            # converged: further rounds are identity updates
            history.extend((rr, *w, 0) for rr in range(r + 1, rounds + 1))
            break

    hist = pa.table({
        "round": pa.array([h[0] for h in history], pa.int64()),
        **{f"w{j}": pa.array([h[1 + j] for h in history], pa.int64())
           for j in range(d)},
        "miss": pa.array([h[-1] for h in history], pa.int64()),
    })
    return hist, w


def classify(
    ds: "ray.data.Dataset",
    feature_cols: Sequence[str],
    weights: Sequence[int],
) -> "ray.data.Dataset":
    """Streaming inference: append ``score = w·[1, x]`` (int64) to every
    row. The weight vector rides in the task closure (d+1 ints — no
    broadcast object needed); one map_batches pass, no shuffle. Callers
    filter on the score (``> 0`` = predicted positive)."""
    cols = list(feature_cols)
    w = [int(v) for v in weights]
    if len(w) != len(cols) + 1:
        raise ValueError(f"need {len(cols) + 1} weights (bias first), got {len(w)}")

    def score(t: pa.Table) -> pa.Table:
        x = np.column_stack(
            [np.ones(t.num_rows, np.int64)]
            + [t[c].to_numpy(zero_copy_only=False).astype(np.int64)
               for c in cols]
        )
        s = x @ np.asarray(w, np.int64)
        return t.append_column("score", pa.array(s, pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow")
