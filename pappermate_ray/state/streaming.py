"""Keyed incremental state over an ordered log — the raw-actor tier.

Ray Data has no event-time windows/watermarks; ordered incremental
semantics are expressed as (a) groupby + per-group pandas when the whole
key history fits a group (pipelines use that), or (b) THIS module when
state must persist across an unbounded stream: a pool of ``@ray.remote``
actors, each owning a hash bucket of keys, fed batches in event-time
order. The last-resort tier from the build rules — used only where the
Dataset API genuinely can't express the semantics.

Determinism: bucket = fnv1a64(key) % n_actors; batches are delivered in
caller-controlled order; per-actor state is a plain dict.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import ray

from ..functions.quality import fnv1a64


@ray.remote
class KeyedAggregator:
    """Owns running (count, sum) per key for one hash bucket."""

    def __init__(self) -> None:
        self.state: Dict[Any, Tuple[int, float]] = {}

    def update(self, rows: List[Tuple[Any, float]]) -> None:
        st = self.state
        for key, value in rows:
            n, s = st.get(key, (0, 0.0))
            st[key] = (n + 1, s + value)

    def snapshot(self) -> Dict[Any, Tuple[int, float]]:
        return dict(self.state)


class KeyedStreamState:
    """Driver-side facade: route rows to bucket actors, snapshot on demand."""

    def __init__(self, n_actors: int = 4):
        self.actors = [KeyedAggregator.remote() for _ in range(n_actors)]
        self.n = n_actors

    def _bucket(self, key: Any) -> int:
        return fnv1a64(str(key).encode("utf-8")) % self.n

    def feed(self, rows: List[Tuple[Any, float]]) -> None:
        buckets: Dict[int, List[Tuple[Any, float]]] = {}
        for row in rows:
            buckets.setdefault(self._bucket(row[0]), []).append(row)
        ray.get([self.actors[b].update.remote(rs) for b, rs in buckets.items()])

    def snapshot(self) -> Dict[Any, Tuple[int, float]]:
        out: Dict[Any, Tuple[int, float]] = {}
        for snap in ray.get([a.snapshot.remote() for a in self.actors]):
            out.update(snap)
        return out

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
