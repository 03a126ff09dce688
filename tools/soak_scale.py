"""10x-scale soak (round-4 verdict #5): run the two composed flagships
— curate_full and incremental_refresh — over an sf1-equivalent corpus
(sf0.1 documents replicated ``mult``x with distinct ids) and RECORD the
memory shape the 100-TB claim rests on: peak plasma (object store)
usage, spill volume, and driver peak RSS, sampled every second while
the pipelines run. Results go in BASELINE.md.

    python tools/soak_scale.py [mult] [num_cpus]

The replica corpus lands under /tmp keyed on FIXTURES_VERSION; doc ids
are ``d * mult + r`` so every id-derived planted structure (url families,
% arithmetic) stays collision-free and deterministic.
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd


def _build_corpus(src_sf: str, mult: int) -> str:
    from pappermate_ray.fixtures import FIXTURES_VERSION

    out = f"/tmp/soak_v{FIXTURES_VERSION}_x{mult}"
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(f"{out}", exist_ok=True)
    t = pq.read_table(f"{src_sf}/documents.parquet")

    def rep(t: pa.Table, r: int) -> pa.Table:
        ids = pa.compute.add(
            pa.compute.multiply(t["doc_id"], pa.scalar(mult, pa.int64())),
            pa.scalar(r, pa.int64()))
        return t.set_column(t.schema.get_field_index("doc_id"), "doc_id", ids)

    pq.write_table(
        pa.concat_tables([rep(t, r) for r in range(mult)]),
        f"{out}/documents.parquet")
    with open(marker, "w"):
        pass
    return out


class PlasmaSampler(threading.Thread):
    """1 Hz poll: peak object-store usage via the resource ledger
    (total − available ``object_store_memory``; verified against a
    known materialize) and cumulative spill via the session's
    ray_spilled_objects directory size (no grpc in this container, so
    ``memory_summary`` is unavailable)."""

    def __init__(self, spill_dirs: list):
        super().__init__(daemon=True)
        self.spill_dirs = spill_dirs
        self.peak_mib = 0.0
        self.spilled_mib = 0.0
        self._halt = threading.Event()

    def _spill_bytes(self) -> int:
        total = 0
        for d in self.spill_dirs:
            try:
                for f in os.listdir(d):
                    total += os.path.getsize(os.path.join(d, f))
            except OSError:
                pass
        return total

    def run(self):
        total = ray.cluster_resources().get("object_store_memory", 0.0)
        while not self._halt.is_set():
            try:
                avail = ray.available_resources().get(
                    "object_store_memory", total)
                self.peak_mib = max(self.peak_mib,
                                    (total - avail) / 1048576.0)
                self.spilled_mib = max(self.spilled_mib,
                                       self._spill_bytes() / 1048576.0)
            except Exception:
                pass
            self._halt.wait(1.0)

    def stop(self):
        self._halt.set()


def _driver_hwm_mib() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    soak_dir = _build_corpus("/root/testdata/sf0.1", mult)
    from pappermate_ray.queries import SQL_QUERIES

    import glob

    spill_dirs = glob.glob("/tmp/ray/session_latest/ray_spilled_objects*")
    results = {}
    for name in ("curate_full", "incremental_refresh"):
        sampler = PlasmaSampler(spill_dirs)
        sampler.start()
        t0 = time.time()
        ds = SQL_QUERIES[name](soak_dir)
        n = ds.count()
        wall = time.time() - t0
        stats_tail = ds.stats().splitlines()[-8:]
        sampler.stop()
        sampler.join(timeout=3)
        results[name] = {
            "rows": n, "wall_s": round(wall, 1),
            "peak_plasma_mib": sampler.peak_mib,
            "spilled_mib": sampler.spilled_mib,
            "stats_tail": stats_tail,
        }

    results["driver_peak_rss_mib"] = round(_driver_hwm_mib(), 1)
    results["mult"] = mult
    results["num_cpus"] = ncpu
    results["n_docs"] = 5000 * mult
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
