"""Profile pipeline variants at a given CPU count. Usage:
python tools/profile_pipeline.py <num_cpus> <variant: actors|fixed|tasks>"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ncpu = int(sys.argv[1])
    variant = sys.argv[2]
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False

    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.fixtures import pages_batch_from_documents
    from pappermate_ray.stages.extract import add_size_bucket, extract_pages_batch
    from pappermate_ray.stages.parse import ContractParse
    from pappermate_ray.stages.spans import EntitySpans

    sf_dir = "/root/testdata/sf0.1"
    R = 10

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"],
                           override_num_blocks=ncpu * 4)

    def replicate(t: pa.Table) -> pa.Table:
        tabs = []
        for r in range(R):
            ids = pa.array([d * R + r for d in t["doc_id"].to_pylist()], pa.int64())
            tabs.append(pa.table({"doc_id": ids, "text": t["text"], "lang": t["lang"]}))
        return pa.concat_tables(tabs)

    pages = docs.map_batches(replicate, batch_format="pyarrow", batch_size=32).map_batches(
        pages_batch_from_documents, batch_format="pyarrow", batch_size=256
    )

    ds = pages.map_batches(add_size_bucket, batch_format="pyarrow", batch_size=128)
    ds = ds.map_batches(extract_pages_batch, batch_format="pyarrow", batch_size=128)
    if variant == "actors":
        ds = ds.map_batches(ContractParse, batch_format="pyarrow", batch_size=128, concurrency=(1, ncpu))
        ds = ds.map_batches(EntitySpans, batch_format="pyarrow", batch_size=128, concurrency=(1, ncpu))
    elif variant == "fixed":
        ds = ds.map_batches(ContractParse, batch_format="pyarrow", batch_size=128, concurrency=ncpu)
        ds = ds.map_batches(EntitySpans, batch_format="pyarrow", batch_size=128, concurrency=ncpu)
    else:  # tasks
        parse = ContractParse()
        spans = EntitySpans()
        ds = ds.map_batches(parse.__call__, batch_format="pyarrow", batch_size=128)
        ds = ds.map_batches(spans.__call__, batch_format="pyarrow", batch_size=128)
    flat = ds.drop_columns(["blocks", "entities"])

    t0 = time.perf_counter()
    out = f"/tmp/profile_out_{ncpu}_{variant}"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    flat.write_parquet(out)
    dt = time.perf_counter() - t0
    print(f"RESULT {variant} ncpu={ncpu}: {dt:.2f}s  ({50000/dt:.0f} docs/s)")
    stats = flat.stats()
    print(stats[:3000])
    ray.shutdown()


if __name__ == "__main__":
    main()
