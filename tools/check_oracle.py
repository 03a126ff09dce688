"""Local mimic of the driver's correctness gate: run each Ray query and its
DuckDB oracle side-by-side, compare row count + schema + order-insensitive
value hash. Usage: python tools/check_oracle.py [sf_dir] [query ...]
(with query names given, only those gate entries run)"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        tbs = list(res.iter_batches(batch_size=65536, batch_format="pyarrow"))
        return pa.concat_tables(tbs).to_pandas() if tbs else pd.DataFrame()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False

    from pappermate_ray.queries import ORACLE_SQL, SQL_QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = SQL_QUERIES if not only else {n: SQL_QUERIES[n] for n in only}
    failures = []
    for name, fn in queries.items():
        try:
            got = norm(to_pandas(fn(sf_dir)))
            want = norm(con.execute(ORACLE_SQL[name]).df())
            ok_rows = len(got) == len(want)
            ok_schema = list(got.columns) == list(want.columns)
            ok_vals = ok_rows and ok_schema and value_hash(got) == value_hash(want)
            status = "OK " if (ok_rows and ok_schema and ok_vals) else "FAIL"
            print(f"{status} {name}: rows {len(got)}/{len(want)} schema={ok_schema} values={ok_vals}")
            if status == "FAIL":
                failures.append(name)
                print("  got:\n", got.head(5).to_string())
                print("  want:\n", want.head(5).to_string())
                print("  got dtypes:", dict(got.dtypes.astype(str)))
                print("  want dtypes:", dict(want.dtypes.astype(str)))
        except Exception as e:
            failures.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    ray.shutdown()
    print(f"\n{len(queries) - len(failures)}/{len(queries)} queries match; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2:] or None))
