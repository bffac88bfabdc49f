"""Gate harness: run every queries() entry vs its oracle_sql() through
DuckDB (driver-style compare: sorted columns, sorted value tuples,
csv-md5 hash).
Usage: python scripts/gate_check.py [sf_dir] [--only name1,name2]"""
import hashlib
import sys
import time

import duckdb
import pandas as pd

ONLY = None
argv = list(sys.argv[1:])
if "--only" in argv:
    i = argv.index("--only")
    ONLY = set(argv[i + 1].split(","))
    del argv[i:i + 2]
SF = argv[0] if argv else "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

e = E.entry()
n = e.count() if hasattr(e, "count") else len(e)
print(f"entry(): {n} rows OK")

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

Q, O = E.queries(), E.oracle_sql()


def norm(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


fails = []
for name, fn in Q.items():
    if ONLY is not None and name not in ONLY:
        continue
    t0 = time.time()
    try:
        res = fn(SF)
        df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        if hasattr(df, "to_pandas"):
            df = df.to_pandas()
        if name not in O:
            print(f"{name}: rows-only {len(df)} ({time.time()-t0:.1f}s)")
            continue
        odf = con.sql(O[name]).df()
        ok_rows = len(df) == len(odf)
        ok_schema = sorted(df.columns) == sorted(odf.columns)
        ok_hash = ok_schema and norm(df) == norm(odf)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{name}: {status} rows={len(df)}/{len(odf)} "
              f"schema={ok_schema} hash={ok_hash} ({time.time()-t0:.1f}s)")
    except Exception as ex:
        fails.append(name)
        print(f"{name}: ERR {type(ex).__name__}: {ex}")

ran = len(Q) if ONLY is None else len(ONLY & set(Q))
print(f"\n{ran - len(fails)}/{ran} green; fails: {fails}")
ray.shutdown()
sys.exit(1 if fails else 0)
