"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count + schema + order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])


def norm_cell(v):
    if isinstance(v, float):
        return repr(v)          # full precision: bit-exactness is the goal
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame_fingerprint(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(norm_cell(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(df), cols, h


def main():
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        sn, sc, sh = frame_fingerprint(sdf)
        on, oc, oh = frame_fingerprint(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name}: spark={sn} oracle={on} rows, "
              f"hash {'=' if sh == oh else '!='} ({time.time()-t0:.1f}s)")
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"     cols spark={sc} oracle={oc}")
            elif sn == on:
                # find first differing row for debugging
                a = sorted(tuple(norm_cell(v) for v in r)
                           for r in sdf[sorted(sdf.columns)].itertuples(index=False, name=None))
                b = sorted(tuple(norm_cell(v) for v in r)
                           for r in odf[sorted(odf.columns)].itertuples(index=False, name=None))
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"     first diff row {i}:\n      spark  {x}\n      oracle {y}")
                        break
    print("\n%d failures" % len(failures), failures)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
