"""Local replica of the driver's correctness check: run every
``queries()`` entry at a scale factor and compare row-count + sorted
value frame against the DuckDB oracle. Usage:

    python tools/check_contract.py [sf_dir] [name1,name2,...]

The optional second argument restricts the sweep to the named queries
(and skips the entry() smoke check) — an iteration aid; the committed
round artifact is always the full unfiltered run.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from denrl_spark.session import get_spark

    spark = get_spark(8, extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    if only is None:
        df = e.entry(spark)
        print(f"entry: rows={df.count()} schema={df.schema.simpleString()}")

    qs, osql = e.queries(), e.oracle_sql()
    if only is not None:
        missing = [n for n in only if n not in qs]
        if missing:
            print(f"unknown queries: {missing}")
            return 1
        qs = {n: qs[n] for n in only}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in osql:
            print(f"ok   {name}: rows-only rows={len(sdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as ex:
            failures.append((name, f"oracle error: {ex}"))
            print(f"FAIL {name}: oracle error: {ex}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rowcount {len(sdf)} != {len(odf)}"))
            print(f"FAIL {name}: rowcount {len(sdf)} != {len(odf)}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"columns {list(a.columns)} != {list(b.columns)}"))
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            failures.append((name, f"{int(neq.sum())} differing rows"))
            print(f"FAIL {name}: {int(neq.sum())} differing rows of {len(a)}")
            print("  spark:", a[neq].head(3).to_dict("records"))
            print("  oracle:", b[neq].head(3).to_dict("records"))
            continue
        print(f"ok   {name}: rows={len(sdf)} value-match ({time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries ok; {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
