"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 on Spark AND its oracle_sql()
in DuckDB, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from qsvspark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent oracles (IVF centroids are trained from the
    # embeddings table) must bake constants from the SAME sf as the
    # Spark side — the driver's gate runs at the sf0.01 default
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    spark = get_spark("oracle-check", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failed.append(name)
            continue
        ok = True
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
            ok = False
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={scols} duckdb={ocols}")
            ok = False
        if ok:
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            sset = sorted(tuple(r[i] for i in sidx) for r in srows)
            oset = sorted(tuple(r[i] for i in oidx) for r in orows)
            if sset != oset:
                diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs {diff}")
                ok = False
        if ok:
            print(f"OK   {name}: {len(srows)} rows")
        else:
            failed.append(name)
    print(f"\n{'ALL PASS' if not failed else 'FAILED: ' + ', '.join(failed)}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
