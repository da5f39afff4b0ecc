"""Local simulator of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against the
DuckDB oracle the same way the driver does: row count, column names,
order-insensitive value hash (columns sorted by name, rows sorted).
Usage: python tools/driver_sim.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

# IR_SIM_SF_DIR overrides for soak runs (e.g. sf0.1); the stemmed-
# flagship dynamic oracle derives its vocab from SPARK_GRAFT_ORACLE_SF_DIR,
# which must point at the same dataset — set it here so they can't drift.
SF_DIR = os.environ.get("IR_SIM_SF_DIR", "/root/testdata/sf0.01")
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    import duckdb

    import __spark_entry__ as se
    from informationretrieval_en_people_cn_spark.session import get_spark

    spark = get_spark(app_name="driver-sim", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = se.queries()
    oracles = se.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows ({dt:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            failures.append(name)
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            continue
        a = normalize(srows, [c.lower() for c in scols])
        b = normalize(orows, [c.lower() for c in ocols])
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            failures.append(name)
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs {diff}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(a)} rows match ({dt:.1f}s)")
    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
