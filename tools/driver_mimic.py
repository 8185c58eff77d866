#!/usr/bin/env python3
"""Mimic the grading driver: run every __spark_entry__.queries() entry
AND its oracle_sql() in DuckDB over the same parquet tables, compare
row count / sorted-column value hash. Usage:

    python tools/driver_mimic.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(rows, cols):
    cols = sorted(cols)
    h = hashlib.sha256()
    canon = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        canon.append("|".join(vals))
    for line in sorted(canon):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from information_retrieval_spark.session import get_spark

    spark = get_spark(app_name="driver-mimic", master="local[8]",
                      shuffle_partitions=8)

    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        orel = con.execute(oracles[name])
        ocols = [d[0] for d in orel.description]
        orows = [dict(zip(ocols, row)) for row in orel.fetchall()]
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_schema and value_hash(srows, scols) == value_hash(orows, ocols)
        status = "OK " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:24s} rows={len(srows):7d}/{len(orows):<7d} "
              f"schema={'ok' if ok_schema else f'{sorted(scols)}!={sorted(ocols)}'} "
              f"hash={'ok' if ok_hash else 'MISMATCH'}  {status}")
    # flagship smoke
    if not only:
        edf = entrymod.entry(spark)
        erows = edf.collect()
        print(f"entry() flagship: {len(erows)} rows, schema={edf.columns}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
