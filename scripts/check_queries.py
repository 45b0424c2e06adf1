#!/usr/bin/env python
"""Spot-check named queries against their oracles (dev loop helper).

Usage: python scripts/check_queries.py name1 name2 ... [--sf DIR]
Runs the same rows/schema/hash comparison as scripts/full_sweep.py but
only for the named queries, at sf0.001 by default (fast dev loop).
"""

from __future__ import annotations

import os
import sys

repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo_root)

from scripts.full_sweep import TABLES, _hash_rows  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("polar_spark_check")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    bad = 0
    for name in args:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            bad += 1
            continue
        sdf = qs[name](spark, sf_dir)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(osql[name])
        dcols = [d[0].lower() for d in res.description]
        drows = res.fetchall()
        ok_schema = scols == dcols
        ok_rows = len(srows) == len(drows)
        ok_hash = _hash_rows(scols, srows) == _hash_rows(dcols, drows)
        ok = ok_schema and ok_rows and ok_hash
        print(
            f"{name}: {'OK' if ok else 'FAIL'}"
            f" rows={len(srows)}/{len(drows)} schema={ok_schema} hash={ok_hash}"
        )
        if not ok:
            bad += 1
            print("  spark:", sorted(srows)[:4])
            print("  duck :", sorted(drows)[:4])
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
