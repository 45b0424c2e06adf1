#!/usr/bin/env python
"""Full-registry oracle sweep — the driver's CORRECTNESS comparison
(row count + schema + order-insensitive value hash) over EVERY
registered query, not just the driver's 50-row window.  Output:
SWEEP_r{N}.json next to the per-round artifacts so the judge can diff
the artifact of record for queries outside the driver window.

Usage: python scripts/full_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 9)
        return 0.0 if r == 0.0 else r  # collapse -0.0 (repr differs)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _hash_rows(cols, rows):
    # sort columns by name, then rows — the driver's order-insensitive hash
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(_canon(r[i])) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SWEEP_r5.json"

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    if not os.path.isabs(out_path):
        out_path = os.path.join(repo_root, out_path)

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("polar_spark_full_sweep")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    t_start = time.monotonic()
    for i, name in enumerate(qs):
        rec: dict[str, object] = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = qs[name](spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            if name in osql:
                res = con.execute(osql[name])
                dcols = [d[0].lower() for d in res.description]
                drows = res.fetchall()
                rec["spark_rows"], rec["oracle_rows"] = len(srows), len(drows)
                rec["rows_match"] = len(srows) == len(drows)
                rec["schema_match"] = scols == dcols
                rec["hash_match"] = _hash_rows(scols, srows) == _hash_rows(dcols, drows)
            else:
                rec["spark_rows"] = len(srows)
                rec["rows_match"] = len(srows) >= 0
        except Exception as e:  # noqa: BLE001 — sweep must record, not die
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        results[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        print(f"[{i+1}/{len(qs)}] {name}: {'OK' if ok else rec}", flush=True)
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(qs),
        "n_green": sum(
            1
            for r in results.values()
            if r["rows_match"] and r["schema_match"] and r["hash_match"]
        ),
        "wall_sec": round(time.monotonic() - t_start, 1),
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    return 0 if summary["n_green"] == summary["n_queries"] else 1


if __name__ == "__main__":
    sys.exit(main())
