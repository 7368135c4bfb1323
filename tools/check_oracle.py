"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle at sf=0.01, then
compares row count, schema width, and an order-insensitive value comparison
(columns sorted by name, rows sorted, values stringified). Stricter than a
hash compare: prints the first differing rows on mismatch.

Usage:  python tools/check_oracle.py [--vanilla] [--first N] [--json PATH] [query ...]

``--vanilla`` builds a bare SparkSession (no session.py configs — ANSI on,
no legacy parquet flags, default shuffle partitions), replicating the
driver's harness exactly; any query that only works under our tuned session
fails here first. ``--first N`` limits to the first N queries in catalog
insertion order (the driver's correctness window is the first ~50).
``--json PATH`` additionally writes a per-query result map with the full
verdict triple ``{rows_match, schema_match, hash_match}`` per query (the
committed ORACLE_FULL.json evidence that the queries past the driver's
~50-slot window are oracle-green too).
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # IEEE -0.0 == 0.0; don't let the sign render as "-0"
        # driver hashes exact values; we round at 1e-9 to catch real bugs
        # while tolerating representation noise the queries already rounded away
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main() -> int:
    from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
    from bridge_monitoring_pyspark_spark.session import get_spark

    argv = sys.argv[1:]
    vanilla = "--vanilla" in argv
    argv = [a for a in argv if a != "--vanilla"]
    first_n = None
    if "--first" in argv:
        i = argv.index("--first")
        first_n = int(argv[i + 1])
        del argv[i:i + 2]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    only = set(argv)
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark(master="local[8]", extra_confs={"spark.sql.shuffle.partitions": "8"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    catalog = list(all_queries().items())
    if first_n is not None:
        catalog = catalog[:first_n]
    failures = []
    results: dict[str, dict] = {}
    for name, q in sorted(catalog):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = q.build(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if q.oracle is None:
            print(f"  {name:32s} rows={len(srows):6d}  (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                failures.append((name, "0 rows from rows-only query"))
            results[name] = {"rows": len(srows), "status": "rows_only",
                             "ok": len(srows) > 0}
            continue
        res = con.execute(q.oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        # Per-query verdict triple, mirroring the driver's CORRECTNESS rows
        # (rows_match / schema_match / hash_match) so the committed JSON is
        # independently auditable, not a summary claim (VERDICT r6 item 5).
        rows_match = len(srows) == len(drows)
        schema_match = sorted(scols) == sorted(dcols)
        hash_match = False
        problems = []
        if not rows_match:
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not schema_match:
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if rows_match and schema_match:
            a, b = norm_rows(scols, srows), norm_rows(dcols, drows)
            hash_match = a == b
            if not hash_match:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        status = "OK " if not problems else "FAIL"
        print(f"  {name:32s} rows={len(srows):6d}  {status} [{time.time()-t0:.1f}s]")
        for p in problems:
            print(f"      {p}")
            failures.append((name, p))
        results[name] = {
            "rows": len(srows),
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "status": "ok" if not problems else "fail",
            "ok": not problems,
            **({"problems": [p[:200] for p in problems]} if problems else {}),
        }
    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES'}")
    if json_path:
        import json

        summary = {
            "sf_dir": SF_DIR,
            "vanilla": vanilla,
            "n_checked": len(results),
            "n_oracle_ok": sum(1 for r in results.values() if r["status"] == "ok"),
            "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
            "n_fail": len(failures),
            "queries": results,
        }
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
