"""Round-14 optimization profiler: time catalog queries (noop sink, min of N)
and dump .explain('formatted') for the batch ones.

Usage: python tools/profile_r14.py [-n RUNS] [--explain-dir DIR] name [name...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries  # noqa: E402
from bridge_monitoring_pyspark_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    cat = all_queries()
    # JVM warmup
    cat["bronze_valid_events"].build(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    for name in args.names:
        q = cat[name]
        times = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"prof:{name}:{i}")
            t0 = time.time()
            df = q.build(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(times):.3f}  runs={[round(t,3) for t in times]}", flush=True)
        if args.explain_dir and "streaming" not in q.tags:
            os.makedirs(args.explain_dir, exist_ok=True)
            try:
                df = q.build(spark, args.sf_dir)
                txt = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                with open(os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                    f.write(txt)
            except Exception as e:  # noqa: BLE001
                print(f"  explain failed: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
