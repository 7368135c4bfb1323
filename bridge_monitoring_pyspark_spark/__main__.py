"""CLI pipeline runner — operational parity with the reference's
``python pipelines/<layer>.py`` entry points (scripts/run_all.sh) in one
module:

    python -m bridge_monitoring_pyspark_spark bronze --sf-dir /root/testdata/sf0.001 --out /tmp/out
    python -m bridge_monitoring_pyspark_spark silver --sf-dir ... --out ...
    python -m bridge_monitoring_pyspark_spark gold   --sf-dir ... --out ... [--window "1 hour"]
    python -m bridge_monitoring_pyspark_spark all    --sf-dir ... --out ...

Differences from the reference, by design: one SparkSession per invocation
(not one OS process per layer), `availableNow` drains by default (use
--follow for continuous micro-batch), and `all` runs the layers in
dependency order inside one process — replacing the reference's
filesystem-polling startup race (SURVEY.md §3.3) with explicit ordering.
"""

from __future__ import annotations

import argparse
import os
import sys

from .plans.bridge import EVENT_RULES
from .session import get_spark
from .streaming import jobs


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bridge_monitoring_pyspark_spark")
    p.add_argument("layer", choices=["bronze", "silver", "gold", "all"])
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    p.add_argument("--out", required=True)
    p.add_argument("--window", default="1 hour")
    p.add_argument("--watermark", default="2 minutes")
    p.add_argument("--follow", action="store_true",
                   help="run continuously instead of draining availableNow")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    spark = get_spark(master=args.master) if args.master else get_spark()
    spark.sparkContext.setLogLevel("WARN")
    avail = not args.follow

    def bronze() -> None:
        out = jobs.run_bronze(spark, args.sf_dir, os.path.join(args.out, "bronze"),
                              available_now=avail)
        print(f"bronze -> {out}")

    def silver() -> None:
        out = jobs.run_silver(spark, args.sf_dir, os.path.join(args.out, "silver"),
                              EVENT_RULES, available_now=avail)
        print(f"silver -> {out}")

    def gold() -> None:
        out = jobs.run_gold(spark, args.sf_dir, os.path.join(args.out, "gold"),
                            window=args.window, watermark=args.watermark,
                            available_now=avail)
        print(f"gold -> {out}")

    steps = {"bronze": [bronze], "silver": [silver], "gold": [gold],
             "all": [bronze, silver, gold]}[args.layer]
    for step in steps:
        step()
    if args.follow:
        spark.streams.awaitAnyTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
