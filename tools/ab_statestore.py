"""State-store provider A-B for a catalog streaming query at decade scale.

VERDICT r10 item 5: the decade-3 sessionizer adjudication ("HDFS-provider
full-map re-snapshot x batches dominates at large state") was measured on the
default provider only; the RocksDB arm existed only in the synthetic
rate-source tool (bench_stream_rate.py --state-store). This tool runs ONE arm
of the A-B on the real catalog query over the real decade fixtures, so the
pair of invocations yields a SCALING.md row pair (hdfs vs rocksdb, same
corpus) with the delta attributable to the provider alone.

One arm per process on purpose: each provider gets its own JVM, the same
warm-up, and the same cold-page posture, so neither arm inherits the other's
page cache or codegen warmth asymmetrically.

Usage:
    python tools/ab_statestore.py --provider hdfs    --sf-dir .scale/sf10
    python tools/ab_statestore.py --provider rocksdb --sf-dir .scale/sf10

Prints one JSON line: {"query", "provider", "sf_dir", "runs", "min_sec",
"calibration_sec"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries  # noqa: E402
from bridge_monitoring_pyspark_spark.session import get_spark  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)
PROVIDERS = {"rocksdb": ROCKSDB, "hdfs": HDFS}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="streaming_session_timeout_flush")
    ap.add_argument("--provider", choices=("hdfs", "rocksdb"), required=True)
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale", "sf10"))
    ap.add_argument("--warm", default="/root/testdata/sf0.001",
                    help="warm-up dir: compiles the plan and spins up the "
                         "Python workers so first-touch cost stays off the "
                         "timed runs")
    ap.add_argument("--repeat", type=int, default=1)
    a = ap.parse_args()

    # Set the provider at SESSION CREATION, for BOTH arms. The engine default
    # (session.default_configs) pins RocksDB for every session, so an hdfs
    # arm that merely skips a conf.set still runs RocksDB — the exact bug the
    # round-11 A-B shipped with (ADVICE r11): both arms measured the same
    # provider and the "delta" was host variation. extra_confs wins over the
    # default because get_spark applies it last.
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={
            "spark.sql.streaming.stateStore.providerClass": PROVIDERS[a.provider]
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    got = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    if got != PROVIDERS[a.provider]:
        print(json.dumps({"fatal": f"provider conf not applied: {got}"}))
        sys.exit(1)

    from pyspark.sql import functions as F

    def calib_once() -> float:
        t0 = time.time()
        spark.range(2_000_000_000).select(F.bit_xor(F.xxhash64("id"))).collect()
        return time.time() - t0

    # Calibration BEFORE the timed runs (matches bench_scale.py), and
    # exception-guarded: a calibration hiccup is diagnostics lost, never an
    # expensive completed A-B run thrown away — and measuring it up front
    # keeps the matched-host comparison rule (~1.1x) honest instead of
    # sampling host speed after the runs already happened.
    try:
        calib = round(min(calib_once() for _ in range(3)), 3)
    except Exception:  # noqa: BLE001 — diagnostics only
        calib = None

    q = all_queries()[a.query]

    def run(sf_dir: str) -> float:
        t0 = time.time()
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run(a.warm)
    runs = [round(run(a.sf_dir), 2) for _ in range(a.repeat)]
    out = {
        "query": a.query,
        "provider": a.provider,
        "sf_dir": a.sf_dir,
        "runs": runs,
        "min_sec": min(runs),
        "calibration_sec": calib,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
