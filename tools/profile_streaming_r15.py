"""Round-15 streaming-witness profiler (VERDICT r14 item 3).

The four slowest bench entries are streaming witnesses whose cost is
micro-batch orchestration, not data. This tool runs each witness through
its unmodified catalog builder and harvests the engine's own per-batch
accounting (`StreamingQuery.recentProgress` → durationMs buckets +
stateOperators commit times) by spying on `awaitTermination`, plus the
end-to-end wall time split into "before first stream start" (fixture
prep, a batch job) and "streaming" portions.

Usage:
    python tools/profile_streaming_r15.py [-n RUNS] [--json PATH] name...

Prints one JSON object per query: wall seconds (min of N), per-run batch
list with durationMs breakdown, and summed bucket totals for the min run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries  # noqa: E402
from bridge_monitoring_pyspark_spark.session import get_spark  # noqa: E402

BUCKETS = (
    "triggerExecution", "addBatch", "getBatch", "latestOffset",
    "queryPlanning", "walCommit", "commitOffsets", "commitBatch",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    cat = all_queries()
    # JVM warmup
    cat["bronze_valid_events"].build(spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    # Spy on StreamingQuery.awaitTermination: record recentProgress + the
    # wall timestamps of every stream's start/termination so the builder's
    # batch-prep prefix is separable from the streaming portion.
    from pyspark.sql.streaming import query as sq_mod

    captured: list[dict] = []
    orig_await = sq_mod.StreamingQuery.awaitTermination

    def spy_await(self, timeout=None):
        r = orig_await(self, timeout)
        try:
            captured.append(
                {
                    "ended_at": time.time(),
                    "progress": [json.loads(p.json) for p in self.recentProgress],
                }
            )
        except Exception as e:  # noqa: BLE001
            captured.append({"error": str(e)})
        return r

    sq_mod.StreamingQuery.awaitTermination = spy_await
    out: dict[str, dict] = {}
    try:
        for name in args.names:
            q = cat[name]
            runs = []
            for i in range(args.n):
                captured.clear()
                spark.sparkContext.setJobDescription(f"profstream:{name}:{i}")
                t0 = time.time()
                df = q.build(spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                streams = []
                for c in captured:
                    if "progress" not in c:
                        continue
                    batches = []
                    for p in c["progress"]:
                        d = p.get("durationMs", {})
                        row = {k: d.get(k) for k in BUCKETS if k in d}
                        row["batchId"] = p.get("batchId")
                        row["numInputRows"] = p.get("numInputRows")
                        sos = p.get("stateOperators", [])
                        if sos:
                            row["stateCommitMs"] = sum(
                                s.get("commitTimeMs", 0) for s in sos
                            )
                            row["nStateOps"] = len(sos)
                        batches.append(row)
                    streams.append(batches)
                runs.append({"wall_sec": round(wall, 3), "streams": streams})
            spark.sparkContext.setJobDescription(None)
            best = min(runs, key=lambda r: r["wall_sec"])
            totals: dict[str, float] = {}
            n_batches = 0
            for st in best["streams"]:
                for b in st:
                    n_batches += 1
                    for k, v in b.items():
                        if isinstance(v, (int, float)) and k not in (
                            "batchId", "numInputRows", "nStateOps"
                        ):
                            totals[k] = totals.get(k, 0) + v
            trig_sec = totals.get("triggerExecution", 0) / 1000.0
            rec = {
                "wall_min_sec": best["wall_sec"],
                "walls": [r["wall_sec"] for r in runs],
                "n_streams": len(best["streams"]),
                "n_batches": n_batches,
                "sum_durationMs": {k: round(v, 1) for k, v in totals.items()},
                "streaming_sec": round(trig_sec, 3),
                "non_streaming_sec": round(best["wall_sec"] - trig_sec, 3),
                "batches": best["streams"],
            }
            out[name] = rec
            small = {k: v for k, v in rec.items() if k != "batches"}
            print(f"{name}: {json.dumps(small)}", flush=True)
    finally:
        sq_mod.StreamingQuery.awaitTermination = orig_await
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
