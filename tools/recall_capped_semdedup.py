"""Recall-vs-CAP sweep for the cluster-size-capped SemDeDup.

VERDICT r11 item 3: `semdedup_prune_kmeans_capped` trades cross-sub
near-dup pairs for bounded per-task memory; until this tool the trade was
documented but never measured. The uncapped fixed-K form produces EXACT
ground truth wherever it still runs (it OOMs only at decade 3), so recall
is directly countable:

    drops(form)      = corpus \\ survivors(form)
    recall(cap)      = |drops(capped) ∩ drops(uncapped)| / |drops(uncapped)|
    false_survivors  = docs kept ONLY because their near-dup landed in
                       another sub-cluster = |drops(uncapped)| - |drops(capped)|

(The intersection equals drops(capped) by the subset invariant — a capped
drop needs a smaller-id near-dup in the same (cid, sub), which is a
fortiori the same cid — pinned by tests/test_extras24.py; this tool
asserts it rather than assuming it.)

Usage:
    python tools/recall_capped_semdedup.py --sf-dir /root/testdata/sf0.01 \
        --caps 32 128 512

Prints one JSON line per cap plus a ground-truth line:
    {"sf_dir", "n_vectors", "n_dropped_uncapped", "uncapped_sec"}
    {"cap", "recall", "false_survivors", "n_dropped", "capped_sec"}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bridge_monitoring_pyspark_spark.plans.extras24 import (  # noqa: E402
    _semdedup_prune_kmeans,
    _semdedup_prune_kmeans_capped,
    _semdedup_prune_kmeans_capped_proj,
)

VARIANTS = {
    "hash": _semdedup_prune_kmeans_capped,
    "proj": _semdedup_prune_kmeans_capped_proj,
}
from bridge_monitoring_pyspark_spark.session import get_spark  # noqa: E402
from bridge_monitoring_pyspark_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--caps", type=int, nargs="+", default=[32, 128, 512])
    ap.add_argument(
        "--tau", type=float, default=None,
        help="near-dup threshold override (default: the catalog's "
             "SEMDEDUP_TAU=0.4); production SemDeDup runs ~0.9+, where the "
             "locality split's advantage is largest",
    )
    ap.add_argument(
        "--variants", nargs="+", choices=sorted(VARIANTS), default=["hash"],
        help="split rules to sweep: 'hash' (vec_id %% nsub) and/or 'proj' "
             "(rank by cosine-to-centroid, chunk runs of CAP)",
    )
    a = ap.parse_args()

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    spark.sparkContext.setLogLevel("ERROR")

    all_ids = {
        r.vec_id
        for r in load_table(spark, a.sf_dir, "embeddings")
        .select("vec_id")
        .collect()
    }

    tau_kw = {} if a.tau is None else {"tau": a.tau}
    t0 = time.time()
    uncapped_survivors = {
        r.vec_id
        for r in _semdedup_prune_kmeans(spark, a.sf_dir, **tau_kw).collect()
    }
    uncapped_sec = round(time.time() - t0, 2)
    drops_uncapped = all_ids - uncapped_survivors
    print(
        json.dumps(
            {
                "sf_dir": a.sf_dir,
                "tau": a.tau,
                "n_vectors": len(all_ids),
                "n_dropped_uncapped": len(drops_uncapped),
                "uncapped_sec": uncapped_sec,
            }
        ),
        flush=True,
    )

    for variant in a.variants:
        build = VARIANTS[variant]
        for cap in a.caps:
            t0 = time.time()
            survivors = {
                r.vec_id
                for r in build(spark, a.sf_dir, cap=cap, **tau_kw).collect()
            }
            sec = round(time.time() - t0, 2)
            drops = all_ids - survivors
            stray = drops - drops_uncapped  # must be empty (subset invariant)
            recall = (
                len(drops & drops_uncapped) / len(drops_uncapped)
                if drops_uncapped
                else 1.0
            )
            print(
                json.dumps(
                    {
                        "variant": variant,
                        "cap": cap,
                        "recall": round(recall, 4),
                        "false_survivors": len(drops_uncapped - drops),
                        "n_dropped": len(drops),
                        "subset_violations": len(stray),
                        "capped_sec": sec,
                    }
                ),
                flush=True,
            )
            if stray:
                # Fatal: a capped drop with no uncapped counterpart breaks
                # the subset invariant the recall/false_survivors formulas
                # above depend on — a run past this point would publish
                # quietly inconsistent numbers.
                sys.exit(
                    f"recall_capped_semdedup: subset invariant VIOLATED — "
                    f"{len(stray)} capped-only drops (variant={variant}, "
                    f"cap={cap}); sample={sorted(stray)[:5]}"
                )

    spark.stop()


if __name__ == "__main__":
    main()
