"""Scaling-efficiency evidence for the north rule (N -> 4N executors).

The sandbox has no multi-node cluster, so the two "cluster sizes" are
two local parallelism levels running the IDENTICAL job on the IDENTICAL
pre-materialized input (the sanctioned stand-in; see BASELINE.md).

    python tools/scaling_bench.py [--events 600000] [--cpus 8,32]

The parent process generates the change feed once, then launches one
fresh subprocess per parallelism level (a SparkSession's master cannot
change within one JVM). Each child replays the full feed through the
CDC pipeline (decode -> normalize -> LWW -> fenced MERGE) and reports
apply wall time. Efficiency(N->4N) = T_N / (4 * T_4N) for a fixed
workload (equivalently throughput_4N / (4 * throughput_N)).

Output: one JSON line with events/s per level + efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(
    cpus: int, n_events: int, feed_dir: str, work_dir: str, trials: int
) -> None:
    from pyspark.sql import functions as F

    from omniparser_spark.cdc.pipeline import CdcPipeline
    from omniparser_spark.session import get_spark

    # partition-count knobs (experiments at high core counts: more,
    # smaller tasks pack stage tails better across SMT threads)
    shuffle_mult = int(os.environ.get("SPARK_GRAFT_SHUFFLE_MULT", "2"))
    spark = get_spark(
        app_name=f"omniparser_spark_scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(shuffle_mult * cpus, 8),
    )
    feed = spark.read.parquet(feed_dir)

    # warm the JVM/codegen path outside the timed window with a small
    # full-pipeline run on a scratch table (steady-state measurement:
    # the deployment target is a long-lived tail daemon, not a cold JVM)
    warm = CdcPipeline(
        spark, f"{work_dir}/warm_table", f"{work_dir}/warm_ckpt", n_buckets=8,
        n_source_parts=8,
    )
    warm.run_feed(feed, min(4000, n_events), batch_size=2000)

    trial_secs = []
    final_rows = None
    for t in range(max(trials, 1)):
        shutil.rmtree(f"{work_dir}/table_{t}", ignore_errors=True)
        pipe = CdcPipeline(
            spark,
            f"{work_dir}/table_{t}",
            f"{work_dir}/ckpt_{t}",
            n_buckets=max(cpus, 16),
            n_source_parts=8,
        )
        t0 = time.time()
        pipe.run_feed(feed, n_events, batch_size=max(n_events // 4, 1))
        trial_secs.append(round(time.time() - t0, 3))
        final_rows = pipe.read_table().count()
        shutil.rmtree(f"{work_dir}/table_{t}", ignore_errors=True)
        shutil.rmtree(f"{work_dir}/ckpt_{t}", ignore_errors=True)
    secs = min(trial_secs)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "events": n_events,
                "secs": secs,
                "events_per_sec": round(n_events / secs, 1),
                "final_rows": final_rows,
                "trial_secs": trial_secs,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=600_000)
    ap.add_argument("--cpus", type=str, default="8,32")
    ap.add_argument("--trials", type=int, default=2,
                    help="runs per level; best is kept (host-noise guard)")
    ap.add_argument("--run-one", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--feed-dir", type=str, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--work-dir", type=str, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.run_one is not None:
        run_one(
            args.run_one, args.events, args.feed_dir, args.work_dir, args.trials
        )
        return

    levels = [int(c) for c in args.cpus.split(",")]
    tmp = tempfile.mkdtemp(prefix="omniparser_spark_scaling_")
    try:
        # generate the shared feed once (not part of any timed window)
        from omniparser_spark.session import get_spark
        from omniparser_spark.sources.changefeed import FeedSpec, materialize_feed

        spark = get_spark(
            app_name="omniparser_spark_scaling_gen",
            master=f"local[{os.cpu_count() or 8}]",
        )
        spec = FeedSpec(
            n_events=args.events, n_convs=max(args.events // 40, 100), seed=42
        )
        materialize_feed(
            spark, spec, f"{tmp}/feed",
            num_partitions=int(
                os.environ.get("SPARK_GRAFT_FEED_PARTS", "64")
            ),
        )
        spark.stop()

        results = []
        for cpus in levels:
            work = f"{tmp}/work_{cpus}"
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--run-one",
                    str(cpus),
                    "--events",
                    str(args.events),
                    "--trials",
                    str(args.trials),
                    "--feed-dir",
                    f"{tmp}/feed",
                    "--work-dir",
                    work,
                ],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
                raise SystemExit(f"scaling run at local[{cpus}] failed")
            results.append(json.loads(line[-1]))
            shutil.rmtree(work, ignore_errors=True)

        summary = {"metric": "cdc apply scaling efficiency", "levels": results}
        if len(results) >= 2:
            lo, hi = results[0], results[-1]
            factor = hi["cpus"] / lo["cpus"]
            eff = (hi["events_per_sec"] / lo["events_per_sec"]) / factor
            summary["parallelism_factor"] = factor
            summary["scaling_efficiency"] = round(eff, 3)
        print(json.dumps(summary))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
