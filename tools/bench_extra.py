"""Per-query isolation bench + physical-plan capture (guide §1.1/1.4).

NOT the driver bench — bench.py stays frozen. This times individual
declared queries through the same noop sink so a single operator can be
measured (and re-measured after a change) without paying for the whole
suite, and snapshots `.explain("formatted")` for the plans/ evidence
dir.

Usage:
    python tools/bench_extra.py --sf-dir /root/testdata/sf1.0 \
        --queries semantic_dedup_embeddings,minhash_signature \
        [--trials 2] [--plans plans/r08 --suffix before]

Prints one JSON line: {"sf_dir": ..., "queries": {name: best_sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="dir to write <query>_<suffix>.txt plans into")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    from omniparser_spark.session import get_spark

    spark = get_spark(
        app_name="omniparser_spark_bench_extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
    )
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    timings: dict[str, float] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        best = float("inf")
        for trial in range(args.trials):
            spark.sparkContext.setJobDescription(f"{name} trial {trial}")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            if args.plans and trial == 0:
                os.makedirs(args.plans, exist_ok=True)
                with open(
                    os.path.join(
                        args.plans, f"{name}_{args.suffix}.txt"
                    ),
                    "w",
                ) as f:
                    f.write(formatted_plan(spark, df))
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(json.dumps({name: timings[name]}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "queries": timings}))


if __name__ == "__main__":
    main()
