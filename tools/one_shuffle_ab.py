"""Paired one-shuffle-vs-two-shuffle merge A/B at the headline shape.

Round 7 rewrote the COW merge so the LWW aggregate runs ON TOP of the
exact-bucket placement's partitioning (groupBy keys prepended with the
placement columns), collapsing the aggregate exchange and the
placement exchange into ONE shuffle per batch (lake/merge.py
`_one_shuffle_merge`). The trade: the aggregate's map-side combine now
happens after the placement shuffle, so full pre-aggregate rows travel
the wire — a win exactly when per-key duplicate factors are low (CDC
feeds: most keys appear once per batch) and a potential loss when they
are high. This tool measures both arms interleaved on one host/session
so the default is a recorded decision, not a guess.

Arms (same feed, fresh table+checkpoint per trial, round-robin):
  one_shuffle  — SPARK_GRAFT_ONE_SHUFFLE_MERGE=1 (the new default)
  two_shuffle  — SPARK_GRAFT_ONE_SHUFFLE_MERGE=0 (the r6 plan)

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
       python tools/one_shuffle_ab.py [trials]
Prints one JSON line: per-arm trial lists + best + the ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from omniparser_spark.cdc.pipeline import CdcPipeline
    from omniparser_spark.session import get_spark
    from omniparser_spark.sources.changefeed import FeedSpec, materialize_feed

    spark = get_spark(
        app_name="one_shuffle_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    n_events = int(
        os.environ.get("SPARK_GRAFT_AB_EVENTS")
        or max(int(10_000_000 * sf), 20_000)
    )
    spec = FeedSpec(n_events=n_events, n_convs=max(n_events // 40, 100), seed=42)
    tmp = tempfile.mkdtemp(prefix="one_shuffle_ab_")
    # the flag is read per merge call, so toggling the env between
    # pipelines inside one session flips the plan without a restart
    arms = {"one_shuffle": "1", "two_shuffle": "0"}
    # SPARK_GRAFT_AB_MODE=mor benches the merge-on-read delta write
    # (the one-shuffle rewrite changed both paths)
    mode = os.environ.get("SPARK_GRAFT_AB_MODE", "cow")
    out: dict = {
        "n_events": n_events, "cpus": cpus, "trials": trials,
        "merge_mode": mode, "arms": {},
    }
    try:
        feed = materialize_feed(spark, spec, f"{tmp}/feed", num_partitions=cpus * 2)
        warm = CdcPipeline(
            spark, f"{tmp}/warm_t", f"{tmp}/warm_c", n_buckets=8,
            n_source_parts=spec.n_source_parts,
        )
        warm.run_feed(feed, min(4000, n_events), batch_size=2000)

        times: dict[str, list[float]] = {a: [] for a in arms}
        for trial in range(trials):
            for arm, flag in arms.items():
                os.environ["SPARK_GRAFT_ONE_SHUFFLE_MERGE"] = flag
                p = CdcPipeline(
                    spark, f"{tmp}/{arm}_t{trial}_tab", f"{tmp}/{arm}_t{trial}_ck",
                    n_buckets=max(cpus, 16), n_source_parts=spec.n_source_parts,
                    merge_mode=mode,
                )
                t0 = time.time()
                p.run_feed(feed, spec.n_events, batch_size=max(n_events // 4, 1))
                times[arm].append(round(time.time() - t0, 3))
        os.environ.pop("SPARK_GRAFT_ONE_SHUFFLE_MERGE", None)
        for arm, ts in times.items():
            out["arms"][arm] = {"trials": ts, "best": min(ts)}
        out["one_shuffle_over_two_shuffle"] = round(
            out["arms"]["one_shuffle"]["best"]
            / out["arms"]["two_shuffle"]["best"],
            3,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
