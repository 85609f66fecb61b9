"""Benchmark harness — one JSON line on stdout.

Headline metric: change-events/sec applied end-to-end (synthetic
transcript change stream -> normalize -> LWW dedup -> MERGE into the
lake table), plus per-query wall times for the representative operator
suite at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Query timing materializes the full result via the `noop` sink (no
driver collect, no column pruning shortcuts).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    from omniparser_spark.session import get_spark

    spark = get_spark(
        app_name="omniparser_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}

    # ---- CDC apply throughput (the north metric) ----
    from omniparser_spark.cdc.pipeline import CdcPipeline
    from omniparser_spark.sources.changefeed import FeedSpec, materialize_feed
    from pyspark.sql import functions as F

    # 10M x sf (1M at sf0.1): large enough that the 4 micro-batches run
    # at steady-state throughput (per-batch fixed overhead is ~1-2 s;
    # at 2M x sf the headline measured mostly that overhead, not the
    # engine — see README "Measured"). The host's effective CPU speed
    # also swings ~2.5x between sessions, so the number is only
    # comparable against a same-host rerun.
    n_events = max(int(10_000_000 * sf), 20_000)
    spec = FeedSpec(
        n_events=n_events,
        n_convs=max(n_events // 40, 100),
        seed=42,
    )
    tmp = tempfile.mkdtemp(prefix="omniparser_spark_bench_")
    try:
        pipe = CdcPipeline(
            spark, f"{tmp}/table", f"{tmp}/ckpt", n_buckets=max(cpus, 16),
            n_source_parts=spec.n_source_parts,
        )

        # feed materialization is generation, not apply — not timed
        feed = materialize_feed(
            spark, spec, f"{tmp}/feed", num_partitions=cpus * 2
        )

        # warm-up: one small apply on a scratch table outside the timed
        # window (JIT/codegen warm-up; we measure steady-state
        # throughput, which is what extrapolates to a long-running tail)
        warm = CdcPipeline(
            spark, f"{tmp}/warm_table", f"{tmp}/warm_ckpt", n_buckets=8,
            n_source_parts=spec.n_source_parts,
        )
        warm.run_feed(feed, min(4000, n_events), batch_size=2000)

        t0 = time.time()
        pipe.run_feed(feed, spec.n_events, batch_size=max(n_events // 4, 1))
        cdc_secs = time.time() - t0
        timings["cdc_apply_e2e"] = round(cdc_secs, 3)
        events_per_sec = n_events / cdc_secs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # ---- representative operator suite ----
    bench_queries = [
        "lww_dedup",
        "decode_csv_roundtrip",
        "decode_json_payload",
        "decode_xmlish_roundtrip",
        "decode_fixed_roundtrip",
        "agg_pricing_summary",
        "join_broadcast_enrich",
        "topk_per_group",
        "sessionize_events",
        "text_fingerprint",
        "text_language_id",
        "minhash_signature",
        "simhash_signature",
        "spec_transform",
        "decode_custom_plugin",
        "cosine_topk_bruteforce",
        "asof_join_enrich",
        "text_tfidf_topterms",
        "text_chunk_windows",
        "text_redact_pii",
        "profile_numeric_stats",
        "decode_edi_hierarchy",
        "pack_sequences_greedy",
        # dedup_cluster_assign intentionally NOT benched: its iterative
        # rounds are driver-latency-bound (localCheckpoint per round),
        # so wall time tracks host scheduling noise more than engine
        # work — a misleading round-over-round regression signal.
    ]
    qs = entrymod.queries()
    for name in bench_queries:
        if name not in qs:
            continue
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # iterative-path signal (round-2 verdict): label propagation at a
    # FIXED 3 rounds — one 3-join DAG, no convergence-count jobs, no
    # per-round localCheckpoint — so regressions in the clustering
    # join/agg shape are visible without the driver-latency noise that
    # kept the convergent variant out of the bench.
    from omniparser_spark.operators.clustering import connected_components
    from omniparser_spark.operators.dedup_text import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # pair GENERATION is candidate-generator cost, not the iterative
    # path — materialize it outside the timed window so the entry
    # tracks the propagation joins themselves
    pairs_dir = tempfile.mkdtemp(prefix="omniparser_spark_ccpairs_")
    try:
        ngram_jaccard_pairs(docs, k=3, threshold=0.5).select(
            "id_a", "id_b"
        ).write.mode("overwrite").parquet(pairs_dir)
        cc_pairs = spark.read.parquet(pairs_dir)
        t0 = time.time()
        materialize(connected_components(cc_pairs, exact_rounds=3))
        timings["connected_components_3round"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(pairs_dir, ignore_errors=True)

    out = {
        "metric": "change-events/sec applied e2e (normalize+LWW+MERGE)",
        "value": round(events_per_sec, 1),
        "unit": "events/sec",
        "queries": timings,
        "sf": sf,
        "cdc_events": n_events,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
