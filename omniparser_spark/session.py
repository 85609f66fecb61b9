"""SparkSession factory tuned for the CDC engine.

Local mode is the sandbox stand-in for a multi-executor cluster; every
conf below is equally valid on a 1000-executor deployment (AQE, Arrow,
UTC session TZ, shuffle-partition sizing). ``shuffle_partitions``
defaults to the core count locally; on a real cluster it should be
~2-3x total executor cores (or left to AQE coalescing from a high
initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "omniparser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard confs.

    - AQE on: runtime shuffle-partition coalescing + skew-join splits.
    - Arrow on: every pandas UDF / toPandas crossing is Arrow-batched.
    - UTC session timezone: deterministic timestamp semantics and
      apples-to-apples comparison with the DuckDB oracle.
    - ``spark.python.worker.reuse``: warm Python workers across Arrow
      batches (the engine's analogue of the reference's cached JS VM
      pool, ``extensions/omniv21/customfuncs/javascript.go:73-97``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions or _default_shuffle_partitions(master)

    # shuffle/spill dirs on tmpfs when it is safe: the sandbox's single
    # virtual disk serializes 32 concurrent shuffle writers (measured
    # 1.5x wall-clock); on a real cluster this is the provisioned
    # node-local SSD array. tmpfs is RAM-backed, so it is only used
    # when (a) SPARK_LOCAL_DIRS is unset, (b) not opted out via
    # SPARK_GRAFT_TMPFS=0, and (c) /dev/shm has generous headroom
    # (>=16 GiB free, or SPARK_GRAFT_TMPFS=1 forces it) — a deployment
    # that forgot SPARK_LOCAL_DIRS must not spill shuffle data into
    # executor RAM and OOM the host.
    local_dir = None
    tmpfs_pref = os.environ.get("SPARK_GRAFT_TMPFS", "auto")
    if (
        "SPARK_LOCAL_DIRS" not in os.environ
        and tmpfs_pref != "0"
        and os.path.isdir("/dev/shm")
    ):
        import shutil

        free = shutil.disk_usage("/dev/shm").free
        if tmpfs_pref == "1" or free >= 16 * 2**30:
            local_dir = f"/dev/shm/spark-local-{os.getuid()}"
            os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        # split file scans finely enough that a micro-batch spreads over
        # every core: with the default 128 MiB bins a few-hundred-MB
        # batch collapses to <8 scan tasks and the decode stage can't
        # use the cluster (measured: local[32] no faster than local[8]).
        # At 10^10-event scale batches are tens of GB and row groups
        # bound the split size anyway, so a small cap stays correct.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the lake's own snapshot metadata is the commit record (atomic
        # version-pointer swap): the Hadoop _SUCCESS marker and the v1
        # double-rename job commit are pure per-commit overhead here — a
        # crashed v2 write leaves files no snapshot references, which
        # expire_snapshots' scan-based GC collects.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
            "false",
        )
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
        # ObjectHashAggregate (collect_list/max_by — the hierarchical
        # assembly and packing operators) falls back to SORT-based
        # aggregation after only 128 distinct keys in the hash map,
        # forcing a full extra sort of the nested payloads per agg
        # operator (measured 3x wall on the 1.2M-segment EDI nested
        # assembly: 10.2s -> 3.6s warm). Raise the fallback to 256k
        # entries: input partitions are bounded by maxPartitionBytes
        # (16 MiB here, <=128 MiB on any sane deployment), so even a
        # fully buffered partition of collect_list groups stays far
        # under executor memory; the fallback still protects against a
        # pathological giant-partition input.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "262144",
        )
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _default_shuffle_partitions(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return max(4, int(inner))
        except ValueError:
            return 32
    return 200
