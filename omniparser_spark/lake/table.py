"""Snapshot lake table with Iceberg commit semantics over plain parquet.

The sandbox image ships no Iceberg/Delta jars, so the engine implements
the *semantics* it needs from Iceberg directly over parquet, shaped so
the production swap-in is 1:1:

- **bucket partitioning**: data files live under ``_bucket=k`` dirs
  where ``k = pmod(xxhash64(conv_id), n_buckets)`` — the same partition
  transform as Iceberg's ``bucket(N, conv_id)``. A MERGE touching B
  buckets reads and rewrites only those B directories (file-level
  pruning), so merge cost scales with the *batch's* key footprint, not
  the table size — the property that makes COW MERGE viable at 100 TB.
- **snapshot metadata + atomic pointer**: each commit writes
  ``metadata/v{N}.metadata.json`` (schema, per-bucket data dirs,
  summary properties, parent pointer) and atomically swaps
  ``metadata/version-hint.text`` via ``os.replace`` — the single-writer
  analogue of Iceberg's optimistic metadata CAS.
- **snapshot summary properties** carry ``batch_id`` /
  ``max_offset_applied`` — the exactly-once fence: a re-delivered
  micro-batch is detected *before* any work (reference analogue: the
  UUIDv3 record checksum used for idempotency,
  ``extensions/omniv21/ingester.go:16-28``).
- **additive schema evolution without rewrite**: the table schema is a
  metadata fact; reads apply the current schema to all data files, so
  files written before a column existed yield NULL for it (exactly
  Iceberg ``ALTER TABLE ... ADD COLUMN``).

On a real cluster with an Iceberg catalog configured,
:func:`omniparser_spark.lake.merge.merge_into` emits a genuine
``MERGE INTO`` SQL statement instead (see ``_iceberg_available``).
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VERSION_HINT = "version-hint.text"


class ConcurrentCommitError(RuntimeError):
    """Another writer advanced the table between this commit's base
    read and its pointer swap (Iceberg CommitFailedException parity)."""


def _mmh3_int(k: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32 hash of a 4-byte int (the function
    HashPartitioning applies to an int column) — bit-verified against
    `F.hash` in tests. Needed driver-side to pre-compute partition
    salts; pure arithmetic, no Spark job."""
    k &= 0xFFFFFFFF
    k1 = (k * 0xCC9E2D51) & 0xFFFFFFFF
    k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
    k1 = (k1 * 0x1B873593) & 0xFFFFFFFF
    h1 = seed ^ k1
    h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
    h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 4
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - 2**32 if h1 >= 2**31 else h1


_PARTITION_SALT_CACHE: dict[int, list[int]] = {}


def _partition_salts(n_parts: int) -> list[int]:
    """The first integers whose Spark hash occupies each of `n_parts`
    shuffle partitions exactly once (cached per count; the search
    touches a few hundred ints at most)."""
    salts = _PARTITION_SALT_CACHE.get(n_parts)
    if salts is None:
        seen: dict[int, int] = {}
        s = 0
        while len(seen) < n_parts:
            p = _mmh3_int(s) % n_parts
            if p not in seen:
                seen[p] = s
            s += 1
        salts = [seen[p] for p in range(n_parts)]
        _PARTITION_SALT_CACHE[n_parts] = salts
    return salts


def place_exact_buckets(
    df: DataFrame, buckets, bucket_col: str = "_bucket"
) -> tuple[DataFrame, list[str]]:
    """Repartition so each bucket gets its OWN shuffle partition, and
    return ``(placed_df, partition_cols)`` where `partition_cols` are
    the column(s) this shuffle hash-partitioned on.

    A caller that immediately aggregates can prepend `partition_cols`
    to its groupBy keys: Catalyst recognizes the existing
    HashPartitioning as satisfying the aggregate's required
    distribution (partitioning exprs ⊆ grouping exprs), so the
    aggregation runs partition-local with NO second exchange — the
    placement shuffle and the aggregation shuffle collapse into one.
    Only valid when every partition column is functionally determined
    by the intended group keys (here: `_bucket` = f(key_col), and the
    salt = g(_bucket)), so the groups are unchanged."""
    values = (
        list(range(buckets)) if isinstance(buckets, int) else list(buckets)
    )
    n = len(values)
    if n <= 1:
        # a single partition satisfies every distribution — downstream
        # groupBys already run exchange-free with no extra key
        return df.repartition(1), []
    if os.environ.get("SPARK_GRAFT_EXACT_PLACEMENT", "1") == "0":
        # A/B escape hatch: the pre-fix hash placement (collision
        # stragglers and all), for same-host comparison runs
        return df.repartition(n, bucket_col), [bucket_col]
    salts = _partition_salts(n)
    mapping = F.create_map(
        *[
            F.lit(int(x))
            for v, s in zip(values, salts)
            for x in (v, s)
        ]
    )
    placed = df.withColumn(
        "_salt_pt",
        F.element_at(mapping, F.col(bucket_col).cast("int")),
    ).repartition(n, "_salt_pt")
    return placed, ["_salt_pt"]


def repartition_exact_buckets(
    df: DataFrame, buckets, bucket_col: str = "_bucket"
) -> DataFrame:
    """Repartition so each bucket gets its OWN shuffle partition.

    ``repartition(n, "_bucket")`` hash-partitions the bucket id — and
    hashing n distinct values into n slots collides (measured: 32
    buckets -> max 3 per partition, 14 empty), so the write stage runs
    with a built-in ~3x straggler while half the cores idle, at ANY
    cluster width. This maps each bucket id through a pre-computed
    salt whose Spark hash lands in a distinct partition: exact 1:1
    placement, no extra job, no sampling, and still exactly one data
    file per touched bucket."""
    placed, extra = place_exact_buckets(df, buckets, bucket_col)
    for c in extra:
        if c != bucket_col:
            placed = placed.drop(c)
    return placed


def bucket_expr(key_col: str | Column, n_buckets: int) -> Column:
    """Iceberg-style bucket transform: pmod(xxhash64(key), N)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(F.xxhash64(c.cast("string")), F.lit(n_buckets)).cast("int")


@contextlib.contextmanager
def fixed_shape_job(spark):
    """Run an action with AQE off: the commit write's output
    partitioning is PINNED by exact bucket placement (one shuffle
    partition per touched bucket — a user-specified partition count AQE
    must not coalesce, and bucket dirs AQE skew-split must not break),
    so adaptive re-planning cannot improve the job at any scale — it
    only adds its per-query-stage re-optimization latency (measured
    ~0.25-0.3 s per action at local[32], the dominant slice of the
    per-commit serial floor that caps multi-batch lifecycle queries).
    Same reasoning covers the bucket-prune distinct collect: a key-only
    scan into a bounded int list.  Scale note: this scopes ONLY the
    fixed-shape commit/prune actions — reads, joins, and every declared
    query keep AQE (skew joins, partition coalescing) untouched."""
    key = "spark.sql.adaptive.enabled"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = "true"
    if prev == "false":
        yield
        return
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


@dataclass
class Snapshot:
    version: int
    schema_json: dict[str, Any]
    bucket_dirs: dict[str, str]  # bucket id (as str) -> dir relative to table root
    summary: dict[str, Any] = field(default_factory=dict)
    parent_version: int | None = None
    # bucket id (as str) -> UPPER BOUND on the bucket's max _last_offset
    # (Iceberg manifest column-stats parity, for ONE load-bearing stat).
    # Used by read_changes to skip buckets untouched since an offset;
    # a missing entry means "unknown — must read". Upper-bound-only
    # semantics keep maintenance free: the merge stamps touched buckets
    # with the batch's max offset (no extra scan), untouched buckets
    # carry their stat by reference with the data dir.
    bucket_stats: dict[str, int] = field(default_factory=dict)
    # bucket id (as str) -> ORDERED list of merge-on-read delta dirs
    # (oldest commit first), each relative to the table root. Iceberg
    # v2 MOR parity: a delta commit appends the batch's rows here
    # instead of rewriting the base bucket file; readers resolve the
    # per-key LWW winner across base + deltas at scan time. Empty for
    # pure-COW tables — every read/CDF path is delta-aware but pays
    # nothing when this is empty.
    delta_dirs: dict[str, list[str]] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "schema": self.schema_json,
                "bucket_dirs": self.bucket_dirs,
                "summary": self.summary,
                "parent_version": self.parent_version,
                "bucket_stats": self.bucket_stats,
                "delta_dirs": self.delta_dirs,
            },
            indent=1,
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        return Snapshot(
            version=d["version"],
            schema_json=d["schema"],
            bucket_dirs=d["bucket_dirs"],
            summary=d.get("summary", {}),
            parent_version=d.get("parent_version"),
            bucket_stats=d.get("bucket_stats", {}),
            delta_dirs=d.get("delta_dirs", {}),
        )


class LakeTable:
    """A bucket-partitioned snapshot table. Single-writer, atomic commits."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)

    # ---------- lifecycle ----------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType | str,
        key_col: str = "conv_id",
        n_buckets: int = 16,
        merge_keys: tuple[str, ...] | None = None,
        sort_order: tuple[str, ...] | None = None,
    ) -> "LakeTable":
        """`key_col` is the bucket-partition key; `merge_keys` is the
        full row-identity key the MERGE upserts on (defaults to just
        key_col). Both are snapshot-summary facts so every reader —
        CDF pre-image joins included — uses the declared identity.

        `sort_order` (Iceberg sort-order parity): columns every commit
        sorts rows by WITHIN each bucket file. Costs one in-task sort
        per commit (no extra shuffle — rows are already co-located per
        bucket); buys parquet run-length/dictionary compression on the
        sort prefix and contiguous per-conversation reads downstream
        (e.g. ("conv_id", "turn_idx") lays every conversation out in
        turn order)."""
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        # hidden engine columns ride along in the stored schema
        hidden = [
            T.StructField("_last_offset", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
        names = {f.name for f in schema.fields}
        schema = T.StructType(
            schema.fields + [f for f in hidden if f.name not in names]
        )
        t = cls(spark, path)
        os.makedirs(t._meta_dir, exist_ok=True)
        os.makedirs(os.path.join(t.path, "data"), exist_ok=True)
        snap = Snapshot(
            version=0,
            schema_json=json.loads(schema.json()),
            bucket_dirs={},
            summary={
                "key_col": key_col,
                "merge_keys": list(merge_keys or (key_col,)),
                "n_buckets": n_buckets,
                "batch_id": -1,
                "max_offset_applied": -1,
                **({"sort_order": list(sort_order)} if sort_order else {}),
            },
        )
        t._write_snapshot(snap)
        return t

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, "metadata", VERSION_HINT))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        t.current()  # raises if missing
        return t

    # ---------- metadata ----------

    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.path, "metadata")

    def current(self) -> Snapshot:
        with open(os.path.join(self._meta_dir, VERSION_HINT)) as f:
            v = int(f.read().strip())
        return self.snapshot_at(v)

    def snapshot_at(self, version: int) -> Snapshot:
        """Load a specific snapshot's metadata (raises FileNotFoundError
        if it was expired — same contract as Iceberg time travel)."""
        with open(
            os.path.join(self._meta_dir, f"v{version}.metadata.json")
        ) as f:
            return Snapshot.from_json(f.read())

    # ---------- tags (Iceberg tag refs: named, retained snapshots) ----------

    @property
    def _refs_path(self) -> str:
        return os.path.join(self._meta_dir, "refs.json")

    def tags(self) -> dict[str, int]:
        """name -> pinned snapshot version."""
        if not os.path.exists(self._refs_path):
            return {}
        with open(self._refs_path) as f:
            return {k: int(v) for k, v in json.load(f).items()}

    def _write_tags(self, tags: dict[str, int]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self._meta_dir)
        with os.fdopen(fd, "w") as f:
            json.dump(tags, f, indent=1, sort_keys=True)
        os.replace(tmp, self._refs_path)

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under a name (Iceberg `ALTER TABLE ... CREATE
        TAG`): the tagged snapshot — metadata AND every data directory
        it references — survives `expire_snapshots` until the tag is
        dropped, and reads resolve it by name (`read(tag=...)`).

        The training-data use case this exists for: tag the exact table
        version a training run consumed ("run-2024-06-01") so the
        dataset is reproducible byte-for-byte months later, while the
        live table keeps merging and expiring underneath.

        Re-tagging an existing name to a different version raises
        (drop it first — accidental retarget silently changes what a
        past run means); deliberate movers use :meth:`retarget_tag`.
        Returns the pinned version.
        """
        v = int(version) if version is not None else self.current().version
        self.snapshot_at(v)  # must exist (raises if expired/never was)
        tags = self.tags()
        if name in tags and tags[name] != v:
            raise ValueError(
                f"tag {name!r} already pins v{tags[name]}; drop it before "
                f"re-tagging to v{v}"
            )
        tags[name] = v
        self._write_tags(tags)
        return v

    def retarget_tag(self, name: str, version: int) -> int:
        """Atomically move (or create) a tag to `version` — ONE tags
        write, so there is no crash window in which neither the old nor
        the new snapshot is pinned (a drop-then-create sequence that
        dies in between leaves the new frontier collectible by
        expiry).  For deliberate movers like the incremental-view sync
        frontier; one-shot reproducibility pins should keep using
        :meth:`create_tag`, whose refusal to move is the safety."""
        v = int(version)
        self.snapshot_at(v)
        tags = self.tags()
        tags[name] = v
        self._write_tags(tags)
        return v

    def drop_tag(self, name: str) -> None:
        tags = self.tags()
        if name not in tags:
            raise KeyError(name)
        del tags[name]
        self._write_tags(tags)

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.current().schema_json)

    def summary(self) -> dict[str, Any]:
        return dict(self.current().summary)

    def meta(self, name: str) -> DataFrame:
        """Iceberg metadata-table parity (`SELECT * FROM tbl.snapshots`
        etc.) — the table's own bookkeeping surfaced as DataFrames for
        ops queries and dashboards:

        - ``snapshots``: one row per retained snapshot — version,
          parent, batch fence, offset frontier, bucket/delta-file
          counts, committed_at (metadata-file mtime), and whether the
          snapshot is a pending WAP stage (version above the published
          head);
        - ``files``: one row per live data file of the CURRENT
          snapshot — bucket, relative path, bytes, is_delta;
        - ``partitions``: one row per bucket — base/delta file counts,
          total bytes, and the max-offset pruning stat;
        - ``refs``: the named refs — the published head plus every tag.

        All of these are driver-side metadata walks (O(snapshots) /
        O(files per current snapshot) — the same cost class as commit
        bookkeeping), materialized into small DataFrames so they
        compose with joins/filters like any other table.
        """
        import re as _re

        if name == "snapshots":
            head = self.current().version
            rows = []
            for fn in os.listdir(self._meta_dir):
                m = _re.fullmatch(r"v(\d+)\.metadata\.json", fn)
                if not m:
                    continue
                p = os.path.join(self._meta_dir, fn)
                try:
                    with open(p) as f:
                        s = Snapshot.from_json(f.read())
                    mtime = os.path.getmtime(p)
                except (FileNotFoundError, ValueError):
                    continue
                rows.append((
                    s.version,
                    s.parent_version,
                    int(s.summary.get("batch_id", -1)),
                    int(s.summary.get("max_offset_applied", -1)),
                    int(s.summary.get("n_buckets", 0)),
                    len(s.bucket_dirs),
                    sum(len(v) for v in s.delta_dirs.values()),
                    float(mtime),
                    s.version > head,
                ))
            return self.spark.createDataFrame(
                sorted(rows),
                "version long, parent_version long, batch_id long, "
                "max_offset_applied long, n_buckets int, "
                "n_bucket_dirs int, n_delta_dirs int, "
                "committed_at double, is_staged boolean",
            )
        if name in ("files", "partitions"):
            snap = self.current()
            files = []
            per_bucket: list[tuple[int, str, bool]] = [
                *((int(b), d, False) for b, d in snap.bucket_dirs.items()),
                *(
                    (int(b), d, True)
                    for b, lst in snap.delta_dirs.items()
                    for d in lst
                ),
            ]
            for b, rel, is_delta in per_bucket:
                full = os.path.join(self.path, rel)
                try:
                    entries = os.listdir(full)
                except FileNotFoundError:
                    continue
                for e in entries:
                    if not e.endswith(".parquet") or e.startswith((".", "_")):
                        continue
                    try:
                        sz = os.path.getsize(os.path.join(full, e))
                    except OSError:
                        continue
                    files.append((b, os.path.join(rel, e), sz, is_delta))
            if name == "files":
                return self.spark.createDataFrame(
                    sorted(files),
                    "bucket int, path string, bytes long, is_delta boolean",
                )
            agg: dict[int, list[int]] = {}
            for b, _p, sz, is_delta in files:
                a = agg.setdefault(b, [0, 0, 0])
                a[1 if is_delta else 0] += 1
                a[2] += sz
            stats = {int(k): int(v) for k, v in snap.bucket_stats.items()}
            rows = [
                (b, a[0], a[1], a[2], stats.get(b))
                for b, a in sorted(agg.items())
            ]
            return self.spark.createDataFrame(
                rows,
                "bucket int, n_base_files int, n_delta_files int, "
                "bytes long, max_offset_stat long",
            )
        if name == "refs":
            rows = [("main", "branch", self.current().version)] + [
                (n, "tag", v) for n, v in sorted(self.tags().items())
            ]
            return self.spark.createDataFrame(
                rows, "name string, type string, version long"
            )
        raise ValueError(
            f"unknown metadata table {name!r}; "
            "one of: snapshots, files, partitions, refs"
        )

    def history(self) -> list[Snapshot]:
        snaps, cur = [], self.current()
        while cur is not None:
            snaps.append(cur)
            if cur.parent_version is None:
                break
            parent = os.path.join(
                self._meta_dir, f"v{cur.parent_version}.metadata.json"
            )
            if not os.path.exists(parent):
                # parent expired (or a crash interrupted expiry between
                # metadata deletes and the root relink): the chain ends
                # here — same contract as Iceberg's expire_snapshots.
                break
            with open(parent) as f:
                cur = Snapshot.from_json(f.read())
        return snaps

    @contextlib.contextmanager
    def _commit_lock(self, timeout: float = 10.0, stale_after: float = 60.0):
        """Mutual exclusion across the check-and-swap window: an
        O_EXCL-created ``metadata/commit.lock`` held from the version
        check through the pointer replace, so two writers cannot both
        pass the check and clobber each other (the pre-lock CAS was
        advisory — both could read the same base in the race window).
        A lock older than `stale_after` is presumed crashed and broken;
        contention past `timeout` raises ConcurrentCommitError (the
        caller's retry path re-reads the base either way)."""
        lock = os.path.join(self._meta_dir, "commit.lock")
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock)
                except OSError:
                    continue  # holder released between open and stat
                if age > stale_after:
                    # break a crashed writer's lock — but under a break
                    # MUTEX with a re-verify, so two waiters cannot both
                    # decide "stale" and the second unlink a lock a live
                    # writer just (re)acquired (TOCTOU)
                    bl = lock + ".break"
                    try:
                        bfd = os.open(bl, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                        os.close(bfd)
                    except FileExistsError:
                        with contextlib.suppress(OSError):
                            if time.time() - os.path.getmtime(bl) > 5:
                                os.unlink(bl)  # crashed breaker
                        time.sleep(0.05)
                        continue
                    try:
                        with contextlib.suppress(OSError):
                            if time.time() - os.path.getmtime(lock) > stale_after:
                                os.unlink(lock)
                    finally:
                        with contextlib.suppress(OSError):
                            os.unlink(bl)
                    continue
                if time.monotonic() > deadline:
                    raise ConcurrentCommitError(
                        f"commit lock {lock} held for >{timeout}s; "
                        "another writer is committing (or crashed "
                        f"<{stale_after}s ago) — retry on a fresh base"
                    )
                time.sleep(0.05)
        try:
            yield
        finally:
            with contextlib.suppress(OSError):
                os.unlink(lock)

    # summary keys that carry the single-stream exactly-once fence: two
    # concurrent commits may not BOTH advance them (ingest-vs-ingest on
    # one stream is a real conflict; ingest-vs-maintenance is not)
    _FENCE_KEYS = ("batch_id", "max_offset_applied")

    def _check_pending_stage(self, snap: Snapshot) -> None:
        """Any commit at this version number — staged or not — would
        overwrite a pending staged snapshot's metadata file (both derive
        the number from the published head). Overwriting is legal only
        for a re-delivery of the SAME batch (crash-before-publish
        re-apply); a different batch must publish or abandon the pending
        stage first, else publish(N) would fast-forward to a snapshot
        missing the staged batch (stage path) or the staged batch's data
        would be silently orphaned (commit path).

        A metadata file at or below the PUBLISHED head is not a stage —
        it is a committed snapshot (a concurrent writer advanced the
        head past our assembled version); that case is the moved-head
        conflict, handled by the swap's expected-parent check and the
        rebase loop, so this guard must not fire for it."""
        with open(os.path.join(self._meta_dir, VERSION_HINT)) as f:
            head = int(f.read().strip())
        if snap.version <= head:
            return
        meta_path = os.path.join(
            self._meta_dir, f"v{snap.version}.metadata.json"
        )
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                existing = Snapshot.from_json(f.read())
            if existing.summary.get("batch_id") != snap.summary.get(
                "batch_id"
            ):
                raise ConcurrentCommitError(
                    f"a staged snapshot v{snap.version} for batch "
                    f"{existing.summary.get('batch_id')} is pending; "
                    "publish or abandon it before committing batch "
                    f"{snap.summary.get('batch_id')}"
                )

    def _validate_rebase(
        self,
        base: Snapshot,
        head: Snapshot,
        touched: set[str],
        summary_updates: dict[str, Any],
        schema_changed: bool,
    ) -> None:
        """Iceberg-style conflict validation: the head moved while this
        commit was in flight — rebasing (re-pointing the already-written
        data files at the new head) is sound ONLY if the interleaved
        commits are provably disjoint from ours. Raises
        ConcurrentCommitError otherwise; the caller surfaces it and the
        writer retries from a fresh read."""

        def conflict(why: str) -> ConcurrentCommitError:
            return ConcurrentCommitError(
                f"table {self.path} moved v{base.version} -> "
                f"v{head.version} while this commit was in flight and "
                f"cannot be rebased: {why}; re-read and retry"
            )

        if schema_changed or head.schema_json != base.schema_json:
            raise conflict("schema changed in one of the commits")
        for k in ("n_buckets", "key_col", "sort_order"):
            if head.summary.get(k) != base.summary.get(k):
                raise conflict(f"table property {k!r} changed")
        if any(k in summary_updates for k in self._FENCE_KEYS):
            if any(
                head.summary.get(k) != base.summary.get(k)
                for k in self._FENCE_KEYS
            ):
                raise conflict(
                    "both commits advance the batch fence (two ingest "
                    "writers on one stream)"
                )
        for b in sorted(touched):
            if head.bucket_dirs.get(b) != base.bucket_dirs.get(b):
                raise conflict(f"bucket {b} was rewritten concurrently")
            if head.delta_dirs.get(b, []) != base.delta_dirs.get(b, []):
                raise conflict(
                    f"bucket {b}'s pending deltas changed concurrently"
                )
            if head.bucket_stats.get(b) != base.bucket_stats.get(b):
                raise conflict(f"bucket {b}'s stats changed concurrently")

    def _finalize_commit(
        self,
        assemble,
        base: Snapshot,
        touched_buckets,
        summary_updates: dict[str, Any],
        schema_changed: bool,
        stage: bool,
        max_rebases: int = 3,
    ) -> Snapshot:
        """Assemble the snapshot against `base` and swap the pointer;
        on a moved head, validate disjointness and rebase (re-assemble
        against the new head — the data files are already on disk and
        carry over untouched) up to `max_rebases` times. `assemble` is
        a pure function Snapshot -> Snapshot."""
        snap = assemble(base)
        self._check_pending_stage(snap)
        if stage:
            self._write_metadata_file(snap)  # pointer untouched
            return snap
        touched = (
            None
            if touched_buckets is None
            else {str(b) for b in touched_buckets}
        )
        for _ in range(max_rebases):
            try:
                self._write_snapshot(
                    snap, expected_parent=snap.parent_version
                )
                return snap
            except ConcurrentCommitError:
                head = self.current()
                if head.version == snap.parent_version or touched is None:
                    # not a moved-head conflict (lock timeout / pending
                    # stage), or a full rewrite — nothing to rebase onto
                    raise
                self._validate_rebase(
                    base, head, touched, summary_updates, schema_changed
                )
                base = head
                snap = assemble(base)
                self._check_pending_stage(snap)
        self._write_snapshot(snap, expected_parent=snap.parent_version)
        return snap

    def _write_metadata_file(self, snap: Snapshot) -> None:
        meta_path = os.path.join(
            self._meta_dir, f"v{snap.version}.metadata.json"
        )
        with open(meta_path, "w") as f:
            f.write(snap.to_json())

    def publish(self, version: int) -> Snapshot:
        """Write-audit-publish: fast-forward the main pointer to a
        STAGED snapshot (``commit(..., stage=True)``) after its audit
        passed. Atomic CAS under the commit lock: the staged snapshot's
        parent must still be the current head, else
        ConcurrentCommitError (someone published in between — re-stage
        on the new base). Iceberg parity: stage-only commits +
        cherry-pick publish, the standard audit-gate pattern for
        production lake ingest."""
        snap = self.snapshot_at(version)  # raises if never staged/expired
        with self._commit_lock():
            hint = os.path.join(self._meta_dir, VERSION_HINT)
            with open(hint) as f:
                current = int(f.read().strip())
            if snap.parent_version != current:
                raise ConcurrentCommitError(
                    f"staged v{version} was built on v{snap.parent_version} "
                    f"but the table head is v{current}; re-stage on the "
                    "current head"
                )
            fd, tmp = tempfile.mkstemp(dir=self._meta_dir)
            with os.fdopen(fd, "w") as f:
                f.write(str(version))
            os.replace(tmp, hint)
        return snap

    def abandon_stage(self, version: int) -> None:
        """Explicitly discard a PENDING staged snapshot (an audit that
        failed, or a stage the caller walked away from). Deletes the
        staged metadata file under the commit lock; the staged data
        directories become unreferenced and the next
        :meth:`expire_snapshots` collects them.

        Without this, an abandoned stage wedges every later commit at
        the same version number with ConcurrentCommitError until
        `stage_grace_seconds` (default 24 h) ages it out — abandoning
        is documented as legal, so it needs a same-moment release
        valve, not a day-long wait.

        Refuses to touch anything at or below the published head (those
        are committed snapshots, not stages) or a version with no
        metadata file."""
        v = int(version)
        with self._commit_lock():
            hint = os.path.join(self._meta_dir, VERSION_HINT)
            with open(hint) as f:
                head = int(f.read().strip())
            if v <= head:
                raise ValueError(
                    f"v{v} is at or below the published head v{head} — "
                    "a committed snapshot, not a pending stage"
                )
            meta_path = os.path.join(self._meta_dir, f"v{v}.metadata.json")
            if not os.path.exists(meta_path):
                raise FileNotFoundError(
                    f"no staged snapshot v{v} to abandon"
                )
            os.remove(meta_path)

    def _write_snapshot(
        self, snap: Snapshot, expected_parent: int | None = None
    ) -> None:
        """Iceberg-style commit: write immutable metadata file, then
        atomically swap the version pointer (os.replace is atomic on
        POSIX — the single-writer analogue of the catalog CAS).

        `expected_parent`: optimistic-concurrency check — if another
        writer advanced the pointer since this commit's base snapshot
        was read, raise instead of silently clobbering its commit
        (Iceberg's CommitFailedException contract; the caller re-reads
        and retries on a fresh base). The check and the pointer swap
        happen under ``_commit_lock``, so concurrent same-base writers
        serialize: one commits, the other fails the check — defense in
        depth for a mis-deployed second writer; the engine is
        single-writer by design.
        """
        with self._commit_lock():
            if expected_parent is not None:
                hint = os.path.join(self._meta_dir, VERSION_HINT)
                with open(hint) as f:
                    current = int(f.read().strip())
                if current != expected_parent:
                    raise ConcurrentCommitError(
                        f"table {self.path} moved to v{current} while this "
                        f"commit was based on v{expected_parent}; re-read "
                        "and retry"
                    )
            self._write_metadata_file(snap)
            fd, tmp = tempfile.mkstemp(dir=self._meta_dir)
            with os.fdopen(fd, "w") as f:
                f.write(str(snap.version))
            os.replace(tmp, os.path.join(self._meta_dir, VERSION_HINT))

    # ---------- read ----------

    def read(
        self,
        buckets: list[int] | None = None,
        include_hidden: bool = False,
        version: int | None = None,
        tag: str | None = None,
    ) -> DataFrame:
        """Read the current snapshot, optionally pruned to some buckets.

        `version` time-travels to a historical snapshot (Iceberg
        `VERSION AS OF`): snapshots are immutable — a COW commit never
        rewrites a previous snapshot's files, only stops referencing
        them — so any un-expired version reads exactly as committed.
        `tag` resolves a named ref created by :meth:`create_tag`
        (mutually exclusive with `version`).

        The snapshot's schema is applied to every file; files predating
        an added column surface NULL for it (additive evolution without
        rewrite).

        Merge-on-read: buckets with pending delta files (see
        :meth:`commit_delta`) are resolved at scan time — base + deltas
        unioned, one per-key ``max_by`` under the table's LWW order —
        so every reader (CDF, views, lookup, erase, fsck) sees exactly
        the state a COW merge would have produced. Buckets without
        deltas scan their base file directly (zero MOR tax); the
        resolve aggregate shuffles only the DIRTY buckets' rows.
        """
        if tag is not None:
            if version is not None:
                raise ValueError("pass either version or tag, not both")
            version = self.tags()[tag]
        snap = self.current() if version is None else self.snapshot_at(version)
        schema = T.StructType.fromJson(snap.schema_json)

        want = None if buckets is None else {int(b) for b in buckets}
        dirty = sorted(
            int(b)
            for b, lst in snap.delta_dirs.items()
            if lst and (want is None or int(b) in want)
        )
        clean_dirs = [
            os.path.join(self.path, d)
            for b, d in sorted(snap.bucket_dirs.items(), key=lambda kv: int(kv[0]))
            if (want is None or int(b) in want) and int(b) not in dirty
        ]
        if not clean_dirs:
            df = self.spark.createDataFrame([], schema)
        else:
            df = self.spark.read.schema(schema).parquet(*clean_dirs)
        if dirty:
            dirty_dirs = [
                os.path.join(self.path, snap.bucket_dirs[str(b)])
                for b in dirty
                if str(b) in snap.bucket_dirs
            ] + [
                os.path.join(self.path, d)
                for b in dirty
                for d in snap.delta_dirs[str(b)]
            ]
            raw = self.spark.read.schema(schema).parquet(*dirty_dirs)
            df = df.unionByName(self._resolve_lww(raw, snap))
        if not include_hidden:
            if "_deleted" in df.columns:
                df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
            df = df.drop(*[c for c in df.columns if c.startswith("_")])
        return df

    def _resolve_lww(self, df: DataFrame, snap: Snapshot) -> DataFrame:
        """Collapse base + delta rows to the per-key LWW winner — the
        read-time half of merge-on-read. The order is the SAME total
        order the COW merge fences on: (order_cols..., _last_offset),
        with order_cols from the snapshot summary (default ["ts"],
        recorded by the first delta commit). Exact ties can only be the
        same event stored twice (a re-delivered batch both compacted
        into the base and still pending as a delta), so their payloads
        are identical and the winner choice is immaterial. One
        hash-shuffle with map-side combine over the dirty rows only."""
        keys = [
            k
            for k in (
                snap.summary.get("merge_keys")
                or [snap.summary["key_col"]]
            )
            if k in df.columns
        ]
        order_cols = [
            c
            for c in snap.summary.get("delta_order_cols", ["ts"])
            if c in df.columns
        ]
        for hidden, default in (
            ("_last_offset", F.lit(-1).cast("long")),
            ("_deleted", F.lit(False)),
        ):
            if hidden not in df.columns:
                df = df.withColumn(hidden, default)
        others = [c for c in df.columns if c not in keys]
        payload = F.struct(*others)
        order = F.struct(
            *[F.col(c) for c in order_cols], F.col("_last_offset")
        )
        return (
            df.groupBy(*keys)
            .agg(F.max_by(payload, order).alias("_w"))
            .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in others])
        )

    # ---------- write ----------

    def commit(
        self,
        df: DataFrame,
        touched_buckets: list[int] | None,
        summary_updates: dict[str, Any],
        new_schema: T.StructType | None = None,
        stage: bool = False,
        bucket_stats_updates: dict[int, int] | None = None,
        base: "Snapshot | None" = None,
    ) -> Snapshot:
        """Write `df` as the new content of `touched_buckets` (None = all),
        carrying over untouched buckets by reference, then commit.

        `df` must contain a ``_bucket`` int column; data is written
        ``partitionBy("_bucket")`` so each bucket gets its own directory
        (file-level pruning for later merges). ``_bucket`` itself is a
        derived partition transform, recomputed from the key on read
        when needed — it is not stored in the row data (same as Iceberg
        hidden partitioning).

        `stage=True` (write-audit-publish): the snapshot's data and
        metadata are fully written but the main pointer does NOT move —
        readers keep seeing the old head. Audit the staged snapshot via
        ``read(version=snap.version)``, then :meth:`publish` it (atomic
        fast-forward) or discard it with :meth:`abandon_stage` (a batch
        re-delivery after a crash re-stages; orphaned staged files are
        collected by ``expire_snapshots`` once they age past its stage
        grace period). Staged and non-staged commits for DIFFERENT
        batches collide on the same version number; both paths refuse
        to clobber a pending stage for another batch — so a stage left
        pending WEDGES all later commits (ConcurrentCommitError) until
        it is published, abandoned via :meth:`abandon_stage`, or aged
        out by expiry's ``stage_grace_seconds`` (default 24 h).

        Concurrency: a commit whose base moved underneath it is REBASED
        onto the new head and retried — without rewriting data — when
        the conflict is provably disjoint (Iceberg's optimistic retry
        with conflict validation): the new head must not have changed
        this commit's touched buckets (base dir, pending deltas, or
        stats), the schema/bucket domain, and at most ONE of the two
        commits may advance the batch fence. That lets maintenance
        (compaction, erasure, view syncs) run concurrently with ingest
        — the common multi-writer shape on a real cluster — while two
        ingest writers on one stream still conflict (single-stream
        fence). Overlapping buckets or a fence-vs-fence race raise
        ConcurrentCommitError as before.

        `base`: the snapshot the caller's `df` plan was READ from (the
        merge/maintenance read). Passing it extends the conflict window
        back to plan time — an interleaved commit between the caller's
        read and this swap is validated (and rebased or refused)
        instead of silently building on a stale read. Omitted, the
        window starts at this call (the pre-round-7 behavior).
        """
        prev = base if base is not None else self.current()
        snap_rel = os.path.join(
            "data", f"snap-{prev.version + 1}-{uuid.uuid4().hex[:8]}"
        )
        snap_dir = os.path.join(self.path, snap_rel)

        sort_order = prev.summary.get("sort_order")
        if sort_order and all(c in df.columns for c in sort_order):
            # declared table sort order: in-task sort only (rows are
            # already bucket-co-located), applied on every commit path
            # (merge / erase / rescale) uniformly
            df = df.sortWithinPartitions("_bucket", *sort_order)
        with fixed_shape_job(df.sparkSession):
            (
                df.write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(snap_dir)
            )

        # discover written bucket dirs (a bucket whose content became
        # empty — e.g. all rows deleted — simply disappears)
        new_dirs: dict[str, str] = {}
        if os.path.isdir(snap_dir):
            for entry in os.listdir(snap_dir):
                if entry.startswith("_bucket="):
                    b = entry.split("=", 1)[1]
                    new_dirs[b] = os.path.join(snap_rel, entry)

        def assemble(base: Snapshot) -> Snapshot:
            bucket_dirs = dict(base.bucket_dirs)
            if touched_buckets is None:
                bucket_dirs = dict(new_dirs)
            else:
                for b in touched_buckets:
                    bucket_dirs.pop(str(b), None)
                bucket_dirs.update(new_dirs)

            # a base rewrite SUBSUMES the rewritten buckets' pending MOR
            # deltas: every in-engine rewrite path (merge, compaction,
            # erase, rescale) derives its content from the
            # delta-resolving read(), so the new base already folds them
            # in. Untouched buckets keep their deltas by reference.
            if touched_buckets is None:
                delta_dirs: dict[str, list[str]] = {}
            else:
                cleared = {str(b) for b in touched_buckets}
                delta_dirs = {
                    b: list(lst)
                    for b, lst in base.delta_dirs.items()
                    if b not in cleared and lst
                }

            schema_json = (
                json.loads(new_schema.json())
                if new_schema is not None
                else base.schema_json
            )
            summary = dict(base.summary)
            summary.update(summary_updates)

            # Per-bucket max-_last_offset stats. Invariants:
            # - an UNTOUCHED bucket keeps its dir by reference, so its
            #   stat carries verbatim;
            # - a rewritten/new bucket dir keeps a stat ONLY if the
            #   caller declares one (`bucket_stats_updates`) — any
            #   commit that can raise a bucket's max _last_offset
            #   (merge, bootstrap) MUST declare; rewrite-only commits
            #   (erase) may re-declare the parent's value (still an
            #   upper bound), others drop to "unknown" (read_changes
            #   then reads the bucket — safe);
            # - a full rewrite (touched_buckets=None, e.g. rescale: the
            #   bucket DOMAIN changes) never carries parent stats.
            bucket_stats: dict[str, int] = {}
            if touched_buckets is not None:
                for b, d in base.bucket_dirs.items():
                    if (
                        bucket_dirs.get(b) == d
                        and b in base.bucket_stats
                    ):
                        bucket_stats[b] = base.bucket_stats[b]
                # delta-ONLY buckets (no base file yet) carried
                # untouched keep their stat with their deltas
                for b in delta_dirs:
                    if b not in bucket_stats and b in base.bucket_stats:
                        bucket_stats[b] = base.bucket_stats[b]
            if bucket_stats_updates:
                for bk, v in bucket_stats_updates.items():
                    if str(bk) in bucket_dirs:
                        bucket_stats[str(bk)] = int(v)

            return Snapshot(
                version=base.version + 1,
                schema_json=schema_json,
                bucket_dirs=bucket_dirs,
                summary=summary,
                parent_version=base.version,
                bucket_stats=bucket_stats,
                delta_dirs=delta_dirs,
            )

        return self._finalize_commit(
            assemble, prev, touched_buckets, summary_updates,
            schema_changed=new_schema is not None, stage=stage,
        )

    def commit_delta(
        self,
        df: DataFrame,
        summary_updates: dict[str, Any],
        stage: bool = False,
        stats_upper_bound: int | None = None,
        order_cols: tuple[str, ...] = ("ts",),
        base: "Snapshot | None" = None,
    ) -> Snapshot:
        """Merge-on-read commit (Iceberg v2 MOR parity): append `df`'s
        rows as per-bucket DELTA files — the base bucket files are not
        read, not rewritten, and carried by reference — and record them
        in the snapshot's ``delta_dirs``. Readers resolve the per-key
        LWW winner across base + deltas at scan time (:meth:`read`).

        This inverts COW's cost trade: a COW merge pays
        O(touched_buckets x bucket_size) read+write per batch; a delta
        commit pays O(batch) write and ZERO base reads, at the price of
        a resolve aggregate on every read of a dirty bucket. On a
        10^10-event feed where each micro-batch touches most buckets,
        MOR turns the per-batch write amplification from ~table-sized
        to batch-sized; :meth:`compact_buckets` folds deltas back into
        the base (restoring zero-tax reads) on whatever cadence the
        deployment chooses — exactly Iceberg's
        ``merge.mode=merge-on-read`` + ``rewrite_data_files`` pairing.

        `df` must carry ``_bucket`` plus the full hidden-column row
        shape (``_last_offset``, ``_deleted``) and at most ONE row per
        merge key (the caller LWW-dedupes the batch; see
        ``merge.merge_into(mode="mor")``). Multiple rows per key would
        still resolve correctly — max_by is order-insensitive — but
        would bloat the delta files.

        `stats_upper_bound`: the batch's max offset, recorded as the
        per-bucket max-_last_offset stat for every bucket this delta
        touches (changelog pruning keeps working under MOR).
        `order_cols` is recorded in the summary on first use so readers
        resolve under the same total order the writer fenced on.

        WAP (`stage=True`) composes exactly as with :meth:`commit`.

        `base`: see :meth:`commit` — the snapshot the caller's batch
        plan derived its bucket expression from.
        """
        prev = base if base is not None else self.current()
        snap_rel = os.path.join(
            "data", f"snap-{prev.version + 1}-{uuid.uuid4().hex[:8]}"
        )
        snap_dir = os.path.join(self.path, snap_rel)

        sort_order = prev.summary.get("sort_order")
        if sort_order and all(c in df.columns for c in sort_order):
            df = df.sortWithinPartitions("_bucket", *sort_order)
        with fixed_shape_job(df.sparkSession):
            df.write.mode("overwrite").partitionBy("_bucket").parquet(
                snap_dir
            )

        new_dirs: dict[str, str] = {}
        if os.path.isdir(snap_dir):
            for entry in os.listdir(snap_dir):
                if entry.startswith("_bucket="):
                    b = entry.split("=", 1)[1]
                    new_dirs[b] = os.path.join(snap_rel, entry)

        def assemble(base: Snapshot) -> Snapshot:
            delta_dirs = {
                b: list(lst) for b, lst in base.delta_dirs.items()
            }
            for b, d in new_dirs.items():
                delta_dirs.setdefault(b, []).append(d)

            summary = dict(base.summary)
            summary.update(summary_updates)
            recorded = summary.get("delta_order_cols")
            if recorded is None:
                summary["delta_order_cols"] = list(order_cols)
            elif list(order_cols) != list(recorded):
                raise ValueError(
                    f"delta order {list(order_cols)} conflicts with the "
                    f"table's recorded order {recorded}; all MOR commits "
                    "must fence on one total order"
                )

            # base files are untouched: every stat carries verbatim,
            # then the batch's bound raises the touched buckets'
            # (upper-bound semantics — max keeps it valid even for
            # out-of-order feeds)
            bucket_stats = dict(base.bucket_stats)
            if stats_upper_bound is not None:
                for b in new_dirs:
                    bucket_stats[b] = max(
                        int(bucket_stats.get(b, -1)),
                        int(stats_upper_bound),
                    )

            return Snapshot(
                version=base.version + 1,
                schema_json=base.schema_json,
                bucket_dirs=dict(base.bucket_dirs),
                summary=summary,
                parent_version=base.version,
                bucket_stats=bucket_stats,
                delta_dirs=delta_dirs,
            )

        # rebase contract (same as commit()): the appended delta dirs
        # are this commit's touched buckets — a concurrent maintenance
        # commit on DISJOINT buckets rebases cleanly; one that rewrote
        # or re-folded our buckets conflicts
        return self._finalize_commit(
            assemble, prev, sorted(new_dirs), summary_updates,
            schema_changed=False, stage=stage,
        )

    def rollback(self, version: int) -> Snapshot:
        """Iceberg ``rollback_to_snapshot`` parity: make `version`'s
        STATE the new head by committing a fresh snapshot that
        re-references that version's data dirs, deltas, schema,
        summary, and stats verbatim. History is preserved (the bad
        snapshots stay time-travelable until expiry) and the version
        counter keeps moving forward — a rollback is an auditable
        commit, not a pointer rewind, so expiry's keep-last window and
        the parent chain stay coherent.

        The summary carry includes the batch/offset FENCES as they
        were at `version`: after rolling back a bad batch, re-driving
        the feed from that frontier re-applies it exactly-once.
        Refuses to roll back while a WAP stage is pending (same
        pending-stage wedge rule as commit)."""
        prev = self.current()
        src = self.snapshot_at(version)
        snap = Snapshot(
            version=prev.version + 1,
            schema_json=src.schema_json,
            bucket_dirs=dict(src.bucket_dirs),
            summary={
                **src.summary,
                "rolled_back_from": prev.version,
                "rolled_back_to": version,
            },
            parent_version=prev.version,
            bucket_stats=dict(src.bucket_stats),
            delta_dirs={b: list(x) for b, x in src.delta_dirs.items()},
        )
        meta_path = os.path.join(
            self._meta_dir, f"v{snap.version}.metadata.json"
        )
        if os.path.exists(meta_path):
            raise ConcurrentCommitError(
                f"a staged snapshot v{snap.version} is pending; publish "
                "or abandon it before rolling back"
            )
        self._write_snapshot(snap, expected_parent=prev.version)
        return snap

    def expire_snapshots(
        self, keep_last: int = 2, stage_grace_seconds: float = 24 * 3600.0
    ) -> int:
        """Iceberg-style snapshot expiry: drop metadata older than the
        last `keep_last` snapshots and delete data directories no
        longer referenced by any kept snapshot. COW merges rewrite
        touched buckets every commit, so without expiry a long-running
        tail retains every historical copy of the table. Returns the
        number of data directories removed.

        PENDING STAGED snapshots (metadata versions above the published
        head — commit(stage=True) awaiting publish) are off the kept
        chain but are NOT orphans while a WAP audit may still publish
        them: their metadata and data (including carried-over bucket
        references) are protected until older than
        `stage_grace_seconds`, after which they are collected as
        abandoned. This makes expiry safe to run concurrently with a
        live pipeline that also stages merges (CdcPipeline runs expiry
        periodically on its own).

        TAGGED snapshots (:meth:`create_tag`) are retained indefinitely
        — metadata and every bucket directory they reference — exactly
        Iceberg's tag-retention contract; dropping the tag releases
        them to the next expiry.

        Single-writer: safe to run between commits (readers in this
        engine resolve the snapshot at read time on the same driver).
        """
        import shutil
        import time as _time

        snaps = self.history()  # newest first
        keep = snaps[:keep_last]
        # NOTE: no "nothing on the chain to drop" early return — expiry
        # must also collect OFF-chain metadata (aged-out stages, a
        # dropped tag's snapshot), which the scan below finds even when
        # the kept chain is already minimal.

        # collect pending stages still inside the grace period
        import re as _re

        head = snaps[0].version
        pending: list[Snapshot] = []
        now = _time.time()
        for fn in os.listdir(self._meta_dir):
            m = _re.fullmatch(r"v(\d+)\.metadata\.json", fn)
            if m and int(m.group(1)) > head:
                p = os.path.join(self._meta_dir, fn)
                try:
                    fresh = (now - os.path.getmtime(p)) < stage_grace_seconds
                    if fresh:
                        with open(p) as f:
                            pending.append(Snapshot.from_json(f.read()))
                except FileNotFoundError:
                    pass

        # Crash-safe ordering: FIRST re-link the oldest kept snapshot as
        # the history root (atomic tmp + os.replace, same protocol as
        # _write_snapshot), THEN delete dropped metadata and data. A
        # crash at any point leaves the kept chain self-contained —
        # worst case some dropped files survive until the next expiry
        # (idempotent re-run), never a kept snapshot pointing at a
        # removed parent.
        oldest = keep[-1]
        if oldest.parent_version is not None:
            oldest.parent_version = None
            fd, tmp = tempfile.mkstemp(dir=self._meta_dir)
            with os.fdopen(fd, "w") as f:
                f.write(oldest.to_json())
            os.replace(
                tmp,
                os.path.join(self._meta_dir, f"v{oldest.version}.metadata.json"),
            )

        # Deletion is a *scan* for anything the kept chain doesn't
        # reference — not a walk of the dropped snapshots — so a re-run
        # after a crash also collects orphans the crashed run left
        # behind (idempotent GC, same shape as Iceberg's
        # remove_orphan_files).
        # tagged snapshots: load them (if still present) and retain
        tagged: list[Snapshot] = []
        for _name, v in self.tags().items():
            try:
                tagged.append(self.snapshot_at(v))
            except FileNotFoundError:
                pass  # tag points at an already-expired snapshot

        import re

        kept_versions = {s.version for s in keep} | {
            s.version for s in pending
        } | {s.version for s in tagged}
        referenced = {
            d
            for s in keep + pending + tagged
            for d in s.bucket_dirs.values()
        } | {
            d
            for s in keep + pending + tagged
            for lst in s.delta_dirs.values()
            for d in lst
        }
        kept_roots = {os.path.dirname(d) for d in referenced}
        removed = 0
        for fn in os.listdir(self._meta_dir):
            m = re.fullmatch(r"v(\d+)\.metadata\.json", fn)
            if m and int(m.group(1)) not in kept_versions:
                try:
                    os.remove(os.path.join(self._meta_dir, fn))
                except FileNotFoundError:
                    pass
        data_root = os.path.join(self.path, "data")
        for root in os.listdir(data_root) if os.path.isdir(data_root) else []:
            rel_root = os.path.join("data", root)
            full = os.path.join(data_root, root)
            if not os.path.isdir(full):
                continue
            for entry in os.listdir(full):
                if not entry.startswith("_bucket="):
                    continue
                if os.path.join(rel_root, entry) not in referenced:
                    shutil.rmtree(os.path.join(full, entry), ignore_errors=True)
                    removed += 1
            # drop snapshot roots that hold no referenced bucket dirs
            # (only _SUCCESS markers left after the bucket dirs went)
            if rel_root not in kept_roots and not any(
                e.startswith("_bucket=") for e in os.listdir(full)
            ):
                shutil.rmtree(full, ignore_errors=True)
        return removed

    def _buckets_changed_since(self, offset_start: int, snap) -> list[int]:
        """Bucket ids that COULD hold a row whose winning offset is
        >= `offset_start`, from the snapshot's per-bucket max-offset
        stats alone (no scan). Buckets without a stat (pre-stats
        snapshots, full rewrites) are conservatively included."""
        return [
            int(b)
            for b in set(snap.bucket_dirs) | set(snap.delta_dirs)
            if b not in snap.bucket_stats
            or int(snap.bucket_stats[b]) >= offset_start
        ]

    def read_changes(
        self,
        offset_start: int,
        offset_end: int | None = None,
        buckets: list[int] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Change-data-feed read (Delta CDF / Iceberg changelog parity):
        the post-images of every key whose current winner arrived in
        the offset range, with `_change_type` 'delete' for tombstoned
        keys and 'upsert' otherwise.

        Zero write-path cost: the merge already stamps each row's
        winning offset in `_last_offset`, so the changelog for a batch
        is a *filter of the committed data* — no diffing of snapshots,
        no extra commit-time write. A key whose event in the range LOST
        the LWW race (an out-of-order older event) correctly produces no
        change row, because the table row it failed to displace carries
        the earlier winner's offset.

        Scale shape: the snapshot's per-bucket max-_last_offset stats
        (maintained for free at commit time — Iceberg manifest-stats
        parity) prune the scan to buckets that COULD hold a change in
        the range, so an incremental "what changed since offset X" read
        costs O(buckets touched since X), not O(table); within the kept
        buckets the `_last_offset` range predicate pushes to the
        parquet scan. Buckets without a stat (pre-stats snapshots, full
        rewrites) are conservatively read. Offset ranges per
        batch/version come from checkpoint records or snapshot
        summaries (`max_offset_applied`); see
        `changes_between_versions`.

        `version`: read the changelog AS OF that snapshot — required
        when the range's upper bound predates later commits (a key
        changed in the window and again afterwards carries the LATER
        offset in the current snapshot and would otherwise be missed).
        """
        snap = self.current() if version is None else self.snapshot_at(version)
        can_hold = self._buckets_changed_since(offset_start, snap)
        pruned = (
            can_hold
            if buckets is None
            else sorted(set(can_hold) & set(int(b) for b in buckets))
        )
        df = self.read(buckets=pruned, include_hidden=True, version=version)
        cond = F.col("_last_offset") >= offset_start
        if offset_end is not None:
            cond = cond & (F.col("_last_offset") <= offset_end)
        changed = df.filter(cond)
        return changed.select(
            *[c for c in changed.columns if not c.startswith("_")],
            F.when(F.coalesce(F.col("_deleted"), F.lit(False)), "delete")
            .otherwise("upsert")
            .alias("_change_type"),
            F.col("_last_offset").alias("_commit_offset"),
        )

    def lookup(self, key_value, include_hidden: bool = False) -> DataFrame:
        """Point read of one key: hash it to its bucket with the same
        transform the writer used, scan ONLY that bucket's directory,
        and filter the key equality there — O(one bucket) I/O however
        large the table is (Iceberg bucket-transform partition pruning;
        serving-path complement of the merge's write-side pruning).

        The bucket id is computed with a one-row local Spark job so the
        hash is bit-identical to the JVM xxhash64 the writer used —
        ~10 ms, not a scan.
        """
        summary = self.summary()
        key_col = summary["key_col"]
        n_buckets = int(summary["n_buckets"])
        b = (
            self.spark.range(1)
            .select(bucket_expr(F.lit(key_value), n_buckets).alias("b"))
            .collect()[0]["b"]
        )
        df = self.read(buckets=[int(b)], include_hidden=include_hidden)
        return df.filter(F.col(key_col) == key_value)

    def fsck(self, check_rows: bool = True) -> dict[str, Any]:
        """Lake consistency check (ops tool; `python -m omniparser_spark
        --fsck`). Verifies, without mutating anything:

        - the version pointer resolves and every snapshot on the kept
          chain references existing bucket directories (a miss means
          data loss — ERROR);
        - unreferenced data roots are counted (WARNING only: expected
          debris after a crash or an abandoned WAP stage; the next
          ``expire_snapshots`` collects them);
        - a stale ``commit.lock`` is reported (crashed writer);
        - with `check_rows` (two full-scan Spark jobs — it is an fsck:
          one combined count/wrong-bucket aggregate, one merge-key
          uniqueness groupBy): every stored row hashes to the bucket
          directory it lives in (a mismatch means a corrupted bucket
          transform — ERROR) and the merge keys are unique among live
          rows (ERROR).

        Returns {"ok": bool, "errors": [...], "warnings": [...],
        stats...}.
        """
        errors: list[str] = []
        warnings: list[str] = []
        snaps = self.history()
        summary = self.summary()
        key_col = summary["key_col"]
        n_buckets = int(summary["n_buckets"])

        referenced: set[str] = set()
        for s in snaps:
            for d in [
                *s.bucket_dirs.values(),
                *(x for lst in s.delta_dirs.values() for x in lst),
            ]:
                referenced.add(d)
                if not os.path.isdir(os.path.join(self.path, d)):
                    errors.append(
                        f"snapshot v{s.version} references missing dir {d}"
                    )
        for name, v in self.tags().items():
            try:
                ts = self.snapshot_at(v)
            except FileNotFoundError:
                errors.append(
                    f"tag {name!r} points at missing snapshot v{v}"
                )
                continue
            for d in [
                *ts.bucket_dirs.values(),
                *(x for lst in ts.delta_dirs.values() for x in lst),
            ]:
                referenced.add(d)
                if not os.path.isdir(os.path.join(self.path, d)):
                    errors.append(
                        f"tag {name!r} (v{v}) references missing dir {d}"
                    )
        kept_roots = {os.path.dirname(d) for d in referenced}
        data_root = os.path.join(self.path, "data")
        orphans = 0
        if os.path.isdir(data_root):
            for root in os.listdir(data_root):
                if os.path.join("data", root) not in kept_roots:
                    orphans += 1
        if orphans:
            warnings.append(
                f"{orphans} unreferenced data root(s) (crash/stage "
                "debris; expire_snapshots collects them)"
            )
        lock = os.path.join(self._meta_dir, "commit.lock")
        if os.path.exists(lock):
            age = time.time() - os.path.getmtime(lock)
            (warnings if age < 60 else errors).append(
                f"commit.lock present ({age:.0f}s old)"
            )

        row_stats: dict[str, Any] = {}
        if check_rows and not errors:
            cur = self.current()
            parts = []
            per_bucket: list[tuple[str, str]] = [
                *cur.bucket_dirs.items(),
                *(
                    (b, d)
                    for b, lst in cur.delta_dirs.items()
                    for d in lst
                ),
            ]
            for b, d in per_bucket:
                parts.append(
                    self.spark.read.schema(self.schema())
                    .parquet(os.path.join(self.path, d))
                    .select(
                        F.col(key_col).alias("_k"),
                        F.lit(int(b)).alias("_dir_b"),
                    )
                )
            if parts:
                import functools

                allb = functools.reduce(lambda a, x: a.unionByName(x), parts)
                agg = allb.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count(
                        F.when(
                            bucket_expr(F.col("_k"), n_buckets)
                            != F.col("_dir_b"),
                            1,
                        )
                    ).alias("bad"),
                ).collect()[0]
                if int(agg["bad"]):
                    errors.append(
                        f"{int(agg['bad'])} row(s) in the wrong bucket dir"
                    )
                row_stats["rows_checked"] = int(agg["n"])
                merge_keys = list(
                    summary.get("merge_keys") or [key_col]
                )
                dups = (
                    self.read()
                    .groupBy(*merge_keys)
                    .count()
                    .filter(F.col("count") > 1)
                    .count()
                )
                if dups:
                    errors.append(
                        f"{dups} duplicate live merge-key group(s)"
                    )
        return {
            "ok": not errors,
            "errors": errors,
            "warnings": warnings,
            "snapshots": len(snaps),
            "current_version": snaps[0].version if snaps else None,
            "orphan_data_roots": orphans,
            **row_stats,
        }

    def erase_where(
        self,
        predicate: Column,
        key_values: list | None = None,
    ) -> dict[str, Any]:
        """PHYSICAL erasure (GDPR/right-to-be-forgotten): rewrite the
        touched buckets with every row matching `predicate` removed —
        including tombstones, so no trace of the key remains in the
        current snapshot (Iceberg `DELETE FROM` with copy-on-write).
        Returns {snapshot_version, rows_erased, touched_buckets}.

        `key_values`: when the erasure targets known bucket-key values
        (the common case: erase these conv_ids), pass them so the
        rewrite prunes to their buckets — O(matching buckets), not
        O(table). A free predicate rewrites every bucket.

        Semantics notes:
        - This is a point-in-time TABLE operation, not a change event:
          it does not advance the offset/batch fence, and a later feed
          event for an erased key will legitimately re-insert it —
          upstream must also drop the subject's events (standard
          erasure-pipeline practice).
        - Prior snapshots still reference the old files; follow with
          :meth:`expire_snapshots` (as the CDC loop already does each
          batch) to physically drop them. Time travel to pre-erasure
          versions then fails, by design.
        """
        pre = self.current()
        summary = pre.summary
        key_col = summary["key_col"]
        n_buckets = int(summary["n_buckets"])
        if key_values is not None:
            key_type = next(
                f.dataType for f in self.schema().fields if f.name == key_col
            )
            vals = self.spark.createDataFrame(
                [(v,) for v in key_values],
                T.StructType([T.StructField(key_col, key_type)]),
            )
            buckets = sorted(
                int(r["b"])
                for r in vals.select(
                    bucket_expr(key_col, n_buckets).alias("b")
                ).distinct().collect()
            )
        else:
            buckets = list(range(n_buckets))

        target = self.read(
            buckets=buckets, include_hidden=True, version=pre.version
        )
        for hidden, default in (("_last_offset", F.lit(-1).cast("long")),
                                ("_deleted", F.lit(False))):
            if hidden not in target.columns:
                target = target.withColumn(hidden, default)
        marked = target.withColumn(
            "_erase", F.coalesce(predicate, F.lit(False))
        )
        # explicit count, not an Observation: when the erasure empties
        # its buckets the commit write collapses to an empty relation
        # and a CollectMetrics node would never fire. Erasure is a rare
        # maintenance op; one extra scan of the PRUNED buckets is fine.
        erased = int(
            marked.agg(
                F.count(F.when(F.col("_erase"), 1)).alias("e")
            ).collect()[0]["e"]
        )
        kept = repartition_exact_buckets(
            marked.filter(~F.col("_erase"))
            .drop("_erase")
            .withColumn("_bucket", bucket_expr(key_col, n_buckets)),
            buckets,
        )
        snap = self.commit(
            kept,
            touched_buckets=buckets,
            summary_updates={},
            # erasure only REMOVES rows: the parent's per-bucket max
            # _last_offset stays a valid upper bound — re-declare it so
            # changelog pruning keeps working across erasures
            bucket_stats_updates={
                int(b): pre.bucket_stats[str(b)]
                for b in buckets
                if str(b) in pre.bucket_stats
            },
            base=pre,
        )
        return {
            "snapshot_version": snap.version,
            "rows_erased": erased,
            "touched_buckets": buckets,
        }

    def compact_buckets(
        self,
        min_files: int = 2,
        buckets: list[int] | None = None,
    ) -> dict[str, Any]:
        """Small-file compaction (Iceberg ``rewrite_data_files`` /
        Delta ``OPTIMIZE`` parity): rewrite each selected bucket's
        content — byte-identical rows — into ONE file per bucket.

        Why it exists: the merge path already co-locates each touched
        bucket into one task (one file per bucket per rewrite), but
        that invariant deliberately does NOT hold for high-parallelism
        bulk writes — a ``bootstrap(files_per_bucket=k)`` initial load
        spreads each bucket over ~k writers precisely so a 100 TB
        onboarding isn't serialized through n_buckets tasks — and a
        direct :meth:`commit` caller may ship whatever partitioning
        its frame arrived with. Those paths leave k+ files per bucket,
        and at scale the per-file open/footer cost taxes every
        subsequent scan and changelog read. Compaction is the
        maintenance half of that trade (Iceberg's write-time
        clustering vs `rewrite_data_files` split): run it after a
        bulk load or periodically in the apply loop's tail, like
        `expire_snapshots`, to restore one file per bucket.

        Changelog-neutral by construction: `read_changes` is a filter
        on the stored `_last_offset` column (zero write-path CDF), and
        compaction rewrites rows verbatim — hidden columns included —
        so every changelog read before/after compaction is identical.
        The parent's per-bucket max-offset stats are re-declared
        exactly (content unchanged ⇒ the stat is exact, not merely an
        upper bound), so incremental-sync pruning keeps working.

        Selection: only buckets whose directory holds >= `min_files`
        data files are rewritten (a one-file bucket gains nothing);
        `buckets` restricts further. File counting is a driver-side
        directory listing — O(n_buckets) metadata, the same class as
        snapshot bookkeeping, no Spark job.

        NOT a change event: the offset/batch fence does not move, so it
        can never mask or replay a batch. Prior snapshots still
        reference the old small files until `expire_snapshots` drops
        them (time travel across the compaction keeps working until
        then). Returns {snapshot_version, compacted_buckets,
        files_before, files_after}; no commit at all if nothing
        qualifies.
        """
        snap = self.current()
        summary = snap.summary
        key_col = summary["key_col"]
        n_buckets = int(summary["n_buckets"])

        def _n_files(rel: str) -> int:
            d = os.path.join(self.path, rel)
            try:
                return sum(
                    1 for e in os.listdir(d)
                    if e.endswith(".parquet") and not e.startswith((".", "_"))
                )
            except FileNotFoundError:
                return 0

        # MOR deltas count toward a bucket's file tally, so compaction
        # doubles as delta folding: reading via the delta-resolving
        # read() and rewriting the base clears the bucket's delta list
        # (commit() subsumption rule) — Iceberg rewrite_data_files'
        # delete-file compaction in one op.
        counts = {
            int(b): _n_files(snap.bucket_dirs.get(str(b), ""))
            + sum(_n_files(d) for d in snap.delta_dirs.get(str(b), []))
            for b in {int(x) for x in snap.bucket_dirs}
            | {int(x) for x in snap.delta_dirs}
        }
        eligible = sorted(
            b for b, n in counts.items()
            if n >= max(int(min_files), 2)
            and (buckets is None or b in set(int(x) for x in buckets))
        )
        if not eligible:
            return {
                "snapshot_version": snap.version,
                "compacted_buckets": [],
                "files_before": 0,
                "files_after": 0,
            }

        target = self.read(
            buckets=eligible, include_hidden=True, version=snap.version
        )
        for hidden, default in (("_last_offset", F.lit(-1).cast("long")),
                                ("_deleted", F.lit(False))):
            if hidden not in target.columns:
                target = target.withColumn(hidden, default)
        # one partition per bucket -> exactly one output file per
        # bucket directory, with exact 1:1 placement (no hash-collision
        # stragglers in the rewrite stage)
        packed = repartition_exact_buckets(
            target.withColumn("_bucket", bucket_expr(key_col, n_buckets)),
            eligible,
        )
        new_snap = self.commit(
            packed,
            touched_buckets=eligible,
            summary_updates={},
            bucket_stats_updates={
                b: snap.bucket_stats[str(b)]
                for b in eligible
                if str(b) in snap.bucket_stats
            },
            base=snap,
        )
        after = sum(
            _n_files(d)
            for b, d in new_snap.bucket_dirs.items()
            if int(b) in set(eligible)
        )
        return {
            "snapshot_version": new_snap.version,
            "compacted_buckets": eligible,
            "files_before": sum(counts[b] for b in eligible),
            "files_after": after,
        }

    def read_changes_with_preimage(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """CDF with pre-images (Delta `update_preimage` parity): every
        key changed after `from_version` with both its post-image
        columns and a `_pre` struct of the same columns as of
        `from_version` (NULL for inserts). This is what incremental
        view maintenance needs — apply `delta = f(post) - f(_pre)` to a
        downstream aggregate instead of recomputing it from the full
        table.

        Cost: the post-image filter scan (as read_changes) + a join
        against ONLY the changed keys' rows of the base snapshot —
        snapshots are immutable files, so the base read is exact and
        prunable, no log replay.
        """
        summary = self.summary()
        # the declared row identity (full merge key), not the bucket
        # key; tables written before merge_keys existed used the merge
        # module's DEFAULT_KEYS, so fall back to those (restricted to
        # the schema), never to the bucket key alone
        from omniparser_spark.lake.merge import DEFAULT_KEYS

        schema_cols = [f.name for f in self.schema().fields]
        keys = list(
            summary.get("merge_keys")
            or [c for c in DEFAULT_KEYS if c in schema_cols]
            or [summary["key_col"]]
        )
        post = self.changes_between_versions(from_version, to_version)
        # prune the pre-image read to the window's candidate buckets: a
        # key's bucket is a pure hash of the bucket key, so every
        # changed key's pre-image lives in a bucket whose max-offset
        # stat (in the TO snapshot) reaches into the window — the same
        # metadata prune read_changes uses for the post side. Without
        # this the pre read is an O(table) snapshot scan per sync (the
        # r6 verdict's scale-killer class, source-side twin). Only
        # valid while both snapshots share a bucket layout — a rescale
        # inside the window falls back to the full pre read.
        cur_v = self.current().version
        to_v = cur_v if to_version is None else to_version
        snap_from = self.snapshot_at(from_version)
        snap_to = self.snapshot_at(to_v)
        lo = int(snap_from.summary.get("max_offset_applied", -1))
        same_layout = int(snap_from.summary.get("n_buckets", -1)) == int(
            snap_to.summary.get("n_buckets", -2)
        )
        pre_buckets = (
            self._buckets_changed_since(lo + 1, snap_to)
            if same_layout
            else None
        )
        pre = self.read(
            version=from_version, include_hidden=True, buckets=pre_buckets
        )
        data_cols = [
            c for c in post.columns
            if not c.startswith("_") and c not in keys
        ]
        # additive schema evolution between the two versions: a column
        # born after from_version has no pre-image — NULL-fill it at
        # the post schema's type so the _pre struct always matches the
        # post columns (otherwise the select below fails to resolve)
        post_types = dict(post.dtypes)
        pre_types = dict(pre.dtypes)
        for c in data_cols:
            if c not in pre.columns:
                pre = pre.withColumn(
                    c, F.lit(None).cast(post_types[c])
                )
            elif pre_types[c] != post_types[c]:
                # type-widening evolution: surface the pre-image at the
                # post (wide) type so _pre's struct fields line up
                pre = pre.withColumn(c, F.col(c).cast(post_types[c]))
        pre_live = pre.filter(
            ~F.coalesce(F.col("_deleted"), F.lit(False))
        ).select(*keys, F.struct(*data_cols).alias("_pre"))
        return post.join(pre_live, on=keys, how="left")

    def changes_between_versions(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """CDF keyed by snapshot versions: every key changed AFTER
        `from_version` up to `to_version` (default: current). Offset
        bounds are reconstructed from the immutable snapshot summaries
        (`max_offset_applied`), so this is metadata + one pruned scan."""
        cur = self.current()
        to_v = cur.version if to_version is None else to_version
        lo = int(self.snapshot_at(from_version).summary.get("max_offset_applied", -1))
        hi = int(self.snapshot_at(to_v).summary.get("max_offset_applied", -1))
        # read AS OF to_v: a key changed inside the window and again
        # after it carries the later offset in the current snapshot and
        # would be silently dropped by the range filter
        return self.read_changes(
            lo + 1, hi, version=None if to_v == cur.version else to_v
        )

    def rescale_buckets(self, new_n_buckets: int) -> Snapshot:
        """Online bucket rescale (Iceberg `REPLACE PARTITION FIELD
        bucket(N, key)` + rewrite): one full-table COW rewrite into the
        new bucket count, committed as a normal snapshot. Run this when
        the table outgrows its bucket count (merge cost stays
        O(batch-key-footprint) only while a typical batch touches a
        strict subset of buckets — see merge_into's cost model); readers
        and subsequent merges pick the new count up from the snapshot
        summary, and time travel to pre-rescale versions still works
        (their metadata pins their own bucket dirs)."""
        summary = self.summary()
        key_col = summary["key_col"]
        df = repartition_exact_buckets(
            self.read(include_hidden=True).withColumn(
                "_bucket", bucket_expr(key_col, new_n_buckets)
            ),
            new_n_buckets,
        )
        return self.commit(
            df,
            touched_buckets=None,
            summary_updates={"n_buckets": new_n_buckets},
        )

    def evolve_schema_additive(self, new_cols: T.StructType) -> None:
        """ALTER TABLE ADD COLUMNS — metadata-only, no data rewrite."""
        prev = self.current()
        schema = T.StructType.fromJson(prev.schema_json)
        existing = {f.name for f in schema.fields}
        added = [f for f in new_cols.fields if f.name not in existing]
        if not added:
            return
        merged = T.StructType(schema.fields + [
            T.StructField(f.name, f.dataType, True) for f in added
        ])
        snap = Snapshot(
            version=prev.version + 1,
            schema_json=json.loads(merged.json()),
            bucket_dirs=prev.bucket_dirs,
            summary=dict(prev.summary),
            parent_version=prev.version,
            # metadata-only commit: data files are untouched, so the
            # per-bucket max-offset stats carry over verbatim (dropping
            # them silently disables changelog bucket pruning for every
            # table that ever evolves its schema)
            bucket_stats=dict(prev.bucket_stats),
            delta_dirs={b: list(x) for b, x in prev.delta_dirs.items()},
        )
        self._write_snapshot(snap, expected_parent=prev.version)

    # safe widenings: parquet files written at the narrow type read
    # correctly under the wide read schema (verified against Spark 4's
    # vectorized parquet reader; Iceberg V2 type-promotion set)
    _WIDENINGS = {
        ("integer", "long"),
        ("float", "double"),
        ("short", "integer"),
        ("short", "long"),
        ("byte", "short"),
        ("byte", "integer"),
        ("byte", "long"),
    }

    def evolve_schema_widen(self, widened: dict[str, T.DataType]) -> None:
        """ALTER TABLE ALTER COLUMN TYPE along the safe widening
        lattice (int->long, float->double, ...) — metadata-only, no
        data rewrite: old files keep their narrow physical type and the
        read schema widens them at scan time (Iceberg type-promotion
        parity). Raises on any non-widening change (string<->numeric,
        narrowing) — those require a real rewrite and are refused
        rather than corrupting reads."""
        prev = self.current()
        schema = T.StructType.fromJson(prev.schema_json)
        by_name = {f.name: f for f in schema.fields}
        changed = False
        for col, new_type in widened.items():
            if col not in by_name:
                raise ValueError(f"no such column: {col}")
            old_type = by_name[col].dataType
            if old_type == new_type:
                continue
            pair = (old_type.typeName(), new_type.typeName())
            if pair not in self._WIDENINGS:
                raise ValueError(
                    f"{col}: {pair[0]} -> {pair[1]} is not a safe "
                    "widening; rewrite the table instead"
                )
            by_name[col] = T.StructField(col, new_type, by_name[col].nullable)
            changed = True
        if not changed:
            return
        merged = T.StructType([by_name[f.name] for f in schema.fields])
        snap = Snapshot(
            version=prev.version + 1,
            schema_json=json.loads(merged.json()),
            bucket_dirs=prev.bucket_dirs,
            summary=dict(prev.summary),
            parent_version=prev.version,
            # metadata-only commit: data files are untouched, so the
            # per-bucket max-offset stats carry over verbatim (dropping
            # them silently disables changelog bucket pruning for every
            # table that ever evolves its schema)
            bucket_stats=dict(prev.bucket_stats),
            delta_dirs={b: list(x) for b, x in prev.delta_dirs.items()},
        )
        self._write_snapshot(snap, expected_parent=prev.version)
