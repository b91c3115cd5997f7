"""Tiered continuous aggregates (1m → 1h → 1d) with retention, lineage, and
checkpoint-resume — the north-star rollup pipeline.

Physical design (SURVEY.md §7, BASELINE.json north_rule):

- **Decomposable partials.** Each tier stores ``(n, sum, min, max, sum_sq)``
  per (url, bin). 1h re-aggregates the 1m *partials* (sum of n/sum/sum_sq,
  min of min, max of max), 1d re-aggregates 1h — no re-scan of raw pages
  (the "factor windows" rewrite of correlated window aggregates, ICDE'22:
  coarser windows computed from finer factor windows).
  mean = sum/n and std = sqrt(sum_sq/n − mean²) are derived at read time, so
  every tier's points match a direct computation from raw data exactly.
- **Range-bucket partitioning on warc_ts.** Output parquet is partitioned by
  ``ts_bucket`` (hours for 1m tier, days above); at 10^12 rows this is what
  partition pruning and retention expiry operate on (range encoding for
  partition elimination, EDBT'18). (Iceberg's
  ``hours(warc_ts)`` partition transform is the cluster-deployment analog;
  the sandbox stand-in is hive-style parquet partitions.)
- **Retention expiry** = dropping whole ts_bucket partitions — an O(1)
  metadata operation, never a row-level delete.
- **Resumable jobs.** A ``_lineage`` parquet table records one row per
  (tier, ts_bucket) with row counts and a content fingerprint, committed
  after the bucket's files land. On restart, buckets present in lineage are
  skipped — the batch analog of the reference's carried operator state
  (SURVEY.md §2.11: partial bins / zi / phase become resume checkpoints).
- **Skew.** The 1m groupBy key is (url, bin) — high cardinality, so Spark's
  partial aggregation + AQE absorb hot domains. The per-key *ordered* kernels
  (EWMA etc.) are where a hot url would serialize; :func:`salted_repartition`
  splits those by (url, salt) when a single url's history outgrows a task.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TIERS = {"1m": 60, "1h": 3600, "1d": 86400}
PARTIAL_COLS = ["n", "sum", "min", "max", "sum_sq"]


def pages_signal(pages: DataFrame) -> DataFrame:
    """The rollup input signal: per-crawl page size per url
    (``value = length(html)``), plus epoch-seconds ts."""
    return pages.select(
        "url",
        F.col("warc_ts").cast("double").alias("ts"),
        F.length("html").cast("double").alias("value"),
    )


def rollup_base(signal: DataFrame, bin_seconds: int = 60) -> DataFrame:
    """Tier-1 rollup from raw signal: decomposable partials per (url, bin_m)."""
    b = F.floor(F.col("ts") / bin_seconds).cast("bigint")
    return (
        signal.withColumn("bin_m", b)
        .groupBy("url", "bin_m")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.sum(F.col("value") * F.col("value")).alias("sum_sq"),
        )
    )


def rollup_next(prev: DataFrame, factor: int) -> DataFrame:
    """Re-aggregate a finer tier's partials into a coarser tier
    (1m → 1h: factor=60; 1h → 1d: factor=24)."""
    return (
        prev.withColumn("bin_m", F.floor(F.col("bin_m") / factor).cast("bigint"))
        .groupBy("url", "bin_m")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.sum("sum_sq").alias("sum_sq"),
        )
    )


def finalize(rollup: DataFrame, bin_seconds: int) -> DataFrame:
    """Derive mean/std and the bin's start timestamp from the partials."""
    mean = F.col("sum") / F.col("n")
    var = F.col("sum_sq") / F.col("n") - mean * mean
    return rollup.select(
        "url",
        "bin_m",
        (F.col("bin_m") * bin_seconds).cast("double").alias("bin_ts"),
        "n",
        "sum",
        "min",
        "max",
        mean.alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("std"),
    )


def _bucket_col(bin_seconds: int):
    """Partition bucket: hours for sub-hour tiers, days otherwise."""
    per = 3600 if bin_seconds < 3600 else 86400
    return F.floor(F.col("bin_m") * bin_seconds / per).cast("bigint").alias("ts_bucket")


def _bucket_writer(staging: str):
    """mapInArrow task body: write this task's rows into one parquet file per
    ts_bucket under ``staging`` and emit (ts_bucket, n_rows) stats.

    The data is hash-partitioned on ts_bucket AND sorted within partitions
    by ts_bucket before this runs, so a bucket is wholly owned by exactly
    one task and arrives as one contiguous run — one file per bucket, named
    deterministically ``part-<partitionId>.parquet``, with at most ONE open
    ParquetWriter per task (the sort is what Spark's own dynamic-partition
    writer does for the same reason; without it a task holding thousands of
    buckets would hold thousands of writer buffers). Retried or speculative
    attempts write identical content (the repartition hash and sort keys
    are deterministic) to a uuid-suffixed temp and atomically rename onto
    the same final name, so duplicate attempts are idempotent — the same
    immutable-content argument the store's bucket-level commit already
    relies on. Each Arrow batch is split into bucket runs by zero-copy
    slicing (O(rows), no per-bucket filter scans).
    """

    def write_partition(batches):
        import os
        import uuid as _uuid

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        counts: dict[int, int] = {}
        closed: set[int] = set()
        cur_b: int | None = None
        cur: tuple | None = None  # (writer, tmp_path, final_path)

        def close_cur():
            nonlocal cur
            if cur is not None:
                cur[0].close()
                os.rename(cur[1], cur[2])
                cur = None

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            b = tbl.column("ts_bucket").to_numpy()
            body = tbl.drop_columns(["ts_bucket"])
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(b)) + 1, [len(b)]])
            for i in range(len(starts) - 1):
                lo, hi = int(starts[i]), int(starts[i + 1])
                bk = int(b[lo])
                sub = body.slice(lo, hi - lo)
                if bk != cur_b:
                    close_cur()  # sorted input: a new bucket ends the old
                    if cur_b is not None:
                        closed.add(cur_b)
                    if bk in closed:
                        # one-writer-at-a-time is only sound on contiguous
                        # runs; a reappearing bucket would atomically
                        # REPLACE its finished file with a partial one —
                        # fail loudly instead (the write_tier call site
                        # always sorts within partitions by ts_bucket)
                        raise ValueError(
                            f"ts_bucket {bk} not contiguous in task {pid}: "
                            "input to _bucket_writer must be sorted by "
                            "ts_bucket within partitions")
                    bdir = os.path.join(staging, f"ts_bucket={bk}")
                    os.makedirs(bdir, exist_ok=True)
                    tmp = os.path.join(
                        bdir, f".part-{pid:05d}-{_uuid.uuid4().hex[:8]}.tmp")
                    cur = (pq.ParquetWriter(tmp, sub.schema,
                                            compression="snappy"),
                           tmp, os.path.join(bdir, f"part-{pid:05d}.parquet"))
                    cur_b = bk
                cur[0].write_table(sub)
                counts[bk] = counts.get(bk, 0) + sub.num_rows
        close_cur()
        if counts:
            ks = sorted(counts)
            yield pa.RecordBatch.from_pydict(
                {"ts_bucket": pa.array(ks, pa.int64()),
                 "n_rows": pa.array([counts[k] for k in ks], pa.int64())})

    return write_partition


class RollupStore:
    """Hive-partitioned parquet lakehouse with lineage + retention.

    Layout: ``root/tier=<t>/ts_bucket=<b>/*.parquet`` and
    ``root/_lineage/*.parquet`` (tier, ts_bucket, n_rows, written_at).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.lineage_dir = os.path.join(root, "_lineage")
        # per-tier phase timings of the most recent write_tier call
        # (write / footer_stats / commit) — bench telemetry
        self.last_write_phases: dict[str, dict] = {}

    # -- lineage ----------------------------------------------------------
    def completed_buckets(self, tier: str) -> set[int]:
        # Count only VISIBLE parquet files: _append_lineage stages each file
        # as a dot-prefixed .tmp before its atomic rename, and a directory
        # holding only such a tmp is non-empty to os.listdir but EMPTY to
        # Spark's listing — reading it raised UNABLE_TO_INFER_SCHEMA (race
        # found by tools/stress_concurrent_writers.py, 2-in-50 under two
        # overlapping writers). A file visible here is always complete
        # (atomic rename), so the read below can never see a partial.
        if not os.path.isdir(self.lineage_dir):
            return set()
        visible = [f for f in os.listdir(self.lineage_dir)
                   if f.endswith(".parquet") and not f.startswith((".", "_"))]
        if not visible:
            return set()
        # lineage is driver-side metadata (a few hundred tiny rows): read the
        # visible files directly with pyarrow instead of launching a Spark
        # read job — the old Spark path cost 0.2-0.5 s of job round trips per
        # write_tier commit at sf0.1, pyarrow ~10 ms (the same asymmetry as
        # _append_lineage, which always wrote with pyarrow).
        out: set[int] = set()
        for f in visible:
            t = pq.read_table(os.path.join(self.lineage_dir, f),
                              columns=["tier", "ts_bucket"])
            out.update(
                t.filter(pc.equal(t.column("tier"), tier))
                .column("ts_bucket").to_pylist())
        return out

    def _append_lineage(self, tier: str, stats: list[tuple[int, int]]):
        # lineage rows are driver-side metadata (the Iceberg-manifest analog):
        # written directly with pyarrow — a Spark job for a few hundred tiny
        # rows costs seconds of Python-RDD worker round-trips, pyarrow ~10 ms.
        # Still plain parquet, so completed_buckets reads it back with Spark.
        now = float(time.time())
        table = pa.table({
            "tier": pa.array([tier] * len(stats), pa.string()),
            "ts_bucket": pa.array([int(b) for b, _ in stats], pa.int64()),
            "n_rows": pa.array([int(n) for _, n in stats], pa.int64()),
            "written_at": pa.array([now] * len(stats), pa.float64()),
        })
        os.makedirs(self.lineage_dir, exist_ok=True)
        fname = f"lineage-{int(now * 1e6)}-{os.getpid()}-{uuid.uuid4().hex[:8]}.parquet"
        # write-temp + atomic rename: a concurrent completed_buckets read
        # must never see a half-written parquet file (the dot-prefixed temp
        # is invisible to parquet directory listings)
        tmp = os.path.join(self.lineage_dir, "." + fname + ".tmp")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(self.lineage_dir, fname))

    # -- write ------------------------------------------------------------
    def write_tier(self, tier: str, rollup: DataFrame, resume: bool = True) -> dict:
        """Write one tier partitioned by ts_bucket, skipping buckets already in
        lineage (checkpoint-resume).

        Crash-safe commit order: data is written to a staging directory, each
        bucket directory is atomically renamed into the tier path (replacing
        any stale partial from a previously crashed attempt — safe precisely
        because a crashed attempt never reached the lineage commit), and ONLY
        THEN are the lineage rows appended. A failure at any point therefore
        leaves either (a) untouched tier data, or (b) fully-written buckets
        not yet in lineage — both of which a resumed run redoes idempotently;
        duplicates are impossible. (On Iceberg the same ordering is a single
        snapshot commit.)

        Semantics note: resume is bucket-granular and assumes immutable input
        per bucket — rows arriving for a bucket already committed to lineage
        are intentionally not re-ingested. ``resume=False`` recomputes the
        tier but still never deletes a lineage-committed bucket; to genuinely
        reprocess committed buckets use :meth:`reopen_buckets` (drops the
        bucket data and its lineage rows together) or a fresh root.

        CONCURRENT writers are safe under the same immutable-input-per-bucket
        assumption (two attempts at the same bucket produce identical
        content): each attempt stages into its OWN uuid-suffixed directory
        (no staging collisions), and commit NEVER deletes an existing bucket
        directory — since buckets only ever appear via one atomic rename of
        a fully-staged directory, an existing dst is always some writer's
        complete, identical copy, and the rename that loses the race is
        simply skipped (ADVICE r4: the old rmtree-replace opened a window
        where a lineage-listed bucket was absent on disk and a concurrent
        read silently lost rows). Lineage rows are appended for every staged
        bucket not already committed, which also adopts a crashed run's
        renamed-but-unrecorded buckets. A reader concurrent with a write
        sees only fully-renamed bucket directories (rename is atomic;
        staging lives under ``_staging``, which readers never touch), and a
        bucket listed in lineage is ALWAYS fully present on disk. Pinned by
        tests/test_rollup_pipeline.py::
        test_concurrent_writers_and_read_mid_write.
        """
        bin_seconds = TIERS[tier]
        out = rollup.withColumn("ts_bucket", _bucket_col(bin_seconds))
        done = self.completed_buckets(tier) if resume else set()
        if done:
            out = out.filter(~F.col("ts_bucket").isin(list(done)))
        tier_dir = os.path.join(self.root, f"tier={tier}")
        staging = os.path.join(self.root, "_staging",
                               f"tier={tier}-{uuid.uuid4().hex[:8]}")
        # Co-locate each ts_bucket in one task before the dynamic-partition
        # write: without this, every shuffle partition opens a writer in every
        # bucket directory (tasks × buckets small files — 23k files / 60 s for
        # a 720-bucket tier at sf0.1; far worse at 10^12 rows). Hashing on
        # ts_bucket alone bounds it to one file per bucket; a hot bucket that
        # outgrows a single file should be pre-split with salted_repartition
        # on (ts_bucket, salt) before calling write_tier.
        par = max(int(self.spark.conf.get("spark.sql.shuffle.partitions", "32")),
                  self.spark.sparkContext.defaultParallelism)
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)
        timings: dict[str, float] = {}
        # The staged write is an executor-side pyarrow writer (mapInArrow)
        # rather than Spark's dynamic-partition ``partitionBy`` insert: the
        # dynamic writer sorts every task's rows by partition value, opens
        # its ~bucket-count files through the Hadoop committer's _temporary
        # double-rename, and leaves row counts to a separate footer pass.
        # Writing the (already bucket-partitioned) rows directly gives one
        # deterministic file per bucket, returns per-bucket row counts from
        # the same job, and needs no second commit protocol underneath our
        # own staged-atomic-rename one. Measured sf0.1 720-bucket 1m tier:
        # write 2.4-2.9 s → 1.5 s AND the 0.4-0.5 s footer pass drops to the
        # cost of collecting ~720 stat rows. Crash-consistency is unchanged:
        # stats come from the writing job itself, which only returns after
        # every staged file is closed and renamed; lineage still commits
        # strictly after the bucket-dir renames below.
        t0 = time.monotonic()
        stat_rows = (
            out.repartition(par, F.col("ts_bucket"))
            .sortWithinPartitions("ts_bucket")
            .mapInArrow(_bucket_writer(staging), "ts_bucket bigint, n_rows bigint")
            .collect())
        timings["write"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        stats_map: dict[int, int] = {}
        for r in stat_rows:
            stats_map[r.ts_bucket] = stats_map.get(r.ts_bucket, 0) + r.n_rows
        timings["footer_stats"] = round(time.monotonic() - t0, 3)
        stats = sorted(stats_map.items())
        t0 = time.monotonic()
        if stats:
            os.makedirs(tier_dir, exist_ok=True)
            # Commit NEVER deletes an existing bucket directory (ADVICE r4).
            # Under this staged-atomic-rename protocol a ``ts_bucket=`` dir
            # under the tier path can only come into existence via one
            # atomic rename of a fully-staged directory — Spark writes land
            # under ``_staging``, never here — so any existing dst is a
            # COMPLETE bucket whose content is identical to ours under the
            # immutable-input-per-bucket contract. The old rmtree path
            # ("replace stale partial") could therefore only ever destroy a
            # concurrent writer's committed bucket, opening a window where a
            # lineage-listed bucket was absent on disk and a concurrent
            # read silently lost its rows. Skip instead; the winner stands.
            # (Genuine reprocessing of changed input goes through
            # ``reopen_buckets``, which drops data + lineage together.)
            for d in os.listdir(staging):
                if not d.startswith("ts_bucket="):
                    continue
                dst = os.path.join(tier_dir, d)
                try:
                    os.rename(os.path.join(staging, d), dst)
                except OSError:
                    # dst exists (a winner's complete, identical bucket) or
                    # a racing writer is mid-rename — wait briefly for the
                    # directory to be visible before concluding it is
                    # genuinely missing.
                    for _ in range(100):
                        if os.path.isdir(dst):
                            break
                        time.sleep(0.05)
                    else:
                        raise
            # Lineage: claim every staged bucket not already committed —
            # this covers both our own renames and a crashed run's renamed
            # buckets that never reached its lineage append (our staged
            # copy's footer stats equal the winner's under the identity
            # contract). Racing writers may both append a bucket's row;
            # completed_buckets reads lineage as a set, so duplicates are
            # harmless.
            committed_now = self.completed_buckets(tier)
            stats = [(b, n) for b, n in stats if b not in committed_now]
            if stats:
                self._append_lineage(tier, stats)
        timings["commit"] = round(time.monotonic() - t0, 3)
        self.last_write_phases[tier] = timings
        shutil.rmtree(staging, ignore_errors=True)
        return {
            "tier": tier,
            "buckets_written": len(stats),
            "buckets_skipped": len(done),
            "rows_written": sum(n for _, n in stats),
            "phase_sec": timings,
        }

    def read_tier(self, tier: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, f"tier={tier}"))

    # -- late data --------------------------------------------------------
    def reopen_buckets(self, tier: str, buckets: list[int]) -> int:
        """Reopen committed buckets for reprocessing (late-arriving rows):
        drop the bucket directories AND their lineage rows, so the next
        resumed run re-ingests exactly those buckets. The lineage table is
        rewritten via temp-dir + atomic swap (same crash-safety discipline as
        write_tier: a failure leaves either the old lineage or the new one,
        never a half state — though a crash after the data drop and before
        the swap means the reopened buckets are simply re-done, which is the
        intended outcome anyway). Returns the number of buckets reopened.

        Lineage is driver-side metadata (a few hundred tiny rows), so the
        rewrite is pyarrow like completed_buckets/_append_lineage — the
        Spark coalesce(1) job this replaces cost seconds of worker round
        trips for the same result (cold path, but there was no reason to
        keep the asymmetry). Same visibility filter as completed_buckets:
        a dot-prefixed .tmp from a concurrent _append_lineage is skipped
        (it either reappears in the new lineage via its own rename — the
        swap preserves nothing staged — or its writer's rename loses to
        ours; both end states are a consistent table, and concurrent
        reopen+write of the SAME bucket is outside the store's contract
        anyway)."""
        buckets = [int(b) for b in buckets]
        if not buckets:
            return 0
        tier_dir = os.path.join(self.root, f"tier={tier}")
        for b in buckets:
            shutil.rmtree(os.path.join(tier_dir, f"ts_bucket={b}"), ignore_errors=True)
        if not os.path.isdir(self.lineage_dir):
            return len(buckets)
        visible = [f for f in os.listdir(self.lineage_dir)
                   if f.endswith(".parquet") and not f.startswith((".", "_"))]
        if not visible:
            return len(buckets)
        lin = pa.concat_tables([
            pq.read_table(os.path.join(self.lineage_dir, f)) for f in visible])
        drop = pc.and_(
            pc.equal(lin.column("tier"), tier),
            pc.is_in(lin.column("ts_bucket"),
                     value_set=pa.array(buckets, pa.int64())))
        kept = lin.filter(pc.invert(drop))
        tmp = self.lineage_dir + "._rewrite"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(kept, os.path.join(tmp, "lineage-rewritten.parquet"))
        old = self.lineage_dir + "._old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.lineage_dir, old)
        os.rename(tmp, self.lineage_dir)
        shutil.rmtree(old, ignore_errors=True)
        return len(buckets)

    # -- retention --------------------------------------------------------
    def expire(self, tier: str, keep_buckets_from: int) -> list[int]:
        """Drop partitions with ts_bucket < keep_buckets_from (O(1) per
        partition — directory drop, the Iceberg partition-drop analog)."""
        tier_dir = os.path.join(self.root, f"tier={tier}")
        dropped = []
        if not os.path.isdir(tier_dir):
            return dropped
        for d in os.listdir(tier_dir):
            if d.startswith("ts_bucket="):
                b = int(d.split("=", 1)[1])
                if b < keep_buckets_from:
                    shutil.rmtree(os.path.join(tier_dir, d))
                    dropped.append(b)
        return dropped


def salt_column(df: DataFrame, key_col: str, n_salts: int,
                hot_keys: "list | None" = None) -> DataFrame:
    """Add the deterministic ``_salt`` column (``xxhash64(ts) mod n_salts``)
    WITHOUT any physical repartition — the right tool for SALTED TWO-STAGE
    AGGREGATION: ``groupBy(key, _salt, bin)`` partials (Spark's map-side
    combine collapses the hot key inside every task; the exchange carries
    partial rows, never raw rows) → ``groupBy(key, bin)`` compose. Use
    :func:`salted_repartition` instead only when a per-key ORDERED kernel
    must consume raw rows — that is the one case that genuinely requires
    moving raw rows to (key, salt)-owned tasks.

    Round-4 lessons from the skewed scaling probe, all real at 10^12 rows:

    - the salt is one cheap JVM hash; the md5 chain it replaced
      (cast→md5→substring→conv per row) cost more than the aggregation it
      was protecting;
    - pass ``hot_keys`` (the detected heavy hitters — see
      :func:`heavy_hitter_keys`) to salt ONLY those keys: salting every key
      multiplies the partial-aggregate output by n_salts for EVERY key,
      while the skew lives in a handful of keys. With ``hot_keys`` the
      exchange stays at unsalted volume + n_salts rows per hot (key, bin);
    - for aggregation chains, do NOT pre-repartition raw rows: the measured
      salted-agg probe scales like the plain rollup, while the same job
      behind a raw-row repartition is pinned to the box's shuffle-bandwidth
      ceiling (~0.7 efficiency at 2→8 cores — a single-box artifact a real
      N→4N executor scale-out, with 4× the memory channels and NICs, does
      not inherit, but also simply avoidable work).
    """
    salt = F.pmod(F.xxhash64(F.col("ts")), F.lit(n_salts)).cast("int")
    if hot_keys is not None:
        salt = F.when(F.col(key_col).isin(list(hot_keys)), salt).otherwise(F.lit(0))
    return df.withColumn("_salt", salt)


def salted_repartition(df: DataFrame, key_col: str, n_salts: int,
                       n_partitions: int,
                       hot_keys: "list | None" = None) -> DataFrame:
    """:func:`salt_column` + a physical repartition on (key, _salt) — for
    per-key ORDERED kernels that must consume raw rows (IIR over a hot
    url's raw samples, per-salt Gorilla blocks): the hot key's rows split
    across n_salts tasks, at the cost of one raw-row exchange (the same
    single exchange the unsalted kernel path pays — only the key changes).
    For aggregation chains use :func:`salt_column` alone (see its
    docstring: no raw-row exchange at all)."""
    return salt_column(df, key_col, n_salts, hot_keys).repartition(
        n_partitions, F.col(key_col), F.col("_salt"))


def heavy_hitter_keys(df: DataFrame, key_col: str, threshold_frac: float = 0.01,
                      sample_frac: float = 0.001, seed: int = 7,
                      min_count: int = 30) -> list:
    """Detect keys carrying more than ``threshold_frac`` of all rows from a
    Bernoulli sample — the cheap driver-side heavy-hitter scan that feeds
    ``salted_repartition(hot_keys=...)``. At 10^12 rows the sample is ~10^9
    rows aggregated map-side to one tiny frame; the returned list is a few
    keys by construction (at most 1/threshold_frac).

    ONE Spark job (VERDICT r4 item 7): ``rollup(key)`` grouping sets emit the
    per-key counts AND the grand-total row (grouping_id=1) from a single
    aggregation over one scan of the sample; the driver fetches only the top
    ``1/threshold_frac + 1`` rows by count — the total row necessarily ranks
    first, and no key below rank 1/threshold_frac can clear the threshold —
    via TakeOrderedAndProject (per-partition top-K, no full sort shuffle).

    ``min_count`` is the standard sampling support floor: a key seen fewer
    than ~30 times in the sample cannot be distinguished from noise, so it
    is never declared hot (matters only for small inputs / tiny samples —
    at web scale a real heavy hitter appears millions of times)."""
    k = int(1.0 / threshold_frac) + 1
    rows = (
        df.sample(fraction=sample_frac, seed=seed)
        .rollup(key_col)
        .agg(F.count(F.lit(1)).alias("_cnt"), F.grouping_id().alias("_gid"))
        .orderBy(F.desc("_cnt"))
        .limit(k + 1)
        .collect()
    )
    total = sum(r["_cnt"] for r in rows if r["_gid"] == 1)
    if total == 0:
        return []
    floor = max(threshold_frac * total, min_count)
    return [r[key_col] for r in rows if r["_gid"] == 0 and r["_cnt"] >= floor]


def run_tiered_rollup(
    spark: SparkSession,
    pages: DataFrame,
    store: RollupStore | None = None,
    resume: bool = True,
    skew_guard: bool = False,
    n_salts: int = 16,
    hot_threshold_frac: float = 0.01,
    hot_sample_frac: float = 0.001,
) -> dict:
    """End-to-end: pages → 1m partials → 1h → 1d; optional persisted store.

    Returns metrics (rows per tier + lineage stats). When ``store`` is None
    the tiers are computed and counted but not persisted (bench mode).

    ``skew_guard=True`` makes the hot-domain mitigation AUTOMATIC (VERDICT
    r4 item 8 — at 10^12 web rows skew is the default, not the exception):
    :func:`heavy_hitter_keys` scans a sample for urls above
    ``hot_threshold_frac`` of all rows; if any are found, the 1m tier is
    computed by the salted two-stage aggregation (salt only the detected
    keys → per-(url, _salt, bin) partials with map-side combine → compose
    partials across salts), whose output equals :func:`rollup_base`
    bin-for-bin (decomposable partials — pytest-pinned). With no hot keys
    the plain path runs; either way the coarser tiers re-aggregate the same
    1m partials. Metrics record ``hot_keys`` so the decision is auditable.
    """
    sig = pages_signal(pages)
    hot_keys: list = []
    if skew_guard:
        # hot_sample_frac: 0.001 suits web scale (~10^9-row sample at 10^12
        # rows); small inputs should pass a larger fraction — a sample of a
        # few dozen rows makes every sampled url look hot
        hot_keys = heavy_hitter_keys(sig, "url", threshold_frac=hot_threshold_frac,
                                     sample_frac=hot_sample_frac)
    if hot_keys:
        per_salt = (
            salt_column(sig, "url", n_salts=n_salts, hot_keys=hot_keys)
            .withColumn("bin_m", F.floor(F.col("ts") / TIERS["1m"]).cast("bigint"))
            .groupBy("url", "_salt", "bin_m")
            .agg(F.count("value").alias("n"), F.sum("value").alias("sum"),
                 F.min("value").alias("min"), F.max("value").alias("max"),
                 F.sum(F.col("value") * F.col("value")).alias("sum_sq"))
        )
        r1m = per_salt.groupBy("url", "bin_m").agg(
            F.sum("n").alias("n"), F.sum("sum").alias("sum"),
            F.min("min").alias("min"), F.max("max").alias("max"),
            F.sum("sum_sq").alias("sum_sq")).cache()
    else:
        r1m = rollup_base(sig, TIERS["1m"]).cache()
    r1h = rollup_next(r1m, 60).cache()
    r1d = rollup_next(r1h, 24)
    metrics: dict = {"skew_guard": bool(skew_guard), "hot_keys": hot_keys}
    if store is not None:
        metrics["write_1m"] = store.write_tier("1m", r1m, resume=resume)
        metrics["write_1h"] = store.write_tier("1h", r1h, resume=resume)
        metrics["write_1d"] = store.write_tier("1d", r1d, resume=resume)
    metrics["rows_1m"] = r1m.count()
    metrics["rows_1h"] = r1h.count()
    metrics["rows_1d"] = r1d.count()
    r1m.unpersist()
    r1h.unpersist()
    return metrics


def read_resolution(
    store: "RollupStore",
    bin_seconds: int,
    t0: float | None = None,
    t1: float | None = None,
) -> DataFrame:
    """Continuous-aggregate READ path: serve a query at ``bin_seconds``
    resolution from the coarsest stored tier that divides it, re-aggregating
    partials if the requested grid is coarser than the tier's.

    Tier choice: the largest tier T with T ≤ bin_seconds and bin_seconds % T
    == 0 (so tier bins compose exactly into requested bins). Time bounds
    [t0, t1) prune on the hive ``ts_bucket`` partition column FIRST — at
    10^12 rows that is the difference between touching two directories and
    scanning the lake — then on bin_m. Bounds are ALIGNED to the requested
    grid before filtering (t0 floored, t1 ceiled to ``bin_seconds``):
    otherwise an edge coarse bin would be re-aggregated from a partial set
    of fine bins yet returned as an ordinary full bin.

    Returns finalized rows (url, bin_m, bin_ts, n, sum, min, max, mean, std)
    on the requested grid.
    """
    candidates = [(name, sec) for name, sec in TIERS.items()
                  if sec <= bin_seconds and bin_seconds % sec == 0]
    if not candidates:
        raise ValueError(
            f"no stored tier divides bin_seconds={bin_seconds}; tiers: {TIERS}")
    tier, tier_sec = max(candidates, key=lambda kv: kv[1])
    if t0 is not None:
        t0 = (int(t0) // bin_seconds) * bin_seconds  # floor to requested grid
    if t1 is not None:
        t1 = -(-int(t1) // bin_seconds) * bin_seconds  # ceil to requested grid
    df = store.read_tier(tier)
    per = 3600 if tier_sec < 3600 else 86400
    if t0 is not None:
        df = df.filter(F.col("ts_bucket") >= int(t0 // per))
        df = df.filter(F.col("bin_m") * tier_sec >= t0)
    if t1 is not None:
        df = df.filter(F.col("ts_bucket") <= int(t1 // per))
        df = df.filter(F.col("bin_m") * tier_sec < t1)
    factor = bin_seconds // tier_sec
    rolled = rollup_next(df, factor) if factor > 1 else df.drop("ts_bucket")
    return finalize(rolled, bin_seconds)
