"""Structured Streaming variants of the batch stages (SURVEY §7.1 step 7).

The reference is batch-only: a 2-day cron re-runs everything with
truncate-and-load (data-pipeline.yaml:5-6, R/storage.R:89-102). At 100 TB a
full rewrite every 2 days is untenable; the streaming variants keep the SAME
transformation expressions (the lazy-plan builders in plans/ and
operators/aggregates) and change only the source/sink:

- ``readStream`` over the landing directory (new submission/points files
  appear continuously);
- event-time watermarks bound state for the windowed aggregations;
- ``trigger(availableNow=True)`` reproduces the batch cron exactly (drain
  everything pending, stop) — the bridge between the two execution modes.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@contextmanager
def stream_state_partitions(spark: SparkSession, n: int = 8):
    """Pin ``spark.sql.shuffle.partitions`` for the duration of a stream
    start/drain, then restore it.

    A stateful streaming operator's partition count is frozen by
    shuffle.partitions at the stream's FIRST micro-batch and persists in
    the checkpoint; each state-store instance then pays per-batch
    checkpoint/commit file overhead forever. So the count should be sized
    to the stream's key cardinality and arrival rate — NOT to the batch
    CPU parallelism (measured locally: 32→8 instances halves the drain
    time of every streaming query at sf0.1). On a production cluster set
    it to the steady-state key volume once; it cannot be changed without a
    new checkpoint.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def batch_shuffle_partitions(batch_df: DataFrame,
                             bytes_per_partition: int = 512 << 10,
                             lo: int = 4,
                             hi: int | None = None) -> int:
    """Shuffle-partition count for a STATELESS ``foreachBatch`` body,
    sized from THIS batch's input bytes — the adaptive replacement for a
    static ``stream_state_partitions`` pin on drains whose state lives in
    versioned parquet rather than a state store (so nothing freezes the
    count in a checkpoint and each micro-batch may size itself).

    Why adaptive: a 4-partition pin is right when per-batch work is tiny
    (task launch overhead dominates — measured sf0.1: unpinning
    streaming_near_dedup cost 5.4 → ~20 s) and wrong when a batch carries
    corpus-scale work (measured 100×: the same pin made the encode+pack
    drain's wall, ~103 s pinned vs ~95 s at full parallelism). A constant
    cannot be right at both scales; the batch's own input size can.

    Sizing: the optimizer's size statistic for the micro-batch plan
    (``optimizedPlan().stats().sizeInBytes()`` — driver-side metadata,
    no job; for a file-source batch this is exactly the batch's file
    bytes. ``inputFiles()`` is NOT usable here: a micro-batch DataFrame
    is backed by an in-memory file index that reports no input files —
    measured empty on Spark 4). ``ceil(bytes / bytes_per_partition)``
    clamped to [lo, hi]. The default 512 KiB/partition is calibrated to
    COMPRESSED text parquet whose downstream working set (token arrays,
    shingle/band explosions) runs ~10-20× the file bytes — i.e. ~5-10 MB
    of working set per task. ``hi`` defaults to the session's current
    ``spark.sql.shuffle.partitions`` (the batch-CPU ceiling). Unknown
    statistics (Catalyst's sizeInBytes defaults to Long.MaxValue) or py4j
    failures fall back to ``hi`` (full parallelism — fail toward
    throughput, not toward a tiny pin)."""
    import math

    if hi is None:
        hi = int(batch_df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    try:
        # py4j converts scala.math.BigInt's underlying value to a Python
        # int in some call paths and hands back a JavaObject in others —
        # str() round-trips both
        total = int(str(
            batch_df._jdf.queryExecution().optimizedPlan().stats()
            .sizeInBytes()))
        if total <= 0 or total >= (1 << 62):
            return hi
    except Exception:
        return hi
    return max(lo, min(hi, math.ceil(total / bytes_per_partition)))


def spread_batch(batch_df: DataFrame, n: int) -> DataFrame:
    """Raise a micro-batch's MAP-side parallelism to ``n`` when the
    landing-file granularity caps it below that.

    ``sized_batch_shuffle`` governs only the post-shuffle stages; all
    work BEFORE the first shuffle (tokenize → shingle explode → hash,
    the expensive leg of every text drain) runs at scan parallelism —
    one task per landing file under ``maxFilesPerTrigger=1``. Measured
    (tools/wide_row_probe.py, ×100-wide rows, ~18 MB/file): the entire
    shingle stage serialized on ONE task per batch and the drain walled
    66–68 s REGARDLESS of the shuffle sizing (adaptive-32 vs pin-4 tie)
    — the scan stage was the bottleneck the shuffle knob can't reach.
    The fix is one cheap shuffle of the RAW batch rows (file bytes,
    pre-explosion) so the explosion itself runs at ``n``. No-op when
    the scan already has ``n`` partitions (checking costs one lazy
    driver-side plan walk, no job). ``PESKAS_BATCH_SPREAD=off`` is the
    A/B lever and production escape hatch."""
    import os

    if os.environ.get("PESKAS_BATCH_SPREAD", "").strip() == "off":
        return batch_df
    try:
        cur = batch_df.rdd.getNumPartitions()
    except Exception:
        return batch_df
    if cur >= n:
        return batch_df
    return batch_df.repartition(n)


@contextmanager
def sized_batch_shuffle(batch_df: DataFrame,
                        bytes_per_partition: int = 512 << 10,
                        lo: int = 4, hi: int | None = None):
    """Pin ``spark.sql.shuffle.partitions`` for one ``foreachBatch`` body
    to :func:`batch_shuffle_partitions`'s size-derived count, restoring
    the session value afterwards.

    ``PESKAS_BATCH_SHUFFLE_MODE`` overrides for A/B measurement and
    production escape-hatch: ``off`` leaves the session conf untouched
    (the pre-adaptive behavior); an integer forces that static count."""
    import os
    import re

    spark = batch_df.sparkSession
    mode = os.environ.get("PESKAS_BATCH_SHUFFLE_MODE", "").strip()
    if mode == "off":
        yield int(spark.conf.get("spark.sql.shuffle.partitions"))
        return
    if re.fullmatch(r"-?\d+", mode):
        # full int syntax, not isdigit(): '-4' previously failed
        # isdigit() and silently fell through to the adaptive path —
        # any non-positive static count ('0', '-4') would pin
        # spark.sql.shuffle.partitions to a value Spark rejects at the
        # first shuffle, so fail loudly AT THE KNOB, not in the drain
        if int(mode) < 1:
            raise ValueError(
                f"PESKAS_BATCH_SHUFFLE_MODE={mode!r}: static partition "
                f"count must be >= 1 (use 'off' to disable the "
                f"per-batch pin)")
        n = int(mode)
    elif mode in ("", "adaptive"):
        n = batch_shuffle_partitions(batch_df, bytes_per_partition, lo, hi)
    else:
        raise ValueError(
            f"PESKAS_BATCH_SHUFFLE_MODE={mode!r}: expected 'off', "
            f"'adaptive', unset, or a positive integer")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def spread_stream(df: DataFrame, default_n: int | None = None) -> DataFrame:
    """Spread lever for the ENGINE-side drains (windowed aggs, stateful
    ops, stream-stream joins): inserts a ``repartition(n)`` between the
    streaming scan and the stateful shuffle, lifting the pre-shuffle
    leg off the one-task-per-landing-file scan.

    Default NO-OP unless the call site passes ``default_n``: the §10p
    audit measured the extra exchange as a LOSS at 7 of 8 drains
    (projection/cast legs are too cheap; stream_join pays the exchange
    twice). The exception is ``session_window`` — its map side SORTS
    the partition and partially merges sessions before the shuffle,
    O(n log n) serialized on the single scan task — which won 3/3
    interleaved 100× A/Bs (mins 28.2 → 26.0 s, pairwise up to 48%)
    and tied at sf0.1, so that call site passes
    ``default_n=defaultParallelism``. ``PESKAS_STREAM_SPREAD`` remains
    the A/B override: ``off``/``0`` forces no-op, a positive integer
    forces that count."""
    import os

    env = os.environ.get("PESKAS_STREAM_SPREAD", "").strip()
    if env:
        if env == "off" or (env.isdigit() and int(env) == 0):
            return df
        if env.isdigit():
            return df.repartition(int(env))
        raise ValueError(
            f"PESKAS_STREAM_SPREAD={env!r}: expected 'off', unset, or a "
            f"non-negative integer")
    if default_n and default_n > 0:
        return df.repartition(default_n)
    return df


def stream_from_parquet_dir(spark: SparkSession, path: str,
                            schema: StructType | str) -> DataFrame:
    """File-source stream over a landing directory (schema mandatory —
    streaming reads never infer)."""
    return spark.readStream.schema(schema).parquet(path)


_EVENTS_SCHEMA = ("event_id long, ts {}, user_id long, event_type string, "
                  "value double, props string")


def stream_events_dir(spark: SparkSession, path: str,
                      ts_unit: str | None = None,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Stream an `events` landing directory with ``ts`` normalized to
    TIMESTAMP whatever the writer's physical unit.

    Parquet writers disagree on timestamp units: TIMESTAMP(MICROS/MILLIS)
    Spark reads natively, TIMESTAMP(NANOS) its vectorized reader rejects
    unless ``legacy.parquet.nanosAsLong`` turns the column into a raw int64
    (then truncated to µs here, matching DuckDB's TIMESTAMP_NS→TIMESTAMP
    cast). A streaming source's user-supplied schema silently reinterprets
    the physical int64, so the unit MUST be sniffed from a footer — one
    metadata read per stream start, not per batch.

    The sniff is a LOCAL, non-recursive glob: it works for the harness's
    local landing dirs but sees nothing on object storage, in partitioned
    subdirectories, or when the landing zone is still empty at stream
    start (the normal production case — files arrive later). In those
    deployments pass ``ts_unit`` explicitly ("us" or "ns", a property of
    the WRITER, known at pipeline-wiring time); sniffing then never runs.
    A stream declared "us" that later receives NANOS files fails fast in
    the vectorized reader rather than misreading.

    Session-conf note: the UTC zone and (for ns) ``nanosAsLong`` are
    deliberately session-pinned, NOT save/restored — they must be active
    at every micro-batch EXECUTION, which outlives this builder; a restore
    would silently corrupt the stream's later batches. The engine pins UTC
    everywhere (core.session, queries._t), so this is convergent, but a
    caller embedding these streams in a foreign session should know the
    session zone changes."""
    import glob
    import os

    import pyarrow.parquet as pq

    unit = ts_unit
    if unit is None:
        unit = "us"
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if files:
            t = pq.read_schema(files[0]).field("ts").type
            unit = getattr(t, "unit", "us")
    if unit not in ("us", "ns"):
        raise ValueError(f"ts_unit must be 'us' or 'ns', got {unit!r}")
    # event-time window/oracle parity assumes a UTC session zone (see
    # queries._t); pin it for streams too
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def reader(schema: str):
        r = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            # bounds micro-batch size (file granularity) — also how tests
            # force a genuinely multi-batch drain from a staged directory
            r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
        return r.parquet(path)

    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = reader(_EVENTS_SCHEMA.format("long"))
        # integer div — a double intermediate loses precision at 1.7e18 ns
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return reader(_EVENTS_SCHEMA.format("timestamp"))


def windowed_track_rollup(points: DataFrame, minutes: int = 10,
                          watermark: str = "30 minutes") -> DataFrame:
    """Streaming twin of export.export_matched_tracks's rollup (E13+A2):
    10-minute mean positions per trip with a watermark bounding state.

    Uses ``F.window`` (not the arithmetic floor) so the state store tracks
    window expiry; the window start equals functions.expressions.floor_time
    of the event time — the batch and streaming outputs are comparable
    column-for-column.
    """
    w = F.window(F.col("Time"), f"{minutes} minutes")
    return (points
            .withWatermark("Time", watermark)
            .groupBy(F.col("Trip"), w.alias("win"))
            .agg(F.avg("Lat").alias("lat"), F.avg("Lng").alias("lon"),
                 F.count(F.lit(1)).alias("n_pings"))
            .select("Trip", F.col("win.start").alias("time_bucket"),
                    "lat", "lon", "n_pings"))


def run_available_now(stream_df: DataFrame, out_path: str,
                      checkpoint: str, fmt: str = "parquet") -> None:
    """Drain-everything-then-stop execution (the batch-cron bridge).

    Append mode: only windows CLOSED by the watermark are emitted; windows
    still open when the drain finishes stay in the state store until the next
    run. This is the correct incremental-production mode (nothing is emitted
    twice) but it is NOT batch-equivalent at the data's trailing edge — use
    :func:`run_available_now_upsert` for exact batch parity.
    """
    q = (stream_df.writeStream.format(fmt)
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_available_now_upsert(stream_df: DataFrame, out_path: str,
                             checkpoint: str) -> None:
    """Update-mode drain with a ``foreachBatch`` upsert sink.

    Every trigger emits rows whose aggregate changed — including windows the
    watermark has not closed yet — each stamped with the micro-batch id. The
    latest stamp per key is the current value (see
    :func:`read_upsert_result`), so the drained result equals the batch
    aggregation exactly. This is the standard Spark upsert pattern for
    non-idempotent sinks (Structured Streaming guide, foreachBatch section).
    """
    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("_batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_path))

    q = (stream_df.writeStream
         .outputMode("update")
         .foreachBatch(_write)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stage_events_landing(df: DataFrame, path: str, n_files: int) -> None:
    """Write an events frame as ``n_files`` landing files for a file-source
    stream, with the parquet timestamp physical type PINNED to
    TIMESTAMP_MICROS: a bare session's default is INT96, which neither
    branch of :func:`stream_events_dir`'s unit sniff can read (pyarrow
    reports INT96 as ns, but the file is not int64) — the conf is
    save/restored around the write so callers' sessions are untouched."""
    spark = df.sparkSession
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        df.repartition(n_files).write.parquet(path)
    finally:
        spark.conf.set(key, prev) if prev is not None else spark.conf.unset(key)


def run_available_now_merge(stream_df: DataFrame, table, keys: list[str],
                            partial_fn, merges: dict[str, str],
                            checkpoint: str) -> None:
    """Streaming MATERIALIZED VIEW maintenance: each micro-batch is
    partial-aggregated (``partial_fn``) and MERGED into a persisted
    versioned snapshot via aggregates.incremental_rollup — incremental ETL
    with NO streaming state store. The aggregate state lives in the table
    itself (readable by anyone between batches), not in a checkpoint; the
    streaming checkpoint tracks only source progress.

    Exactly-once: foreachBatch re-delivers a batch after a crash, and a
    sum-merge is not idempotent — so the applied batch id commits WITH the
    data (VersionedParquetTable.write's transactional ``meta``), and a
    replayed batch id ≤ the committed marker is skipped. This is the same
    progress-marker recipe the Structured Streaming guide prescribes for
    non-idempotent foreachBatch sinks, with the pointer commit supplying
    the atomicity.

    The marker is per-TABLE, so one snapshot table belongs to one logical
    stream: pointing a second stream (or a rebuilt checkpoint whose batch
    ids restart at 0 over DIFFERENT data) at the same table would be
    silently skipped as replay. Give each stream its own table root.

    Scale: per batch, ONE partial agg of the increment + ONE merge groupBy
    over |keys| rows — cost independent of accumulated history. The full
    snapshot is rewritten per batch (fine for rollups orders of magnitude
    smaller than the fact stream); a key-partitioned table + partition-
    selective rewrite is the next lever if the rollup itself is huge.
    """
    from ..operators.aggregates import incremental_rollup

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        meta = table.read_meta() or {}
        last = meta.get("last_batch_id")
        if last is not None and batch_id <= last:
            return                      # crash-replayed batch: already merged
        # NO spread_batch here — measured null/loss at 100× (SCALE.md
        # §10p): unlike the explode-heavy drains (§10o, 2-4× wins), a
        # partial AGG's map side collapses the batch to answer-sized
        # rows, so spreading the raw rows first pays a full exchange of
        # the fat input for work the one-task partial does nearly as
        # fast (incremental_rollup 17.2 → 19.9 s ON, mixture — whose
        # partial runs token_count over every text — 7.9 → 8.1 s tie).
        partials = partial_fn(batch_df)
        if table.current_version() is None:
            merged = partials
        else:
            spark = batch_df.sparkSession
            merged = incremental_rollup(table.read(spark), partials,
                                        keys, merges)
        # the merge plan lazily reads the OLD version's files while the
        # new version stages in its own directory — no self-overwrite
        table.write(merged, meta={"last_batch_id": batch_id})

    q = (stream_df.writeStream
         .outputMode("append")
         .foreachBatch(_merge)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def read_upsert_result(spark: SparkSession, out_path: str,
                       keys: list[str]) -> DataFrame:
    """Resolve an upsert log written by :func:`run_available_now_upsert` to
    its current state: latest ``_batch_id`` wins per key."""
    from pyspark.sql import Window
    df = spark.read.parquet(out_path)
    w = Window.partitionBy(*keys).orderBy(F.col("_batch_id").desc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn", "_batch_id"))
