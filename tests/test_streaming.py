"""Streaming variant test: availableNow drain must equal the batch rollup."""

import datetime as dt

from pyspark.sql import Row, functions as F

from peskas_malawi_data_pipeline_spark.streaming import ingest_stream

import fixtures as FX


def test_streaming_rollup_matches_batch(spark, tmp_path):
    points = FX.points_df(spark)
    src = str(tmp_path / "points_landing")
    out = str(tmp_path / "rollup_out")
    ckpt = str(tmp_path / "ckpt")
    points.write.mode("overwrite").parquet(src)

    stream = ingest_stream.stream_from_parquet_dir(
        spark, src, points.schema)
    rollup = ingest_stream.windowed_track_rollup(stream, minutes=10)
    # update-mode upsert drain: emits every window, including those the
    # watermark has not closed — exact batch parity at the trailing edge.
    ingest_stream.run_available_now_upsert(rollup, out, ckpt)

    result = ingest_stream.read_upsert_result(
        spark, out, ["Trip", "time_bucket"])
    got = {(r.Trip, r.time_bucket): (r.n_pings, round(r.lat, 9))
           for r in result.collect()}

    batch = (points
             .groupBy("Trip", F.window("Time", "10 minutes").alias("win"))
             .agg(F.avg("Lat").alias("lat"), F.count(F.lit(1)).alias("n_pings"))
             .select("Trip", F.col("win.start").alias("time_bucket"), "lat", "n_pings"))
    want = {(r.Trip, r.time_bucket): (r.n_pings, round(r.lat, 9))
            for r in batch.collect()}
    assert got == want
    assert (101, dt.datetime(2024, 3, 5, 4, 0)) in got


def test_stateful_sessionize_across_microbatches(spark, tmp_path):
    """applyInPandasWithState sessionization with state carried ACROSS
    micro-batches: file 2 extends a session opened in file 1 (same session
    key, grown totals), opens new sessions after the gap, and the drained
    upsert log equals batch two-window sessionization."""
    from peskas_malawi_data_pipeline_spark.streaming import stateful

    t0 = dt.datetime(2024, 3, 5, 8, 0, 0)

    def ev(eid, user, minutes):
        return Row(event_id=eid, user_id=user,
                   ts=t0 + dt.timedelta(minutes=minutes))

    # batch 1: u1 session A (0,10 min); u2 session (5 min)
    b1 = spark.createDataFrame([ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 5)])
    # batch 2: u1 extends A (35 min: gap 25 < 30), then a NEW session at
    # 120 min; u2 idle past the gap -> its state may be evicted, then a new
    # session at 130 min must still key correctly (no ordinal collision)
    b2 = spark.createDataFrame([ev(4, 1, 35), ev(5, 1, 120), ev(6, 2, 130)])

    # plain files (not Spark output dirs — the file source ignores nested
    # directories), microsecond timestamps, ordered mtimes for batch order
    import time
    src = tmp_path / "sess_landing"
    src.mkdir()
    b1.toPandas().to_parquet(str(src / "f1.parquet"),
                             coerce_timestamps="us",
                             allow_truncated_timestamps=True)
    time.sleep(1.1)
    b2.toPandas().to_parquet(str(src / "f2.parquet"),
                             coerce_timestamps="us",
                             allow_truncated_timestamps=True)

    stream = (spark.readStream.schema("event_id long, user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src))
              .withWatermark("ts", "30 minutes"))
    sessions = stateful.stateful_sessionize(stream, gap_s=1800)
    out, ckpt = str(tmp_path / "sess_out"), str(tmp_path / "sess_ckpt")
    ingest_stream.run_available_now_upsert(sessions, out, ckpt)
    result = ingest_stream.read_upsert_result(
        spark, out, ["user_id", "session_start_s"])
    got = {(r.user_id, r.session_start_s): (r.n_events, r.duration_s)
           for r in result.collect()}

    e = int(t0.timestamp())
    want = {
        (1, e): (3, 35 * 60),            # events 1,2,4 — grown across batches
        (1, e + 120 * 60): (1, 0),       # event 5
        (2, e + 5 * 60): (1, 0),         # event 3
        (2, e + 130 * 60): (1, 0),       # event 6, after possible eviction
    }
    assert got == want


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    """The 2-day-cron bridge, end to end: drain, STOP, land more data,
    drain again against the SAME checkpoint. The second run must recover
    source progress + watermark from the checkpoint and the resolved
    upsert log must equal the batch rollup over everything landed.

    The second landing must move FORWARD in event time: the restored
    watermark survives the restart, so data older than it is (correctly)
    discarded as late — landing day-2 trips after day-1 trips mirrors the
    production cadence."""
    import time

    points = FX.points_df(spark)
    first = points.filter(F.col("Trip") == 101)    # Mar 5 trip
    second = points.filter(F.col("Trip") == 102)   # Mar 6 trip
    src, out, ckpt = (str(tmp_path / d) for d in ("landing", "out", "ckpt"))
    (tmp_path / "landing").mkdir()
    first.toPandas().to_parquet(f"{src}/f1.parquet", coerce_timestamps="us",
                                allow_truncated_timestamps=True)

    def drain():
        stream = ingest_stream.stream_from_parquet_dir(spark, src, points.schema)
        rollup = ingest_stream.windowed_track_rollup(stream, minutes=10)
        ingest_stream.run_available_now_upsert(rollup, out, ckpt)

    drain()                                  # run 1: only f1 exists
    n_first = spark.read.parquet(out).count()
    time.sleep(1.1)                          # distinct mtime → new file seen
    second.toPandas().to_parquet(f"{src}/f2.parquet", coerce_timestamps="us",
                                 allow_truncated_timestamps=True)
    drain()                                  # run 2: same checkpoint, new file

    log = spark.read.parquet(out)
    assert log.count() > n_first             # second drain appended
    assert log.select("_batch_id").distinct().count() >= 2

    result = ingest_stream.read_upsert_result(spark, out, ["Trip", "time_bucket"])
    got = {(r.Trip, r.time_bucket): (r.n_pings, round(r.lat, 9))
           for r in result.collect()}
    batch = (points
             .groupBy("Trip", F.window("Time", "10 minutes").alias("win"))
             .agg(F.avg("Lat").alias("lat"), F.count(F.lit(1)).alias("n_pings"))
             .select("Trip", F.col("win.start").alias("time_bucket"),
                     "lat", "n_pings"))
    want = {(r.Trip, r.time_bucket): (r.n_pings, round(r.lat, 9))
            for r in batch.collect()}
    assert got == want

def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Native session_window + append drain with a watermark-flush sentinel
    equals the batch session_window aggregation exactly (the sentinel closes
    the trailing sessions that append mode would otherwise withhold)."""
    from peskas_malawi_data_pipeline_spark.queries import REGISTRY

    fn, _sql = REGISTRY["streaming_session_window"]
    streamed = fn(spark, "/root/testdata/sf0.001")
    got = {(r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
           for r in streamed.collect()}

    from peskas_malawi_data_pipeline_spark.queries import _t
    ev = _t(spark, "/root/testdata/sf0.001", "events") \
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    batch = (ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
             .agg(F.count(F.lit(1)).alias("n_events"))
             .select("user_id",
                     F.unix_micros("win.start").alias("s"),
                     F.unix_micros("win.end").alias("e"), "n_events"))
    want = {(r.user_id, r.s): (r.e, r.n_events) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_decontaminate_flags_overlapping_docs(spark):
    """Decontamination marks exactly the training docs sharing a 3-gram
    shingle with the eval slice; overlap counts are per-doc distinct."""
    from peskas_malawi_data_pipeline_spark.queries import REGISTRY

    fn, _sql = REGISTRY["decontaminate_ngram_overlap"]
    out = fn(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    assert all(r.n_overlap >= 1 for r in out)
    assert all(r.doc_id % 19 != 0 for r in out)  # eval slice never flagged


def test_tws_sessionize_matches_batch(spark):
    """transformWithStateInPandas twin of the sessionizer equals the
    applyInPandasWithState output. Skips where the API's state-server
    dependency (google.protobuf) is absent."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithStateInPandas needs google.protobuf")

    from peskas_malawi_data_pipeline_spark.queries import (
        REGISTRY, streaming_sessionize_tws)

    tws = {(r.user_id, r.session_start_s): (r.n_events, r.duration_s)
           for r in streaming_sessionize_tws(
               spark, "/root/testdata/sf0.001").collect()}
    fn, _ = REGISTRY["streaming_sessionize"]
    ref = {(r.user_id, r.session_start_s): (r.n_events, r.duration_s)
           for r in fn(spark, "/root/testdata/sf0.001").collect()}
    assert tws == ref


def test_watermark_drops_late_rows_across_drains(spark, tmp_path):
    """Watermark semantics proof: after drain 1 establishes watermark
    W = max_ts - 10min, a row older than W arriving in drain 2 is DROPPED
    (its window never appears), while windows W passes are finalized and
    appended exactly once."""
    import datetime as dt

    from pyspark.sql import Row

    landing = str(tmp_path / "landing")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp"
    t = lambda h, m: dt.datetime(2024, 5, 1, h, m)  # noqa: E731

    spark.createDataFrame(
        [Row(user_id=1, ts=t(10, 0)), Row(user_id=1, ts=t(10, 5))],
        schema).coalesce(1).write.mode("append").parquet(landing)

    def drain():
        stream = ingest_stream.stream_from_parquet_dir(spark, landing, schema)
        agged = (stream.withWatermark("ts", "10 minutes")
                 .groupBy(F.window("ts", "10 minutes").alias("win"))
                 .agg(F.count(F.lit(1)).alias("n")))
        with ingest_stream.stream_state_partitions(spark, 2):
            ingest_stream.run_available_now(agged, out, ckpt)

    drain()   # watermark after this drain: 10:05 - 10min = 09:55

    # drain 2: one on-time row advancing the watermark past 10:10, plus one
    # row at 09:00 — older than the established 09:55 watermark
    spark.createDataFrame(
        [Row(user_id=1, ts=t(11, 0)), Row(user_id=1, ts=t(9, 0))],
        schema).coalesce(1).write.mode("append").parquet(landing)
    drain()

    got = {r.win.start: r.n for r in spark.read.parquet(out).collect()}
    assert got == {t(10, 0): 2}   # finalized once, late 09:00 row absent


def test_redrain_without_new_data_is_noop(spark, tmp_path):
    """Checkpoint idempotence: re-running an availableNow drain with no new
    input emits nothing — the exactly-once property an external scheduler
    relies on when a cron re-fires."""
    from pyspark.sql import Row

    landing = str(tmp_path / "landing")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "user_id long, v double"
    spark.createDataFrame([Row(user_id=1, v=1.0), Row(user_id=2, v=2.0)],
                          schema).coalesce(1).write.parquet(landing)

    def drain():
        stream = ingest_stream.stream_from_parquet_dir(spark, landing, schema)
        agged = stream.groupBy("user_id").agg(F.sum("v").alias("s"))
        with ingest_stream.stream_state_partitions(spark, 2):
            ingest_stream.run_available_now_upsert(agged, out, ckpt)

    drain()
    first = spark.read.parquet(out).count()
    drain()  # no new files: must not re-emit
    assert spark.read.parquet(out).count() == first
    resolved = ingest_stream.read_upsert_result(spark, out, ["user_id"])
    assert {(r.user_id, r.s) for r in resolved.collect()} == {(1, 1.0), (2, 2.0)}


def test_tws_timer_protocol_no_stale_eviction():
    """The tws sessionizer's timer protocol, driven against a fake handle
    (executing the real operator needs google.protobuf; the eviction
    correctness argument doesn't): extending a session must DELETE the
    previously armed timer before re-arming — registerTimer adds rather
    than replaces — and a stale timer firing anyway (pre-fix checkpoint
    state) must NOT clear the still-open session."""
    import pandas as pd

    from peskas_malawi_data_pipeline_spark.streaming.stateful import (
        make_session_processor)

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def clear(self):
            self._v = None

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()
            self.timers = set()

        def getValueState(self, name, schema):
            return self.state

        def registerTimer(self, ms):
            self.timers.add(ms)

        def deleteTimer(self, ms):
            self.timers.discard(ms)

    class TV:
        def __init__(self, wm):
            self._wm = wm

        def getCurrentWatermarkInMs(self):
            return self._wm

    class Expired:
        def __init__(self, ms):
            self._ms = ms

        def getExpiryTimeInMs(self):
            return self._ms

    def batch(*secs):
        return [pd.DataFrame({
            "ts": pd.to_datetime([s * 1_000_000_000 for s in secs]),
            "event_id": range(len(secs))})]

    gap = 1800
    proc = make_session_processor(gap_s=gap)()
    handle = FakeHandle()
    proc.init(handle)

    # batch 1: session [1000, 1100] -> timer armed at (1100+gap+1)s
    list(proc.handleInputRows((1,), batch(1000, 1100), TV(0)))
    t1 = (1100 + gap + 1) * 1000
    assert handle.timers == {t1}

    # batch 2 extends the session (2000-1100 < gap): the OLD timer must be
    # deleted, not accumulated -- exactly one armed timer remains
    list(proc.handleInputRows((1,), batch(2000), TV(0)))
    t2 = (2000 + gap + 1) * 1000
    assert handle.timers == {t2}
    assert handle.state.get() == ([1000], [2000], [3], t2)

    # a stale timer firing anyway must not evict the open session
    list(proc.handleExpiredTimer((1,), TV(t1), Expired(t1)))
    assert handle.state.exists()

    # the currently armed timer firing DOES evict
    list(proc.handleExpiredTimer((1,), TV(t2), Expired(t2)))
    assert not handle.state.exists()


def test_stateful_sessionize_out_of_order_across_batches(spark, tmp_path):
    """A valid out-of-order event (above the watermark, below the carried
    last_s) falls INSIDE the open session: it must grow n_events but NOT
    regress last_s — a regressed last_s would emit a shrunken duration to
    the upsert sink and re-arm the eviction timer early enough to split
    the session (code-review finding, round 3)."""
    import time

    from peskas_malawi_data_pipeline_spark.streaming import stateful

    t0 = dt.datetime(2024, 3, 5, 8, 0, 0)

    def ev(eid, user, minutes):
        return Row(event_id=eid, user_id=user,
                   ts=t0 + dt.timedelta(minutes=minutes))

    # batch 1: session opens at 0 with last event at 20 min (watermark
    # after drain: 20-30 -> below 0). batch 2: event at 10 min — older
    # than last_s but NOT late (watermark < 10 min) — then an extension at
    # 45 min (gap from 20 min = 25 < 30: same session).
    b1 = spark.createDataFrame([ev(1, 1, 0), ev(2, 1, 20)])
    b2 = spark.createDataFrame([ev(3, 1, 10), ev(4, 1, 45)])

    src = tmp_path / "ooo_landing"
    src.mkdir()
    for name, b in (("f1", b1), ("f2", b2)):
        b.toPandas().to_parquet(str(src / f"{name}.parquet"),
                                coerce_timestamps="us",
                                allow_truncated_timestamps=True)
        time.sleep(1.1)

    stream = (spark.readStream.schema("event_id long, user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src))
              .withWatermark("ts", "30 minutes"))
    sessions = stateful.stateful_sessionize(stream, gap_s=1800)
    out, ckpt = str(tmp_path / "ooo_out"), str(tmp_path / "ooo_ckpt")
    ingest_stream.run_available_now_upsert(sessions, out, ckpt)
    result = ingest_stream.read_upsert_result(
        spark, out, ["user_id", "session_start_s"])
    got = {(r.user_id, r.session_start_s): (r.n_events, r.duration_s)
           for r in result.collect()}
    e = int(t0.timestamp())
    # one session: 4 events, duration to the TRUE max (45 min), never 10
    assert got == {(1, e): (4, 45 * 60)}


def test_segment_stats_matches_pandas_reference():
    """Property: the numpy session assembly (stateful._segment_stats)
    equals the pandas groupby it replaced, across random batch shapes —
    single event, one giant session, alternating gaps, duplicate
    timestamps."""
    import numpy as np
    import pandas as pd

    from peskas_malawi_data_pipeline_spark.streaming import stateful

    rng = np.random.default_rng(5)
    for trial in range(25):
        n = int(rng.integers(1, 60))
        secs = np.sort(rng.integers(0, 40, size=n).astype("int64"))
        gaps = np.zeros(n, dtype=bool)
        gaps[1:] = rng.random(n - 1) < 0.3
        seg = np.cumsum(rng.integers(0, 2)
                        * np.ones(1, dtype="int64"))[0] + np.cumsum(gaps)
        starts, sizes, maxs = stateful._segment_stats(seg, secs)
        ref = (pd.DataFrame({"seg": seg, "s": secs})
               .groupby("seg")["s"].agg(["size", "min", "max"]))
        assert list(starts) == list(ref["min"]), trial
        assert list(sizes) == list(ref["size"]), trial
        assert list(maxs) == list(ref["max"]), trial


def test_segment_stats_total_on_empty_batch():
    """_segment_stats must be total: a zero-row batch returns three empty
    arrays instead of IndexError-ing on first[0]/ends[-1] (Spark never
    emits empty per-key batches today, but the helper shouldn't care)."""
    import numpy as np

    from peskas_malawi_data_pipeline_spark.streaming import stateful

    empty = np.empty(0, dtype="int64")
    starts, sizes, maxs = stateful._segment_stats(empty, empty)
    assert len(starts) == len(sizes) == len(maxs) == 0


def test_merge_sink_exactly_once_and_incremental(spark, tmp_path):
    """run_available_now_merge: a multi-batch drain lands on the batch
    aggregate; a crash-replayed batch id is skipped (the applied-batch
    marker commits transactionally with the data), so sums never double-
    count; and a second drain with no new files is a no-op."""
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.core.io import VersionedParquetTable
    from peskas_malawi_data_pipeline_spark.streaming import ingest_stream as st

    landing = str(tmp_path / "landing")
    rows = [(i, f"2024-01-01 00:{i % 60:02d}:00", i % 3, "click", 1.5, "{}")
            for i in range(30)]
    st.stage_events_landing(
        spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, "
                  "event_type string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp")), landing, 3)

    table = VersionedParquetTable(str(tmp_path / "rollup"))
    partial = lambda b: b.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    drain = lambda ck: st.run_available_now_merge(
        st.stream_events_dir(spark, landing, max_files_per_trigger=1),
        table, ["user_id"], partial, {"n": "count", "s": "sum"},
        str(tmp_path / ck))

    with st.stream_state_partitions(spark, 2):
        drain("ckpt")
    got = {r.user_id: (r.n, r.s) for r in table.read(spark).collect()}
    assert got == {0: (10, 15.0), 1: (10, 15.0), 2: (10, 15.0)}
    v1 = table.current_version()
    assert table.read_meta()["last_batch_id"] >= 1  # multi-batch drain

    # crash replay: re-deliver an already-applied batch id directly
    batch = spark.read.parquet(landing)
    from peskas_malawi_data_pipeline_spark.operators.aggregates import (
        incremental_rollup)  # noqa: F401  (import check only)
    meta_before = table.read_meta()
    # simulate foreachBatch redelivery by calling the drain again on the
    # SAME checkpoint: no new files -> no merge, version unchanged
    with st.stream_state_partitions(spark, 2):
        drain("ckpt")
    assert table.current_version() == v1
    assert {r.user_id: (r.n, r.s) for r in table.read(spark).collect()} == got
    assert table.read_meta() == meta_before

    # fresh checkpoint replays ALL files with batch ids starting at 0:
    # every id <= the committed marker must be skipped, so still no
    # double-count
    with st.stream_state_partitions(spark, 2):
        drain("ckpt2")
    assert {r.user_id: (r.n, r.s) for r in table.read(spark).collect()} == got


def test_sessionize_pre_start_arrivals_exact(spark, tmp_path):
    """Events OLDER than every open session's start (but above the
    watermark) must resolve exactly like the batch recompute: backward
    extension retires the old sink key via a tombstone; an earlier
    separate session stands alone; and a later bridge event merges two
    carried summaries into one. This is the case the single-summary
    clamp formulation silently got wrong."""
    import time

    from peskas_malawi_data_pipeline_spark.streaming import (
        ingest_stream, stateful)

    t0 = dt.datetime(2024, 3, 5, 8, 0, 0)
    e = int(t0.timestamp())
    mk = lambda eid, m: Row(event_id=eid, user_id=1,
                            ts=t0 + dt.timedelta(minutes=m))

    src = tmp_path / "landing"; src.mkdir()
    batches = [
        # b1: session opens at +100 min
        [mk(1, 100), mk(2, 110)],
        # b2: +80 min is OLDER than the open start but within the gap ->
        # backward extension (key moves 100 -> 80; old key tombstoned);
        # +5 min is an EARLIER separate session (gap to 80 min is 75 min)
        [mk(3, 80), mk(4, 5)],
        # b3: +40 min bridges [5,5] and [80,110] into ONE session at +5
        # (gap 35 min on one side, 40 min on the other... both > 30?)
        [mk(5, 50)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows).toPandas().to_parquet(
            str(src / f"f{i}.parquet"), coerce_timestamps="us",
            allow_truncated_timestamps=True)
        time.sleep(1.1)

    stream = (spark.readStream
              .schema("event_id long, user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(str(src))
              .withWatermark("ts", "4 hours"))
    sessions = stateful.stateful_sessionize(stream, gap_s=1800)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ingest_stream.run_available_now_upsert(sessions, out, ckpt)
    resolved = (ingest_stream.read_upsert_result(
        spark, out, ["user_id", "session_start_s"])
        .filter("n_events >= 0"))
    got = {(r.user_id, r.session_start_s): (r.n_events, r.duration_s)
           for r in resolved.collect()}

    # batch truth: minutes 5, 50, 80, 100, 110 -> gaps 45,30,20,10 min;
    # 45 > 30 splits; 30 == gap does NOT split (strict >)
    want = {(1, e + 5 * 60): (1, 0),
            (1, e + 50 * 60): (4, 60 * 60)}
    assert got == want


def test_streaming_near_dedup_arrival_order_invariant(spark, tmp_path):
    """The streaming LSH index-growth loop (queries.streaming_near_dedup's
    foreachBatch body) accumulates EXACTLY the batch LSH pair set under
    any arrival order and batching: two adversarial landings — duplicate
    cluster members split across batches, and reverse order — both equal
    the single-shot batch run, and replaying a batch (at-least-once
    foreachBatch) changes nothing after the terminal DISTINCT."""
    from pyspark.sql import Row

    from peskas_malawi_data_pipeline_spark.core.barrier import materialize
    from peskas_malawi_data_pipeline_spark.operators import dedup as D

    rows = []
    for g in range(6):
        base = " ".join(f"g{g}w{j}" for j in range(15))
        for m in range(3):
            rows.append(Row(doc_id=g * 10 + m,
                            text=base + (" tail" if m == 2 else "")))
    for i in range(40):
        rows.append(Row(doc_id=1000 + i, text=f"unique {i} " * 5 + f"x{i}"))
    df = spark.createDataFrame(rows)

    want = {(r.id_a, r.id_b) for r in D.minhash_lsh_pairs(
        df, num_hashes=8, band_size=2, shingle_n=3).collect()}
    assert len(want) >= 6          # clusters actually pair

    def run_stream(batches):
        index, acc = None, []
        for ids in batches:
            batch = df.filter(F.col("doc_id").isin(ids))
            nb = materialize(D.minhash_bands(
                batch, num_hashes=8, band_size=2, shingle_n=3))
            idx = index if index is not None else nb.limit(0)
            acc.extend((r.id_a, r.id_b) for r in
                       D.incremental_lsh_pairs(nb, idx,
                                               max_bucket=1000).collect())
            index = materialize(idx.unionByName(nb))
        return set(acc)

    ids = [r.doc_id for r in rows]
    split = [ids[0::3], ids[1::3], ids[2::3]]       # cluster members split
    assert run_stream(split) == want
    assert run_stream([list(reversed(ids))[i::2] for i in range(2)]) == want
    # at-least-once replay: a re-delivered batch re-appends its pairs AND
    # its bands; both are absorbed by set semantics
    assert run_stream(split + [split[1]]) == want


def test_versioned_pack_state_replay_idempotent(spark, tmp_path):
    """The streaming_incremental_pack persistence discipline: state and
    completed output are versioned per batch and a batch reads the state
    version STRICTLY BELOW its own id — so a crash-replayed batch
    re-derives its output from v{n-1} and overwrites its own v{n}
    instead of packing on top of its failed attempt's state (which would
    shift every stream offset and duplicate completed sequences). The
    replayed drain must equal the full-corpus batch pack exactly."""
    import os

    from peskas_malawi_data_pipeline_spark.operators import packing as P

    arrays = [[i * 100 + j + 1 for j in range(n)]
              for i, n in enumerate([4, 9, 2, 7, 3, 11, 5, 6])]
    df = spark.createDataFrame(
        [(i, ids) for i, ids in enumerate(arrays)],
        "doc_id long, token_ids array<long>")
    full = {(r.shard, r.seq_id): list(r.input_ids)
            for r in P.pack_sequences(df, seq_len=5,
                                      n_shards=3).collect()}

    state_dir, comp_dir = str(tmp_path / "state"), str(tmp_path / "comp")

    def latest(base, before=None):
        if not os.path.exists(base):
            return None
        vs = sorted(int(d[1:]) for d in os.listdir(base)
                    if d.startswith("v")
                    and (before is None or int(d[1:]) < before))
        return os.path.join(base, f"v{vs[-1]}") if vs else None

    def step(batch_df, batch_id):
        ps = latest(state_dir, before=batch_id)
        state = (spark.read.parquet(ps) if ps
                 else P.empty_pack_state(spark))
        comp, new_state = P.pack_sequences_incremental(
            batch_df, state, seq_len=5, n_shards=3)
        comp.write.mode("overwrite").parquet(
            os.path.join(comp_dir, f"v{batch_id}"))
        new_state.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}"))

    b0 = df.filter(F.col("doc_id") < 4)
    b1 = df.filter(F.col("doc_id") >= 4)
    step(b0, 0)
    step(b1, 1)
    step(b1, 1)   # crash replay: same batch re-delivered
    completed = spark.read.parquet(
        *(os.path.join(comp_dir, d) for d in sorted(os.listdir(comp_dir))))
    tails = P.pack_state_tails(
        spark.read.parquet(latest(state_dir)), seq_len=5)
    got = {(r.shard, r.seq_id): list(r.input_ids)
           for r in completed.unionByName(tails).collect()}
    assert got == full
    n_rows = completed.count() + tails.count()
    assert n_rows == len(full)   # replay did not double-emit


def test_batch_shuffle_partitions_adaptive(spark, tmp_path):
    """Size-adaptive foreachBatch parallelism: a small file-source
    micro-batch sizes down to ``lo``; the count derives from the batch's
    own bytes (ceil(bytes / bytes_per_partition) clamp); the session
    conf is restored after the sized block; unknown/degenerate stats
    fall back to ``hi``."""
    import os

    landing = str(tmp_path / "landing")
    (spark.range(200_000)
     .selectExpr("id AS doc_id", "repeat('x', 50) AS text")
     .repartition(2).write.parquet(landing))
    sizes = sorted(os.path.getsize(os.path.join(landing, f))
                   for f in os.listdir(landing) if f.endswith(".parquet"))

    seen = []

    def step(batch_df, batch_id):
        # default calibration: one ~430 KB file -> ceil(<1) -> lo=4
        seen.append(ingest_stream.batch_shuffle_partitions(batch_df))
        # explicit calibration: derived from THIS batch's actual bytes
        n_fine = ingest_stream.batch_shuffle_partitions(
            batch_df, bytes_per_partition=64 << 10, lo=1, hi=1000)
        assert sizes[0] <= n_fine * (64 << 10) <= sizes[-1] + (64 << 10)
        with ingest_stream.sized_batch_shuffle(batch_df) as n:
            assert int(batch_df.sparkSession.conf.get(
                "spark.sql.shuffle.partitions")) == n == seen[-1]

    old = spark.conf.get("spark.sql.shuffle.partitions")
    q = (spark.readStream.schema("doc_id long, text string")
         .option("maxFilesPerTrigger", 1).parquet(landing)
         .writeStream.foreachBatch(step)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert seen == [4, 4]
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    # degenerate stats (empty-relation plan reports 0/unknown) -> hi
    empty = spark.createDataFrame([], "x long").filter("x > 0")
    assert ingest_stream.batch_shuffle_partitions(empty, hi=17) in (4, 17)


def test_spread_batch(spark, monkeypatch):
    """Map-side spread: lifts a batch whose scan parallelism is below n
    to n partitions, leaves an already-parallel batch untouched (no
    gratuitous shuffle), and PESKAS_BATCH_SPREAD=off disables it."""
    monkeypatch.delenv("PESKAS_BATCH_SPREAD", raising=False)
    narrow = spark.range(1000).coalesce(1)
    spread = ingest_stream.spread_batch(narrow, 8)
    assert spread.rdd.getNumPartitions() == 8
    assert spread.count() == 1000
    wide = spark.range(1000).repartition(16)
    assert ingest_stream.spread_batch(wide, 8) is wide
    monkeypatch.setenv("PESKAS_BATCH_SPREAD", "off")
    assert ingest_stream.spread_batch(narrow, 8) is narrow


def test_spread_stream_default_noop(spark, monkeypatch):
    """The engine-drain spread lever is a NO-OP unless the call site
    passes default_n (only session_window does — §10p measured spread a
    loss at every other engine drain) or PESKAS_STREAM_SPREAD forces a
    count; 'off'/'0' force the no-op even over a call-site default, and
    garbage fails loudly."""
    import pytest

    monkeypatch.delenv("PESKAS_STREAM_SPREAD", raising=False)
    df = spark.range(100).toDF("x")
    assert ingest_stream.spread_stream(df) is df
    assert ingest_stream.spread_stream(df, default_n=6)\
        .rdd.getNumPartitions() == 6
    monkeypatch.setenv("PESKAS_STREAM_SPREAD", "0")
    assert ingest_stream.spread_stream(df, default_n=6) is df
    monkeypatch.setenv("PESKAS_STREAM_SPREAD", "off")
    assert ingest_stream.spread_stream(df, default_n=6) is df
    monkeypatch.setenv("PESKAS_STREAM_SPREAD", "6")
    assert ingest_stream.spread_stream(df).rdd.getNumPartitions() == 6
    monkeypatch.setenv("PESKAS_STREAM_SPREAD", "lots")
    with pytest.raises(ValueError, match="expected 'off'"):
        ingest_stream.spread_stream(df)


def test_sized_batch_shuffle_mode_knob(spark, monkeypatch):
    """The PESKAS_BATCH_SHUFFLE_MODE escape hatch: a static integer >= 1
    pins that count; '0' (the most obvious typo — Spark rejects a zero
    shuffle-partition count at the first shuffle) fails fast at the knob
    with a clear message instead of breaking every drain downstream."""
    import pytest

    df = spark.range(10).toDF("doc_id")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    monkeypatch.setenv("PESKAS_BATCH_SHUFFLE_MODE", "7")
    with ingest_stream.sized_batch_shuffle(df) as n:
        assert n == 7
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    monkeypatch.setenv("PESKAS_BATCH_SHUFFLE_MODE", "0")
    with pytest.raises(ValueError, match="must be >= 1"):
        with ingest_stream.sized_batch_shuffle(df):
            pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    # full int syntax: '-4' must ALSO fail fast (it used to fail
    # isdigit() and silently fall through to the adaptive path), and an
    # arbitrary non-keyword string is a loud config error, not a silent
    # adaptive fallback
    monkeypatch.setenv("PESKAS_BATCH_SHUFFLE_MODE", "-4")
    with pytest.raises(ValueError, match="must be >= 1"):
        with ingest_stream.sized_batch_shuffle(df):
            pass
    monkeypatch.setenv("PESKAS_BATCH_SHUFFLE_MODE", "fastplease")
    with pytest.raises(ValueError, match="expected 'off'"):
        with ingest_stream.sized_batch_shuffle(df):
            pass
    # 'adaptive' is the explicit spelling of the default path
    monkeypatch.setenv("PESKAS_BATCH_SHUFFLE_MODE", "adaptive")
    with ingest_stream.sized_batch_shuffle(df) as n:
        assert n >= 1
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
