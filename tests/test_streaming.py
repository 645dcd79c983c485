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
