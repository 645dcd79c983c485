"""Stage 4 — merge_trips (reference R/merge_trips.R:41-124).

Associates validated landings with PDS GPS trips by (civil landing date,
IMEI), keeping only (date, imei) pairs that are unique on BOTH sides — the
reference's uniqueness guard (R/merge_trips.R:83-98): groups of size >1 are
dropped, not disambiguated. An as-of join on trip end time would be a
semantic change (SURVEY §2.6 note) — not substituted.

Spark shape: two window-flag passes (A1) + one inner join (J7 — the
reference's full_join + both-non-null filter IS an inner join). Each side
shuffles once on (landing_date, imei); the join reuses that partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import expressions as E
from ..operators import aggregates as agg
from ..operators import joins as join_ops
from .validate import validate_imeis


def prepare_landings(landings: DataFrame, devices: DataFrame) -> DataFrame:
    """Landings side: canonical IMEI via registry match (Q5 — imei alerts
    are consumed here, not in validate), civil landing date, unique-trip
    flag (A1, R/merge_trips.R:85-89)."""
    imeis = validate_imeis(landings, devices)
    df = join_ops.broadcast_left_join(
        landings, imeis.select("survey_id", "imei", "alert_imei"),
        ["survey_id"], "left")
    df = df.withColumn("landing_day", F.to_date("landing_date"))
    df = agg.group_count_flag(df, ["landing_day", "imei"], "unique_trip_per_day")
    return df


def prepare_trips(trips: DataFrame) -> DataFrame:
    """Trips side: rename IMEI, civil end date in Africa/Blantyre
    (E12, R/merge_trips.R:66-69), unique-trip flag (R/merge_trips.R:94-97)."""
    df = trips.withColumnRenamed("IMEI", "imei")
    df = df.withColumn("landing_day", E.local_date(F.col("Ended")))
    df = df.withColumn("trip_started",
                       F.from_utc_timestamp(F.col("Started"), E.BLANTYRE_TZ))
    df = df.withColumn("trip_ended",
                       F.from_utc_timestamp(F.col("Ended"), E.BLANTYRE_TZ))
    df = agg.group_count_flag(df, ["landing_day", "imei"], "unique_trip_per_day")
    return df


def merge_trips(landings: DataFrame, trips: DataFrame, devices: DataFrame) -> DataFrame:
    """Full stage: match unique landings to unique trips by (day, imei)."""
    l_side = (prepare_landings(landings, devices)
              .filter(F.col("unique_trip_per_day") & F.col("imei").isNotNull()))
    t_side = (prepare_trips(trips)
              .filter(F.col("unique_trip_per_day") & F.col("imei").isNotNull())
              .select("landing_day", "imei", "Trip", "trip_started", "trip_ended",
                      F.col("Boat").alias("tracker_boat"),
                      F.col("Community").alias("tracker_community")))
    merged = join_ops.inner_join_matched(l_side, t_side, ["landing_day", "imei"])
    # J7's post-filter (both keys non-null) is implied by the inner join +
    # the imei non-null pre-filters; survey_id is never NULL by construction.
    return merged.drop("unique_trip_per_day")
