"""Stages 5/6 — export_landings + export_matched_tracks
(reference R/export.R:34-75, 126-182).

export_landings: a typed column-subset projection of validated landings
(P6, R/export.R:47-64) written with overwrite semantics.

export_matched_tracks: the distinct matched trip ids select which GPS point
sets to materialize (the reference fetches each trip's points over HTTP in a
process pool — here the fan-out is sources.pds.fetch_trip_points or an
already-landed points table); points join back to merged trips by Trip (J8)
and aggregate to 10-minute mean positions (E13+A2, R/export.R:160-173).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import aggregates as agg
from ..operators import relational as rel

EXPORT_COLUMNS = [
    "form_name", "submission_id", "survey_id", "landing_date",
    "sample_district", "landing_site", "sample_stratum", "fishing_today",
    "n_boats", "vessel_type", "n_fishers", "n_women", "trip_length", "gear",
    "catch_taxon", "catch_kg", "weight_type", "catch_price", "price_kg",
    "alert_number",
]


def export_landings(validated: DataFrame) -> DataFrame:
    """P6 — the public column subset, canonical order."""
    cols = [c for c in EXPORT_COLUMNS if c in validated.columns]
    return rel.select_ordered(validated, cols)


def matched_trip_ids(merged: DataFrame) -> DataFrame:
    """P12 — distinct matched trips (`pull(Trip) %>% unique()`,
    R/export.R:137-141): the driver-side fan-out list for point fetching."""
    return rel.distinct_values(merged, "Trip")


def export_matched_tracks(merged: DataFrame, points: DataFrame,
                          bucket_minutes: int = 10) -> DataFrame:
    """J8 + E13 + A2 — merged trips ⋈ GPS points, rolled up to
    ``bucket_minutes`` mean positions per (trip, survey, bucket).

    The join key Trip is high-cardinality and uniform (trip ids) — a plain
    shuffle join; the rollup groups on 8 carried keys exactly like the
    reference's group_by (R/export.R:166-173).
    """
    trips = merged.select(
        "Trip", "survey_id", "imei", "landing_day",
        "sample_district", "landing_site", "gear", "catch_taxon")
    # inner, not left: a merged trip whose point fetch yielded no rows has
    # no track to export — a left join would fabricate a NULL-bucket row
    # with n_pings=1 for it (the reference aggregates only actual points,
    # R/export.R:166-173)
    joined = trips.join(points, "Trip", "inner")
    keys = ["Trip", "survey_id", "imei", "landing_day",
            "sample_district", "landing_site", "gear", "catch_taxon"]
    return agg.time_bucket_agg(
        joined, "Time", bucket_minutes, keys,
        [F.avg("Lat").alias("lat"), F.avg("Lng").alias("lon"),
         F.count(F.lit(1)).alias("n_pings")],
        bucket_name="time_bucket")
