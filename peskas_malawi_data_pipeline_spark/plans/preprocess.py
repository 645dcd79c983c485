"""Stage 2 — preprocess_landings (reference R/preprocessing.R:35-409).

Input: the union-widened raw table (one row per submission×vessel×catch, all
survey answers string-typed, FIXTURES.md F2). Output: the canonical
harmonized schema (SURVEY §1.4).

Spark shape (SURVEY §3.2/§4.3): the whole stage is ONE lazy select chain —
harmonize + gear-effort + casts + recodes fuse into a single
whole-stage-codegen pass; the only shuffle is the final distinct(). The
reference's 10-frame full-join fold over gear efforts (J1,
R/preprocessing.R:252-264) is fused into per-suffix coalesce expressions;
``gear_effort_join_fold`` keeps the literal join formulation for parity
testing (both must agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import expressions as E
from ..operators import joins as join_ops
from ..operators import relational as rel
from ..operators import structural as struct

PREFIXES = [
    "group_location/",
    "group_vessel_data/group_vessel/",
    "group_vessel_data/group_gear/",
    "group_vessel_data/group_trade/",
    "group_vessel_data/market/",
    "group_vessel_data/gear_data/",
    "group_vessel_data/",
    "vessels/group_species/",
    "vessels/",
]

# Gear-effort suffix groups (E2, R/preprocessing.R:265-271): canonical
# column <- every raw effort column that feeds it, coalesced in order.
EFFORT_GROUPS: dict[str, list[str]] = {
    "gear_hrs": ["longline_effort_hrs", "handline_effort_hrs", "hours_fished_gear"],
    "gear_n_sets": ["mosquito_effort_sets", "kambuzi_effort_sets",
                    "mosquito_effort", "kambuzi_seine_effort"],
    "gear_n_hooks": ["longline_effort_hooks", "handline_effort_hooks",
                     "longline_effort", "handline_effort"],
    "gear_n_hauls": ["fish_trap_effort_hauls", "chilimira_effort_hauls",
                     "chilimira_hauls", "num_hauls", "fish_trap_effort",
                     "chilimira_effort", "chikwekwesa_effort", "wogo_effort",
                     "other_gear_effort"],
    "gear_length": ["gear_length_m", "gear_length"],
}

VESSEL_TYPE_RECODE = {
    "B+E": "boat_engine",
    "B-E": "boat_no_engine",
    "B+E with Dugout Canoe": "boat_engine_dugout",
    "B+E with Plank Canoe": "boat_engine_plank",
    "Plunked Canoe": "plank_canoe",
    "Dugout Canoe": "dugout_canoe",
}

GEAR_RECODE = {
    "other gear": "other",
    "Chambo Seine (Wogo)": "chambo_seine",
    "Gillnet": "gillnet",
    "Chilimira": "chilimira",
    "Longline": "longline",
    "Handline": "handline",
    "Fish Trap": "fish_trap",
    "Kambuzi seine": "kambuzi_seine",
    "Mosquito net": "mosquito_net",
    "Chikwekwesa": "chikwekwesa",
}

TRANSPORT_RECODE = {"1": "foot", "2": "bicycle", "3": "motorcycle", "4": "vehicle"}

WHY_NOT_RECODE = {
    "wind other": "wind",
    "other rain": "rain",
    "rain wind": "rain_wind",
    "wind": "wind",
    "rain": "rain",
}

CANONICAL_ORDER = [
    "form_name", "submission_id", "survey_id", "landing_date",
    "submission_date", "sample_district", "landing_site", "sample_stratum",
    "sample_day", "fishing_today", "why_not_fishing", "n_boats",
    "vessel_type", "n_fishers", "n_women", "trip_length", "tracker_imei",
    "lat", "lon", "gear", "gear_hrs", "gear_n_sets", "gear_n_hooks",
    "gear_n_hauls", "gear_length", "gear_depth", "mesh_size_mm", "gillnets",
    "trader_sex", "trader_transport_mode", "food_destination", "catch_price",
    "catch_price_type", "catch_usage", "catch_taxon", "catch_taxon_other",
    "catch_kg", "weight_type", "price_kg",
]

GILLNET_FIELDS = {
    "gillnet_number": (["gillnet_number"], "double"),
    "net_type": (["net_type"], "string"),
    "gillnet_mesh_mm": (["gillnet_mesh_mm", "gillnet_mesh"], "double"),
    "gillnet_length_m": (["gillnet_length_m", "gillnet_length"], "double"),
}


def _harmonized_columns(df: DataFrame) -> dict[str, F.Column]:
    """The harmonize transmute (P5/E1, R/preprocessing.R:56-92): one
    expression per canonical column, coalescing form variants."""
    c = lambda *names: E.coalesce_cols(df, *names)  # noqa: E731
    gps = c("gps_location", "gps_location_001")
    cols = {
        "landing_date": E.to_timestamp_flex(c("landing_date", "date_of_landing")),
        "submission_date": E.to_timestamp_flex(c("today")),
        "sample_district": c("sample_district"),
        "landing_site": c("landing_beach", "landing_site"),
        "sample_stratum": c("sample_stratum"),
        "sample_day": c("sample_day"),
        "fishing_today": c("fishing_today", "fishing"),
        "why_not_fishing": c("why_not_fishing", "why_not", "if_other"),
        "n_boats": E.to_double_flex(c("n_vessels", "total_landings")),
        "vessel_type": c("vessel_type"),
        "n_fishers": E.to_double_flex(c("crew_number")),
        "n_women": E.to_double_flex(c("crew_female")),
        "trip_length": E.to_double_flex(c("hours_fished")),
        "tracker_imei": c("imei_number", "tracker_imei"),
        "gear": c("gear_type", "gear_type_other"),
        "gear_depth": E.to_double_flex(c("gear_depth_m", "gear_depth")),
        "mesh_size_mm": E.to_double_flex(c("gear_mesh_size_mm", "gear_mesh_size")),
        "trader_sex": c("trader_sex", "buyer_sex"),
        "trader_transport_mode": c("transport_mode", "trans", "transothers"),
        "food_destination": c("dest", "food_destination"),
        "catch_price": E.to_double_flex(c("value_species", "catch_price")),
        "catch_price_type": c("value_type", "catch_price_type"),
        "catch_usage": c("catch_use", "catch_usage"),
        "catch_taxon": c("fish_species", "catch_taxon"),
        "catch_taxon_other": c("fish_species_other", "catch_taxon_other"),
        "catch_kg": E.to_double_flex(c("weight_kg", "weight")),
        "weight_type": c("weight_type"),
    }
    split = E.split_gps(gps)
    cols["lat"], cols["lon"] = split["lat"], split["lon"]
    return cols


def _effort_columns(df: DataFrame) -> dict[str, F.Column]:
    """The fused gear-effort normalization (SURVEY §4.3): per-suffix
    coalesce across every feeding raw column that exists — replaces the
    reference's 10-way full-join fold, zero shuffles."""
    return {
        out: E.to_double_flex(E.coalesce_cols(df, *sources))
        for out, sources in EFFORT_GROUPS.items()
    }


def gear_effort_join_fold(df: DataFrame, keys=("form_name", "survey_id")) -> DataFrame:
    """The literal J1 formulation (reduce of full joins over per-suffix
    frames, R/preprocessing.R:252-264) — kept for parity testing against the
    fused expressions; never the production path."""
    frames = []
    for out, sources in EFFORT_GROUPS.items():
        frame = df.select(
            *keys, E.to_double_flex(E.coalesce_cols(df, *sources)).alias(out))
        frames.append(frame)
    return join_ops.reduce_join(frames, list(keys), "full")


def preprocess_landings(raw: DataFrame) -> DataFrame:
    """raw (F2) → canonical preprocessed landings (SURVEY §1.4)."""
    df = raw
    # survey_id BEFORE any column surgery (E5, R/preprocessing.R:49)
    df = df.withColumn("survey_id", E.make_survey_id(
        F.col("submission_id"), F.col("vessel_number"), F.col("catch_number")))
    df = rel.strip_prefixes(df, PREFIXES)
    df = rel.drop_by_prefix(df, "_")

    harmonized = _harmonized_columns(df)
    efforts = _effort_columns(df)

    keep = [F.col("form_name"), F.col("submission_id").cast("string").alias("submission_id"),
            F.col("survey_id")]
    gillnets = (F.col("gillnets") if "gillnets" in df.columns
                else F.lit(None).cast(
                    "array<struct<gillnet_number:int,net_type:string,"
                    "gillnet_mesh:string,gillnet_mesh_mm:string,"
                    "gillnet_length:string,gillnet_length_m:string>>"))
    df = df.select(
        *keep,
        *[expr.alias(name) for name, expr in harmonized.items()],
        *[expr.alias(name) for name, expr in efforts.items()],
        gillnets.alias("gillnets"),
    )

    # derived price (E4) after casts
    df = df.withColumn("price_kg", E.price_per_kg(
        F.col("catch_price"), F.col("catch_kg"), F.col("catch_price_type")))

    # nested gillnets fixup (N5, R/preprocessing.R:320-354)
    df = struct.normalize_array_of_struct(df, "gillnets", GILLNET_FIELDS)

    # recodes (E3/E8, R/preprocessing.R:356-398)
    df = (df
          .withColumn("vessel_type", E.recode(F.col("vessel_type"), VESSEL_TYPE_RECODE))
          .withColumn("gear", E.recode(F.col("gear"), GEAR_RECODE))
          .withColumn("trader_transport_mode",
                      E.recode(F.col("trader_transport_mode"), TRANSPORT_RECODE))
          .withColumn("why_not_fishing", E.recode(F.col("why_not_fishing"), WHY_NOT_RECODE))
          .withColumn("catch_taxon", E.clean_text(F.col("catch_taxon")))
          .withColumn("catch_taxon_other", F.trim(F.col("catch_taxon_other")))
          .withColumn("catch_taxon",
                      F.when(F.col("catch_taxon").isin("nocatch", "0"), "no_catch")
                       .otherwise(F.col("catch_taxon"))))

    # P11 distinct (the stage's single shuffle), then canonical order (P7)
    df = rel.distinct_rows(df)
    return rel.select_ordered(df, CANONICAL_ORDER)
