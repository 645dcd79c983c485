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

# The five Kobo form names that gate the per-form gear-effort branches
# (E3, R/preprocessing.R:94-249).
FORM_ECAS = "FISHERIES eCAS DATA"
FORM_2024A = "FieldDataApp-2024A"
FORM_2024 = "FieldDataApp-2024"
FORM_2023F = "FieldDataApp-2023F"
FORM_SSF = "Malawi SSF"

# Per-form gear-effort case_when blocks (E3, R/preprocessing.R:94-249):
# intermediate column -> ordered (form-set, source raw column) branches.
# First matching form wins; unmatched forms yield NULL (`TRUE ~ NA`).
# Keys are listed in the reference's full-join frame order — the suffix
# coalesce below depends on it. Quirk Q2 (SURVEY §8): `ceffort` is defined
# twice (R:179-193 vs :196-210) and the SECOND block wins, including its
# typo'd `chilmira_n_hrs` output name (which still feeds gear_hrs because
# the suffix scan matches `ends_with("n_hrs")`).
EFFORT_BLOCKS: dict[str, list[tuple[tuple[str, ...], str]]] = {
    # meffort (R:98-106)
    "mosquito_n_sets": [((FORM_ECAS,), "mosquito_effort_sets"),
                        ((FORM_2023F,), "mosquito_effort")],
    # llffort (R:108-127)
    "longline_n_hooks": [((FORM_ECAS,), "longline_effort_hooks"),
                         ((FORM_2024,), "longline_effort"),
                         ((FORM_2023F,), "longline_effort")],
    "longline_n_hrs": [((FORM_ECAS,), "longline_effort_hrs")],
    # fteffort (R:129-141)
    "fishtrap_n_hauls": [((FORM_ECAS,), "fish_trap_effort_hauls"),
                         ((FORM_2024A,), "fish_trap_effort"),
                         ((FORM_2023F,), "fish_trap_effort")],
    # hlffort (R:143-163)
    "handline_n_hooks": [((FORM_ECAS,), "handline_effort_hooks")],
    "handline_n_hrs": [((FORM_ECAS,), "handline_effort_hrs"),
                       ((FORM_2023F,), "handline_effort")],
    # keffort (R:166-177)
    "kambuzi_n_sets": [((FORM_ECAS,), "kambuzi_effort_sets"),
                       ((FORM_2023F,), "kambuzi_seine_effort")],
    # ceffort — effective SECOND block (Q2, R:196-210)
    "chilimira_n_hauls": [((FORM_ECAS,), "chilimira_effort_hauls"),
                          ((FORM_SSF, FORM_2024, FORM_2024A, FORM_2023F),
                           "chilimira_hauls")],
    "chilmira_n_hrs": [((FORM_2024, FORM_2023F), "chilimira_effort")],
    # cheffort (R:212-227)
    "chikwekwesa_n_sets": [((FORM_2024,), "chikwekwesa_effort"),
                           ((FORM_2023F,), "chikwekwesa_effort")],
    "chikwekwesa_length": [((FORM_2024A,), "chikwekwesa_effort")],
    # weffort (R:229-237)
    "wogo_n_sets": [((FORM_2023F,), "wogo_effort")],
    # oeffort (R:239-248)
    "other_n_hrs": [((FORM_2024, FORM_2023F), "other_gear_effort")],
}

# Suffix-group coalesce after the fold (E2, R/preprocessing.R:265-271):
# `coalesce(!!!select(., ends_with(suffix)))` over the joined frame, so feed
# order = frame column order. `n_hauls` (the raw `num_hauls` rename,
# R:81) sits in the merged_data slice and therefore coalesces FIRST into
# gear_n_hauls; gear_length's only `*length` column is chikwekwesa_length.
EFFORT_SUFFIX_GROUPS: dict[str, list[str]] = {
    "gear_hrs": ["longline_n_hrs", "handline_n_hrs", "chilmira_n_hrs",
                 "other_n_hrs"],
    "gear_n_sets": ["mosquito_n_sets", "kambuzi_n_sets",
                    "chikwekwesa_n_sets", "wogo_n_sets"],
    "gear_n_hooks": ["longline_n_hooks", "handline_n_hooks"],
    "gear_n_hauls": ["n_hauls", "fishtrap_n_hauls", "chilimira_n_hauls"],
    "gear_length": ["chikwekwesa_length"],
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
        # coalesce order follows the reference exactly (R/preprocessing.R:80-81):
        # gear_mesh_size / gear_depth first, their _mm/_m variants second
        "gear_depth": E.to_double_flex(c("gear_depth", "gear_depth_m")),
        "mesh_size_mm": E.to_double_flex(c("gear_mesh_size", "gear_mesh_size_mm")),
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


def _form_branch_expr(df: DataFrame,
                      branches: list[tuple[tuple[str, ...], str]]) -> F.Column:
    """One E3 per-form case_when: first matching form_name branch wins,
    unmatched forms are NULL (`TRUE ~ NA_character_`). Source columns a form
    dialect never shipped are absent from the union frame — R sees them as
    all-NA columns, the engine substitutes a typed NULL literal."""
    expr: F.Column | None = None
    for forms, src in branches:
        col = F.col(f"`{src}`") if src in df.columns else F.lit(None).cast("string")
        cond = (F.col("form_name") == forms[0]) if len(forms) == 1 \
            else F.col("form_name").isin(*forms)
        expr = F.when(cond, col) if expr is None else expr.when(cond, col)
    return expr


def _effort_intermediates(df: DataFrame) -> dict[str, F.Column]:
    """The 13 per-gear intermediate columns of the nine E3 transmute blocks
    (R/preprocessing.R:94-249), plus `n_hauls` (= raw num_hauls, R:81)."""
    inter = {name: _form_branch_expr(df, branches)
             for name, branches in EFFORT_BLOCKS.items()}
    inter["n_hauls"] = (F.col("num_hauls") if "num_hauls" in df.columns
                        else F.lit(None).cast("string"))
    return inter


def _effort_columns(df: DataFrame) -> dict[str, F.Column]:
    """The fused gear-effort normalization (SURVEY §4.3): the nine per-form
    E3 blocks and the per-suffix E2 coalesce composed as plain column
    expressions — replaces the reference's 10-way full-join fold
    (R/preprocessing.R:252-271) with zero shuffles, same values."""
    inter = _effort_intermediates(df)
    out = {}
    for name, feeds in EFFORT_SUFFIX_GROUPS.items():
        exprs = [inter[f] for f in feeds]
        merged = exprs[0] if len(exprs) == 1 else F.coalesce(*exprs)
        out[name] = E.to_double_flex(merged)
    return out


def gear_effort_join_fold(df: DataFrame, keys=("form_name", "survey_id")) -> DataFrame:
    """The literal J1 formulation (reduce of full joins over the nine
    per-gear transmute frames, R/preprocessing.R:252-264, then the
    ends_with-suffix coalesce :265-271) — kept for parity testing against
    the fused expressions; never the production path."""
    inter = _effort_intermediates(df)
    # merged_data slice carries n_hauls (R:253); each E3 block is its own
    # keyed frame, joined back by (form_name, survey_id).
    frames = [df.select(*keys, inter["n_hauls"].alias("n_hauls"))]
    block_names = list(EFFORT_BLOCKS)
    # group intermediate columns back into their source transmute blocks
    blocks = [["mosquito_n_sets"], ["longline_n_hooks", "longline_n_hrs"],
              ["fishtrap_n_hauls"], ["handline_n_hooks", "handline_n_hrs"],
              ["kambuzi_n_sets"], ["chilimira_n_hauls", "chilmira_n_hrs"],
              ["chikwekwesa_n_sets", "chikwekwesa_length"], ["wogo_n_sets"],
              ["other_n_hrs"]]
    assert sorted(c for b in blocks for c in b) == sorted(block_names)
    for cols in blocks:
        frames.append(df.select(*keys, *[inter[c].alias(c) for c in cols]))
    joined = join_ops.reduce_join(frames, list(keys), "full")
    suffix = {"gear_hrs": "n_hrs", "gear_n_sets": "n_sets",
              "gear_n_hooks": "n_hooks", "gear_n_hauls": "n_hauls",
              "gear_length": "length"}
    return joined.select(
        *keys,
        *[E.to_double_flex(E.coalesce_by_suffix(joined, sfx)).alias(out)
          for out, sfx in suffix.items()])


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
