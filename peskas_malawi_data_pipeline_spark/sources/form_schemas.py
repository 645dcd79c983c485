"""Pinned StructType schemas for the five Kobo form versions (SURVEY §7.1
step 1; the five assets at reference R/ingestion.R:51-57).

Production ingest at scale must be schema-pinned: ``spark.read.json``
inference re-reads the landing zone and silently drifts with the data
(a week where no submission carries `wogo_effort` would drop the column
and break every downstream coalesce). These schemas pin, per form, exactly
the fields that form version ships.

Field naming reproduces the Kobo export layout the reference consumes
(R/ingestion.R:132-272): survey-level leaves and repeat-group children are
keyed by their full "/"-joined group path; repeats are arrays of structs.
After the ingest explode + the preprocess prefix-strip
(plans.preprocess.PREFIXES, reference R/preprocessing.R:50-53), the union
of these five forms yields exactly the FIXTURES.md F2 raw-table column set:
per-form effort fields under ``group_vessel_data/gear_data/`` keep their
prefix (the reference addresses them fully qualified,
R/preprocessing.R:103,116,175), everything else strips to a bare name.
Catch/gillnet repeat children are unprefixed for the dialect-A forms and
nested under ``vessels/group_species/`` for "Malawi SSF"
(R/ingestion.R:146-152,173-184,218-222) — matching where the reference's
raw collection shows them prefixed vs bare.
"""

from __future__ import annotations

from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

FORM_ECAS = "FISHERIES eCAS DATA"
FORM_2024A = "FieldDataApp-2024A"
FORM_2024 = "FieldDataApp-2024"
FORM_2023F = "FieldDataApp-2023F"
FORM_SSF = "Malawi SSF"

_S = StringType()
_GV = "group_vessel_data"


def _f(*names: str) -> list[StructField]:
    return [StructField(n, _S) for n in names]


# gillnet repeat element — the legacy forms ship mesh/length bare, the newer
# forms the _mm/_m variants (both coalesced by preprocess GILLNET_FIELDS,
# R/preprocessing.R:328-340)
_GILLNET_LEGACY = StructType(_f("net_type", "gillnet_mesh", "gillnet_length"))
_GILLNET_METRIC = StructType(_f("net_type", "gillnet_mesh_mm", "gillnet_length_m"))


def _catch_struct(weight_field: str) -> StructType:
    return StructType(_f("fish_species", "fish_species_other", weight_field,
                         "weight_type", "value_species", "value_type",
                         "catch_use"))


def _vessel_struct_a(mesh: str, depth: str, group_gear_extra: tuple[str, ...],
                     gear_data: tuple[str, ...], gillnet: StructType,
                     weight_field: str, trade: tuple[str, ...]) -> StructType:
    fields = _f(*(f"{_GV}/group_vessel/{n}" for n in (
        "vessel_type", "crew_number", "crew_female", "hours_fished",
        "imei_number")))
    fields += _f(*(f"{_GV}/group_gear/{n}" for n in (
        "gear_type", "gear_type_other", mesh, depth, "num_hauls",
        *group_gear_extra)))
    fields += _f(*(f"{_GV}/gear_data/{n}" for n in gear_data))
    fields += _f(*trade)
    fields.append(StructField(f"{_GV}/group_gillnets", ArrayType(gillnet)))
    fields.append(StructField(f"{_GV}/group_catch",
                              ArrayType(_catch_struct(weight_field))))
    return StructType(fields)


def _vessel_struct_ssf() -> StructType:
    fields = _f(*(f"vessels/{n}" for n in (
        "vessel_type", "crew_number", "crew_female", "hours_fished",
        "imei_number", "gear_type", "gear_type_other", "gear_mesh_size",
        "gear_depth", "chilimira_hauls", "trader_sex")))
    fields.append(StructField("vessels/group_gillnets",
                              ArrayType(_GILLNET_LEGACY)))
    fields.append(StructField("vessels/fish_repeat", ArrayType(StructType(
        _f(*(f"vessels/group_species/{n}" for n in (
            "fish_species", "fish_species_other", "weight", "weight_type",
            "value_species", "value_type", "catch_use")))))))
    return StructType(fields)


def _survey_schema(vessel_key: str, vessel_struct: StructType,
                   date_field: str = "landing_date",
                   gps: str = "gps_location",
                   fishing: str = "fishing_today",
                   why: tuple[str, ...] = ("why_not_fishing",),
                   n_vessels: str = "n_vessels") -> StructType:
    fields = [StructField("_id", LongType(), False)]
    fields += _f("today",
                 f"group_location/{date_field}",
                 "group_location/sample_district",
                 "group_location/landing_beach",
                 "group_location/sample_stratum",
                 "group_location/sample_day",
                 f"group_location/{gps}",
                 fishing, *why, n_vessels)
    fields.append(StructField(vessel_key, ArrayType(vessel_struct)))
    return StructType(fields)


_ECAS_TRADE = (f"{_GV}/group_trade/trader_sex", f"{_GV}/group_trade/transport_mode")
_MARKET_TRADE = (f"{_GV}/market/buyer_sex", f"{_GV}/market/trans",
                 f"{_GV}/market/transothers", f"{_GV}/market/dest")

# Per-form gear-effort fields follow exactly the E3 branch sources
# (R/preprocessing.R:94-249): bare names live under the (stripped)
# group_gear path, fully-qualified ones under gear_data (kept).
FORM_SCHEMAS: dict[str, StructType] = {
    FORM_ECAS: _survey_schema(_GV, _vessel_struct_a(
        mesh="gear_mesh_size", depth="gear_depth",
        group_gear_extra=("mosquito_effort_sets", "longline_effort_hooks",
                          "longline_effort_hrs", "fish_trap_effort_hauls",
                          "handline_effort_hooks", "handline_effort_hrs",
                          "kambuzi_effort_sets", "chilimira_effort_hauls"),
        gear_data=(), gillnet=_GILLNET_LEGACY, weight_field="weight",
        trade=_ECAS_TRADE)),
    FORM_2024: _survey_schema(_GV, _vessel_struct_a(
        mesh="gear_mesh_size_mm", depth="gear_depth_m",
        group_gear_extra=("chilimira_hauls", "chilimira_effort",
                          "chikwekwesa_effort"),
        gear_data=("longline_effort", "other_gear_effort"),
        gillnet=_GILLNET_METRIC, weight_field="weight_kg",
        trade=_MARKET_TRADE)),
    FORM_2024A: _survey_schema(_GV, _vessel_struct_a(
        mesh="gear_mesh_size_mm", depth="gear_depth_m",
        group_gear_extra=("chilimira_hauls", "fish_trap_effort",
                          "chikwekwesa_effort"),
        gear_data=(), gillnet=_GILLNET_METRIC, weight_field="weight_kg",
        trade=_MARKET_TRADE)),
    FORM_2023F: _survey_schema(_GV, _vessel_struct_a(
        mesh="gear_mesh_size_mm", depth="gear_depth_m",
        group_gear_extra=("chilimira_hauls", "chilimira_effort",
                          "chikwekwesa_effort", "wogo_effort",
                          "fish_trap_effort"),
        gear_data=("mosquito_effort", "longline_effort", "handline_effort",
                   "kambuzi_seine_effort", "other_gear_effort"),
        gillnet=_GILLNET_METRIC, weight_field="weight_kg",
        trade=_MARKET_TRADE)),
    FORM_SSF: _survey_schema(
        "vessels", _vessel_struct_ssf(),
        date_field="date_of_landing", gps="gps_location_001",
        fishing="fishing", why=("why_not", "if_other"),
        n_vessels="total_landings"),
}

# structural layout key per form (consumed by plans.ingest.FORM_LAYOUTS)
FORM_LAYOUT_KEYS: dict[str, str] = {
    FORM_ECAS: "dialect_a_kobo",
    FORM_2024: "dialect_a_kobo",
    FORM_2024A: "dialect_a_kobo",
    FORM_2023F: "dialect_a_kobo",
    FORM_SSF: "dialect_b_kobo",
}


def form_schema(form_name: str) -> StructType:
    """The pinned submission schema for one of the five form versions."""
    try:
        return FORM_SCHEMAS[form_name]
    except KeyError:
        raise KeyError(
            f"no pinned schema for form {form_name!r}; known forms: "
            f"{sorted(FORM_SCHEMAS)}") from None
