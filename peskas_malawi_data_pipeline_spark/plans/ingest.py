"""Stage 1 — ingest_landings (reference R/ingestion.R:38-105).

Reference shape: per-asset HTTP fetch → per-submission recursive flatten +
survey→vessel→catch explode in an R process pool → cross-form rename →
bind_rows union → Mongo truncate-and-load.

Spark shape: landed JSON per form → ONE lazy plan per form
(flatten = schema-walk select, explode = posexplode_outer chain — all narrow
except nothing: the whole stage is shuffle-free) → unionByName across forms
with the ``form_name`` provenance tag → overwrite sink. The reference's
worker pool disappears; tasks are the parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import relational as rel
from ..operators import structural as struct

# (form_name, vessel-array column, catch-array column, gillnet-array column)
# Two structural dialects exist in the wild (FIXTURES.md F1): dialect A nests
# under `group_vessel_data`, dialect B ("Malawi SSF") under `vessels`.
FORM_LAYOUTS = {
    "dialect_a": ("group_vessel_data", "group_catch", "group_gillnets"),
    "dialect_b": ("vessels", "fish_repeat", "group_gillnets"),
    # full-path variants for schema-pinned Kobo exports, where repeat-group
    # children are keyed by their "/"-joined group path (form_schemas)
    "dialect_a_kobo": ("group_vessel_data", "group_vessel_data/group_catch",
                       "group_vessel_data/group_gillnets"),
    "dialect_b_kobo": ("vessels", "vessels/fish_repeat",
                       "vessels/group_gillnets"),
}

# Prefixes the reference's per-form ingestion bares BEFORE bind_rows
# (process_survey extracts these groups' children unqualified,
# R/ingestion.R:146-152,173-184,218-222) — stripping them per form lets
# unionByName merge the same logical column across dialects (e.g. dialect-A
# `group_vessel_data/group_vessel/vessel_type` and SSF `vessels/vessel_type`
# both become `vessel_type`). The group_location/gear_data/market prefixes
# survive to the raw table (FIXTURES.md F2) and are stripped in preprocess.
INGEST_STRIP_PREFIXES = [
    "group_vessel_data/group_vessel/",
    "group_vessel_data/group_gear/",
    "group_vessel_data/group_trade/",
    "vessels/group_species/",
    "vessels/",
]


def ingest_form(raw: DataFrame, form_name: str, layout: str = "dialect_a") -> DataFrame:
    """One form's submissions → flat (submission, vessel, catch) rows.

    Reproduces `process_survey` (R/ingestion.R:132-272): dotted-path flatten
    (N1), 1-based vessel/catch indices (N2), gillnets kept nested with an
    index field (N3), vessels-less submissions and catch-less vessels kept as
    placeholder rows (posexplode_outer).
    """
    vessel_col, catch_col, gillnet_col = FORM_LAYOUTS[layout]
    df = struct.flatten_struct_columns(raw)

    # vessel level
    df = struct.explode_indexed(df, vessel_col, "vessel_number")
    df = _expand_struct(df, vessel_col)

    # gillnets stay nested; add 1-based gillnet_number (N3)
    if gillnet_col in df.columns:
        df = df.withColumn(
            gillnet_col, struct.index_array_of_struct(F.col(gillnet_col), "gillnet_number"))
        df = df.withColumnRenamed(gillnet_col, "gillnets")

    # catch level
    if catch_col in df.columns:
        df = struct.explode_indexed(df, catch_col, "catch_number")
        df = _expand_struct(df, catch_col)

    df = rel.strip_prefixes(df, INGEST_STRIP_PREFIXES)
    df = rel.rename(df, {"_id": "submission_id"})
    return df.withColumn("form_name", F.lit(form_name))


def _expand_struct(df: DataFrame, col: str) -> DataFrame:
    """Hoist an exploded element struct's leaves to top level, flattening
    nested groups to dotted names (same naming as N1)."""
    from pyspark.sql.types import StructType

    if col not in df.columns or not isinstance(df.schema[col].dataType, StructType):
        return df
    others = [F.col(f"`{c}`") for c in df.columns if c != col]
    leaf_cols = []

    def walk(s: StructType, path: str, name: str):
        for f in s.fields:
            fpath = f"{path}.`{f.name}`"
            fname = f"{name}.{f.name}" if name else f.name
            if isinstance(f.dataType, StructType):
                walk(f.dataType, fpath, fname)
            else:
                leaf_cols.append(F.col(fpath).alias(fname))

    walk(df.schema[col].dataType, f"`{col}`", "")
    return df.select(*others, *leaf_cols)


def ingest_landings(forms: dict[str, tuple[DataFrame, str]]) -> DataFrame:
    """All forms → one union-widened raw table (U1, R/ingestion.R:81-92).

    ``forms`` maps form_name → (submissions DataFrame, layout key). The
    cross-form rename (P1: `vessels/` → `group_vessel_data/` on non-SSF
    forms) happens via each layout's own explode; the union fills missing
    columns with NULL exactly like bind_rows.
    """
    flattened = [ingest_form(df, form_name, layout)
                 for form_name, (df, layout) in forms.items()]
    return rel.union_by_name(flattened)


def ingest_landed_forms(spark, paths: dict[str, str]) -> DataFrame:
    """Production ingest entry: form_name → landed JSON path, each read with
    its pinned schema (sources.form_schemas, SURVEY §7.1 step 1) and its
    structural dialect, then union-widened. Column set is schema-stable —
    independent of which fields this batch of submissions happens to
    populate."""
    from ..sources import form_schemas as FS
    from ..sources import kobo

    forms = {
        form_name: (kobo.read_form_json(spark, path, form_name),
                    FS.FORM_LAYOUT_KEYS[form_name])
        for form_name, path in paths.items()
    }
    return ingest_landings(forms)
