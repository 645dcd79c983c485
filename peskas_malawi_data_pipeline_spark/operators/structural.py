"""Nested-data / structural operators (SURVEY §2.3, N1–N5).

The reference flattens Kobo JSON with recursive R list-walking per submission
in a process pool (`R/ingestion.R:132-272,375-393`). Spark-first: the nesting
lives in the schema (StructType/ArrayType), the flatten is a driver-side
schema walk emitting one ``select``, and the survey→vessel→catch hierarchy
explode is ``posexplode_outer`` — fully distributed, no per-row Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def flatten_struct_columns(df: DataFrame, sep: str = ".") -> DataFrame:
    """N1 — recursive flatten of nested struct columns; leaf column names are
    the path joined by ``sep`` (reference `flatten_with_names`,
    `R/ingestion.R:375-393`: depth-first, dotted names, NULL→NA).

    Array columns are left intact (they are the explode targets of N2);
    NULLs are native. Pure projection — zero shuffle, full codegen.
    """
    def leaves(schema: StructType, path: str, name: str) -> list[Column]:
        cols: list[Column] = []
        for field in schema.fields:
            fpath = f"{path}.`{field.name}`" if path else f"`{field.name}`"
            fname = f"{name}{sep}{field.name}" if name else field.name
            if isinstance(field.dataType, StructType):
                cols.extend(leaves(field.dataType, fpath, fname))
            else:
                cols.append(F.col(fpath).alias(fname))
        return cols

    return df.select(*leaves(df.schema, "", ""))


def explode_indexed(df: DataFrame, array_col: str, index_name: str,
                    keep_empty: bool = True) -> DataFrame:
    """N2 (one level) — explode an array column with a 1-based sibling index
    (`vessel_number`/`catch_number`, `R/ingestion.R:188,256`).

    ``posexplode_outer`` keeps rows whose array is NULL/empty as a single
    NULL-element row — the reference's placeholder-NA-catch behavior
    (`R/ingestion.R:224-237`). Parent columns replicate onto each element row
    (the reference's `slice(rep(1, n))` broadcast, W4) for free.
    """
    explode_fn = F.posexplode_outer if keep_empty else F.posexplode
    # Backtick-quote EVERYTHING, the explode target included: flattened
    # names contain dots (N1) and must not be re-parsed as struct paths.
    others = [F.col(f"`{c}`") for c in df.columns if c != array_col]
    out = df.select(*others,
                    explode_fn(F.col(f"`{array_col}`")).alias("__pos", array_col))
    idx = F.when(F.col(array_col).isNotNull(), F.col("__pos") + 1)
    return out.withColumn(index_name, idx.cast("int")).drop("__pos")


def explode_hierarchy(df: DataFrame, levels: Sequence[tuple[str, str]]) -> DataFrame:
    """N2 — survey→vessel→catch hierarchy explode (reference `process_survey`,
    `R/ingestion.R:132-272`): chained indexed explodes, each level's struct
    fields hoisted to top level.

    ``levels`` is a sequence of (array_column, index_name); after each
    explode the element struct's fields are expanded with their own names
    (survey- and vessel-level fields repeat onto each catch row).
    """
    out = df
    for array_col, index_name in levels:
        out = explode_indexed(out, array_col, index_name)
        elem_type = out.schema[array_col].dataType
        if isinstance(elem_type, StructType):
            others = [F.col(f"`{c}`") for c in out.columns if c != array_col]
            out = out.select(*others, F.col(f"`{array_col}`.*"))
    return out


def index_array_of_struct(col: Column, index_name: str) -> Column:
    """N3 — keep a sub-array nested but add a 1-based index field to each
    element (gillnets `gillnet_number`, `R/ingestion.R:191-215`): a
    higher-order ``transform``, no explode, no shuffle.
    """
    return F.transform(
        col,
        lambda g, i: g.withField(index_name, (i + 1).cast("int")),
    )


def normalize_array_of_struct(df: DataFrame, array_col: str,
                              fields: dict[str, tuple[Sequence[str], str]]) -> DataFrame:
    """N4+N5 — normalize a heterogeneous array-of-struct column to a declared
    shape (reference `standardize_list_column` `R/preprocessing.R:466-494` +
    gillnets fixup `:320-354`).

    ``fields`` maps output field name → (candidate source fields in coalesce
    order, cast type). Missing sources become NULL (the reference adds
    missing fields as NA). One ``transform`` expression; rows where the
    array is NULL stay NULL.
    """
    elem_schema = df.schema[array_col].dataType
    assert isinstance(elem_schema, ArrayType) and isinstance(elem_schema.elementType, StructType)
    available = {f.name for f in elem_schema.elementType.fields}

    def rebuild(g: Column) -> Column:
        parts = []
        for out_name, (sources, cast_to) in fields.items():
            present = [g[s] for s in sources if s in available]
            if not present:
                src = F.lit(None)
            elif len(present) == 1:
                src = present[0]
            else:
                src = F.coalesce(*present)
            parts.append(src.cast(cast_to).alias(out_name))
        return F.struct(*parts)

    return df.withColumn(array_col, F.transform(F.col(array_col), rebuild))
