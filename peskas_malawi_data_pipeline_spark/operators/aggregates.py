"""Aggregation and window operators (SURVEY §2.7, §2.8).

All map onto Spark's partial-aggregation machinery (map-side combine before
the shuffle) or window functions; nothing here is a UDF.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_count_flag(df: DataFrame, keys: Sequence[str],
                     flag_name: str = "unique_per_group") -> DataFrame:
    """A1/W2 — attach ``count(*) over (partition by keys) == 1`` to every row
    (`group_by(...) %>% mutate(n() == 1)`, `R/merge_trips.R:87-88,95-97`).
    One shuffle on the keys; no row reduction.
    """
    w = Window.partitionBy(*keys)
    return df.withColumn(flag_name, F.count(F.lit(1)).over(w) == 1)


def grouped_agg(df: DataFrame, keys: Sequence[str], exprs: Sequence[Column]) -> DataFrame:
    """A2/A5/A6 — plain grouped aggregation (10-minute track means
    `R/export.R:166-173`; report counts/sums). Partial aggregation is free.
    """
    return df.groupBy(*keys).agg(*exprs)


def grouped_mean_as_column(df: DataFrame, keys: Sequence[str], value: str,
                           out: str) -> DataFrame:
    """A7 — group mean attached to every row
    (`group_by(fish_species) %>% mutate(mean_price = mean(...))`,
    `inst/reports/malawi-report.qmd:155-156`).
    """
    return df.withColumn(out, F.avg(value).over(Window.partitionBy(*keys)))


def top_k_per_group(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column],
                    k: int, rank_col: str = "rn", keep_rank: bool = False) -> DataFrame:
    """W1 — per-group top-k (`arrange(.by_group) %>% slice_head(n=10)`,
    `inst/reports/malawi-report.qmd:102-112`).

    ``row_number`` over a partitioned window — Spark plans this as a
    partial top-k (WindowGroupLimit pushes k into the sort) so each shuffle
    partition only keeps k rows; at 100 TB this is the only sane shape.
    Callers must make ``order_by`` a total order (tie-break on a key) for
    deterministic output.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def count_sorted(df: DataFrame, keys: Sequence[str], count_name: str = "n") -> DataFrame:
    """A5/W3 — count per group, descending (`count %>% arrange(-n)`,
    `inst/reports/malawi-report.qmd:56-63`)."""
    return (df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_name))
            .orderBy(F.desc(count_name), *keys))


def time_bucket_agg(df: DataFrame, ts_col: str, minutes: int,
                    keys: Sequence[str], exprs: Sequence[Column],
                    bucket_name: str = "time_bucket") -> DataFrame:
    """A2+E13 — fixed-window event-time aggregation (10-minute GPS track
    rollup, `R/export.R:160-173`): floor the timestamp, group on
    (bucket, keys). The same shape Structured Streaming uses for windowed
    aggs, so the streaming variant (streaming.ingest_stream) shares semantics.
    """
    from ..functions.expressions import floor_time

    bucketed = df.withColumn(bucket_name, floor_time(F.col(ts_col), minutes))
    return bucketed.groupBy(bucket_name, *keys).agg(*exprs)


def salted_two_stage_agg(df: DataFrame, keys: Sequence[str], value: Column,
                         salt_source: Sequence[str],
                         salt_buckets: int = 16) -> DataFrame:
    """Skew-busting aggregation: sum/count of ``value`` per ``keys`` computed
    as partial aggregates over (keys, salt) first, then a final merge over
    ``keys`` alone.

    With an extreme hot key, a single-stage groupBy sends every hot row to
    one reducer; the salted partial stage spreads them over
    ``salt_buckets`` tasks, and the final stage merges ``salt_buckets``
    rows per key — the explicit analogue of map-side combine for the case
    where a combiner can't absorb the skew (e.g. high-cardinality
    composite values). Salt is a deterministic hash (no RNG): retries and
    oracle replays are stable. Result is identical to the unsalted
    aggregate (SCALE.md §4).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_source]),
                  F.lit(salt_buckets)).cast("int")
    partial = (df.withColumn("__salt", salt)
               .groupBy(*list(keys), "__salt")
               .agg(F.sum(value).alias("__psum"),
                    F.count(F.lit(1)).alias("__pcnt")))
    return (partial.groupBy(*list(keys))
            .agg(F.sum("__psum").alias("value_sum"),
                 F.sum("__pcnt").alias("n")))
