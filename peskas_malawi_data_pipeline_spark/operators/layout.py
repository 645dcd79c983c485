"""Storage-layout operators: multi-dimensional clustering for data skipping.

Parquet scans skip files/row-groups whose min/max statistics exclude a
predicate. A single-column sort gives perfect skipping on that column and
none on others; interleaving the bits of TWO columns (Morton / Z-order)
gives each file a small rectangle in both dimensions, so predicates on
EITHER column prune — the layout trick behind Delta's ``OPTIMIZE ZORDER``
and Iceberg's sort orders, reproduced here on plain parquet with plain
DataFrame expressions (a bit-spread projection + ``repartitionByRange`` +
``sortWithinPartitions``; no shuffle beyond the range partition that a
clustered write needs anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread_bits(col: Column, bits: int) -> Column:
    """Interleave-ready bit spread: bit i of ``col`` moves to bit 2i."""
    out = None
    for i in range(bits):
        term = F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), 2 * i)
        out = term if out is None else out.bitwiseOR(term)
    return out


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Z-order key of two non-negative ints already scaled to ``bits``
    bits (use ``scale_to_bits`` for arbitrary ranges). Pure codegen —
    ``2·bits`` shift/mask terms, no UDF. ``bits`` must be 1..31: at 32 the
    b-column's top interleaved bit lands on the long's SIGN bit, flipping
    the largest keys negative and silently inverting the clustering
    order."""
    if not 1 <= bits <= 31:
        raise ValueError(f"morton_key bits must be in 1..31, got {bits}")
    return _spread_bits(a.cast("long"), bits).bitwiseOR(
        F.shiftleft(_spread_bits(b.cast("long"), bits), 1))


def scale_to_bits(col: Column, lo: Column | float, hi: Column | float,
                  bits: int = 16) -> Column:
    """Affine-scale a numeric column into [0, 2^bits): rank-free (min/max
    only — one cheap agg to obtain), monotonic, ties preserved."""
    lo = F.lit(lo) if not isinstance(lo, Column) else lo
    hi = F.lit(hi) if not isinstance(hi, Column) else hi
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    unit = (col.cast("double") - lo) / span
    mx = F.lit((1 << bits) - 1)
    return F.least(mx, F.greatest(
        F.lit(0), F.floor(unit * (1 << bits)).cast("long")))


def zorder_write(df: DataFrame, path: str, col_a: str, col_b: str,
                 n_files: int, bits: int = 16) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Z-order
    of (col_a, col_b): each file covers a small min/max rectangle in BOTH
    columns, so single-column predicates on either skip most files.

    One pass to get the two column ranges (tiny agg), one range shuffle on
    the interleaved key, a within-partition sort for row-group-level
    locality — the exact plan a table-format OPTIMIZE would run."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)).first()
    if lo_a is None or lo_b is None:
        # empty input (or all-NULL cluster column): no range to interleave —
        # still write the (empty) table instead of crashing the job
        df.write.mode("overwrite").parquet(path)
        return
    key = morton_key(
        scale_to_bits(F.col(col_a), float(lo_a), float(hi_a), bits),
        scale_to_bits(F.col(col_b), float(lo_b), float(hi_b), bits), bits)
    (df.withColumn("__z", key)
     .repartitionByRange(n_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path))


def bucketed_write(df: DataFrame, table: str, n_buckets: int, *keys: str,
                   path: str | None = None, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Save ``df`` as a Hive-bucketed parquet table on ``keys`` so every
    FUTURE equi-join or aggregation on those keys reads pre-shuffled (and,
    with ``sort=True``, pre-sorted) data: two tables bucketed the same way
    sort-merge-join with ZERO Exchange on either side, and a groupBy on
    the bucket keys skips its exchange too (pinned by
    tests/test_plans.py::test_bucketed_tables_join_without_shuffle).

    This is the 100 TB lever for RECURRING joins — the nightly
    fact↔fact join (e.g. the persisted MinHash band index against daily
    increments, or orders↔lineitem) pays its shuffle ONCE at write time
    and never again; an ad-hoc join should instead rely on AQE. Spark
    requires ``saveAsTable`` for bucket metadata (the bucket spec lives in
    the catalog, not the files); pass ``path`` to make it an external
    table at a chosen location. ``n_buckets`` should target the usual
    shuffle-partition sizing (≈ input size / 128 MB) and, for join
    co-location, MATCH between the two sides — Spark joins tables of
    equal bucket counts without any exchange and, since 3.1+
    (spark.sql.bucketing.coalesceBucketsInJoin), tolerates one side being
    an integer multiple of the other.
    """
    if not keys:
        raise ValueError("bucketed_write requires at least one bucket key")
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def zone_map_stats(df: DataFrame, order_by: list, value_col: str,
                   bucket_rows: int) -> DataFrame:
    """The zone-map table a clustered layout would persist: lay ``df`` out
    in ``order_by`` order, cut it into ``bucket_rows``-row buckets (the
    row-group / file granularity stand-in), and record each bucket's
    (min, max, count) of ``value_col`` — ``(bucket, mn, mx, cnt)``.

    This is exactly the min/max statistics table Delta/Iceberg keep per
    file and parquet keeps per row group; computing it as a DataFrame
    makes layout quality MEASURABLE (see :func:`skip_report`) before
    committing to a physical rewrite with :func:`zorder_write` /
    ``repartitionByRange``. Ranking uses the two-pass range-partitioned
    global row number (no global window); the zone map itself is one
    aggregation, output rows = |df| / bucket_rows."""
    from .ranking import global_row_number

    if bucket_rows <= 0:
        raise ValueError(f"bucket_rows must be positive, got {bucket_rows}")
    cols = list(dict.fromkeys([*order_by, value_col]))  # ordered, deduped
    ranked = global_row_number(df.select(*cols), list(order_by),
                               out_col="__rn")
    return (ranked
            .groupBy(F.expr(f"(__rn - 1) div {bucket_rows}").alias("bucket"))
            .agg(F.min(value_col).alias("mn"), F.max(value_col).alias("mx"),
                 F.count(F.lit(1)).alias("cnt")))


def skip_report(zmap: DataFrame, lo, hi) -> DataFrame:
    """Skip-rate of a range predicate ``value BETWEEN lo AND hi`` against
    a :func:`zone_map_stats` table: a bucket whose [mn, mx] is disjoint
    from [lo, hi] is never read. One row: ``(n_buckets, n_skippable,
    rows_skipped, skip_ppm)`` — the number that decides whether a layout
    rewrite pays for itself."""
    lo = lo if isinstance(lo, Column) else F.lit(lo)
    hi = hi if isinstance(hi, Column) else F.lit(hi)
    can_skip = (F.col("mx") < lo) | (F.col("mn") > hi)
    agg = zmap.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(can_skip.cast("long")).cast("long").alias("n_skippable"),
        F.coalesce(F.sum(F.when(can_skip, F.col("cnt"))), F.lit(0))
        .cast("long").alias("rows_skipped"))
    return agg.select(
        "*", F.expr("n_skippable * 1000000 div n_buckets").alias("skip_ppm"))
