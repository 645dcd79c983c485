"""Deterministic sampling operators for training-data pipelines.

Weighted systematic sampling: order rows by a deterministic md5 key
("random" but reproducible — no RNG, identical across runs and engines),
lay their integer weights end-to-end on a number line, and select every row
whose weight interval contains a sampling point ``offset + k·stride``.
Selection probability is proportional to weight, variance is lower than
independent Bernoulli draws, and the arithmetic is all integer — exact in
any engine, so the whole operator is oracle-checkable.

Scale shape: the prefix sum is TWO-LEVEL — per-shard cumulative sums
(shuffle on the shard key) plus a shard-offset table that is tiny
(``n_shards`` rows, single-partition window over it is free) and broadcast
back. No global single-partition window ever touches row-scale data; the
global order is (shard, key, id), deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.barrier import materialize
from ..functions import text as TX


def weighted_systematic_sample(df: DataFrame, weight_col: str, n: int,
                               id_col: str = "doc_id",
                               n_shards: int = 8) -> DataFrame:
    """≈``n`` rows sampled with probability proportional to the integer
    ``weight_col`` (systematic/low-variance; rows heavier than the stride
    are always selected). Returns the input columns plus ``sample_key``.
    """
    if n < 1:
        # n=0 would make `__total div 0` NULL, greatest(1, NULL) skip the
        # NULL, and the stride collapse to 1 — silently returning ~the
        # whole table when the caller asked for nothing
        raise ValueError(f"n must be >= 1 (got {n})")
    if n_shards < 1:
        # `% 0` is NULL: every row would land in one NULL shard and the
        # per-shard window would funnel the whole table — the exact cliff
        # this module exists to avoid (shuffle_shards has the same guard)
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    key = TX.md5_prefix_hash(F.col(id_col).cast("string"), seed="samp:")
    base = (df.withColumn("__key", key)
            .withColumn("__shard", (F.col("__key") % n_shards).cast("int")))

    w_local = (Window.partitionBy("__shard").orderBy("__key", id_col)
               .rowsBetween(Window.unboundedPreceding, 0))
    base = base.withColumn("__local_cum", F.sum(weight_col).over(w_local))

    # materialized: the n_shards-row totals feed TWO branches (offsets and
    # the grand total) and sit on top of the full hash+shard pipeline —
    # without the barrier each branch re-scans the table (the same
    # multi-consumer hazard ranking.py documents against exchange reuse)
    totals = materialize(base.groupBy("__shard")
                         .agg(F.sum(weight_col).alias("__shard_w")))
    w_off = (Window.orderBy("__shard")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "__shard", F.coalesce(F.sum("__shard_w").over(w_off), F.lit(0))
        .alias("__shard_off"))
    grand = totals.agg(F.sum("__shard_w").alias("__total"))

    g = (base.join(F.broadcast(offsets), "__shard")
         .crossJoin(F.broadcast(grand))
         .withColumn("__ci", F.col("__shard_off") + F.col("__local_cum"))
         .withColumn("__ce", F.col("__ci") - F.col(weight_col))
         .withColumn("__stride",
                     F.greatest(F.lit(1), F.expr(f"__total div {n}")))
         .withColumn("__off", F.expr("__stride div 2")))

    # sampling points strictly below x, all-integer (`div`, never `/`)
    npts = ("(CASE WHEN {x} <= __off THEN 0 "
            "ELSE (({x} - __off - 1) div __stride) + 1 END)")
    return (g.filter(F.expr(f"{npts.format(x='__ci')} > "
                            f"{npts.format(x='__ce')}"))
            .select(*df.columns, F.col("__key").alias("sample_key")))
