"""Mergeable cardinality sketches with engine-portable determinism.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but its
estimates are engine-private: no external oracle can reproduce them bit-for-
bit, and two engines disagree on every group. The K-minimum-values (KMV)
sketch here trades a little accuracy theory for full determinism — the
sketch is "the k smallest md5-derived hashes of the distinct values", a
pure set function of the input, identical in any engine with md5
(Bar-Yossef et al. 2002, "Counting distinct elements in a data stream").

Estimator: with k minimum hashes over a hash space of size H, the k-th
smallest hash h₍ₖ₎ estimates density k/ndv ≈ h₍ₖ₎/H, so
ndv ≈ (k-1)·H/h₍ₖ₎ (the unbiased variant). All integer arithmetic: hashes
are 52-bit (13 md5 hex chars — exact in DuckDB's BIGINT and Spark's long,
clear of any double rounding), and the division is integer division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.barrier import materialize
from ..functions.text import md5_prefix_hash

#: hash space: 13 hex chars = 52 bits. (k-1)·2⁵² must fit int64 → k ≤ 2047.
_HASH_BITS = 52
_HASH_SPACE = 1 << _HASH_BITS


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64, seed: str = "kmv:") -> DataFrame:
    """Per-group approximate distinct count via a k-minimum-values sketch.

    Returns (group_col, sketch_size, est_distinct): ``sketch_size`` is the
    number of retained minimum hashes (= min(ndv, k)); ``est_distinct`` is
    the exact ndv when the group has fewer than k distinct values (the
    sketch IS the distinct set) and the KMV estimate otherwise.

    Scale shape — two-level k-smallest, no per-group funnel:

    1. hash + distinct: ONE shuffle on (group, hash) with map-side partial
       aggregation; NULL values are excluded (a NULL hashes to NULL and is
       not a value).
    2. per-(group, arrival-partition) prune to k via a skew-free window —
       the pid key spreads any single giant group across the cluster, and
       the per-partition k-minimum set is always a superset of the global
       k-minimum set, so no candidate is lost.
    3. the ≤ k·P survivors per group reduce through a tiny per-group
       window + aggregate.

    A naive single window over ``group_col`` funnels each group's full
    distinct-hash set into one task — billions of rows per task at corpus
    scale; step 2 caps that at k·partitions rows. The sketch is mergeable
    (union the hash sets, re-take the k minimum), which is exactly what the
    two-level plan exploits.
    """
    if not 2 <= k <= 2047:
        raise ValueError(f"k must be in [2, 2047] (got {k}): "
                         f"(k-1)·2^{_HASH_BITS} must fit in int64")
    h = md5_prefix_hash(F.col(value_col).cast("string"), seed,
                        hex_chars=_HASH_BITS // 4)
    d = (df.filter(F.col(value_col).isNotNull())
         .select(F.col(group_col), h.alias("__h"))
         .distinct()
         .withColumn("__pid", F.spark_partition_id()))
    w_part = Window.partitionBy(group_col, "__pid").orderBy("__h")
    pruned = (d.withColumn("__rn", F.row_number().over(w_part))
              .filter(F.col("__rn") <= k).drop("__pid", "__rn"))
    w_grp = Window.partitionBy(group_col).orderBy("__h")
    kept = (pruned.withColumn("__rn", F.row_number().over(w_grp))
            .filter(F.col("__rn") <= k))
    numer = (k - 1) * _HASH_SPACE
    # greatest(__kth, 1): hash 0 is a legal md5 prefix, and a zero k-th
    # minimum would make the estimator div NULL instead of a number. With
    # k ≥ 2 distinct hashes the k-th minimum is provably ≥ 1, so the guard
    # never changes a value — it makes the estimator total by construction
    # rather than by that side argument.
    est = (F.when(F.col("sketch_size") < k, F.col("sketch_size"))
           .otherwise(F.expr(f"CAST({numer} AS BIGINT) "
                             f"div greatest(__kth, 1)")))
    return (kept.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("sketch_size"),
                 F.max("__h").alias("__kth"))
            .select(group_col,
                    F.col("sketch_size").cast("long").alias("sketch_size"),
                    est.cast("long").alias("est_distinct")))


def heavy_hitters(df: DataFrame, value_col: str,
                  support_ppm: int = 10_000) -> DataFrame:
    """EXACT heavy hitters — every value occurring in more than
    ``support_ppm`` parts-per-million of the non-null rows, with its exact
    count — without ever shuffling the full value distribution.

    The single-pass answer (groupBy(value).count() then filter) shuffles
    one row per *distinct value*; on a 100 TB corpus with billions of
    distinct tokens that shuffle dwarfs the answer. This is the classic
    two-pass fix (Misra-Gries 1982):

    1. **Candidate pass** — per input partition, a k-counter Misra-Gries
       summary (k = ⌈10⁶/support_ppm⌉) over Arrow batches in
       ``mapInPandas``. MG guarantees any value with partition frequency
       > n_p/(k+1) survives its partition's summary, and a value with
       GLOBAL frequency > n·support must exceed that bar in at least one
       partition (pigeonhole) — so the union of summaries (≤ k·P tiny
       rows, materialized) is a superset of the true heavy hitters.
       Per-partition row counts ride along in the same summary, so the
       corpus is scanned exactly twice overall.
    2. **Exact pass** — broadcast-semi-join the candidates back, count
       only them, and keep count·10⁶ > n·support_ppm (all-integer: the
       threshold compares identically in any engine).

    The candidate SET depends on partitioning; the returned RESULT does
    not — every true heavy hitter is guaranteed present and the exact
    recount discards every false candidate. Deterministic output,
    partition-layout-free. Values travel through the MG summaries as
    strings (pandas dict keys) and are cast back to the input column's
    type on return, so a numeric heavy-hitter list joins back against its
    source column without implicit casts.
    """
    import pandas as pd

    if not 1 <= support_ppm <= 1_000_000:
        raise ValueError(f"support_ppm must be in [1, 1e6] (got {support_ppm})")
    k = -(-1_000_000 // support_ppm)  # ceil

    def mg(batches):
        counters: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            for v, c in pdf["v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # batched MG reduction: subtract the (k+1)-th largest count
                # from everyone; ≤ k values stay strictly positive. Total
                # decrement per value ≤ n_p/(k+1) — the MG error bound.
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - cut for v, c in counters.items() if c > cut}
        yield pd.DataFrame({"v": list(counters) + [None],
                            "pn": [None] * len(counters) + [n]})

    vals = (df.select(F.col(value_col).cast("string").alias("v"))
            .filter(F.col("v").isNotNull()))
    summary = materialize(vals.mapInPandas(mg, "v string, pn long"))
    cands = summary.filter(F.col("v").isNotNull()).select("v").distinct()
    total = summary.agg(F.coalesce(F.sum("pn"), F.lit(0)).alias("__n"))
    counts = (vals.join(F.broadcast(cands), "v", "left_semi")
              .groupBy("v").agg(F.count(F.lit(1)).alias("cnt")))
    out_type = df.schema[value_col].dataType
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * 1_000_000 > F.col("__n") * support_ppm)
            .select(F.col("v").cast(out_type).alias(value_col),
                    F.col("cnt").cast("long").alias("cnt")))
