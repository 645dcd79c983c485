"""Join operators (SURVEY §2.6, J1–J9).

Scale stance: the reference's joins fall into two classes —
(a) fact ⋈ tiny dimension (bounds tables, device registry): always broadcast;
(b) fact ⋈ fact on a shared key (landings ⋈ trips): shuffle hash/sort-merge on
the key, with AQE handling skew. Helpers below encode those choices.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def reduce_join(dfs: Sequence[DataFrame], on: Sequence[str], how: str = "full") -> DataFrame:
    """J1/J3 — fold a list of frames with a shared key
    (`purrr::reduce(full_join)`, `R/preprocessing.R:252-264`;
    `R/validation.R:70-73`).

    NOTE (SURVEY §4.3): when all frames derive from one parent, prefer a
    single fused ``select`` — the gear-effort fold is implemented that way in
    plans.preprocess; this generic fold exists for operator parity and for
    genuinely independent inputs.
    """
    return reduce(lambda a, b: a.join(b, list(on), how), dfs)


def broadcast_left_join(fact: DataFrame, dim: DataFrame, on: Sequence[str] | Column,
                        how: str = "left") -> DataFrame:
    """J4/J5/J6 — fact ⋈ small dimension with an explicit broadcast hint
    (bounds tables `R/validation-functions.R:225,300`; imei alerts
    `R/merge_trips.R:85`). The hint makes the plan stable at any scale —
    never a shuffle of the 100 TB side against a KB-size table.
    """
    on = list(on) if isinstance(on, (list, tuple)) else on
    return fact.join(F.broadcast(dim), on, how)


def inner_join_matched(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """J7 — the reference's full_join + filter(both keys non-null) is an
    inner join (`R/merge_trips.R:103-109`); expressed directly as inner
    (SURVEY §4.3 — same result, half the output churn).
    """
    return left.join(right, list(on), "inner")


def suffix_match_join(facts: DataFrame, fact_key: str, fact_value: str,
                      registry: DataFrame, registry_value: str) -> DataFrame:
    """J9 — theta join: registry value ENDS WITH the reported digits
    (IMEI validation, `R/validation-functions.R:339-375`: regex
    ``paste0(imei, "$")`` per value via purrr::imap).

    Spark-first: a broadcast-nested-loop join on an ``endswith`` predicate
    against the (tiny) registry, then a grouped count per fact key — the
    per-value R loop becomes one distributed pass. Returns one row per
    DISTINCT (fact_key, fact_value) pair. The registry values are
    de-duplicated first — the reference matches against the distinct
    valid-IMEI vector (R/validation-functions.R:339-375), so a device
    listed twice in a hand-maintained sheet must not double its match
    count and raise a spurious ambiguity alert.
    """
    distinct_facts = facts.select(fact_key, fact_value).distinct()
    reg = F.broadcast(registry.select(F.col(registry_value).alias("__reg_value"))
                      .distinct())
    joined = distinct_facts.join(
        reg, F.col("__reg_value").endswith(F.col(fact_value)), "left")
    return (joined.groupBy(fact_key, fact_value)
            .agg(F.count("__reg_value").alias("n_matches"),
                 F.min("__reg_value").alias("matched_value")))


def salted_join(fact: DataFrame, dim: DataFrame, keys: Sequence[str],
                salt_buckets: int = 16, how: str = "inner",
                salt_source: Sequence[str] | None = None) -> DataFrame:
    """Skew-busting equi-join: when a few hot key values dominate the fact
    side but the dim side is too big to broadcast, replicate each dim row
    into ``salt_buckets`` salted copies and scatter fact rows across them —
    every hot key spreads over ``salt_buckets`` tasks instead of one
    straggler. AQE's skew-join handles moderate skew automatically; this is
    the explicit tool for extreme, KNOWN skew (SURVEY §7.1 step 7 salting
    guidance; SCALE.md §4).

    The fact-side salt is a deterministic hash of ``salt_source`` columns
    (default: all non-key columns; when the fact is key-only, a partition-
    local row id — still RNG-free) — retries and oracle replays are
    stable. Join semantics equal the unsalted join for ``inner``/``left``
    ONLY: under right/full, a dim row unmatched in the fact would surface
    once per salt copy (``salt_buckets``× inflation), so those modes are
    rejected.
    """
    keys = list(keys)
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' (got {how!r}): the "
            f"dim side is replicated per salt, so right/full would emit "
            f"unmatched dim rows {salt_buckets} times")
    if salt_source is None:
        salt_source = [c for c in fact.columns if c not in keys]
    if salt_source:
        salt_base = F.xxhash64(*[F.col(c) for c in salt_source])
    else:
        salt_base = F.monotonically_increasing_id()
    salt = F.pmod(salt_base, F.lit(salt_buckets)).cast("int")
    fact_salted = fact.withColumn("__salt", salt)
    dim_salted = (dim.withColumn("__salt",
                                 F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
                  .withColumn("__salt", F.col("__salt").cast("int")))
    out = fact_salted.join(dim_salted, keys + ["__salt"], how)
    return out.drop("__salt")


def grid_complete(df: DataFrame, key_a: str, key_b: str,
                  agg_exprs: Sequence[Column]) -> DataFrame:
    """U2 — `tidyr::complete(a, b)`: aggregate by (a, b), then expand to the
    full cross product of observed key values, NULL-filling absent cells
    (`inst/reports/malawi-report.qmd:69,124`).

    The cross join runs on two *distinct-value* relations (small), never on
    the fact table; the fact side is aggregated before the expansion.
    """
    # null-safe equality: tidyr::complete treats NA as a regular key level
    # — a plain '=' join would strand a NULL-keyed aggregate row away from
    # its own grid cell and silently drop its totals. The agg side's keys
    # are renamed first: grid and agged share the keys' expression lineage
    # (both descend from df), so same-name references would be ambiguous.
    agged = (df.groupBy(key_a, key_b).agg(*agg_exprs)
             .withColumnRenamed(key_a, "__ga")
             .withColumnRenamed(key_b, "__gb"))
    grid = (df.select(key_a).distinct()
            .crossJoin(df.select(key_b).distinct()))
    cond = (grid[key_a].eqNullSafe(F.col("__ga"))
            & grid[key_b].eqNullSafe(F.col("__gb")))
    return grid.join(agged, cond, "left").drop("__ga", "__gb")


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column,
              broadcast_right: bool = False) -> DataFrame:
    """EXISTS filter: rows of ``left`` with at least one match in ``right``,
    left columns only, no row duplication (unlike inner join + distinct —
    which at 100 TB would explode row counts before collapsing them).
    Shuffles only the join keys of ``right``; broadcast when the filter set
    is small (a keep-list of ids is the typical shape).
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column,
              broadcast_right: bool = False) -> DataFrame:
    """NOT EXISTS filter: rows of ``left`` with no match in ``right``
    (dplyr ``anti_join``; the reference uses the full-join-then-filter-NULL
    idiom for the same effect — SURVEY §2.6 J7 note). NULL-safe per SQL
    NOT EXISTS: right-side NULL keys never eliminate left rows.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, "left_anti")


def asof_join(left: DataFrame, right: DataFrame, keys: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: Sequence[str] = (), prefix: str = "r_",
              tolerance_s: int | None = None) -> DataFrame:
    """Backward as-of join: each left row picks the single right row with
    the greatest ``right_ts`` ≤ its ``left_ts`` within the same key group
    (DuckDB/kdb ``ASOF JOIN``, pandas ``merge_asof`` — an operator Spark
    has no built-in for). Left-outer semantics: unmatched left rows keep
    NULL matches.

    Spark-first shape: NOT a range join (which explodes every candidate
    pair before pruning) — both sides are tagged and unioned, then ONE
    window per key, ordered by (ts, side), carries the last right-row
    struct forward (``last(ignorenulls=True)``); left rows then read their
    match from the carried value. One shuffle on the key, linear work in
    |left|+|right|, skew bounded by per-key row counts. Right rows sort
    before left rows at equal ts, so an exactly-simultaneous right row
    matches (ASOF ``>=``).

    ``right`` must be unique per (keys, right_ts) — pre-dedupe otherwise
    (a duplicate would make "the" match ambiguous in any engine).
    ``tolerance_s`` drops matches older than the window (merge_asof
    tolerance): the join stays left-outer, the stale match becomes NULL.
    Matched right columns come back as ``{prefix}{col}`` plus
    ``{prefix}{right_ts}``.
    """
    keys = list(keys)
    rv = F.struct(F.col(right_ts).alias("__rts"),
                  *[F.col(c) for c in value_cols])
    r = right.select(*keys, F.col(right_ts).alias("__ts"),
                     rv.alias("__rv"), F.lit(0).alias("__side"))
    l = (left.withColumn("__ts", F.col(left_ts))
         .withColumn("__side", F.lit(1)))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    m = F.col("__m")
    if tolerance_s is not None:
        m = F.when(
            F.unix_timestamp(F.col(left_ts))
            - F.unix_timestamp(m.getField("__rts")) <= tolerance_s, m)
    picked = [m.getField("__rts").alias(f"{prefix}{right_ts}")] + [
        m.getField(c).alias(f"{prefix}{c}") for c in value_cols]
    return out.select(*[F.col(c) for c in left.columns], *picked)


def interval_join(points: DataFrame, intervals: DataFrame,
                  keys: Sequence[str], point_s: str = "ts_s",
                  start_s: str = "start_s", end_s: str = "end_s",
                  bucket_s: int = 600,
                  end_inclusive: bool = False) -> DataFrame:
    """Range join: each point row paired with every interval (same keys)
    containing its timestamp. All time columns are epoch-second longs
    (callers convert with ``unix_timestamp`` — integer comparisons are
    exact and engine-portable).

    Spark plans a naive ``p.ts BETWEEN i.start AND i.end`` as a broadcast
    nested loop (quadratic per key) — unusable at 100 TB. This operator
    buckets time instead: every interval is exploded to the coarse buckets
    it overlaps (``sequence`` + ``explode``; blowup = interval length ÷
    ``bucket_s``, bounded by choosing the bucket near the typical interval
    length), points map to exactly one bucket, and the pair-up becomes an
    EQUI-join on (keys, bucket) with a residual range filter. A point
    meets each covering interval in exactly one bucket (its own), so no
    dedup is needed.
    """
    keys = list(keys)
    i = intervals.withColumn(
        "__b", F.explode(F.sequence(
            F.floor(F.col(start_s) / bucket_s),
            F.floor(F.col(end_s) / bucket_s))))
    p = points.withColumn("__b", F.floor(F.col(point_s) / bucket_s))
    upper = (F.col(point_s) <= F.col(end_s) if end_inclusive
             else F.col(point_s) < F.col(end_s))
    return (p.join(i, keys + ["__b"])
            .filter((F.col(point_s) >= F.col(start_s)) & upper)
            .drop("__b"))
