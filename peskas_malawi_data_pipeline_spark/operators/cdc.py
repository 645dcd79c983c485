"""Change-data-capture application: batch MERGE (upsert + delete) of a
changelog onto a keyed snapshot.

The reference's only write discipline is truncate-and-load with versioned
pointers (K1, ``R/utils.R`` storage helpers) — fine for its MB-scale
collections, a non-starter at 100 TB where a day's change volume is a
fraction of a percent of the table. ``merge_apply`` is the scale
replacement: the snapshot is touched by exactly ONE outer join on its key
(co-located and shuffle-free when the snapshot is bucketed by that key —
see operators.layout.bucketed_write), and only the changelog — typically
orders of magnitude smaller — is compacted with a window.

Semantics (latest-wins, the Debezium/Kafka-compact model):
- every change row carries the key, a total-order sequence column, an op
  ('U' upsert carrying full row values, 'D' delete), and the value columns;
- per key, only the highest-sequence change matters;
- a winning 'U' replaces the snapshot row (or inserts it); a winning 'D'
  removes it; keys without changes pass through untouched.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_changelog(changes: DataFrame, keys: Sequence[str],
                      seq_col: str = "seq") -> DataFrame:
    """Latest change per key: row_number over (seq desc) — ``seq_col``
    must totally order each key's changes (a log offset / event id; ties
    would make the merge nondeterministic, so no tie-break column is
    offered). One shuffle on the CHANGELOG only."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def merge_apply(snapshot: DataFrame, changes: DataFrame,
                keys: Sequence[str], seq_col: str = "seq",
                op_col: str = "op", delete_op: str = "D") -> DataFrame:
    """Apply a changelog to a keyed snapshot: MERGE INTO as a plain
    DataFrame plan (full outer join + per-side resolution), engine-neutral
    — no table-format dependency, usable on parquet directories today and
    identical in shape to what Delta/Iceberg MERGE compiles to.

    ``snapshot`` must be unique per key and share the value columns the
    changelog carries (the op/seq columns belong to the changelog alone).
    Plan: compact the changelog (shuffle of the small side), full-outer
    join on the key, then one projection choosing per column: change wins
    where present and not a delete, else snapshot. The snapshot is read
    once and shuffled at most once — zero times when bucketed on the key.
    """
    keys = list(keys)
    if op_col in snapshot.columns:
        # op_col is claimed by the changelog side; a snapshot value column
        # with the same name would duplicate in the compacted-changelog
        # projection below. (seq_col MAY double as a snapshot value column
        # — it is selected once, as a value.)
        raise ValueError(
            f"snapshot must not carry the changelog's op column "
            f"({op_col!r}); rename the snapshot column")
    value_cols = [c for c in snapshot.columns if c not in keys]
    latest = compact_changelog(changes, keys, seq_col) \
        .select(*keys, op_col, *value_cols)
    s = snapshot.alias("s")
    c = latest.alias("c")
    joined = s.join(c, keys, "full")
    has_change = F.col(f"c.{op_col}").isNotNull()
    keep = ~has_change | (F.col(f"c.{op_col}") != delete_op)
    picked = [
        F.when(has_change, F.col(f"c.{v}")).otherwise(F.col(f"s.{v}"))
        .alias(v)
        for v in value_cols]
    return joined.filter(keep).select(*keys, *picked)
