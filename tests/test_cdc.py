"""Unit + property tests for operators.cdc (batch MERGE semantics)."""

import random

from pyspark.sql import functions as F

from peskas_malawi_data_pipeline_spark.operators import cdc


def _apply_py(state, log, delete_op="D"):
    """Python reference: replay the log in sequence order."""
    state = dict(state)
    for seq, key, op, val in sorted(log):
        if op == delete_op:
            state.pop(key, None)
        else:
            state[key] = val
    return state


def test_merge_apply_upsert_insert_delete_passthrough(spark):
    snapshot = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    changes = spark.createDataFrame(
        [(10, 2, "U", "b2"),       # update
         (11, 4, "U", "d"),        # insert
         (12, 3, "D", None),       # delete
         (9, 2, "U", "stale"),     # superseded by seq 10
         (13, 5, "U", "e"), (14, 5, "D", None)],  # insert then delete
        "seq int, k int, op string, v string")
    out = {r.k: r.v
           for r in cdc.merge_apply(snapshot, changes, ["k"]).collect()}
    assert out == {1: "a", 2: "b2", 4: "d"}


def test_merge_apply_incremental_equals_full_replay(spark):
    """Splitting a changelog at any point and merging the halves
    sequentially lands on the same state as one replay — the associativity
    that makes daily MERGE batches sound."""
    rng = random.Random(3)
    log = [(seq, rng.randint(0, 25),
            "D" if rng.random() < 0.3 else "U", f"v{seq}")
           for seq in range(120)]
    want = _apply_py({}, log)

    empty = spark.createDataFrame([], "k int, v string")
    split = 60
    df = lambda rows: spark.createDataFrame(
        [(s, k, o, v) for s, k, o, v in rows], "seq int, k int, op string, v string")
    snap1 = cdc.merge_apply(empty, df(log[:split]), ["k"])
    final = cdc.merge_apply(snap1, df(log[split:]), ["k"])
    got = {r.k: r.v for r in final.collect()}
    assert got == want


def test_compact_changelog_latest_per_key(spark):
    changes = spark.createDataFrame(
        [(1, 7, "U"), (3, 7, "D"), (2, 7, "U"), (1, 8, "U")],
        "seq int, k int, op string")
    out = cdc.compact_changelog(changes, ["k"], "seq").collect()
    assert {(r.k, r.seq, r.op) for r in out} == {(7, 3, "D"), (8, 1, "U")}


def test_merge_apply_rejects_op_column_collision(spark):
    import pytest

    snapshot = spark.createDataFrame([(1, "U")], "k int, op string")
    changes = spark.createDataFrame([(1, 1, "U", "x")],
                                    "seq int, k int, op string, v string")
    with pytest.raises(ValueError, match="op column"):
        cdc.merge_apply(snapshot, changes, ["k"])
