"""Sequence-packing invariants (operators/packing.py).

Greedy bins never exceed the budget unless a single oversized document owns
the bin; chunk offsets stay inside the window; both schemes are
deterministic functions of (ids, token counts) — independent of partition
layout.
"""

from pyspark.sql import functions as F

from peskas_malawi_data_pipeline_spark.operators import packing as P


def _docs(spark, sizes):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], ["doc_id", "tok"])


def test_greedy_bins_respect_budget(spark):
    df = _docs(spark, [100, 100, 100, 50, 260, 10, 200, 200])
    packed = P.pack_greedy_sequential(df, "tok", target=256, n_shards=2)
    fills = (packed.groupBy("shard", "bin_id")
             .agg(F.sum("n_tokens").alias("fill"),
                  F.count(F.lit(1)).alias("n")).collect())
    for r in fills:
        assert r.fill <= 256 or r.n == 1   # overflow only for a lone oversize doc
    # every doc assigned exactly once
    assert packed.count() == 8
    assert packed.select("doc_id").distinct().count() == 8


def test_greedy_oversize_doc_gets_own_bin(spark):
    df = _docs(spark, [10, 500, 10])
    packed = P.pack_greedy_sequential(df, "tok", target=256, n_shards=1)
    rows = {r.doc_id: r.bin_id for r in packed.collect()}
    peers = [d for d, b in rows.items() if b == rows[1]]
    assert peers == [1]                     # the 500-token doc sits alone
    assert rows[0] != rows[1] != rows[2]


def test_chunk_offsets_inside_window(spark):
    df = _docs(spark, [100] * 20)
    packed = P.pack_concat_chunks(df, "tok", target=256, n_shards=2)
    rows = packed.collect()
    assert all(0 <= r.bin_offset < 256 for r in rows)
    # within a shard, consecutive docs advance the stream by exactly tok
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        pos = by_shard.get(r.shard, 0)
        assert r.bin_id * 256 + r.bin_offset == pos
        by_shard[r.shard] = pos + r.n_tokens


def test_packing_partition_layout_independent(spark):
    df = _docs(spark, [37, 91, 13, 240, 8, 77, 130, 55, 200, 41])
    a = set(map(tuple, P.pack_greedy_sequential(df, "tok", target=256,
                                                n_shards=4).collect()))
    b = set(map(tuple, P.pack_greedy_sequential(df.repartition(7), "tok",
                                                target=256,
                                                n_shards=4).collect()))
    assert a == b
