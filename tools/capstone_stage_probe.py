"""Per-stage wall attribution for `corpus_to_shards_pipeline`.

The registry query is ONE lazy plan by design (the capstone's point is
that the stages compose without materialization cliffs), so stage costs
cannot be read off the single run. This probe re-runs the same stage
chain with a `materialize()` barrier + timer after each leg — the
barriers make each number an upper bound on the leg's incremental cost
(work the lazy plan would have fused is paid at the barrier), which is
the honest direction for a watch-item table. Mirrors the stage
boundaries of queries.corpus_to_shards_pipeline (keep in sync; the
SCALE.md §10m sf0.1/sf1 table was produced the same way).

Usage: python tools/capstone_stage_probe.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def attribute(spark, sf_dir: str) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.core.barrier import materialize
    from peskas_malawi_data_pipeline_spark.functions import text as T
    from peskas_malawi_data_pipeline_spark.operators import bpe as bpe_ops
    from peskas_malawi_data_pipeline_spark.operators import (
        dedup as dedup_ops, packing as pack_ops, ranking as rank_ops,
        sampling as samp_ops)
    from peskas_malawi_data_pipeline_spark.queries import (
        _MIX_BUDGET, _MIX_WEIGHTS, _t)

    out: dict[str, float] = {}
    t_last = time.time()

    def lap(name: str) -> None:
        nonlocal t_last
        out[name] = round(time.time() - t_last, 2)
        t_last = time.time()

    docs = _t(spark, sf_dir, "documents")
    cand = docs.filter(F.col("doc_id") % 19 != 0)
    ev = docs.filter(F.col("doc_id") % 19 == 0)
    g = cand.select("doc_id", "source", "text",
                    F.explode(F.array(T.gopher_struct(F.col("text"))))
                    .alias("g"))
    gated = materialize(g.filter(T.gopher_passes(F.col("g")))
                        .select("doc_id", "source", "text"))
    lap("split_gopher_gate")

    pairs = dedup_ops.minhash_lsh_pairs(
        gated, num_hashes=8, band_size=2, shingle_n=3)
    comp = materialize(dedup_ops.connected_components_star(pairs))
    lap("lsh_pairs_components")

    def micro(col):
        return F.floor(col * 1000000).cast("long")

    pr, sr = T.punct_ratio(F.col("text")), T.stopword_ratio(F.col("text"))
    packed_q = F.struct(pr.alias("pr"), sr.alias("sr"),
                        F.least(F.length("text").cast("double") / 500.0,
                                F.lit(1.0)).alias("lt"))
    quality = (0.4 * F.col("s.lt")
               + 0.3 * (1.0 - F.least(F.col("s.pr") * 5.0, F.lit(1.0)))
               + 0.3 * F.least(F.col("s.sr") * 5.0, F.lit(1.0)))
    scored = (gated.select("doc_id",
                           F.explode(F.array(packed_q)).alias("s"))
              .select("doc_id", micro(quality).alias("quality_micro")))
    members = scored.join(
        F.broadcast(comp.withColumnRenamed("id", "doc_id")), "doc_id")
    win = Window.partitionBy("component").orderBy(
        F.col("quality_micro").desc(), F.col("doc_id"))
    winners = (members.withColumn("__rk", F.row_number().over(win))
               .filter(F.col("__rk") == 1)
               .select("doc_id", F.lit(True).alias("__win")))
    surv = (scored
            .join(F.broadcast(comp.withColumnRenamed("id", "doc_id")),
                  "doc_id", "left")
            .join(F.broadcast(winners), "doc_id", "left")
            .filter(F.col("component").isNull()
                    | F.coalesce(F.col("__win"), F.lit(False)))
            .select("doc_id"))
    surv_docs = materialize(gated.join(surv, "doc_id", "left_semi"))
    lap("quality_survivors")

    eval_ng = (ev.select(F.explode(T.word_shingles(F.col("text"), 5))
                         .alias("ng")).distinct())
    contam = (surv_docs.select(
        "doc_id", F.explode(T.word_shingles(F.col("text"), 5)).alias("ng"))
        .join(F.broadcast(eval_ng), "ng", "left_semi")
        .select("doc_id").distinct())
    clean = materialize(surv_docs.join(contam, "doc_id", "left_anti"))
    lap("decontaminate_5gram")

    meta = clean.select("source", "doc_id",
                        T.token_count(F.col("text")).cast("long")
                        .alias("n_tokens"))
    present = {r["source"]
               for r in meta.select("source").distinct().collect()}
    weights = {s: w for s, w in _MIX_WEIGHTS.items() if s in present}
    alloc = materialize(samp_ops.mixture_allocation(
        meta, weights, _MIX_BUDGET).drop("oversample_ppm"))
    draw = samp_ops.token_budget_prefix_draw(meta, alloc)
    sel = materialize(draw.filter(F.col("in_fraction")).select("doc_id"))
    lap("mixture_draw")

    merges = [(r.pair, r.new_symbol)
              for r in bpe_ops.bpe_fit(clean, k=5)
              .orderBy("merge_rank").collect()]
    lap("bpe_fit")
    enc = materialize(bpe_ops.bpe_encode_ids(
        clean.join(sel, "doc_id", "left_semi"), merges))
    lap("bpe_encode")

    packed = pack_ops.pack_sequences(enc, ids_col="token_ids",
                                     id_col="doc_id", seq_len=64,
                                     n_shards=8,
                                     boundary_id=bpe_ops.BOUNDARY_ID)
    keyed = packed.select(
        F.concat_ws(":", F.col("shard").cast("string"),
                    F.col("seq_id").cast("string")).alias("seq_key"),
        "n_tokens")
    shuf = rank_ops.shuffle_shards(keyed, id_col="seq_key", n_shards=4,
                                   seed="shufseq:")
    (shuf.groupBy(F.col("shard"))
     .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"))
     .write.format("noop").mode("overwrite").save())
    lap("pack_shuffle")
    out["total_attributed"] = round(sum(out.values()), 2)
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    # warmup: compile plan shapes once at the smallest sf
    attribute(spark, "/root/testdata/sf0.001")
    print(json.dumps({d: attribute(spark, d) for d in dirs}, indent=1))


if __name__ == "__main__":
    main()
