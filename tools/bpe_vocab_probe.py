"""Measure BPE FIT and ENCODE at a realistic vocabulary width (k=500).

Every registry fit uses k=5 merges; the distributed strategies
(`batched` fit, `chained` encode) past ``local_vocab_limit`` are
equivalence-tested but — before this probe — never measured at k>=500.
The question this answers (VERDICT r11 item 7): do fit rounds scale
with VOCAB WIDTH (k) or with CORPUS size? The batched fit's cost model
is (rounds x vocabulary-sized pair-aggregation), rounds ~ k /
effective-batch, so wall should grow ~linearly in k and ~linearly in
the DISTINCT-WORD table (not the corpus) — this probe measures both
axes at sf0.1 and sf1 (10x).

Timing protocol: bench-style — the fit/encode functions do their Spark
work eagerly (per-round collects), so the FIT time is the call itself;
ENCODE is drained through the noop sink. Warmup pass at sf0.001, then
min-of-2.

Usage: python tools/bpe_vocab_probe.py [k] [strategies...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from peskas_malawi_data_pipeline_spark.operators import bpe as B
    from peskas_malawi_data_pipeline_spark.queries import _t

    sf_dirs = [("sf0.1", "/root/testdata/sf0.1"),
               ("sf1", os.path.join(REPO, ".scale", "sf1"))]
    # warmup: compile the plan shapes once at sf0.001
    warm = _t(spark, "/root/testdata/sf0.001", "documents")
    B.bpe_fit(warm, k=5, strategy="batched").collect()

    out: dict = {"k": k}
    for label, sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            continue
        docs = _t(spark, sf_dir, "documents")
        n_docs = docs.count()
        n_vocab = (docs.selectExpr("explode(split(text, ' ')) AS w")
                   .distinct().count())
        row: dict = {"n_docs": n_docs, "n_distinct_words": n_vocab}
        merges_rows = None
        for strat in ("batched", "local"):
            secs = []
            for _ in range(2):
                t0 = time.time()
                m = B.bpe_fit(docs, k=k, strategy=strat) \
                    .orderBy("merge_rank").collect()
                secs.append(round(time.time() - t0, 2))
            row[f"fit_{strat}_sec"] = min(secs)
            row[f"fit_{strat}_merges"] = len(m)
            if merges_rows is None:
                merges_rows = [(r.pair, r.new_symbol) for r in m]
            else:
                assert merges_rows == [(r.pair, r.new_symbol)
                                       for r in m], \
                    f"strategy divergence at {label}"
        for strat in ("chained", "local"):
            secs = []
            for _ in range(2):
                t0 = time.time()
                B.bpe_apply_counts(docs, merges_rows, strategy=strat) \
                    .write.format("noop").mode("overwrite").save()
                secs.append(round(time.time() - t0, 2))
            row[f"encode_{strat}_sec"] = min(secs)
        out[label] = row
        print(json.dumps({label: row}), file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
