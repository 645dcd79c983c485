"""One-order-of-magnitude scale probe for the most expensive queries.

The driver ships sf0.001/sf0.01/sf0.1; the engine's claims are about 100 TB.
This tool manufactures an "sf1" directory (10x sf0.1) by replicating the two
tables the heavy queries actually scan and re-times those queries at both
scales, so the scaling exponent is measured rather than asserted:

- ``lineitem`` x10: each replica offsets ``l_orderkey`` (disjoint new orders)
  but keeps ``l_partkey`` (same part catalog), so the order<->part bipartite
  graph grows the way a real workload grows — 10x edges and order vertices
  against a fixed dimension side.
- ``documents`` x10: each replica gets fresh ``doc_id``s and a
  deterministic per-replica word shuffle of ``text``. A verbatim copy would
  turn every document into a 10-clique of exact near-dups and blow up the
  candidate-pair stage into a skew artifact that says nothing about real
  scaling; shuffling words preserves token/length statistics while breaking
  shingle overlap, so the MinHash/SimHash candidate volume grows linearly
  like a real corpus.

- ``events`` x10: each replica offsets ``event_id`` AND ``user_id`` —
  fresh users, same timestamps — so the streaming probes carry 10x state
  keys (sessions/windows) over the same event-time range, which is how a
  stateful operator actually grows (state volume, not watermark span).

Remaining tables are symlinked from sf0.1 (the probed queries don't scan
them at scale). Probe data lives under ``.scale/`` (gitignored) and is
safe to delete.

Usage: python tools/scale_probe.py [--build-only] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DEST = os.path.join(REPO, ".scale", "sf1")
REPLICAS = 10

DEFAULT_QUERIES = [
    "pagerank_bipartite",
    "near_dedup_survivors",
    "dedup_components",
    "dedup_components_star",
    "simhash_pairs",
    "jaccard_pairs",
    "tfidf_topk",
    "minhash_lsh_pairs",
]

ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]


def _orderkey_offset() -> int:
    """Shared per-replica order-key offset for lineitem AND orders — both
    must shift by the same amount or the fact-to-fact join breaks."""
    a = pq.read_table(os.path.join(SRC, "orders.parquet"),
                      columns=["o_orderkey"]).column(0).to_numpy().max()
    b = pq.read_table(os.path.join(SRC, "lineitem.parquet"),
                      columns=["l_orderkey"]).column(0).to_numpy().max()
    return int(max(a, b)) + 1


def _shuffle_words(text: str, rng: random.Random) -> str:
    words = text.split(" ")
    rng.shuffle(words)
    return " ".join(words)


def build(dest: str = DEST, replicas: int = REPLICAS) -> None:
    os.makedirs(dest, exist_ok=True)

    # Replica-count marker: the per-table builds below skip regeneration
    # when the parquet already exists, so re-running with a different
    # --replicas into the same dest would silently reuse stale data while
    # labeling the results with the new scale factor. Refuse instead.
    marker = os.path.join(dest, ".replicas")
    existing = [t for t in ("lineitem", "documents", "events", "embeddings",
                            "orders")
                if os.path.exists(os.path.join(dest, f"{t}.parquet"))]
    if os.path.exists(marker):
        stored = int(open(marker).read().strip())
        if stored != replicas:
            raise SystemExit(
                f"{dest} was built with --replicas={stored}, requested "
                f"{replicas}; delete the dir (or pass a fresh --dest) to "
                f"rebuild at the new factor")
    elif existing:
        raise SystemExit(
            f"{dest} holds pre-marker fact tables ({', '.join(existing)}) of "
            f"unknown replica count; delete the dir to rebuild")

    for t in ALL_TABLES:
        if t in ("lineitem", "documents", "events", "embeddings", "orders"):
            continue
        link = os.path.join(dest, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)

    # orders x10 in LOCKSTEP with lineitem: same o_orderkey offset, so
    # fact-to-fact joins keep their true selectivity; o_custkey unchanged
    # (the customer dimension stays fixed, like part)
    ord_path = os.path.join(dest, "orders.parquet")
    if not os.path.exists(ord_path) or os.path.islink(ord_path):
        if os.path.islink(ord_path):
            os.remove(ord_path)
        orders = pq.read_table(os.path.join(SRC, "orders.parquet"))
        offset = _orderkey_offset()
        okey = orders.column("o_orderkey").to_numpy()
        writer = pq.ParquetWriter(ord_path, orders.schema)
        for r in range(replicas):
            writer.write_table(orders.set_column(
                orders.schema.get_field_index("o_orderkey"), "o_orderkey",
                pa.array(okey + r * offset,
                         type=orders.schema.field("o_orderkey").type)))
        writer.close()

    # embeddings x10: fresh vec_ids; replicas r>0 rotate the component
    # order by r (norm-preserving, cosine-to-original low) so replicas are
    # DISTINCT vectors and candidate volume grows linearly like a fresh
    # corpus. (A small-delta perturbation instead makes every replica a
    # genuine near-dup of its source — 10-cliques — and the near-dup
    # probes become output-bound quadratic, same effect as simhash_pairs
    # on the saturated text corpus; measured: 15× time for 162× pairs.)
    emb_path = os.path.join(dest, "embeddings.parquet")
    if not os.path.exists(emb_path) or os.path.islink(emb_path):
        if os.path.islink(emb_path):
            os.remove(emb_path)
        emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
        vid = emb.column("vec_id").to_numpy()
        vecs = emb.column("embedding").to_pylist()
        v_off = int(vid.max()) + 1
        writer = pq.ParquetWriter(emb_path, emb.schema)
        for r in range(replicas):
            if r == 0:
                vr = vecs
            else:
                vr = [v[r:] + v[:r] for v in vecs]
            tbl = emb.set_column(
                emb.schema.get_field_index("vec_id"), "vec_id",
                pa.array(vid + r * v_off, type=emb.schema.field("vec_id").type))
            tbl = tbl.set_column(
                tbl.schema.get_field_index("embedding"), "embedding",
                pa.array(vr, type=emb.schema.field("embedding").type))
            writer.write_table(tbl)
        writer.close()

    ev_path = os.path.join(dest, "events.parquet")
    if not os.path.exists(ev_path) or os.path.islink(ev_path):
        if os.path.islink(ev_path):
            os.remove(ev_path)
        ev = pq.read_table(os.path.join(SRC, "events.parquet"))
        eid = ev.column("event_id").to_numpy()
        uid = ev.column("user_id").to_numpy()
        e_off, u_off = int(eid.max()) + 1, int(uid.max()) + 1
        writer = pq.ParquetWriter(ev_path, ev.schema)
        for r in range(replicas):
            tbl = ev.set_column(
                ev.schema.get_field_index("event_id"), "event_id",
                pa.array(eid + r * e_off, type=ev.schema.field("event_id").type))
            tbl = tbl.set_column(
                tbl.schema.get_field_index("user_id"), "user_id",
                pa.array(uid + r * u_off, type=ev.schema.field("user_id").type))
            writer.write_table(tbl)
        writer.close()

    li_path = os.path.join(dest, "lineitem.parquet")
    if not os.path.exists(li_path):
        li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
        okey = li.column("l_orderkey").to_numpy()
        offset = _orderkey_offset()
        writer = pq.ParquetWriter(li_path, li.schema)
        for r in range(replicas):
            shifted = pa.array(okey + r * offset, type=li.schema.field("l_orderkey").type)
            writer.write_table(li.set_column(
                li.schema.get_field_index("l_orderkey"), "l_orderkey", shifted))
        writer.close()

    doc_path = os.path.join(dest, "documents.parquet")
    if not os.path.exists(doc_path):
        docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
        ids = docs.column("doc_id").to_numpy()
        texts = docs.column("text").to_pylist()
        offset = int(ids.max()) + 1
        writer = pq.ParquetWriter(doc_path, docs.schema)
        for r in range(replicas):
            tbl = docs
            if r > 0:
                rng = random.Random(1_000_003 * r)
                texts_r = [_shuffle_words(t, rng) if t else t for t in texts]
                tbl = tbl.set_column(tbl.schema.get_field_index("text"),
                                     "text", pa.array(texts_r, type=pa.string()))
            shifted = pa.array(ids + r * offset,
                               type=docs.schema.field("doc_id").type)
            tbl = tbl.set_column(tbl.schema.get_field_index("doc_id"),
                                 "doc_id", shifted)
            writer.write_table(tbl)
        writer.close()

    with open(marker, "w") as fh:
        fh.write(f"{replicas}\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--replicas", type=int, default=REPLICAS,
                    help="replication factor over sf0.1 (10 -> 'sf1', 100 -> 'sf10')")
    ap.add_argument("--dest", default=None,
                    help="probe-data dir (default .scale/sf<replicas/10>)")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    if args.replicas < 2:
        # replicas=1 would label the big side "sf0.1" — colliding with the
        # baseline label and silently self-comparing (ratio always 1.0)
        ap.error("--replicas must be >= 2 (a 1-replica probe compares "
                 "sf0.1 with itself)")
    label_big = f"sf{args.replicas / 10:g}"
    dest = args.dest or os.path.join(REPO, ".scale", label_big)
    build(dest, args.replicas)
    if args.build_only:
        print(f"built {dest}")
        return

    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    qs = entry.queries()
    names = args.queries or DEFAULT_QUERIES

    results = {}
    for name in names:
        fn = qs[name]
        # bench-style warmup: first execution of a plan shape in a fresh
        # JVM pays a multi-second codegen/JIT stall that would swamp the
        # small-SF side of the ratio
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass
        row = {}
        for label, sf_dir in (("sf0.1", SRC), (label_big, dest)):
            # noop sink, not count(): count() lets Catalyst eliminate
            # unique-key left joins and prune aggregate expressions, timing
            # a fraction of the real plan; noop evaluates every output
            # column of every row. The row count for the report is a THIRD
            # (untimed, usually cheaper — pruned) execution; accepted
            # because the probe is an offline tool and the count labels
            # output-bound ratios (simhash/near-dup) — drop it if probe
            # wall time matters.
            secs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                secs.append(round(time.time() - t0, 2))
            row[label] = {"sec": min(secs), "rows": fn(spark, sf_dir).count()}
        row["ratio"] = round(row[label_big]["sec"] / max(row["sf0.1"]["sec"], 1e-9), 2)
        results[name] = row
        print(json.dumps({name: row}))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
