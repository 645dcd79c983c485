"""Probe the batch-sizing SIGNAL (bytes vs rows per partition) on a
deliberately wide-row corpus.

``ingest_stream.batch_shuffle_partitions`` sizes a stateless
foreachBatch body from the micro-batch's BYTES (512 KiB/partition).
Round 12 calibrated that constant at sf0.1 and one 100x replica of the
SAME corpus shape — where bytes and rows are proportional, so the data
couldn't distinguish the two signals. This probe decouples them: a
corpus with the same DOCUMENT COUNT as sf0.1 but ``--repeat``x the text
per row (each doc's text repeated, per-repeat word-shuffled so shingle
sets actually grow instead of deduplicating away). A rows-per-partition
policy chooses the SAME partition count on both corpora; the bytes
policy scales with the width. NOTE the width has to clear the lo-clamp
before the signals separate: at 10x the wide batches are ~1.8 MB and
BOTH policies land on lo=4 (measured identical 11.1 vs 11.7 s — a
useful null, but no discrimination); the default 100x gives ~18 MB
batches, where bytes chooses ~35 and rows stays at 4. Timing
`streaming_near_dedup`
(text-volume-bound: shingle explode -> minhash -> band join) under both
choices shows which signal tracks the real work:

- wide corpus, adaptive (bytes signal, MODE unset) — records the counts
  it chose via an instrumented batch_shuffle_partitions;
- wide corpus, static pin = the count the adaptive policy chooses on the
  NORMAL corpus (what a rows-derived policy would pick, since row counts
  are equal) — forced via PESKAS_BATCH_SHUFFLE_MODE;
- normal corpus, adaptive — the reference row.

One process per (corpus, policy) — multi-config sessions drift 30-50%
(SCALE.md §10n). Per process: one untimed warmup drain, then min-of-2.
Probe data lives under ``.scale/wide_docs`` (gitignored).

Usage: python tools/wide_row_probe.py [--repeat 10]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DEST = os.path.join(REPO, ".scale", "wide_docs")  # suffixed _x{repeat} in main()

ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]

_RUNNER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
{mode_line}
from peskas_malawi_data_pipeline_spark.core import get_spark
import peskas_malawi_data_pipeline_spark.queries as Q
from peskas_malawi_data_pipeline_spark.streaming import ingest_stream as st

chosen = []
_orig = st.batch_shuffle_partitions
def _rec(batch_df, *a, **k):
    n = _orig(batch_df, *a, **k)
    chosen.append(n)
    return n
st.batch_shuffle_partitions = _rec

spark = get_spark("wide_row_probe")
fn = Q.REGISTRY["streaming_near_dedup"][0]
fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()  # warm
best = None
for _ in range(2):
    chosen.clear()
    t0 = time.perf_counter()
    fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
    t = time.perf_counter() - t0
    best = t if best is None else min(best, t)
print("WIDE_ROW_RESULT " + json.dumps(
    {{"sec": round(best, 3), "chosen_per_batch": chosen}}))
"""


def build_wide_docs(repeat: int, dest: str = DEST) -> None:
    if os.path.exists(os.path.join(dest, "documents.parquet")):
        return
    os.makedirs(dest, exist_ok=True)
    for t in ALL_TABLES:
        if t == "documents":
            continue
        link = os.path.join(dest, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = docs.column("text").to_pylist()
    wide = []
    for i, t in enumerate(texts):
        if not t:
            wide.append(t)
            continue
        rng = random.Random(7_919 * i)
        parts = []
        for _ in range(repeat):
            words = t.split(" ")
            rng.shuffle(words)
            parts.append(" ".join(words))
        wide.append(" ".join(parts))
    tbl = docs.set_column(docs.schema.get_field_index("text"), "text",
                          pa.array(wide, type=pa.string()))
    tbl = tbl.set_column(
        tbl.schema.get_field_index("n_chars"), "n_chars",
        pa.array([len(t) if t else 0 for t in wide],
                 type=tbl.schema.field("n_chars").type))
    pq.write_table(tbl, os.path.join(dest, "documents.parquet"))


def run_config(sf_dir: str, mode: str | None) -> dict:
    mode_line = (f"os.environ['PESKAS_BATCH_SHUFFLE_MODE'] = {mode!r}"
                 if mode is not None else
                 "os.environ.pop('PESKAS_BATCH_SHUFFLE_MODE', None)")
    script = _RUNNER.format(repo=REPO, sf_dir=sf_dir, mode_line=mode_line)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("WIDE_ROW_RESULT "):
            return json.loads(line[len("WIDE_ROW_RESULT "):])
    raise RuntimeError(f"runner produced no result:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=100)
    args = ap.parse_args()

    dest = f"{DEST}_x{args.repeat}"
    build_wide_docs(args.repeat, dest)

    normal = run_config(SRC, None)
    print(json.dumps({"corpus": "sf0.1", "policy": "adaptive_bytes",
                      **normal}))
    rows_pin = max(normal["chosen_per_batch"] or [4])
    wide_bytes = run_config(dest, None)
    print(json.dumps({"corpus": f"wide_x{args.repeat}",
                      "policy": "adaptive_bytes", **wide_bytes}))
    wide_rows = run_config(dest, str(rows_pin))
    print(json.dumps({"corpus": f"wide_x{args.repeat}",
                      "policy": f"rows_equivalent_pin_{rows_pin}",
                      **wide_rows}))


if __name__ == "__main__":
    main()
