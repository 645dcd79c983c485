"""Measure the fused-vs-per-arm crossover of ann_pq_recall's plan gate.

``queries._PQ_FUSE_MAX_CANDIDATES`` gates a physical-plan choice: below
the threshold the two PQ-ADC arms share one multi-codebook corpus encode
and one LUT scoring window (stage-overhead-bound regime); above it they
run as two independent passes (candidate-volume-bound regime — a fused
pass explodes 2 arms per candidate through one window, so two 1x passes
beat one 2x pass). Round 12 bracketed the crossover only at 4M and 40M
candidates (the sf1/sf10 replica dirs, a 10x gap); this probe narrows
the bracket by manufacturing embeddings-only corpora at intermediate
replica counts and timing BOTH branches, one process per (size, branch)
so no measurement inherits another's session drift (SCALE.md's measured
30-50% multi-config-session inflation).

Corpus construction mirrors tools/scale_probe.py's embeddings recipe:
replica r rotates each vector's component order by ``r % dim`` (fresh
vec_ids). Replicas where ``r % dim == 0`` duplicate source vectors —
harmless here because this probe only TIMES the plan (candidate volume
is what matters); recall-number comparisons should use the scale dirs.
Every other table is symlinked from sf0.1 (ann_pq_recall scans only
embeddings). Probe data lives under ``.scale/pq_fuse/`` (gitignored).

Timing: per process, one untimed warmup run (trains + persists the ANN
artifacts, compiles plans, warms the page cache), then min-of-2 noop
drains — the same protocol as the committed r12 crossover numbers.

Usage: python tools/pq_fuse_probe.py [--replicas 20 30] [--fresh]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
ROOT = os.path.join(REPO, ".scale", "pq_fuse")

ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]

_RUNNER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from peskas_malawi_data_pipeline_spark.core import get_spark
import peskas_malawi_data_pipeline_spark.queries as Q

Q._PQ_FUSE_MAX_CANDIDATES = {gate}
spark = get_spark("pq_fuse_probe")
fn = Q.REGISTRY["ann_pq_recall"][0]
fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()  # warm
best = None
for _ in range(2):
    t0 = time.perf_counter()
    fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
    t = time.perf_counter() - t0
    best = t if best is None else min(best, t)
n = Q._ann_corpus_count(Q._t(spark, {sf_dir!r}, "embeddings"), {sf_dir!r})
nq = Q._ann_n_queries(Q._t(spark, {sf_dir!r}, "embeddings"), {sf_dir!r})
print("PQ_FUSE_RESULT " + json.dumps(
    {{"sec": round(best, 3), "corpus": n, "n_queries": nq,
      "candidates": n * nq}}))
"""


def build_embeddings_dir(replicas: int, dest: str) -> None:
    if os.path.exists(os.path.join(dest, "embeddings.parquet")):
        return
    os.makedirs(dest, exist_ok=True)
    for t in ALL_TABLES:
        if t == "embeddings":
            continue
        link = os.path.join(dest, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vid = emb.column("vec_id").to_numpy()
    vecs = emb.column("embedding").to_pylist()
    dim = len(vecs[0])
    v_off = int(vid.max()) + 1
    # write to a temp name and rename on success: a partial
    # embeddings.parquet left by a failed run would otherwise pass the
    # exists() fast-path above and be treated as a complete corpus
    out = os.path.join(dest, "embeddings.parquet")
    tmp = out + ".tmp"
    writer = pq.ParquetWriter(tmp, emb.schema)
    try:
        for r in range(replicas):
            rot = r % dim
            vr = vecs if rot == 0 else [v[rot:] + v[:rot] for v in vecs]
            tbl = emb.set_column(
                emb.schema.get_field_index("vec_id"), "vec_id",
                pa.array(vid + r * v_off,
                         type=emb.schema.field("vec_id").type))
            tbl = tbl.set_column(
                tbl.schema.get_field_index("embedding"), "embedding",
                pa.array(vr, type=emb.schema.field("embedding").type))
            writer.write_table(tbl)
    except BaseException:
        writer.close()
        os.unlink(tmp)
        raise
    writer.close()
    os.replace(tmp, out)


def run_branch(sf_dir: str, fused: bool) -> dict:
    gate = 10 ** 15 if fused else 0
    script = _RUNNER.format(repo=REPO, sf_dir=sf_dir, gate=gate)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("PQ_FUSE_RESULT "):
            return json.loads(line[len("PQ_FUSE_RESULT "):])
    raise RuntimeError(f"runner produced no result:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, nargs="+", default=[20, 30])
    ap.add_argument("--fresh", action="store_true",
                    help="rebuild probe corpora even if present")
    ap.add_argument("--dir", default=None,
                    help="time an EXISTING sf dir (e.g. .scale/sf1) "
                         "instead of building replica corpora")
    ap.add_argument("--interleave", type=int, default=0, metavar="N",
                    help="run N interleaved fused/per-arm process pairs "
                         "(F,P,F,P,...) and report the per-branch min — "
                         "the protocol for drift-vs-regression calls on "
                         "this box, where a single measurement can swing "
                         "50%% under external load (round-13 verdict #1)")
    args = ap.parse_args()

    if args.interleave:
        target = args.dir or os.path.join(REPO, ".scale", "sf1")
        fused_runs, per_arm_runs = [], []
        candidates = None
        for i in range(args.interleave):
            f = run_branch(target, fused=True)
            p = run_branch(target, fused=False)
            candidates = f["candidates"]
            fused_runs.append(f["sec"])
            per_arm_runs.append(p["sec"])
            print(json.dumps({"pair": i + 1, "fused": f["sec"],
                              "per_arm": p["sec"]}), flush=True)
        print(json.dumps({
            "dir": target, "candidates": candidates,
            "fused_min": min(fused_runs),
            "per_arm_min": min(per_arm_runs),
            "fused_runs": fused_runs,
            "per_arm_runs": per_arm_runs}))
        return

    for n in args.replicas:
        dest = os.path.join(ROOT, f"r{n}")
        if args.fresh and os.path.isdir(dest):
            import shutil
            shutil.rmtree(dest)
        build_embeddings_dir(n, dest)
        row = {"replicas": n}
        for fused in (True, False):
            res = run_branch(dest, fused)
            row["fused_sec" if fused else "per_arm_sec"] = res["sec"]
            row.update({k: res[k] for k in
                        ("corpus", "n_queries", "candidates")})
        print(json.dumps(row))


if __name__ == "__main__":
    main()
