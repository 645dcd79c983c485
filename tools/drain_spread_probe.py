"""Audit the REMAINING streaming drains for the scan-parallelism cap
(round-13 verdict #5).

Round 13 proved that a foreachBatch drain's pre-shuffle leg runs at scan
parallelism (one landing file per trigger = ONE map task) and wired
``ingest_stream.spread_batch`` at the three explode-heavy drains, with
2.1–4.1× isolated wins at 100×. The other drains also consume one
landing file per batch — but "their pre-shuffle legs are cheap" was an
assumption. This probe measures it: one isolated A/B (spread on / off)
per drain at the 100× dir, one process per (drain, config), untimed
warmup then min-of-2 — the §10o protocol.

Outcome (SCALE.md §10p): 7 of 8 drains measured spread as a loss or
tie — the merge drains' briefly-wired default was REVERTED (a partial
agg collapses the batch map-side; spreading the fat raw rows loses),
and only ``streaming_session_window`` (whose map side sorts + partially
merges sessions before the shuffle) won 3/3 interleaved A/Bs and is
wired ON by default. Arm levers per family:

- merge drains (``run_available_now_merge``: streaming_mixture_allocation,
  streaming_incremental_rollup): ON arm re-wires nothing today (both
  arms identical post-revert; kept for re-audit via
  ``PESKAS_BATCH_SPREAD=off`` on the OFF arm);
- engine drains: ON arm sets ``PESKAS_STREAM_SPREAD=N``
  (``ingest_stream.spread_stream`` repartition between the streaming
  scan and the stateful shuffle);
- engine-default-on (streaming_session_window): OFF arm sets
  ``PESKAS_STREAM_SPREAD=off``.

Usage: python tools/drain_spread_probe.py [--sf-dir .scale/sf10]
           [--drains name ...] [--stream-spread 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: drain -> ("merge"|"engine") — which lever the OFF/ON arm drives
DRAINS = {
    "streaming_mixture_allocation": "merge",
    "streaming_incremental_rollup": "merge",
    "streaming_time_bucket": "engine",
    "streaming_enriched_rollup": "engine",
    "streaming_sessionize": "engine",
    "streaming_dedup": "engine",
    "streaming_stream_join": "engine",
    # session_window's spread is wired ON by default (§10p, 3/3 wins):
    # its OFF arm forces the lever off like the merge family
    "streaming_session_window": "engine-default-on",
}

_RUNNER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from peskas_malawi_data_pipeline_spark.core import get_spark
import peskas_malawi_data_pipeline_spark.queries as Q

spark = get_spark("drain_spread_probe")
fn = Q.REGISTRY[{name!r}][0]
fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()  # warm
best = None
for _ in range(2):
    t0 = time.perf_counter()
    fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
    t = time.perf_counter() - t0
    best = t if best is None else min(best, t)
print("DRAIN_SPREAD_RESULT " + json.dumps({{"sec": round(best, 3)}}))
"""


def run_config(name: str, sf_dir: str, env_extra: dict) -> float:
    script = _RUNNER.format(repo=REPO, name=name, sf_dir=sf_dir)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PESKAS_BATCH_SPREAD", "PESKAS_STREAM_SPREAD")}
    env.update(env_extra)
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("DRAIN_SPREAD_RESULT "):
            return json.loads(line[len("DRAIN_SPREAD_RESULT "):])["sec"]
    raise RuntimeError(f"{name} runner produced no result:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale", "sf10"))
    ap.add_argument("--drains", nargs="+", default=sorted(DRAINS))
    ap.add_argument("--stream-spread", default="32",
                    help="PESKAS_STREAM_SPREAD for engine drains' ON arm")
    args = ap.parse_args()

    for name in args.drains:
        fam = DRAINS[name]
        if fam == "merge":
            on_env, off_env = {}, {"PESKAS_BATCH_SPREAD": "off"}
        elif fam == "engine-default-on":
            on_env, off_env = {}, {"PESKAS_STREAM_SPREAD": "off"}
        else:
            on_env = {"PESKAS_STREAM_SPREAD": args.stream_spread}
            off_env = {}
        # interleave OFF first (today's default for engine drains), then
        # ON, so neither arm systematically gets the quieter slot
        off = run_config(name, args.sf_dir, off_env)
        on = run_config(name, args.sf_dir, on_env)
        print(json.dumps({"drain": name, "family": fam,
                          "spread_off": off, "spread_on": on}), flush=True)


if __name__ == "__main__":
    main()
