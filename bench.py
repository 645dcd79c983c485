"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Every query is drained through the noop sink: unlike count() — whose
column pruning can strip the projected expressions from a narrow plan and
time a bare scan — noop evaluates every output column of every row while
writing nothing, so the measured time covers the full computation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from peskas_malawi_data_pipeline_spark.core import get_spark  # noqa: E402
from peskas_malawi_data_pipeline_spark.queries import REGISTRY  # noqa: E402

# The driver machine-parses stdout as ONE JSON object, but the JVM writes
# launch noise to fd 1 ("WARNING: Using incubator modules: …") which broke
# parsing in round 1 (BENCH_r01 "parsed": null). main() redirects the REAL
# stdout fd to stderr before the JVM inherits it (get_spark starts the JVM
# lazily, so doing it at the top of main is early enough) — Python prints
# and every JVM byte land on stderr — keeping a dup of the original stdout
# for the final JSON. Done in main, not at import, so importing this
# module (tests pin _drift_flagged) has no process-wide fd side effect.
_REAL_STDOUT: int | None = None

def _latest_baseline(sf: str) -> dict[str, float]:
    """Per-query timings from the NEWEST committed `.baseline_r*_bench*
    .json` whose recorded sf matches the current run (the recording-
    quality artifacts tools/record_baseline.py commits alongside
    BASELINE.md; the `*` suffix admits the `_sf1` variants — the sf
    guard below already rejects mismatched files, so before round 13
    the sf1 re-measure pass silently never ran despite a same-sf
    baseline existing). Empty dict when none match — the re-measure
    pass then simply doesn't run (e.g. sf0.01 smoke runs).

    Anti-ratchet overlay: when the recording session itself flagged a
    row as drift-elevated and re-measured it in isolation, the ISOLATED
    number is the evidence-grade baseline for that query — the session
    number bakes that session's drift into every future ratio. The
    overlay takes min(session, isolated) per flagged row, so a
    committed raw JSON stays raw while every reader applies the policy
    (round-12 verdict, "what's wrong" #1)."""
    import glob
    import re

    best_round, table = -1, {}
    here = os.path.dirname(os.path.abspath(__file__))
    for f in glob.glob(os.path.join(here, ".baseline_r*_bench*.json")):
        m = re.search(r"_r(\d+)_", os.path.basename(f))
        if not m or int(m.group(1)) <= best_round:
            continue
        try:
            with open(f, encoding="utf-8") as fh:
                doc = json.load(fh)
        except (OSError, ValueError):
            continue
        if str(doc.get("sf")) != str(float(sf) if
                                     sf.replace(".", "").isdigit() else sf):
            continue
        queries = dict(doc.get("queries", {}))
        for n, rec in doc.get("isolated_remeasure", {}).items():
            if n in queries and isinstance(rec, dict) \
                    and isinstance(rec.get("isolated"), (int, float)):
                queries[n] = min(queries[n], rec["isolated"])
        best_round, table = int(m.group(1)), queries
    return table


def _drift_flagged(timings: dict[str, float],
                   baseline: dict[str, float]) -> list[str]:
    """Queries whose session timing warrants an isolated re-measure.

    Flag rule (round-13 verdict #3): (ratio > 1.3 AND delta > 0.3 s) OR
    ratio > 1.5. The pure-ratio arm exists because the absolute guard
    alone exempted sub-second rows entirely — pack_greedy ratcheted
    0.42 → 0.69 s (1.63×) into the r13 baseline un-flagged. A 1.5× step
    on a sub-second row is still worth one isolated min-of-3 (the
    documented noise band there is ±50%, so 1.5× is the edge of noise,
    and the re-measure is what separates drift from creep)."""
    return sorted(
        name for name, sec in timings.items()
        if baseline.get(name)
        and ((sec > 1.3 * baseline[name] and sec - baseline[name] > 0.3)
             or sec > 1.5 * baseline[name]))


def _remeasure_set(flagged: list[str], timings: dict[str, float],
                   baseline: dict[str, float], cap: int) -> list[str]:
    """Cap the isolated re-measure loop (round-14 verdict #2): on a loaded
    box the drift rule can flag most of the registry (83/215 in r14), and
    an uncapped min-of-3 loop appends ~250 extra query executions — the
    harness responds to external load by tripling its own wall. Keep the
    top-`cap` rows by absolute drift delta (session − baseline); the
    payload notes how many were flagged in total."""
    if cap < 0 or len(flagged) <= cap:
        return list(flagged)
    return sorted(flagged, key=lambda n: baseline[n] - timings[n])[:cap]


# The driver keeps only the LAST ~2000 chars of stdout: if the payload is
# bigger the driver's regex recovers a random half and PERF attribution
# dies. Shrink priority (round-14 verdict #1 — the old loop shed QUERY
# rows first, so one elevated session crowded the queries dict down to a
# single entry and PERF manufactured 59 phantom "dropped" queries):
#   1. queries dict: top-k by seconds, never below _QUERIES_FLOOR while
#      any other lever remains;
#   2. isolated_remeasure rows: capped at _ISO_CAP from the start, shed
#      before the queries dict drops below its floor;
#   3. re-measure error strings: truncate then drop;
#   4. only if a floor-40 payload STILL cannot fit (pathological), shrink
#      the queries dict further so the line at least parses.
_QUERIES_FLOOR = 40
_ISO_CAP = 5


def _emit_payload(timings: dict[str, float], total: float, sf: str,
                  isolated: dict[str, float], baseline: dict[str, float],
                  remeasure_errors: dict[str, str], limit: int,
                  n_flagged: int) -> str:
    def payload_for(k: int, iso_k: int, err_k: int | None = None) -> str:
        top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:k])
        doc = {
            "metric": "total_query_wall_time",
            "value": total,
            "unit": "sec",
            "queries": top,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
        if isolated and iso_k > 0:
            # in-session value vs isolated min-of-3 for every query that
            # read >30% over its committed baseline — both numbers in
            # the record, per the round-11 verdict's evidence rule.
            # iso_k < len trims to the LARGEST-drift rows.
            keep = sorted(isolated,
                          key=lambda n: baseline[n] - timings[n])[:iso_k]
            doc["isolated_remeasure"] = {
                n: {"session": timings[n], "isolated": isolated[n],
                    "baseline": baseline[n]} for n in keep}
            if iso_k < len(isolated):
                doc["isolated_note"] = (f"top {iso_k} of {len(isolated)} "
                                        f"re-measured rows shown")
        if n_flagged > len(isolated) + len(remeasure_errors):
            doc["drift_note"] = (f"{len(isolated) + len(remeasure_errors)} "
                                 f"of {n_flagged} drift-flagged rows "
                                 f"re-measured (cap)")
        if remeasure_errors:
            # err_k None = all; a shrink lever like iso_k — unbounded
            # error strings (200 chars each) could otherwise hold the
            # payload over the driver's parse window after k/iso_k hit
            # their floors (truncate each message to 80 chars first,
            # then drop whole entries)
            errs = dict(sorted(remeasure_errors.items()))
            if err_k is not None:
                errs = {n: m[:80] for n, m in list(errs.items())[:err_k]}
                if err_k < len(remeasure_errors):
                    doc["remeasure_errors_note"] = (
                        f"{err_k} of {len(remeasure_errors)} shown")
            if errs:
                doc["isolated_remeasure_errors"] = errs
        if k < len(timings):
            doc["note"] = (f"queries = top {k} of {len(timings)} by sec; "
                           f"full set in BASELINE.md")
        return json.dumps(doc, separators=(",", ":"))

    if limit <= 0:  # recording-quality runs: no cap, full everything
        return payload_for(len(timings), len(isolated))
    floor = min(_QUERIES_FLOOR, len(timings))
    k, iso_k = len(timings), min(len(isolated), _ISO_CAP)
    err_k: int | None = None
    payload = payload_for(k, iso_k, err_k)
    while len(payload) > limit:
        if k > floor:
            k = max(floor, k - 5)
        elif iso_k > 0:
            iso_k = max(0, iso_k - 2)
        elif err_k is None or err_k > 0:
            err_k = (len(remeasure_errors) if err_k is None
                     else max(0, err_k - 2))
        elif k > 1:
            # pathological: even the floor-40 dict alone is over the
            # window — a parseable payload beats the floor
            k = max(1, k - 5)
        else:
            break
        payload = payload_for(k, iso_k, err_k)
    return payload


def main() -> None:
    global _REAL_STDOUT
    _REAL_STDOUT = os.dup(1)
    os.dup2(2, 1)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    # Warm the JVM so timings are steady-state: each distinct expression
    # pattern pays a one-time multi-second codegen/JIT stall on its first
    # multi-task stage in a fresh JVM (observed lockstep across all tasks).
    # Running the whole registry once at sf0.001 (~6k-row tables) compiles
    # every plan shape + spawns the Python workers for the pandas stages.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name, (fn, _sql) in REGISTRY.items():
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warmup is best-effort; the timed run surfaces real errors

    # Warm the OS page cache for the TIMED sf too (plans were compiled above
    # at sf0.001): otherwise the first timed query absorbs the one-time cold
    # read of the big tables and the measurement mixes disk with compute.
    import glob
    for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(f).write.format("noop").mode("overwrite").save()
        except Exception:
            try:  # NANOS-timestamp tables need the events loader path
                from peskas_malawi_data_pipeline_spark.queries import _t
                name = os.path.basename(f).rsplit(".", 1)[0]
                _t(spark, sf_dir, name).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    # Two timed passes, per-query minimum: single-shot timings on a busy
    # 32-thread box swing ±30% from GC/compaction noise; min-of-2 reports
    # the achievable steady-state cost.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}
    import gc
    for _ in range(passes):
        for name, (fn, _sql) in REGISTRY.items():
            # Drop Python references to the previous query's DataFrames so
            # the ContextCleaner can release their localCheckpoint blocks.
            # (The in-session slowdown originally blamed on dead blocks was
            # later root-caused to codegen class-cache thrash, fixed via
            # spark.sql.codegen.cache.maxEntries in core.session; the
            # gc.collect stays as cheap reference hygiene.) Outside the
            # timer — inter-query hygiene, not query cost.
            gc.collect()
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t = round(time.perf_counter() - start, 3)
            timings[name] = min(timings.get(name, t), t)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Automatic isolated re-measure: whole-session totals on this box
    # drift (sub-second queries ±50%, late-session band up to +130%), so
    # a query reading >30% over its committed per-query baseline gets an
    # immediate min-of-3 re-measure ALONE at the end of the run — the
    # BENCH record then carries both numbers and a regression can be
    # separated from session drift without a manual follow-up session.
    isolated: dict[str, float] = {}
    baseline = _latest_baseline(sf)
    all_flagged = _drift_flagged(timings, baseline)
    cap = int(os.environ.get("SPARK_GRAFT_BENCH_REMEASURE_CAP", "8"))
    flagged = _remeasure_set(all_flagged, timings, baseline, cap)
    remeasure_errors: dict[str, str] = {}
    for name in flagged:
        fn, _sql = REGISTRY[name]
        for _ in range(3):
            gc.collect()
            start = time.perf_counter()
            # A re-measure failure (e.g. an executor OOM on the Nth
            # repeat) must not destroy the already-collected timings —
            # record the failure in the payload instead of propagating.
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:
                remeasure_errors[name] = f"{type(e).__name__}: {e}"[:200]
                break
            t = round(time.perf_counter() - start, 3)
            isolated[name] = min(isolated.get(name, t), t)

    # The driver records only the LAST 2000 chars of stdout and JSON-parses
    # that tail: a full 131-query dict (~3.4 KB) truncates mid-object and
    # parses as null (BENCH_r01-r04 all show "parsed": null), leaving only
    # a random ~half of the per-query times regex-recoverable. Emit the
    # most informative payload that PARSES instead — shrink priority and
    # floors in _emit_payload. No silent cap: the note names what was
    # dropped, and the COMPLETE per-query recordings are committed as
    # .baseline_r*_bench*.json + the BASELINE.md table.
    # SPARK_GRAFT_BENCH_MAX_CHARS=0 disables the cap (recording-quality
    # runs feeding tools/record_baseline.py need every query).
    limit = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_CHARS", "1990"))
    payload = _emit_payload(timings, total, sf, isolated, baseline,
                            remeasure_errors, limit, len(all_flagged))
    os.write(_REAL_STDOUT, (payload + "\n").encode())


if __name__ == "__main__":
    main()
