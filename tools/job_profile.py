"""Per-job profile of one registry query: duration + callsite per Spark
job, from the Spark event log. Attribution for BUILD-dominated queries
(tools/build_exec_split.py): which collect/checkpoint/write calls the
jobs come from and what each costs.

Usage:
    python tools/job_profile.py QUERY [--sf-dir DIR] [--no-warm]

Runs QUERY once warm (plans warmed at sf0.001 first), then once
profiled, and prints per-job rows (ms, callsite) plus a by-callsite
rollup. Gaps BETWEEN jobs (driver-side think time: planning, Py4J,
DuckDB-free pure-Python work) are reported as the difference between
wall and Σjob.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    log_dir = tempfile.mkdtemp(prefix="peskas_evlog_")
    from peskas_malawi_data_pipeline_spark.core import get_spark
    from peskas_malawi_data_pipeline_spark.queries import REGISTRY

    spark = get_spark("job_profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    fn, _ = REGISTRY[args.query]
    if not args.no_warm:
        try:
            fn(spark, args.warm_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass
        # warm timed-sf page cache + artifacts once
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    marker = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    first_profiled = (max(marker) + 1) if marker else 0
    fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.stop()  # flush the event log

    jobs: dict[int, dict] = {}
    execs: dict[str, str] = {}
    logfiles = []
    for root, _dirs, files in os.walk(log_dir):
        logfiles += [os.path.join(root, f) for f in files
                     if "events" in f or f.startswith("local-")]
    for path in logfiles:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                kind = ev.get("Event", "")
                if kind == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    site = props.get("callSite.short", "?")
                    jobs[jid] = {"start": ev["Submission Time"],
                                 "site": site,
                                 "exec": props.get(
                                     "spark.sql.execution.id")}
                elif kind == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
                elif kind.endswith("SparkListenerSQLExecutionStart"):
                    execs[str(ev["executionId"])] = ev.get(
                        "description", "?").splitlines()[0][:110]

    rows = [(jid, j) for jid, j in sorted(jobs.items())
            if jid >= first_profiled and "end" in j]
    total_job_ms = 0
    by_site: dict[str, list] = {}
    print(f"{'job':>5s} {'ms':>8s}  callsite")
    for jid, j in rows:
        ms = j["end"] - j["start"]
        total_job_ms += ms
        site = j["site"]
        if site == "?" and j.get("exec") is not None:
            site = execs.get(j["exec"], "?")
        by_site.setdefault(site, []).append(ms)
        print(f"{jid:5d} {ms:8d}  {site}")
    print(f"\nwall {wall*1000:.0f} ms; {len(rows)} jobs, "
          f"sum {total_job_ms} ms; driver gaps "
          f"{wall*1000 - total_job_ms:.0f} ms")
    print("\nby callsite (n, total ms):")
    for site, lst in sorted(by_site.items(), key=lambda kv: -sum(kv[1])):
        print(f"{sum(lst):8d} ms  n={len(lst):3d}  {site}")


if __name__ == "__main__":
    main()
