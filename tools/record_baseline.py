"""Rewrite BASELINE.md's recorded-timings table from a bench.py JSON line.

Usage: python tools/record_baseline.py BENCH.json [--round N]

Reads the one-line JSON bench.py prints (run it with
SPARK_GRAFT_BENCH_PASSES=3 on an idle box for a recording-quality run),
and replaces everything from the '## Recorded engine timings' heading to
the end of BASELINE.md with a fresh two-column table plus the measurement
provenance, so later rounds can compute per-query regression ratios
against a complete, current base.
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "## Recorded engine timings"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--round", default="4")
    ap.add_argument("--passes", default="3")
    args = ap.parse_args()

    with open(args.bench_json) as fh:
        payload = json.loads(fh.read().strip())
    q = dict(sorted(payload["queries"].items()))
    total = payload["value"]

    names = list(q)
    half = (len(names) + 1) // 2
    lines = [
        f"{MARKER} (round-{args.round} baseline)",
        "",
        "Per-query wall seconds from `bench.py` (local[32], "
        f"sf{payload['sf']}, min of {args.passes} timed passes after "
        "plan+page-cache warmup; noop sink drains every output column; "
        "idle box). Whole-session totals on this box drift ±4% "
        "run-to-run and individual sub-second queries ±50% — judge "
        "per-query ratios only with that band in mind. These rows exist "
        "so later rounds can compute real per-query regression ratios — "
        "the reference publishes no numbers.",
        "",
        f"Total wall time: **{total} s** across {len(names)} queries.",
        "",
        "| query | sec | query | sec |",
        "|---|---|---|---|",
    ]
    for i in range(half):
        left = f"{names[i]} | {q[names[i]]}"
        right = (f"{names[half + i]} | {q[names[half + i]]}"
                 if half + i < len(names) else " | ")
        lines.append(f"| {left} | {right} |")
    lines.append("")

    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as fh:
        head = fh.read().split(MARKER, 1)[0].rstrip() + "\n\n"
    with open(path, "w") as fh:
        fh.write(head + "\n".join(lines))
    print(f"recorded {len(names)} queries, total {total} s -> {path}")


if __name__ == "__main__":
    main()
