"""Isolated per-process timing probe for a subset of registry queries.

Usage:
    python tools/ab_probe.py --sf-dir DIR --passes N \
        [--conf k=v ...] [--label L] query [query ...]

One PROCESS per config arm (session conf like shuffle codec or join
strategy cannot be flipped reliably inside a live session): warms each
named query at sf0.001 (plan/codegen/Python-worker warmup), page-warms
the timed SF once, then times `fn(spark, sf_dir)` through the noop sink
min-of-N, printing one JSON line {label, conf, sf_dir, queries: {name:
sec}}. Interleave arms by invoking the processes alternately (A,B,A,B)
from a driver shell — the box's documented load spikes flip single-shot
rankings (SCALE.md §10o protocol).
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable)")
    ap.add_argument("--label", default="")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)

    from peskas_malawi_data_pipeline_spark.core import get_spark
    from peskas_malawi_data_pipeline_spark.queries import REGISTRY

    spark = get_spark("ab_probe", extra_conf=extra or None)
    names = args.queries
    for name in names:
        fn, _ = REGISTRY[name]
        try:
            fn(spark, args.warm_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass
    # page-cache warm of the timed SF (bench.py protocol)
    import glob
    for f in sorted(glob.glob(os.path.join(args.sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(f).write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            try:
                from peskas_malawi_data_pipeline_spark.queries import _t
                t = os.path.basename(f).rsplit(".", 1)[0]
                _t(spark, args.sf_dir, t).write.format("noop") \
                    .mode("overwrite").save()
            except Exception:
                pass

    timings: dict[str, float] = {}
    for _ in range(args.passes):
        for name in names:
            fn, _ = REGISTRY[name]
            gc.collect()
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            t = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, t), t)

    print(json.dumps({"label": args.label, "conf": extra,
                      "sf_dir": args.sf_dir, "passes": args.passes,
                      "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
