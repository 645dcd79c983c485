"""Physical-plan regression tests: the 100 TB-scale properties of each plan
are asserted, not assumed. A correct result with the wrong plan (missed
pushdown, a broadcast that became a shuffle, a cartesian product) is a
failure at scale even when the small-SF values match, so the plan shape is
part of the contract.

Checked properties map to SURVEY §4.2/§4.3: predicate pushdown + column
pruning reach the parquet scan; small dimensions broadcast (the 100 TB fact
side never shuffles for them); aggregations are partial (map-side combine)
before their single exchange; the suffix theta-join is a broadcast
nested-loop, never a shuffled cartesian.
"""

from __future__ import annotations

import os
import shutil

from peskas_malawi_data_pipeline_spark.queries import REGISTRY

from conftest import SF_DIR


def plan(spark, name: str, mode: str = "formatted") -> str:
    """Physical plan text. ``formatted`` for per-node detail (PushedFilters,
    ReadSchema); ``simple`` when counting nodes — formatted mode prints every
    node twice (tree + detail section)."""
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_DIR)
    utils = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils
    return utils.explainString(df._jdf.queryExecution(), mode)


def test_agg_filter_pushdown_and_pruning(spark):
    p = plan(spark, "pricing_summary")
    # filter reaches the scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: only the 6 referenced columns are read (of 11)
    read = next(l for l in p.splitlines() if l.startswith("ReadSchema"))
    assert "l_orderkey" not in read and "l_partkey" not in read
    # map-side combine: partial agg below the exchange
    assert "partial_sum" in p
    s = plan(spark, "pricing_summary", "simple")
    assert s.count("Exchange") == 1  # exactly one shuffle (the narrow agg key)


def test_broadcast_dim_join_never_shuffles_fact(spark):
    p = plan(spark, "join_broadcast_dim")
    assert "BroadcastHashJoin" in p
    # the only Exchange is the post-join aggregation, not a join shuffle
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_multi_join_broadcasts_dims(spark):
    p = plan(spark, "regional_revenue")
    assert p.count("BroadcastHashJoin") >= 3  # region, nation, supplier
    assert "CartesianProduct" not in p


def test_suffix_theta_join_is_broadcast_nested_loop(spark):
    p = plan(spark, "suffix_match_join")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_narrow_project_has_no_exchange(spark):
    p = plan(spark, "filter_project")
    assert "Exchange" not in p  # pure scan→filter→project, single stage


def test_topk_per_group_partial_limit(spark):
    # rank-filter pushdown: each partition pre-limits before the shuffle
    p = plan(spark, "topk_per_group")
    assert "WindowGroupLimit" in p


def test_global_topk_is_take_ordered(spark):
    p = plan(spark, "shipping_priority")
    assert "TakeOrderedAndProject" in p  # never a full global sort


def test_window_flag_single_shuffle(spark):
    p = plan(spark, "window_unique_flag", "simple")
    assert p.count("Exchange") == 1


def test_rollup_single_shuffle(spark):
    # grouping sets expand map-side: one expand + partial agg + one exchange
    p = plan(spark, "rollup_totals", "simple")
    assert "Expand" in p
    assert p.count("Exchange") == 1


def test_exact_dedup_semi_join(spark):
    p = plan(spark, "exact_dedup")
    assert "LeftSemi" in p


def test_left_join_builds_broadcast_from_aggregated_side(spark):
    p = plan(spark, "left_join_null_keep")
    assert "BroadcastHashJoin" in p
    assert "Join LeftOuter" in p or "BuildRight" in p


def test_bucketed_tables_join_without_shuffle(spark):
    """SCALE.md §3: landings and trips bucketed by the merge key join with
    ZERO exchanges — the pipeline's only fact⋈fact join becomes co-located.
    (Bucket pruning also applies; bucket count would be sized to the
    cluster at 100 TB.)"""
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.queries import _t

    ev = _t(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    left = ev.select("user_id", "day", "event_id", "value")
    right = ev.select("user_id", "day", F.col("value").alias("v2"))
    from peskas_malawi_data_pipeline_spark.operators import layout

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df in [("b_left", left), ("b_right", right)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
        # through the operator API (layout.bucketed_write), so the helper
        # itself is what this plan proof covers
        layout.bucketed_write(df, name, 8, "user_id", "day")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bucket key"):
        layout.bucketed_write(left, "b_bad", 8)
    joined = spark.table("b_left").join(spark.table("b_right"),
                                        ["user_id", "day"])
    # disable auto-broadcast so the plan shows the sort-merge path a
    # 100 TB fact⋈fact join would take (restore after planning)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        utils = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils
        p = utils.explainString(joined._jdf.queryExecution(), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p        # bucketing satisfies the distribution
    assert "SelectedBucketsCount" in p


def test_partitioned_write_gets_partition_pruning(spark, tmp_path):
    """The lakehouse layout contract (SCALE.md §3): stage outputs partitioned
    by a natural key give downstream reads partition pruning — the filter
    lands in PartitionFilters and pruned partitions are never scanned."""
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.core import io as io_ops
    from peskas_malawi_data_pipeline_spark.queries import _t

    ev = _t(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts").cast("string"))
    path = str(tmp_path / "events_by_type")
    io_ops.write_table(ev, path, partition_by=["event_type"])

    scan = io_ops.read_table(spark, path).filter(F.col("event_type") == "click")
    utils = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils
    p = utils.explainString(scan._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [isnotnull(event_type" in p
    # the predicate is satisfied entirely by pruning — no data-filter remains
    assert scan.count() == ev.filter(F.col("event_type") == "click").count()


def test_semi_join_pushdown_and_type(spark):
    """semi_join_exists: the date window reaches the orders scan as pushed
    filters, and the join is a real LeftSemi (left side never duplicated) —
    not an inner join + distinct."""
    p = plan(spark, "semi_join_exists")
    assert "LeftSemi" in p
    assert "GreaterThanOrEqual(o_orderdate" in p
    assert "Distinct" not in p


def test_anti_join_prunes_filter_side_to_keys(spark):
    """anti_join_missing: LeftAnti join, and the orders side is pruned to
    (o_custkey, o_totalprice) at the scan — the 100 TB filter side shuffles
    keys, not rows."""
    p = plan(spark, "anti_join_missing")
    assert "LeftAnti" in p
    orders_reads = [l for l in p.splitlines()
                    if l.strip().startswith("ReadSchema") and "o_custkey" in l]
    assert orders_reads and all(
        "o_orderpriority" not in l and "o_orderdate" not in l
        for l in orders_reads)
    assert "GreaterThan(o_totalprice,300000.0)" in p


def test_pack_chunks_single_shuffle(spark):
    """Concat-chunk packing is one shuffle (the per-shard sort) and no
    Python: the window arithmetic stays JVM-side."""
    p = plan(spark, "pack_chunks", mode="simple")
    # exactly one hash exchange (the shard window); the RoundRobin exchange
    # is the loader's single-row-group parallelization, local-harness only
    assert p.count("Exchange hashpartitioning") == 1
    assert "Python" not in p and "ArrowEval" not in p


def test_asof_join_is_single_window_not_range_join(spark):
    """asof_join: one hash exchange on the key (the window), never a
    broadcast-nested-loop or cartesian over the time ranges."""
    p = plan(spark, "asof_join_latest_view", mode="simple")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("Exchange hashpartitioning") <= 2   # groupBy + window share the user key
    assert "Window" in p


def test_interval_join_is_equi_join_not_nested_loop(spark):
    """interval_join_clicks: the range predicate rides an EQUI-join on
    (user, bucket) — never the broadcast-nested-loop Spark would plan for a
    raw BETWEEN join."""
    p = plan(spark, "interval_join_clicks", mode="simple")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_funnel_single_user_shuffle(spark):
    """funnel_stages: three chained conditional-min windows + the per-user
    rollup all reuse ONE user_id partitioning; the only other exchange is
    the tiny final stage-count."""
    p = plan(spark, "funnel_stages", mode="simple")
    assert p.count("Window") == 3
    assert p.count("Exchange hashpartitioning") <= 2


def test_min_price_supplier_single_data_shuffle(spark):
    """min_price_supplier: window min + filter + rollup reuse one
    l_partkey partitioning — a single data shuffle, where the
    aggregate-then-self-join decorrelation would shuffle lineitem twice."""
    p = plan(spark, "min_price_supplier", mode="simple")
    assert "Join" not in p                    # no self-join decorrelation
    assert p.count("Exchange hashpartitioning") == 1


def test_declared_pivot_single_shuffle(spark):
    """pivot_event_counts: declaring the pivot values keeps the pivot ONE
    partial-agg shuffle — no distinct-collection job, no second exchange."""
    p = plan(spark, "pivot_event_counts", mode="simple")
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_" in plan(spark, "pivot_event_counts")


def test_ngram_topk_partial_agg_before_shuffle(spark):
    """ngram_topk: the shingle explosion is absorbed by map-side combine —
    the (source, ngram) counts partial-aggregate below their exchange, and
    the rank window rides the same partitioning-compatible count table
    (one agg shuffle + one window shuffle, nothing more)."""
    p = plan(spark, "ngram_topk")
    assert "partial_count" in p
    s = plan(spark, "ngram_topk", mode="simple")
    assert s.count("Exchange hashpartitioning") <= 2


def test_tfidf_broadcasts_per_source_doc_counts(spark):
    """tfidf_topk: the tiny per-source doc-count table broadcasts; the term
    and doc-frequency aggregations do not cartesian or nested-loop."""
    p = plan(spark, "tfidf_topk", mode="simple")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_moving_sum_no_global_sort(spark):
    """moving_sum_7d: the frame-spec window sorts within priority
    partitions only — a global (single-partition) exchange would serialize
    the whole series through one task at scale."""
    p = plan(spark, "moving_sum_7d", mode="simple")
    assert "Exchange SinglePartition" not in p


def test_cube_single_shuffle_with_partial_agg(spark):
    """cube_totals: all four granularities expand BEFORE one partial-agg
    shuffle (the Expand operator), not one aggregation pass each."""
    p = plan(spark, "cube_totals", mode="simple")
    assert "Expand" in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_" in plan(spark, "cube_totals")


def test_repetition_ratio_no_exchange(spark):
    """repetition_ratio: a pure per-row map — no shuffle anywhere (the
    documents round-robin repartition is the only exchange)."""
    p = plan(spark, "repetition_ratio", mode="simple")
    assert p.count("Exchange") <= 1  # only the small-file spread repartition


def test_q6_all_predicates_pushed(spark):
    """forecast_revenue_delta: every range predicate reaches the parquet
    scan (row-group min/max pruning at scale) and only the 4 referenced
    columns are read."""
    p = plan(spark, "forecast_revenue_delta")
    pushed = next(l for l in p.splitlines() if "PushedFilters" in l)
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed
    read = next(l for l in p.splitlines() if l.startswith("ReadSchema"))
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_q16_exclusion_is_broadcast_anti_join(spark):
    """supplier_part_variety: the NOT IN subquery plans as a broadcast
    LEFT ANTI hash join — the fact side never shuffles for the exclusion."""
    p = plan(spark, "supplier_part_variety")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_q17_decorrelates_to_single_lineitem_pass(spark):
    """small_quantity_revenue: the correlated AVG subquery must NOT become
    a second aggregate+self-join of lineitem — one window over partkey,
    one scan of lineitem."""
    p = plan(spark, "small_quantity_revenue", mode="simple")
    assert p.count("lineitem.parquet") == 1
    assert "Window" in p


def test_q18_having_join_back_reuses_partitioning(spark):
    """large_volume_orders: the aggregate on l_orderkey and the join back
    to orders share the key — lineitem shuffles exactly once."""
    p = plan(spark, "large_volume_orders", mode="simple")
    # one exchange for the groupBy(l_orderkey); orders/customer side joins
    # must not introduce a second lineitem shuffle
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_q21_one_agg_one_window_no_self_join(spark):
    """sole_return_suppliers: the EXISTS/NOT-EXISTS pair decorrelates into
    one aggregation + one window — lineitem is scanned ONCE, never
    self-joined."""
    p = plan(spark, "sole_return_suppliers", mode="simple")
    assert p.count("lineitem.parquet") == 1
    assert "Window" in p


def test_q11_scalar_threshold_is_broadcast_not_collect(spark):
    """revenue_concentration: the global-total threshold joins back as a
    broadcast nested loop of a ONE-ROW aggregate — no shuffled cartesian."""
    p = plan(spark, "revenue_concentration", mode="simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: when the fact is partitioned on the join
    key and the dim side carries a selective filter, the fact scan is
    pruned at RUNTIME by the dim's key set (dynamicpruningexpression in the
    plan) — at 100 TB this is the difference between scanning 2 partitions
    and scanning all of them, without any literal filter on the fact."""
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.core import io as io_ops
    from peskas_malawi_data_pipeline_spark.queries import _t

    ev = _t(spark, SF_DIR, "events")
    path = str(tmp_path / "events_part")
    io_ops.write_table(ev, path, partition_by=["event_type"])

    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0),
         ("signup", 5.0), ("error", 0.0)],
        ["event_type", "weight"]).filter(F.col("weight") >= 5.0)
    fact = io_ops.read_table(spark, path)
    joined = fact.join(F.broadcast(dim), "event_type")

    utils = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils
    p = utils.explainString(joined._jdf.queryExecution(), "formatted")
    assert "dynamicpruningexpression" in p
    assert joined.count() == ev.filter(
        F.col("event_type").isin("purchase", "signup")).count()


def test_upsert_partitions_touches_only_present_partitions(spark, tmp_path):
    """core.io.upsert_partitions: dynamic partition overwrite replaces ONLY
    the partitions present in the incremental frame — the O(new data)
    alternative to the reference's truncate-and-load (R/storage.R:89)."""
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.core import io as io_ops
    from peskas_malawi_data_pipeline_spark.queries import _t

    ev = (_t(spark, SF_DIR, "events")
          .select("event_id", "event_type", "value"))
    path = str(tmp_path / "events_upsert")
    io_ops.write_table(ev, path, partition_by=["event_type"])
    before_click = spark.read.parquet(path).filter(
        F.col("event_type") == "click").count()

    # incremental run: only 'view' rows, values rewritten
    incr = (ev.filter(F.col("event_type") == "view")
            .withColumn("value", F.lit(0.0)))
    n_view = incr.count()
    io_ops.upsert_partitions(incr, path, ["event_type"])

    after = spark.read.parquet(path)
    # untouched partition intact
    assert after.filter(F.col("event_type") == "click").count() == before_click
    # upserted partition fully replaced (same rows, new values)
    view = after.filter(F.col("event_type") == "view")
    assert view.count() == n_view
    assert view.agg(F.sum("value")).collect()[0][0] == 0.0
    # static overwrite mode restored on the session
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode") != "dynamic"


def test_runtime_bloom_filter_prunes_fact_rows(spark):
    """Runtime bloom-filter join pruning (the shuffle-join analogue of DPP):
    with a selective dim filter and a non-broadcast join, Spark injects a
    might_contain(bloom) predicate into the FACT scan — at 100 TB the fact
    side drops non-matching rows before the shuffle instead of after the
    join. Plan-checked with the feature's size thresholds relaxed (local
    parquet is tiny; on a cluster the defaults govern)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        p = (spark.read.parquet(f"{SF_DIR}/part.parquet")
             .filter(F.col("p_size") == 3))
        j = li.join(p, li.l_partkey == p.p_partkey)
        utils = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils
        plan = utils.explainString(j._jdf.queryExecution(), "formatted")
        assert "might_contain" in plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's OptimizeSkewedJoin actually FIRES on a constructed hot key
    (the last scale mechanism that was asserted but not plan-pinned):
    with a non-broadcast SMJ and one key holding a quarter of the rows,
    the final adaptive plan shows SortMergeJoin(skew=true) over skewed
    AQEShuffleReads — the hot partition is split across tasks instead of
    serializing one reducer — and the answer is unchanged. Thresholds
    are relaxed like the bloom test (local shuffle partitions are
    hundreds of bytes; on a cluster the 256MB/5.0 defaults govern —
    SCALE.md §11 sets skewJoin.enabled on the submit line)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.shuffle.partitions": "100",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100b",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100b",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 1000, 1, 10).select(
            F.when(F.col("id") < 250, 249).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"))
        right = spark.range(0, 1000, 1, 10).select(
            F.when(F.col("id") % 2 == 0, 2).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad2"))
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0]["count"] == 625   # split must not change rows
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert any("AQEShuffleRead" in ln and "skewed" in ln
                   for ln in plan.splitlines())
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_compact_table_reduces_files_keeps_rows(spark, tmp_path):
    """core.io.compact_table: a many-small-files table rewrites to the
    target file count with identical contents (row count + value sum)."""
    import os

    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.core import io as io_ops
    from peskas_malawi_data_pipeline_spark.queries import _t

    ev = _t(spark, SF_DIR, "events").select("event_id", "value")
    path = str(tmp_path / "small_files")
    ev.repartition(64).write.parquet(path)
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before >= 32
    total = ev.count()
    vsum = ev.agg(F.sum("event_id")).collect()[0][0]

    n_after = io_ops.compact_table(spark, path, target_files=4)
    assert n_after <= 6
    back = spark.read.parquet(path)
    assert back.count() == total
    assert back.agg(F.sum("event_id")).collect()[0][0] == vsum


def test_compact_swap_strategy_is_pluggable(spark, tmp_path):
    """core.io.compact_table swap seam: the default rename swap refuses
    object-store URIs (non-atomic there — a table-format metadata commit is
    the right strategy), and an injected swap callable is honored."""
    import pytest

    from peskas_malawi_data_pipeline_spark.core import io as io_ops

    with pytest.raises(ValueError, match="not atomic"):
        io_ops._local_rename_swap("s3://bucket/table", "s3://bucket/tmp")

    path = str(tmp_path / "t")
    spark.range(100).repartition(8).write.parquet(path)
    calls = []

    def metadata_commit_swap(p, tmp):
        calls.append((p, tmp))
        io_ops._local_rename_swap(p, tmp)  # stand-in for a catalog commit

    io_ops.compact_table(spark, path, target_files=2, swap=metadata_commit_swap)
    assert calls == [(path, path + ".__compact_tmp")]
    assert spark.read.parquet(path).count() == 100


def test_compact_delta_table_binding(spark, tmp_path):
    """core.io.compact_delta_table: the Delta Lake binding of the commit
    slot — transactional self-overwrite compaction, no side directory, no
    swap window. ENVIRONMENT-GATED like the protobuf streaming twin: this
    sandbox prohibits installs and ships without delta-spark, so the
    binding is recorded as an environment refusal (the gate itself is
    asserted un-gated below)."""
    import importlib.util

    import pytest

    from peskas_malawi_data_pipeline_spark.core import io as io_ops

    if importlib.util.find_spec("delta") is None:
        # the refusal path must be a clear, actionable error either way
        with pytest.raises(ModuleNotFoundError, match="delta-spark"):
            io_ops.compact_delta_table(spark, str(tmp_path / "t"), 2)
        pytest.skip("delta-spark not installed and installs are prohibited "
                    "in this environment (recorded refusal)")

    path = str(tmp_path / "t")
    (spark.range(1000).repartition(16)
     .write.format("delta").save(path))
    n_after = io_ops.compact_delta_table(spark, path, target_files=2)
    assert n_after <= 2
    assert spark.read.format("delta").load(path).count() == 1000


def test_storage_adapters_contract(spark, tmp_path):
    """core.io adapter seam (S4/K1 parity): parquet adapter honors
    truncate-and-load (second write fully replaces), and the MongoDB
    adapter builds the connector's option set without needing the jar."""
    import pytest
    from pyspark.sql import Row

    from peskas_malawi_data_pipeline_spark.core import io as io_ops

    pq = io_ops.get_adapter("parquet")
    loc = str(tmp_path / "collection")
    pq.write(spark.createDataFrame([Row(a=1), Row(a=2)]), loc)
    pq.write(spark.createDataFrame([Row(a=9)]), loc)  # truncate-and-load
    assert [r.a for r in pq.read(spark, loc).collect()] == [9]
    assert pq.read(spark, loc, columns=["a"]).columns == ["a"]

    mongo = io_ops.get_adapter(
        "mongodb", connection_uri="mongodb://h:27017", database="pipeline")
    assert mongo.options("raw") == {
        "connection.uri": "mongodb://h:27017",
        "database": "pipeline",
        "collection": "raw",
    }
    with pytest.raises(ValueError, match="unknown storage backend"):
        io_ops.get_adapter("csvkit")


def test_global_ranking_matches_window_forms(spark):
    """operators.ranking: the two-pass range-partition rank/ntile equals
    the single-window forms exactly, and the plan range-partitions the fact
    side instead of funneling it through one task."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.operators import ranking
    from peskas_malawi_data_pipeline_spark.queries import _t

    ev = _t(spark, SF_DIR, "events").select("event_id", "value")

    got_rn = ranking.global_row_number(ev, ["value", "event_id"], "rn")
    w = Window.orderBy("value", "event_id")
    want_rn = ev.withColumn("rn", F.row_number().over(w))
    assert got_rn.exceptAll(want_rn).count() == 0
    assert want_rn.exceptAll(got_rn).count() == 0

    got_t = ranking.global_ntile(ev, ["value", "event_id"], 7, "tile")
    want_t = ev.withColumn("tile", F.ntile(7).over(w).cast("long"))
    assert got_t.exceptAll(want_t).count() == 0
    assert want_t.exceptAll(got_t).count() == 0

    utils = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils
    p = utils.explainString(got_rn._jdf.queryExecution(), "extended")
    # the range exchange now runs inside the materialized barrier (so the
    # two consuming branches cannot see different samplings); the final
    # plan shows the barrier scan + the per-bucket window — and the fact
    # side must never appear under an unpartitioned Window
    assert "existingrdd" in p.lower()
    assert "partitionby __pid" in p.lower().replace("specifiedwindowframe", "")         or "windowspecdefinition(__pid" in p.lower()
    pre = utils.explainString(
        ev.repartitionByRange(8, "value", "event_id")._jdf.queryExecution(),
        "extended")
    assert "rangepartitioning" in pre.lower()

    # n < n_tiles edge: every row its own tile, trailing tiles empty
    tiny = ev.limit(3)
    tiles = sorted(r.tile for r in
                   ranking.global_ntile(tiny, ["value", "event_id"], 10,
                                        "tile").collect())
    assert tiles == [1, 2, 3]


def test_registry_wide_plan_hygiene(spark):
    """Every batch registry query planable at sf0.001 must be free of the
    three 100 TB red flags: CartesianProduct joins, row-at-a-time Python
    evaluation (BatchEvalPython — Arrow paths show as ArrowEvalPython /
    MapInPandas), and unpartitioned windows over unbounded inputs. New
    queries inherit this gate automatically.

    Known-bounded global windows are exempted by name: their window input
    is n_shards/n_centroids/|buckets| rows by construction."""
    import re

    BOUNDED_GLOBAL_WINDOW_OK = {
        "weighted_sample",   # 8-row shard-total prefix sum
        "ann_ivf_topk",      # 16-row centroid seed numbering
        "ann_recall_at_k",   # same 8-row centroid numbering via ivf_topk
        "ntile_deciles",     # |buckets|-row offset frame (ranking.global_ntile)
        "corpus_shuffle",    # |buckets|-row offset frame (ranking.shuffle_shards)
        "packed_shuffle_stats",  # same |buckets|-row offset frame — the
                                 # shuffle ranks SEQUENCES (answer-sized)
                                 # via shuffle_shards/global_row_number
        "epoch_shuffle_orders",  # the same sequence-key shuffle, once per
                                 # epoch seed (two |buckets|-row frames)
        "corpus_to_shards_pipeline",  # same |buckets|-row offset frame —
                                      # the capstone's final leg IS
                                      # packed_shuffle_stats' shuffle over
                                      # answer-sized sequence keys
        "token_rank_fluency",  # |buckets|-row offset frame over the ≤100-row
                               # heavy-hitter vocabulary (global_row_number)
        "zone_map_skipping",   # |buckets|-row offset frame ×2 layouts
                               # (layout.zone_map_stats via global_row_number)
        "mixture_allocation",  # n_sources-row apportionment frame: the
                               # largest-remainder rank/leftover windows run
                               # AFTER the per-source aggregation
    }
    utils = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils
    offenders = {}
    for name, (fn, _sql) in REGISTRY.items():
        if name.startswith("streaming_"):
            continue  # drains execute eagerly; covered by their own tests
        df = fn(spark, "/root/testdata/sf0.001")
        p = utils.explainString(df._jdf.queryExecution(), "extended")
        flags = []
        if "CartesianProduct" in p:
            flags.append("cartesian")
        if "BatchEvalPython" in p:
            flags.append("row-python-udf")
        if (name not in BOUNDED_GLOBAL_WINDOW_OK
                and re.search(r"windowspecdefinition\([a-z_#0-9L]+ (ASC|DESC)", p)):
            flags.append("global-window")
        if flags:
            offenders[name] = flags
    assert not offenders, offenders


def test_zorder_layout_shrinks_per_file_ranges_on_both_dims(spark, tmp_path):
    """operators.layout.zorder_write: with Z-order clustering, every file
    covers a small min/max rectangle in BOTH columns, so parquet stats
    prune on either predicate — measured directly from the written files'
    footer statistics against a random layout."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.operators import layout
    from peskas_malawi_data_pipeline_spark.queries import _t

    ev = _t(spark, SF_DIR, "events").select(
        "user_id", F.unix_timestamp("ts").alias("t"), "value")
    spans = {}
    for mode in ("random", "zorder"):
        path = str(tmp_path / mode)
        if mode == "zorder":
            layout.zorder_write(ev, path, "user_id", "t", n_files=16)
        else:
            ev.repartition(16).write.mode("overwrite").parquet(path)
        import glob
        per_file = []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            los, his = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in ("user_id", "t") and col.statistics:
                        s = col.statistics
                        los[name] = min(los.get(name, s.min), s.min)
                        his[name] = max(his.get(name, s.max), s.max)
            if los:
                per_file.append({k: his[k] - los[k] for k in los})
        spans[mode] = {
            k: sum(p[k] for p in per_file) / len(per_file)
            for k in ("user_id", "t")}

    # random layout: every file spans ~the whole domain on both dims;
    # z-order: substantially narrower rectangles on BOTH dims at once
    assert spans["zorder"]["user_id"] < spans["random"]["user_id"] * 0.5
    assert spans["zorder"]["t"] < spans["random"]["t"] * 0.5

    # and the data survives the round trip
    total = ev.count()
    assert spark.read.parquet(str(tmp_path / "zorder")).count() == total


def test_zorder_write_empty_and_allnull_input(spark, tmp_path):
    """zorder_write on an empty frame (or all-NULL cluster column) has no
    range to interleave — it must still write the table rather than crash
    an empty-partition compaction job."""
    from peskas_malawi_data_pipeline_spark.operators import layout

    empty = spark.range(0).selectExpr("id as a", "id as b")
    p1 = str(tmp_path / "empty")
    layout.zorder_write(empty, p1, "a", "b", n_files=4)
    assert spark.read.parquet(p1).count() == 0

    allnull = spark.range(5).selectExpr(
        "cast(null as long) as a", "id as b")
    p2 = str(tmp_path / "allnull")
    layout.zorder_write(allnull, p2, "a", "b", n_files=2)
    assert spark.read.parquet(p2).count() == 5


def test_rename_swap_marker_lifecycle(spark, tmp_path):
    """The rename swap writes a recovery marker around its non-atomic
    window: gone after a successful swap; left behind (with recovery
    instructions) if the second rename never happens."""
    from peskas_malawi_data_pipeline_spark.core import io as io_ops

    path = str(tmp_path / "t")
    spark.range(10).write.parquet(path)
    tmp = path + ".__compact_tmp"
    spark.range(10).repartition(1).write.parquet(tmp)
    io_ops._local_rename_swap(path, tmp)
    assert not os.path.exists(tmp + ".__swap_inprogress")
    assert spark.read.parquet(path).count() == 10

    # simulated crash inside the window: marker survives and names both dirs
    spark.range(3).write.parquet(tmp)
    import shutil
    orig_move = shutil.move
    calls = {"n": 0}

    def failing_move(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("crash between renames")
        return orig_move(src, dst)

    shutil.move = failing_move
    try:
        import pytest
        with pytest.raises(OSError):
            io_ops._local_rename_swap(path, tmp)
    finally:
        shutil.move = orig_move
    marker = tmp + ".__swap_inprogress"
    assert os.path.exists(marker)
    text = open(marker).read()
    assert tmp in text and tmp + ".__old" in text


def test_versioned_table_commit_protocol(spark, tmp_path):
    """core.io.VersionedParquetTable: truncate-and-load and compaction as
    O(1) pointer commits — a reader's resolved plan survives a concurrent
    commit (it scans the immutable old version), a crash BEFORE the pointer
    commit leaves the previous version live, and vacuum never deletes the
    live version."""
    import os

    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.core import io as io_ops

    t = io_ops.VersionedParquetTable(str(tmp_path / "vt"))
    assert t.current_version() is None

    assert t.write(spark.range(100).withColumn("x", F.col("id") * 2)) == 1
    old_reader = t.read(spark)            # resolves v1 at plan time

    # a second truncate-and-load commits v2; the table dir never vanishes
    assert t.write(spark.range(50).withColumn("x", F.lit(0))) == 2
    assert t.read(spark).count() == 50
    assert old_reader.count() == 100      # old plan still scans immutable v1

    # crash before commit: a complete-but-uncommitted v3 must stay invisible
    spark.range(7).withColumn("x", F.lit(1)).write.parquet(t.data_dir(3))
    assert t.current_version() == 2
    assert t.read(spark).count() == 50

    # compaction = rewrite + pointer commit (v4 supersedes the orphan too)
    spark.range(2000).withColumn("x", F.col("id")).repartition(32) \
        .write.mode("overwrite").parquet(t.data_dir(4))
    t._commit(4)
    n_files = t.compact(spark, target_files=2)
    assert n_files <= 3
    assert t.current_version() == 5
    assert t.read(spark).count() == 2000

    # crash a write again: v6 staged but never committed (orphan)
    spark.range(3).withColumn("x", F.lit(9)).write.parquet(t.data_dir(6))
    removed = t.vacuum(keep=1)
    assert t.data_dir(5) not in removed and os.path.exists(t.data_dir(5))
    assert not os.path.exists(t.data_dir(1))
    # the orphan is GC'd, never mistaken for a committed recent version
    assert not os.path.exists(t.data_dir(6))
    assert t.read(spark).count() == 2000

    # keep=2 must keep the two most recent COMMITTED versions; a fresh
    # orphan must not displace one of them from the keep window
    v_new = t.write(spark.range(9).withColumn("x", F.lit(0)))  # next commit
    spark.range(2).withColumn("x", F.lit(1)).write.parquet(t.data_dir(v_new + 2))
    t.vacuum(keep=2)
    assert os.path.exists(t.data_dir(5)) and os.path.exists(t.data_dir(v_new))
    assert not os.path.exists(t.data_dir(v_new + 2))
    assert t.read(spark).count() == 9


def test_shuffle_shards_balanced_deterministic_partition_free(spark):
    """ranking.shuffle_shards: equal shard sizes (±1), (shard, pos) unique
    and dense per shard, and the assignment is a pure function of ids —
    identical across input partitionings."""
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.operators import ranking
    from peskas_malawi_data_pipeline_spark.queries import _t

    docs = _t(spark, SF_DIR, "documents").select("doc_id", "text")
    out = ranking.shuffle_shards(docs, n_shards=7)
    rows = [(r.doc_id, r.shard, r.pos) for r in out.collect()]
    n = len(rows)
    sizes = {}
    for _, s, _ in rows:
        sizes[s] = sizes.get(s, 0) + 1
    assert set(sizes) == set(range(7))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # per-shard positions dense 0..size-1
    by_shard = {}
    for _, s, p in rows:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(sizes[s]))
    # partitioning-free: same assignment from a different layout
    again = ranking.shuffle_shards(docs.repartition(3, "text"), n_shards=7)
    assert {(r.doc_id, r.shard, r.pos) for r in again.collect()} == set(rows)
    # shards are hash-stratified, not contiguous id ranges: the first 7
    # ids should not all land in one shard
    first = {s for d, s, _ in rows if d < 7}
    assert len(first) > 1

    import pytest
    with pytest.raises(ValueError, match="n_shards"):
        ranking.shuffle_shards(docs, n_shards=0)


def test_shuffle_shards_more_shards_than_rows(spark):
    """n_shards > |corpus|: ranks 1..n round-robin into the first n shards,
    each with a single row at pos 0 — no empty-shard crash, no collisions."""
    from peskas_malawi_data_pipeline_spark.operators import ranking
    from peskas_malawi_data_pipeline_spark.queries import _t

    docs = _t(spark, SF_DIR, "documents").select("doc_id").limit(3)
    rows = [(r.shard, r.pos) for r in
            ranking.shuffle_shards(docs, n_shards=7).collect()]
    assert len(rows) == 3
    assert all(p == 0 for _, p in rows)
    assert len({s for s, _ in rows}) == 3          # three distinct shards
    assert all(0 <= s < 7 for s, _ in rows)



def test_zone_map_stats_and_skip_report(spark):
    """zone_map_stats buckets in layout order and skip_report counts only
    fully-disjoint buckets; bad bucket size rejected."""
    import pytest
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.operators import layout

    df = spark.createDataFrame([(i, i * 10) for i in range(100)],
                               "id int, v int")
    zmap = layout.zone_map_stats(df, ["v", "id"], "v", 25)
    zm = {r.bucket: (r.mn, r.mx, r.cnt) for r in zmap.collect()}
    assert zm == {0: (0, 240, 25), 1: (250, 490, 25),
                  2: (500, 740, 25), 3: (750, 990, 25)}
    rep = layout.skip_report(zmap, 300, 400).collect()[0]
    # buckets 0 (mx 240 < 300), 2 and 3 (mn > 400) skip; bucket 1 overlaps
    assert (rep.n_buckets, rep.n_skippable, rep.rows_skipped,
            rep.skip_ppm) == (4, 3, 75, 750000)
    with pytest.raises(ValueError, match="bucket_rows"):
        layout.zone_map_stats(df, ["v"], "v", 0)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Spark's runtime bloom-filter injection (the row-level data-skipping
    complement to zone maps): a selective dim-side filter materializes a
    bloom over the join key and pre-filters the FACT scan before the
    shuffle — at cluster scale this triggers by default once the
    application side exceeds ~10 GB; locally we lower that threshold to
    prove the plan shape and that results are unchanged."""
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.queries import _t

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    li = _t(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = (_t(spark, SF_DIR, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT")
         .select("o_orderkey"))
    join = lambda: li.join(o, li.l_orderkey == o.o_orderkey)
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        plan = join()._jdf.queryExecution().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan
        filtered = join().count()
    finally:
        for k, v in saved.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))
    plan_off = join()._jdf.queryExecution().toString()
    assert "might_contain" not in plan_off
    assert filtered == join().count()


def test_versioned_table_audit_detects_corruption(spark, tmp_path):
    """write_audited commits an order-insensitive content fingerprint
    with the data; verify_audit passes on the intact table, fails after a
    data file disappears, and refuses tables written without an audit."""
    import glob
    import os

    import pytest
    from pyspark.sql import functions as F

    from peskas_malawi_data_pipeline_spark.core.io import VersionedParquetTable

    t = VersionedParquetTable(str(tmp_path / "t"))
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("s"))
    v = t.write_audited(df.repartition(4), meta={"job": "unit"})
    audit = t.verify_audit(spark)
    assert audit["rows"] == 100 and t.read_meta()["job"] == "unit"

    # column order must not matter to the fingerprint
    assert t._fingerprint(df.select("s", "id")) == audit

    # drop one data file -> mismatch
    part = sorted(glob.glob(os.path.join(t.data_dir(v), "part-*")))[0]
    os.remove(part)
    with pytest.raises(ValueError, match="audit mismatch"):
        t.verify_audit(spark)

    # plain write has no audit to verify
    t2 = VersionedParquetTable(str(tmp_path / "t2"))
    t2.write(df)
    with pytest.raises(ValueError, match="no recorded audit"):
        t2.verify_audit(spark)


def test_ann_baseline_artifact_staleness(spark, tmp_path, monkeypatch):
    """The persisted exact-L2 baseline must be reused across "sessions"
    (memo resets) while the corpus is unchanged, and REBUILT — not
    silently served stale — when the corpus content changes (even at
    identical row count / file size): the artifact's committed meta
    carries the corpus content fingerprint and a mismatch forces the
    all-pairs recompute."""
    from pyspark.sql import Row, functions as F

    import peskas_malawi_data_pipeline_spark.queries as Q

    monkeypatch.setenv("PESKAS_ANN_BASELINE_CACHE",
                       str(tmp_path / "cache"))
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)

    def write_corpus(shift):
        rows = [Row(vec_id=i,
                    embedding=[float((i * 7 + d + shift) % 13) / 10.0
                               for d in range(8)])
                for i in range(30)]
        (spark.createDataFrame(rows).repartition(1)
         .write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet"))

    def baseline():
        Q.reset_ann_artifact_memo()
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding")
        c = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
        return sorted((r.query_id, r.corpus_id) for r in
                      Q._exact_l2_baseline(spark, q, c, sf_dir).collect())

    write_corpus(0)
    first = baseline()
    art_root = tmp_path / "cache"
    slugs = list(art_root.iterdir())
    assert len(slugs) == 1
    v_after_first = (slugs[0] / "_CURRENT").read_text().strip()
    # unchanged corpus, fresh memo → artifact reused, no new version
    assert baseline() == first
    assert (slugs[0] / "_CURRENT").read_text().strip() == v_after_first

    # rewrite the corpus with DIFFERENT content (same shape/row count)
    write_corpus(3)
    second = baseline()
    assert second != first, "stale artifact served for a changed corpus"
    assert (slugs[0] / "_CURRENT").read_text().strip() != v_after_first


def test_ann_trained_artifact_staleness(spark, tmp_path, monkeypatch):
    """The persisted TRAINED artifacts (Lloyd codebooks / centroids /
    dim permutations, queries._ann_trained) must round-trip
    bit-identically across "sessions" (memo resets) while the corpus is
    unchanged — WITHOUT re-running training — and must be rebuilt when
    the corpus content changes at identical shape, exactly like the
    exact-L2 baseline artifact."""
    import json

    from pyspark.sql import Row, functions as F

    import peskas_malawi_data_pipeline_spark.queries as Q

    monkeypatch.setenv("PESKAS_ANN_BASELINE_CACHE",
                       str(tmp_path / "cache"))
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)

    def write_corpus(shift):
        rows = [Row(vec_id=i,
                    embedding=[float((i * 7 + d + shift) % 13) / 10.0
                               for d in range(8)])
                for i in range(40)]
        (spark.createDataFrame(rows).repartition(1)
         .write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet"))

    calls = {"n": 0}

    def trained():
        Q.reset_ann_artifact_memo()
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

        def build():
            calls["n"] += 1
            from peskas_malawi_data_pipeline_spark.operators import (
                similarity as sim_ops)
            return sim_ops.kmeans_centroids(
                emb,
                sim_ops.kmeans_lloyd(emb, id_col="vec_id", k=4,
                                     iterations=2),
                id_col="vec_id")

        c = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
        return Q._ann_trained(c, sf_dir, (sf_dir, "cents_test", 4, 2),
                              build)

    write_corpus(0)
    first = trained()
    assert calls["n"] == 1
    # fresh "session" (memo reset), unchanged corpus → disk hit,
    # NO retraining, exact dict round-trip (int keys and values)
    assert trained() == first
    assert calls["n"] == 1
    art_files = list((tmp_path / "cache").rglob("*.json"))
    assert len(art_files) == 1
    obj = json.loads(art_files[0].read_text())
    assert obj["corpus_fp"]["rows"] == 40

    # corpus rewrite at identical shape → fingerprint mismatch → retrain
    write_corpus(5)
    second = trained()
    assert calls["n"] == 2
    assert second != first, "stale trained artifact served"

    # a tuple-keyed artifact (PQ codebook) round-trips too
    Q.reset_ann_artifact_memo()
    cb = {(s, c_): [s, c_, s * c_] for s in (1, 2) for c_ in (1, 2, 3)}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    Q._ann_trained_store(c, sf_dir, (sf_dir, "cb_test", 2, 3), cb)
    assert Q._ann_trained_try_load(
        c, sf_dir, (sf_dir, "cb_test", 2, 3)) == cb

    # a trainer-ALGORITHM version bump must invalidate persisted
    # artifacts even on an unchanged corpus: the fingerprint guards data
    # changes, the version constant guards code changes
    monkeypatch.setattr(Q, "_ANN_TRAINER_VERSION",
                        Q._ANN_TRAINER_VERSION + 1)
    assert Q._ann_trained_try_load(
        c, sf_dir, (sf_dir, "cb_test", 2, 3)) is None


def test_ann_trained_artifact_corrupt_degrades(spark, tmp_path,
                                               monkeypatch):
    """A corrupt/truncated persisted trained-artifact file must degrade
    to retraining (never crash, never serve garbage), and the retrain
    must REPLACE the corrupt file so the next session hits disk again."""
    import json

    from pyspark.sql import Row, functions as F

    import peskas_malawi_data_pipeline_spark.queries as Q

    monkeypatch.setenv("PESKAS_ANN_BASELINE_CACHE",
                       str(tmp_path / "cache"))
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    rows = [Row(vec_id=i, embedding=[float((i * 3 + d) % 7)
                                     for d in range(4)])
            for i in range(20)]
    (spark.createDataFrame(rows).repartition(1)
     .write.parquet(f"{sf_dir}/embeddings.parquet"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return {1: [1, 2], 2: [3, 4]}

    def trained():
        Q.reset_ann_artifact_memo()
        return Q._ann_trained(c, sf_dir, (sf_dir, "corrupt_t", 1), build)

    first = trained()
    assert calls["n"] == 1
    art = next((tmp_path / "cache").rglob("*.json"))
    art.write_text("{ not json")          # truncated/corrupt artifact
    assert trained() == first             # degraded to retraining
    assert calls["n"] == 2
    json.loads(art.read_text())           # retrain REPLACED the file
    assert trained() == first             # and the next session disk-hits
    assert calls["n"] == 2


def test_pq_recall_fuse_gate_branches_identical(spark, tmp_path,
                                                monkeypatch):
    """ann_pq_recall's candidate-volume plan gate (fused multi-codebook
    scoring vs per-arm passes) must produce IDENTICAL rows on both
    branches — the gate is a physical-plan choice, never a semantic
    one."""
    from pyspark.sql import Row

    import peskas_malawi_data_pipeline_spark.queries as Q

    monkeypatch.setenv("PESKAS_ANN_BASELINE_CACHE",
                       str(tmp_path / "cache"))
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    rows = [Row(vec_id=i,
                embedding=[float((i * 13 + d * 5) % 17) / 4.0
                           for d in range(8)])
            for i in range(60)]
    (spark.createDataFrame(rows).repartition(1)
     .write.parquet(f"{sf_dir}/embeddings.parquet"))

    fn = Q.REGISTRY["ann_pq_recall"][0]

    def run():
        Q.reset_ann_artifact_memo()
        return sorted(map(tuple, fn(spark, sf_dir).collect()))

    monkeypatch.setattr(Q, "_PQ_FUSE_MAX_CANDIDATES", 10 ** 12)
    fused = run()
    monkeypatch.setattr(Q, "_PQ_FUSE_MAX_CANDIDATES", -1)
    per_arm = run()
    assert fused == per_arm
    assert len(fused) == 4

    # degenerate corpus: an arm with zero candidate rows is unreachable
    # (both arms ride one coded frame), because a rowless corpus raises
    # in codebook training BEFORE either branch builds — pin that the
    # exception is branch-independent (shape parity by exception)
    import pytest

    empty_dir = str(tmp_path / "sf_empty")
    os.makedirs(empty_dir)
    (spark.createDataFrame([], "vec_id long, embedding array<double>")
     .repartition(1).write.parquet(f"{empty_dir}/embeddings.parquet"))
    for gate in (10 ** 12, -1):
        monkeypatch.setattr(Q, "_PQ_FUSE_MAX_CANDIDATES", gate)
        Q.reset_ann_artifact_memo()
        with pytest.raises(ValueError, match="empty corpus"):
            fn(spark, empty_dir).collect()
