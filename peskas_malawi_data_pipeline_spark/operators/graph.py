"""Graph operators over edge-list DataFrames.

PageRank here is the canonical bounded-iteration algorithm shape on Spark:
per iteration ONE join (scores → edges) + ONE aggregation (sum of
neighbor contributions), both hash-partitioned on node id, with the static
relations (edges, out-degrees) checkpointed once up front so k iterations
touch only materialized inputs — never k re-evaluations of the upstream
plan (same lesson as dedup.connected_components).

Determinism: classic PageRank sums doubles, whose value depends on
partition-order association — unusable against a cross-engine oracle. The
integer formulation keeps scores in micro-units (bigint): contributions
are ``score div out_degree`` and the damping update is
``(100 - d)% · unit + (d% · Σcontrib) div 100`` — bigint sums are
order-insensitive, so any partitioning of any engine produces identical
scores. The quantization error vs float PageRank is ≤1 micro-unit per
iteration, irrelevant for ranking/centrality uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.barrier import materialize

UNIT = 1_000_000  # one PageRank point, in micro-units


def pagerank_integer(edges: DataFrame, iterations: int = 5,
                     damping_pct: int = 85,
                     src: str = "src", dst: str = "dst",
                     broadcast_scores: bool = True,
                     checkpoint_interval: int = 5) -> DataFrame:
    """Bounded-iteration integer PageRank over a directed edge list.

    Every node present as a source or destination participates; dangling
    nodes (no out-edges) contribute nothing (their mass leaks, the common
    simplification). Returns (id, score_micro).

    ``broadcast_scores=True`` ships the (id, score) frame to the edge
    partitions each round — the edge set, the big side, is never
    re-shuffled; the only exchange per round is the |nodes|-sized
    contribution aggregation. Right whenever nodes ≪ edges and the score
    frame fits executor memory (≤ low hundreds of millions of nodes).
    Beyond that, set False for the shuffled join and pre-partition both
    sides on the node id (the GraphX/Pregel regime).

    ``checkpoint_interval`` truncates lineage every N rounds; rounds in
    between stay LAZY so Catalyst fuses them into one job (each round's
    score frame is consumed exactly once — by the next round's broadcast —
    so nothing recomputes). Measured on the order↔part graph (noop-sink
    drain, so every output column is evaluated): fusing 5 rounds into one
    job vs materializing each is 4.4 s → 3.8 s at sf0.1 and 39 s → 13 s at
    10× that — per-round eager materialization costs O(|nodes|)
    serialization per round, so the fusion win GROWS with scale. Keep the
    interval bounded (default 5): unbounded lazy chaining makes analysis
    time and failure re-computation grow with iteration count."""
    nodes = materialize(edges.select(F.col(src).alias("id"))
                        .union(edges.select(F.col(dst).alias("id")))
                        .distinct())
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    # static per-edge frame: (src, dst, src out-degree), reused every round
    e = materialize(edges.select(src, dst).join(out_deg, src))

    base = F.lit((100 - damping_pct) * UNIT // 100).cast("long")
    scores = nodes.withColumn("score_micro", F.lit(UNIT).cast("long"))
    for i in range(iterations):
        s = F.broadcast(scores) if broadcast_scores else scores
        contrib = (e.join(s, e[src] == s.id)
                   .select(F.col(dst).alias("id"),
                           F.expr("score_micro div __deg").alias("__c")))
        gathered = contrib.groupBy("id").agg(F.sum("__c").alias("__sum"))
        # under broadcast_scores, gathered is node-sized too — broadcasting
        # it into the base-reinstating left join keeps the (checkpointed)
        # node frame unshuffled: zero wide exchanges per round beyond the
        # contribution aggregation itself
        if broadcast_scores:
            gathered = F.broadcast(gathered)
        scores = (nodes.join(gathered, "id", "left")
                  .select("id", (base + F.expr(
                      f"({damping_pct} * coalesce(__sum, 0L)) div 100"))
                      .alias("score_micro")))
        if (i + 1) % checkpoint_interval == 0 and i + 1 < iterations:
            scores = materialize(scores)
    return scores
