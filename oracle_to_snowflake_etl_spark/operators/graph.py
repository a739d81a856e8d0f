"""Integer PageRank: fixed-point graph centrality with a full value
oracle.

The second class of iterative algorithm next to dedup_clusters'
transitive closure (operators/dedup.py): a NUMERIC fixed-point
iteration. Classic float PageRank cannot be differentially checked — the
per-node inbound SUM is float and order-dependent, so two engines (or
two partitionings!) disagree in the last ulp and the drift compounds
per iteration. The integer formulation removes every float:

    r0(v)   = SCALE div N
    contrib = r(u) div deg(u)          per edge u->v   (integer floor)
    r'(v)   = (15*SCALE) div (100*N)  +  (85 * sum(contrib)) div 100

Integer sums are exact and commutative, so a FIXED number of iterations
yields bit-identical ranks on any engine and any partitioning — the
DuckDB oracle is the same recurrence unrolled as chained CTEs. The
div-floor leaks a few units of rank mass per node per round (bounded by
deg+1 units of 1e-9); that is the price of exactness and is identical
on both sides.

Scale shape per iteration: one join edges x ranks (both partitioned on
the join key — the rank frame is repartitioned once, edges reuse their
shuffle) + one groupBy(dst) agg. Loop disciplines inherited from
dedup_clusters: localCheckpoint per round (truncate lineage — persist
leaves the plan growing), partition count sized from the measured edge
count, never from the upstream corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000


def pagerank_int(edges: DataFrame, iterations: int = 5,
                 scale: int = PR_SCALE,
                 n_parts: int | None = None,
                 checkpoint_every: int = 1) -> DataFrame:
    """(node, rank_q) after ``iterations`` rounds over a DIRECTED edge
    list (src, dst). rank_q is the rank scaled by ``scale``. Every node
    must have out-degree >= 1 (feed an undirected/self-looped list for
    graphs with sinks — dangling-mass redistribution is a modeling
    choice that belongs at the call site). ``n_parts`` overrides the
    iteration partition count (tools/ab_pagerank.py measures rules).
    ``checkpoint_every``: localCheckpoint the rank frame every Nth
    round instead of every round — trades one materialization job per
    skipped round against a 2-round lineage in the next join (results
    identical; tools/ab_pagerank_ckpt.py measures the trade)."""
    edges = edges.select("src", "dst").persist()
    n_edges = edges.count()
    # size from measured edges: ~250k edges/partition, floor 4 so a
    # mid-size graph never serializes, cap 1024 (~1M/partition at a
    # billion edges). The round-5 interleaved A/B (tools/ab_pagerank.py,
    # results in PLANS.md) re-measured this rule against the r3
    # defaultParallelism floor back-to-back: at sf0.1 (176,784 edges) the
    # two are within noise of each other (the r4 "25% slower" claim and
    # the r4 bench's +35% regression were BOTH host noise); the
    # edge-derived rule stays because small per-round tasks pay pure
    # scheduler latency at this size and the rule converges to the same
    # per-partition volume at scale.
    if n_parts is None:
        n_parts = int(max(4, min(1024, n_edges // 250_000 + 1)))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # loop-invariant: the degree-annotated edge list, partitioned on the
    # join key so every iteration's edges-x-ranks join reuses this
    # layout instead of re-deriving (and re-shuffling) it per round
    ed = (edges.join(deg, "src").repartition(n_parts, "src")
          .persist())
    # checkpoint: the node set feeds EVERY round's rank rebuild — left
    # un-materialized it re-runs the 'distinct over all edges' per round
    nodes = (edges.select(F.col("src").alias("node")).distinct()
             .repartition(n_parts, "node").localCheckpoint())
    n_nodes = nodes.count()
    base = (15 * scale) // (100 * n_nodes)
    ranks = nodes.withColumn(
        "r", F.lit(scale // n_nodes).cast("long")).localCheckpoint()
    try:
        for i in range(iterations):
            contrib = (ed.join(ranks, ed.src == ranks.node)
                       .select("dst", F.expr("r div deg").alias("c"))
                       .groupBy("dst").agg(F.sum("c").alias("s")))
            ranks = (nodes.join(contrib, nodes.node == contrib.dst, "left")
                     .select("node",
                             (F.lit(base)
                              + F.expr("(85 * coalesce(s, 0)) div 100"))
                             .cast("long").alias("r")))
            if (i + 1) % max(1, checkpoint_every) == 0 \
                    or i == iterations - 1:
                ranks = ranks.localCheckpoint()
        return ranks.select("node", F.col("r").alias("rank_q"))
    finally:
        edges.unpersist()
        ed.unpersist()


def bipartite_edges_sql(iterations: int = 5, scale: int = PR_SCALE,
                        k: int = 20) -> str:
    """DuckDB oracle for :func:`pagerank_int` over the orders<->suppliers
    bipartite graph from lineitem (node ids: 2*orderkey / 2*suppkey+1),
    the recurrence unrolled as chained CTEs — top-k by (rank, node)."""
    ctes = ["""
    edges AS (
      SELECT DISTINCT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      UNION ALL
      SELECT DISTINCT l_suppkey * 2 + 1, l_orderkey * 2 FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST({scale} // n AS BIGINT) AS r
           FROM nodes CROSS JOIN nn)""".format(scale=scale)]
    for i in range(1, iterations + 1):
        ctes.append("""
    r{i} AS (
      SELECT node,
             CAST((CAST(15 AS BIGINT) * {scale}) // (100 * n)
                  + (85 * COALESCE(s, 0)) // 100 AS BIGINT) AS r
      FROM nodes CROSS JOIN nn
      LEFT JOIN (SELECT dst, CAST(SUM(r // deg) AS BIGINT) AS s
                 FROM edges JOIN deg USING (src)
                 JOIN r{p} ON node = src
                 GROUP BY dst) c ON node = dst)""".format(
            i=i, p=i - 1, scale=scale))
    return ("WITH" + ",".join(ctes)
            + f"""
    SELECT node, r AS rank_q FROM r{iterations}
    ORDER BY rank_q DESC, node LIMIT {k}""")
