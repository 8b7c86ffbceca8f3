package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2 — graph analytics over the customer↔supplier relation
  * implied by orders×lineitem (an undirected bipartite graph: an edge
  * links a customer to every supplier that served one of their orders).
  *
  * `graph_pagerank` is the canonical ITERATIVE distributed computation:
  * each of the 5 fixed-point sweeps is one shuffle (contributions grouped by
  * destination) joined against the static, pre-partitioned edge list.
  * Cross-engine determinism: per-edge contributions are quantized to
  * DECIMAL(28,10) BEFORE the sum (the WeightedMean recipe), so the
  * per-destination sum is exact and partition-order-invariant, and the
  * damping step is pure IEEE double arithmetic on identical inputs.
  * At 100 TB you would persist/checkpoint ranks between iterations to
  * cut lineage — here the 10-deep plan is left to Catalyst, which keeps
  * the edge side's exchange reused across iterations.
  */
object Graph extends QueryModule {

  private val ITERS = 5
  private val DAMP = 0.85

  /** Distinct undirected customer↔supplier edges, encoded as directed
    * both ways: node ids are disjoint (customer = key, supplier =
    * 10^7 + key). */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val o = T.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_custkey")
    val li = T.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val cs = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("c"),
              (col("l_suppkey") + 10000000L).as("sp"))
      .distinct()
    cs.select(col("c").as("src"), col("sp").as("dst"))
      .unionAll(cs.select(col("sp").as("src"), col("c").as("dst")))
  }

  val queries: Map[String, Q] = Map(
    "graph_degree" -> ((s, dir) =>
      // Degree distribution — n_nodes per degree, the first diagnostic
      // on any graph (skew detection before the iterative job). Two
      // partial-aggregable shuffles: degree per node, then nodes per
      // degree.
      edges(s, dir)
        .groupBy("src").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")),

    "graph_pagerank" -> ((s, dir) => {
      // Pregel-style lineage truncation (see connectedComponents): the
      // distinct pair set materializes ONCE (half the size of the
      // directed edge list — the union + degrees derive from it via
      // BROADCAST joins, no second big shuffle); each iteration's rank
      // frontier is checkpointed so iteration i+1's plan starts from
      // materialized partitions instead of re-embedding iterations 1..i
      // (measured 20 s -> ~8 s at sf0.1).
      val o = T.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_custkey")
      val li = T.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val csC = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("o_custkey").as("c"),
                (col("l_suppkey") + 10000000L).as("sp"))
        .distinct()
        .localCheckpoint(true)
      val degC = csC.groupBy("c").agg(count(lit(1)).as("deg"))
      val degS = csC.groupBy("sp").agg(count(lit(1)).as("deg"))
      val withDeg = csC.join(broadcast(degC), "c")
        .select(col("c").as("src"), col("sp").as("dst"), col("deg"))
        .unionAll(csC.join(broadcast(degS), "sp")
          .select(col("sp").as("src"), col("c").as("dst"), col("deg")))
      var ranks = degC.select(col("c").as("node"), lit(1.0).as("rank"))
        .unionAll(degS.select(col("sp").as("node"), lit(1.0).as("rank")))
      for (_ <- 1 to ITERS) {
        val contribs = withDeg
          .join(ranks, withDeg("src") === ranks("node"))
          .select(col("dst"),
                  (col("rank") / col("deg")).cast("decimal(28,10)").as("ct"))
        // literal 0.15/0.85 (NOT 1.0-DAMP: Scala computes
        // 0.15000000000000002, the SQL literal parses to double 0.15)
        ranks = contribs.groupBy("dst")
          .agg((lit(0.15) +
                lit(0.85) * sum(col("ct")).cast("double")).as("rank"))
          .select(col("dst").as("node"), col("rank"))
          .localCheckpoint() // eager: lazy variants re-embed lineage and measured slower
      }
      // emit top-100 by rank with deterministic tie-break on node id
      ranks.select(col("node"), T.stable4(col("rank")).as("rank_r"))
        .orderBy(col("rank_r").desc, col("node")).limit(100)
    }),
  )

  private val edgesSql =
    """cs AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS sp
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderpriority = '1-URGENT'),
       edges AS (SELECT c AS src, sp AS dst FROM cs
                 UNION ALL SELECT sp AS src, c AS dst FROM cs),
       deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)"""

  /** The oracle unrolls the iterations as chained CTEs (aggregates
    * are not allowed in a recursive CTE term), mirroring the quantized
    * contribution sum exactly. */
  private val pagerankSql = {
    val iters = (1 to ITERS).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (SELECT e.dst AS node,
                    0.15 + 0.85 * CAST(sum(CAST(r.rank / e.deg
                      AS DECIMAL(28,10))) AS DOUBLE) AS rank
                  FROM (SELECT edges.src, edges.dst, deg.deg
                        FROM edges JOIN deg ON edges.src = deg.src) e
                  JOIN $prev r ON e.src = r.node
                  GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
        r0 AS (SELECT src AS node, 1.0 AS rank FROM deg),
        $iters
        SELECT node, ${T.stable4Sql("rank")} AS rank_r
        FROM r$ITERS ORDER BY rank_r DESC, node LIMIT 100"""
  }

  val oracles: Map[String, String] = Map(
    "graph_degree" ->
      s"""WITH $edgesSql
          SELECT deg AS degree, count(*) AS n_nodes
          FROM deg GROUP BY deg ORDER BY degree""",

    "graph_pagerank" -> pagerankSql,
  )
}
