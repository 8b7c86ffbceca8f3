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

  /** Per-user triangle counts of the user co-activity graph (users
    * co-active on the same (event_type, day); non-bipartite, unlike the
    * customer↔supplier relation above), restricted to pairs satisfying
    * `keep` — the sparsifier parameter (`lit(true)` = the full graph).
    *
    * Algorithm: the degree-ORIENTED wedge count — the at-scale
    * formulation: orient every undirected edge from its (degree,
    * id)-smaller endpoint to the larger, so out-degrees are bounded and
    * no hub vertex explodes the wedge join (naive wedge-at-any-vertex
    * costs Σdeg²; orientation caps total work at O(m^1.5)). Wedges build
    * at the common LOW vertex and close with ONE hash join back on the
    * oriented edge set. Degree table is node-sized → broadcast.
    * Skew note: pair generation is a (type, day)-blocked self-join; a
    * pathologically hot block at corpus scale would route through the
    * same triangle-salted sub-blocking as DedupOps.skewSafeSelfPairs —
    * the wedge join itself is already hub-safe via the orientation. */
  private[graft] def coActivityTriangles(s: SparkSession, dir: String,
                                         keep: org.apache.spark.sql.Column)
      : DataFrame = {
    val DAY_US = 86400L * 1000000L
    val act = T.events(s, dir)
      .select(col("event_type"), expr(s"ts_us div $DAY_US").as("day"),
              col("user_id").as("u"))
      .distinct()
    val b = act.select(col("event_type").as("et2"), col("day").as("day2"),
                       col("u").as("v"))
    val pairs = act.join(b, col("event_type") === col("et2") &&
                            col("day") === col("day2") &&
                            col("u") < col("v") && keep)
      .select("u", "v").distinct()
      .localCheckpoint() // pair set feeds degrees + wedge legs ×3: cut once
    val deg = pairs.select(col("u").as("n"))
      .unionAll(pairs.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val wd = pairs
      .join(broadcast(deg.select(col("n").as("u"), col("d").as("du"))), "u")
      .join(broadcast(deg.select(col("n").as("v"), col("d").as("dv"))), "v")
    def key(d: String, i: String) =
      struct(col(d).as("kd"), col(i).as("ki"))
    val uLow = key("du", "u") < key("dv", "v")
    val oriented = wd.select(
      when(uLow, col("u")).otherwise(col("v")).as("src"),
      when(uLow, col("v")).otherwise(col("u")).as("dst"),
      when(uLow, key("dv", "v")).otherwise(key("du", "u")).as("dk"))
    val o2 = oriented.select(col("src").as("src2"), col("dst").as("c"),
                             col("dk").as("dk2"))
    val wedges = oriented.join(o2,
        col("src") === col("src2") && col("dk") < col("dk2"))
      .select(col("src").as("a"), col("dst").as("bb"), col("c"))
    val closer = oriented.select(col("src").as("b3"), col("dst").as("c3"))
    wedges.join(closer, col("bb") === col("b3") && col("c") === col("c3"))
      .select(explode(array(col("a"), col("bb"), col("c"))).as("user_id"))
      .groupBy("user_id").agg(count(lit(1)).as("n_triangles"))
      .orderBy("user_id")
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

    "graph_triangles" -> ((s, dir) =>
      // Deterministic sparsifier: at sf0.1 nearly every user pair is
      // co-active somewhere, making the graph ~complete (Θ(n³)
      // triangles — 65 s of explode, useless as a graph). Keeping 1/13
      // of pairs by a portable modular hash yields a sparse graph with
      // a non-trivial triangle population at every SF. The hash terms
      // are pre-reduced mod 13 so the product stays tiny: BIGINT ids at
      // corpus scale can never overflow (Spark non-ANSI would wrap
      // silently where DuckDB errors — advisor r8). GraphSpec runs the
      // same algorithm UNsparsified (keep = true) at sf0.001 against a
      // brute-force in-memory count.
      //
      // The predicate is phrased as v-residue == f(u-residue) — the
      // SAME set as (2u+v)%13 == 0 (7919 = 11^-1... rather 11 = -2 mod
      // 13) — because one side depends only on the left row and the
      // other only on the right: Catalyst extracts it as an EQUI join
      // key, so the blocked self-join hash-partitions on (type, day,
      // residue class) and never materializes the 12/13 of candidate
      // pairs the old post-join filter threw away.
      coActivityTriangles(s, dir,
        col("v") % 13 === (col("u") % 13 * 11) % 13)),

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

    "graph_triangles" ->
      // Unoriented 3-way join with a < b < c counts each triangle once —
      // the same set the oriented wedge algorithm produces.
      """WITH act AS (SELECT DISTINCT event_type,
                             epoch_us(ts) // 86400000000 AS day,
                             user_id AS u
                      FROM events),
          pairs AS (SELECT DISTINCT a.u AS u, b.u AS v
                    FROM act a JOIN act b
                      ON a.event_type = b.event_type AND a.day = b.day
                         AND a.u < b.u
                         AND (a.u % 13 * 7919 + b.u % 13) % 13 = 0),
          tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                  FROM pairs e1
                  JOIN pairs e2 ON e2.u = e1.v
                  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
          nodes AS (SELECT a AS n FROM tri
                    UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri)
         SELECT n AS user_id, count(*) AS n_triangles
         FROM nodes GROUP BY n ORDER BY user_id""",
  )
}
