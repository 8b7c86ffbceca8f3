package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}

/** SURVEY.md §2 — round-11 Spark-4 SQL-surface breadth: the query
  * capabilities a reference user reaches for BEFORE hand-rolling
  * DataFrame code.
  *
  *  - `rcte_running_clamp`: `WITH RECURSIVE` (Spark 4's recursive
  *    CTE, planned as `UnionLoopExec`) — linear recursion
  *    (out-degree-1 chains), which never explodes. Probed limitation
  *    on 4.1.2: only UNION ALL recursion is supported — `UNION`
  *    (distinct) raises `UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE`, so
  *    frontier-deduplicating fixpoints (full transitive closure /
  *    connected components) are NOT natively expressible; that is why
  *    `dedup_cc` keeps its hand-rolled pointer-jumping loop as the
  *    corpus-scale path.
  *  - `graph_reachability`: since round 12 the contract key is a
  *    level-synchronous DataFrame BFS whose frontier carries walk
  *    COUNTS (|V|-bounded per level); the `WITH RECURSIVE` form
  *    survives only as [[reachabilityCte]], the sf0.001 spec oracle —
  *    its UNION ALL recursion enumerates walks and would abort on
  *    `cteRecursionRowLimit` at scale.
  *  - `sql_pipe`: SQL pipe syntax (`|>`), the Spark-4 parser surface —
  *    the q1 pricing report re-phrased as a pipeline, same oracle.
  *  - `obs_metrics`: `Dataset.observe` + `Observation` — zero-cost
  *    production metrics collected DURING a pass (no second scan; the
  *    aggregates ride the task completion listener), emitted here as
  *    the query result so the oracle can check the observed values
  *    against a real aggregation.
  */
object SqlSurface extends QueryModule {

  /** Balance cap for `rcte_running_clamp` — sized to BIND on the
    * fixture (single o_totalprice values range ~1k-550k, so runs of
    * non-'F' orders exceed it routinely); a cap that never binds would
    * leave the two-sided-clamp claim vacuous (SqlSurfaceSpec asserts
    * it binds). */
  private[graft] val RCTE_CAP = "200000"

  /** Distinct urgent customer↔supplier pairs (same relation as
    * Graph.edges), materialized ONCE so each BFS level (or recursion
    * step, in the CTE demo) joins a checkpointed 120k-row table instead
    * of re-executing the lineitem⋈orders distinct per level — at 100 TB
    * the frontier inputs must be materialized exactly like this
    * (UnionLoopExec re-executes referenced plans every iteration). */
  private def stageCs(s: SparkSession, dir: String): DataFrame = {
    val o = T.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_custkey")
    val li = T.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val cs = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("c"),
              (col("l_suppkey") + 10000000L).as("sp"))
      .distinct()
      .localCheckpoint()
    cs.createOrReplaceTempView("graft_rcte_cs")
    cs
  }

  /** The `WITH RECURSIVE` (UnionLoopExec) form of graph_reachability —
    * kept as the parser-surface demo and as the spec's independent
    * oracle twin on sf0.001, NOT as the contract implementation: UNION
    * ALL recursion enumerates WALKS (~366k at sf0.1 against the engine's
    * 1M `cteRecursionRowLimit`), so at 100× the seed set / edge density
    * this form ABORTS on the row-limit guard by design. The contract key
    * below computes the identical answer with a level-synchronous
    * aggregated frontier that is |V|-bounded per level at any scale.
    * SqlSurfaceSpec pins the two byte-equal on sf0.001. */
  private[graft] def reachabilityCte(s: SparkSession, dir: String): DataFrame = {
    stageCs(s, dir)
    s.sql("""
      WITH RECURSIVE
        edges AS (SELECT c AS src, sp AS dst FROM graft_rcte_cs
                  UNION ALL
                  SELECT sp AS src, c AS dst FROM graft_rcte_cs),
        reach(node, lvl) AS (
          SELECT DISTINCT c, 0 FROM graft_rcte_cs WHERE c % 500 = 1
          UNION ALL
          SELECT e.dst, r.lvl + 1
          FROM reach r JOIN edges e ON e.src = r.node
          WHERE r.lvl < 3)
      SELECT node, min(lvl) AS dist, count(*) AS n_walks
      FROM reach GROUP BY node ORDER BY node""")
  }

  /** Level-synchronous walk-counting BFS: from `seeds` (one `node`
    * column) over directed `edges` (`src`, `dst`), returns
    * (node, dist, n_walks) where dist = min level reaching the node
    * and n_walks = number of distinct ≤`depth`-hop walks ending
    * there. Scale-safe formulation (VERDICT r11): instead of
    * enumerating walks (the WITH RECURSIVE form above — walk count
    * grows with edge density and ABORTS on cteRecursionRowLimit at
    * 100×), the frontier carries walk COUNTS aggregated per node —
    * W_{l+1}(dst) = Σ_{src→dst} W_l(src) — so every level is one hash
    * join + one partial-agg shuffle bounded by |V| rows REGARDLESS of
    * walk count, and n_walks = Σ_l W_l, dist = min level with
    * W_l > 0. A few levels of lineage over a (caller-checkpointed)
    * edge table need no per-level checkpoint. Name-based resolution
    * throughout: from level 2 on, the frontier's lineage CONTAINS
    * edges, so a stale Dataset reference like edges("dst") is
    * ambiguous under self-join dedup (the r12 AnalysisException);
    * renaming node→src and joining on the column NAME lets Spark's
    * DeduplicateRelations re-key the repeated subtree while every
    * select resolves against the join output. GraphSpec
    * property-tests this against a driver-side reference on seeded
    * random graphs. */
  private[graft] def walkBfs(edges: DataFrame, seeds: DataFrame,
                             depth: Int): DataFrame = {
    var frontier = seeds.distinct()
      .select(col("node"), lit(1L).as("walks"), lit(0).as("lvl"))
    var acc = frontier
    for (l <- 1 to depth) {
      frontier = frontier
        .select(col("node").as("src"), col("walks"))
        .join(edges, "src")
        .select(col("dst").as("node"), col("walks"))
        .groupBy("node")
        .agg(sum("walks").as("walks"))
        .select(col("node"), col("walks"), lit(l).as("lvl"))
      acc = acc.unionAll(frontier)
    }
    acc.groupBy("node")
      .agg(min("lvl").as("dist"), sum("walks").as("n_walks"))
      .orderBy("node")
  }

  val queries: Map[String, Q] = Map(
    "graph_reachability" -> ((s, dir) => {
      // Level-capped BFS from a deterministic seed set (customers with
      // custkey % 500 = 1) over the urgent customer↔supplier graph —
      // see [[walkBfs]] for the scale story.
      val cs = stageCs(s, dir)
      val edges = cs.select(col("c").as("src"), col("sp").as("dst"))
        .unionAll(cs.select(col("sp").as("src"), col("c").as("dst")))
        .localCheckpoint() // probed 3×, one materialization
      val seeds = cs.select(col("c").as("node"))
        .filter(col("node") % 500 === 1)
      walkBfs(edges, seeds, 3)
    }),

    "rcte_running_clamp" -> ((s, dir) => {
      // TWO-SIDED-clamped running balance per customer: bal_i =
      // least(CAP, greatest(0, bal_{i-1} + delta_i)) over date-ordered
      // orders. The two-sidedness is load-bearing for the "recursion is
      // the right tool" claim: a FLOOR-only clamp has the classic
      // prefix-sum closed form bal_n = S_n - min_{0<=k<=n} S_k (two
      // window functions, one pass — SqlSurfaceSpec proves it), so a
      // zero-floor fold would NOT need recursion. Add the cap and each
      // step is x -> min(CAP, max(0, x+d)); compositions stay in the
      // 3-parameter family min(b, max(a, x+c)) but a one-pass window
      // rewrite needs a max over all split points j of
      // min(CAP + S_n - S_j, ...) — O(n) state per row, not a frame
      // aggregate — so the fold is genuinely sequential per key.
      // Linear recursion: each level advances every chain by one
      // element, so total work is exactly one row per order (150k at
      // sf0.1, no explosion) and depth = max orders per customer
      // (25 « the 100-level guard). Exactness: deltas cast to
      // DECIMAL(38,6) once, every step re-cast to DECIMAL(38,6), so
      // both engines fold identical exact decimals; DOUBLE only at
      // the emit boundary.
      T.load(s, dir, "orders")
        .select(col("o_custkey").as("cust"),
                row_number().over(
                  Window.partitionBy("o_custkey")
                    .orderBy("o_orderdate", "o_orderkey")).as("i"),
                when(col("o_orderstatus") === "F",
                     -col("o_totalprice"))
                  .otherwise(col("o_totalprice"))
                  .cast(T.DEC).as("delta"))
        .localCheckpoint()
        .createOrReplaceTempView("graft_rcte_seq")
      s.sql(s"""
        WITH RECURSIVE walk(cust, i, bal) AS (
          SELECT cust, i,
                 CAST(least(CAST($RCTE_CAP AS DECIMAL(38,6)),
                            greatest(CAST(0 AS DECIMAL(38,6)), delta))
                      AS DECIMAL(38,6))
          FROM graft_rcte_seq WHERE i = 1
          UNION ALL
          SELECT /*+ BROADCAST(w) */ s.cust, s.i,
                 CAST(least(CAST($RCTE_CAP AS DECIMAL(38,6)),
                            greatest(CAST(0 AS DECIMAL(38,6)),
                                     w.bal + s.delta))
                      AS DECIMAL(38,6))
          FROM walk w JOIN graft_rcte_seq s
            ON s.cust = w.cust AND s.i = w.i + 1)
        SELECT cust, i, CAST(bal AS DOUBLE) AS bal
        FROM walk ORDER BY cust, i""")
    }),

    "sql_pipe" -> ((s, dir) => {
      // q1_pricing re-phrased in Spark 4 pipe syntax — scan |> filter
      // |> aggregate |> order, each stage a prefix of the next. Parser
      // surface only: the plan (and the oracle) are q1_pricing's, and
      // SqlSurfaceSpec pins twin equality, so the pipe form can never
      // drift from the classic form. One SQL-text trap vs the Column
      // API: `10000.0` parses as DECIMAL(6,1) (not a Double literal),
      // so stable4's division needs an explicit DOUBLE cast to keep
      // the emit type DOUBLE like q1_pricing's.
      T.views(s, dir, "lineitem")
      def q1d(inner: String) =
        s"CAST(sum(CAST($inner AS DECIMAL(38,6))) AS DOUBLE)"
      s.sql(s"""
        FROM lineitem
        |> WHERE CAST(l_shipdate AS DATE) <= DATE '2001-08-06'
        |> AGGREGATE
             ${q1d("l_quantity")} AS sum_qty,
             ${q1d("l_extendedprice")} AS sum_base_price,
             ${q1d("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${q1d("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}
               AS sum_charge,
             CAST(${T.stable4Sql(s"${q1d("l_quantity")} / count(*)")}
                  AS DOUBLE) AS avg_qty,
             CAST(${T.stable4Sql(s"${q1d("l_discount")} / count(*)")}
                  AS DOUBLE) AS avg_disc,
             count(*) AS count_order
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus""")
    }),

    "sql_exec_immediate" -> ((s, dir) => {
      // EXECUTE IMMEDIATE (r16) — parameterized DYNAMIC SQL, the
      // injection-safe template surface (the JDBC PreparedStatement
      // analog inside the engine): the SQL text is a value, parameters
      // bind by NAME from a declared SESSION VARIABLE (:floor) and
      // from a literal (:excl) — never string concatenation. Binding
      // happens before analysis, so the parameter lands as a foldable
      // literal and pushdown/pruning see a constant predicate exactly
      // as in the static twin. The sum is decimal-pinned then routed
      // through the §2.0 STRING->DOUBLE convention: r16's driver gate
      // hash-mismatched the DECIMAL(18,2) emit (rows+schema matched;
      // every local typed check passed), so the output representation
      // is pinned to DOUBLE the same way as the other 314 keys.
      graft.Tables.views(s, dir, "customer")
      s.sql("DECLARE OR REPLACE VARIABLE bal_floor DOUBLE DEFAULT 5000.0")
      s.sql("""EXECUTE IMMEDIATE
                 'SELECT c_mktsegment, count(*) AS n_cust,
                         CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                                   AS STRING) AS DOUBLE) AS total_bal
                  FROM customer
                  WHERE c_acctbal >= :floor AND c_mktsegment <> :excl
                  GROUP BY c_mktsegment
                  ORDER BY c_mktsegment'
               USING bal_floor AS floor, 'MACHINERY' AS excl""")
    }),

    "obs_metrics" -> ((s, dir) => {
      // Production observability: metrics computed by the SAME pass
      // that does the work (Dataset.observe plants a CollectMetrics
      // node; values arrive via the listener bus when the action
      // completes — no second scan of a 100 TB input). The pass here is
      // a noop-sink write (the "run the pipeline" stand-in); the
      // observed values are then emitted as the result row, so the
      // driver's DuckDB oracle independently re-aggregates the table
      // and checks what the listener reported.
      val obs = Observation()
      val pass = obsPass(s, dir, obs)
      pass.write.format("noop").mode("overwrite").save()
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
           m("sum_price").asInstanceOf[Double],
           m("min_disc").asInstanceOf[Double],
           m("max_tax").asInstanceOf[Double]))
        .toDF("n_rows", "sum_price", "min_disc", "max_tax")
    }),
  )

  /** The observed pass behind `obs_metrics`, exposed so `graft.Plans`
    * can dump the plan that carries the `CollectMetrics` node (the
    * query's own result is a 1-row local relation of the values the
    * listener delivered — correct, but planless). A fresh
    * [[Observation]] per call: an Observation binds to one action. */
  private[graft] def obsPass(s: SparkSession, dir: String,
                             obs: Observation): DataFrame =
    T.load(s, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") <=
                lit("2001-08-06").cast("date"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        T.d(sum(T.dec(col("l_extendedprice")))).as("sum_price"),
        T.d(min(col("l_discount"))).as("min_disc"),
        T.d(max(col("l_tax"))).as("max_tax"))

  private val csSql =
    """SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS sp
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderpriority = '1-URGENT'"""

  val oracles: Map[String, String] = Map(
    "graph_reachability" ->
      s"""WITH RECURSIVE
            cs AS ($csSql),
            edges AS (SELECT c AS src, sp AS dst FROM cs
                      UNION ALL
                      SELECT sp AS src, c AS dst FROM cs),
            reach(node, lvl) AS (
              SELECT DISTINCT c, 0 FROM cs WHERE c % 500 = 1
              UNION ALL
              SELECT e.dst, r.lvl + 1
              FROM reach r JOIN edges e ON e.src = r.node
              WHERE r.lvl < 3)
          SELECT node, min(lvl) AS dist, count(*) AS n_walks
          FROM reach GROUP BY node ORDER BY node""",

    "rcte_running_clamp" ->
      s"""WITH RECURSIVE
           seq AS (SELECT o_custkey AS cust,
                          row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS i,
                          CAST(CASE WHEN o_orderstatus = 'F'
                                    THEN -o_totalprice
                                    ELSE o_totalprice END
                               AS DECIMAL(38,6)) AS delta
                   FROM orders),
           walk(cust, i, bal) AS (
             SELECT cust, i,
                    CAST(least(CAST($RCTE_CAP AS DECIMAL(38,6)),
                               greatest(CAST(0 AS DECIMAL(38,6)), delta))
                         AS DECIMAL(38,6))
             FROM seq WHERE i = 1
             UNION ALL
             SELECT s.cust, s.i,
                    CAST(least(CAST($RCTE_CAP AS DECIMAL(38,6)),
                               greatest(CAST(0 AS DECIMAL(38,6)),
                                        w.bal + s.delta))
                         AS DECIMAL(38,6))
             FROM walk w JOIN seq s ON s.cust = w.cust AND s.i = w.i + 1)
         SELECT cust, i, CAST(CAST(bal AS STRING) AS DOUBLE) AS bal
         FROM walk ORDER BY cust, i""",

    "sql_pipe" -> {
      def q1d(inner: String) =
        s"CAST(CAST(sum(CAST($inner AS DECIMAL(38,6))) AS STRING) AS DOUBLE)"
      s"""SELECT l_returnflag, l_linestatus,
                 ${q1d("l_quantity")} AS sum_qty,
                 ${q1d("l_extendedprice")} AS sum_base_price,
                 ${q1d("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
                 ${q1d("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
                 ${T.stable4Sql(s"${q1d("l_quantity")} / count(*)")} AS avg_qty,
                 ${T.stable4Sql(s"${q1d("l_discount")} / count(*)")} AS avg_disc,
                 count(*) AS count_order
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) <= DATE '2001-08-06'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus"""
    },

    "sql_exec_immediate" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
                CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                          AS STRING) AS DOUBLE) AS total_bal
         FROM customer
         WHERE c_acctbal >= 5000.0 AND c_mktsegment <> 'MACHINERY'
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",

    "obs_metrics" ->
      """SELECT count(*) AS n_rows,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6)))
                          AS STRING) AS DOUBLE) AS sum_price,
                CAST(min(l_discount) AS DOUBLE) AS min_disc,
                CAST(max(l_tax) AS DOUBLE) AS max_tax
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) <= DATE '2001-08-06'""",
  )
}
