package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates the four SqlSurface keys (VERDICT r11 #1 / r12 brief): each
  * key's result is pinned against an INDEPENDENT formulation of the
  * same computation on sf0.001, so the parser-surface forms (pipe
  * syntax, WITH RECURSIVE) can never drift from their classic twins.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  /** Collect with columns aligned by NAME (the driver's compare order),
    * preserving the query's own row order. */
  private def rows(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toSeq.map(_.toSeq)
  }

  test("sql_pipe: pipe-syntax form is value-identical to q1_pricing") {
    val pipe = SparkEntry.queries("sql_pipe")(spark, sf)
    val classic = SparkEntry.queries("q1_pricing")(spark, sf)
    assert(pipe.columns.sorted.toSeq == classic.columns.sorted.toSeq,
      "pipe and classic forms must expose the same column names")
    assert(rows(pipe) == rows(classic),
      "pipe-syntax result drifted from the classic q1_pricing result")
  }

  test("obs_metrics: observed values equal a direct aggregation of the input") {
    val got = SparkEntry.queries("obs_metrics")(spark, sf).collect()
    assert(got.length == 1)
    val direct = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate").cast("date") <=
                lit("2001-08-06").cast("date"))
      .agg(count(lit(1)).as("n_rows"),
           Tables.d(sum(Tables.dec(col("l_extendedprice")))).as("sum_price"),
           Tables.d(min(col("l_discount"))).as("min_disc"),
           Tables.d(max(col("l_tax"))).as("max_tax"))
      .collect()(0)
    assert(got(0).getLong(0) == direct.getLong(0), "n_rows")
    assert(got(0).getDouble(1) == direct.getDouble(1), "sum_price")
    assert(got(0).getDouble(2) == direct.getDouble(2), "min_disc")
    assert(got(0).getDouble(3) == direct.getDouble(3), "max_tax")
  }

  /** The per-customer (i, delta) sequence the rcte key folds over,
    * collected driver-side (Spark does the double->DECIMAL(38,6) cast,
    * so the spec replicates only the FOLD, not the cast). */
  private def deltaSeq: Array[(Long, Int, java.math.BigDecimal)] = {
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("cust"),
              row_number().over(
                Window.partitionBy("o_custkey")
                  .orderBy("o_orderdate", "o_orderkey")).as("i"),
              when(col("o_orderstatus") === "F", -col("o_totalprice"))
                .otherwise(col("o_totalprice"))
                .cast(Tables.DEC).as("delta"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2)))
  }

  private def foldClamped(cap: Option[java.math.BigDecimal])
      : Seq[(Long, Int, Double)] = {
    val zero = java.math.BigDecimal.ZERO
    deltaSeq.groupBy(_._1).toSeq.flatMap { case (cust, rs) =>
      var bal = zero
      rs.sortBy(_._2).map { case (_, i, delta) =>
        bal = bal.add(delta).max(zero)
        cap.foreach(c => bal = bal.min(c))
        (cust, i, bal.doubleValue())
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("rcte_running_clamp: recursion equals a hand-rolled two-sided-clamped fold") {
    val got = SparkEntry.queries("rcte_running_clamp")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    // Independent twin: fold bal_i = min(CAP, max(0, bal_{i-1} +
    // delta_i)) driver-side with exact java.math.BigDecimal arithmetic —
    // the semantics the recursive CTE claims.
    val cap = new java.math.BigDecimal(
      graft.operators.SqlSurface.RCTE_CAP)
    val want = foldClamped(Some(cap))
    assert(got.nonEmpty && got == want,
      s"fold mismatch; first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // Non-vacuity: the cap must BIND somewhere, else the two-sided
    // claim (and the reason recursion is needed at all) is vacuous.
    assert(got.exists(_._3 == cap.doubleValue()),
      s"cap ${cap} never binds on this fixture — two-sided clamp is vacuous")
  }

  test("one-shuffle distributed fold equals the recursion (the corpus-scale path)") {
    // The UnionLoop form costs ~depth sequential job rounds, each
    // re-joining the checkpointed seq table — fine as the SQL surface,
    // but at 100 TB the engine should fold in ONE shuffle: groupByKey
    // on the customer, sort the (small, calendar-bounded) per-key
    // group, run the clamp sequentially inside the task. This test
    // pins that distributed path value-identical to the recursive CTE,
    // exact-decimal included — the same demo/scale-twin split the
    // graph_reachability key uses.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cap = new java.math.BigDecimal(graft.operators.SqlSurface.RCTE_CAP)
    val zero = java.math.BigDecimal.ZERO
    val folded = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("cust"),
              row_number().over(
                Window.partitionBy("o_custkey")
                  .orderBy("o_orderdate", "o_orderkey")).as("i"),
              when(col("o_orderstatus") === "F", -col("o_totalprice"))
                .otherwise(col("o_totalprice"))
                .cast(Tables.DEC).as("delta"))
      .as[(Long, Int, java.math.BigDecimal)]
      .groupByKey(_._1)
      .flatMapGroups { (cust, it) =>
        var bal = zero
        it.toSeq.sortBy(_._2).map { case (_, i, delta) =>
          bal = bal.add(delta).max(zero).min(cap)
          (cust, i, bal.doubleValue())
        }
      }
      .collect().toSeq.sortBy(t => (t._1, t._2))
    val cte = SparkEntry.queries("rcte_running_clamp")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(folded.nonEmpty && folded == cte,
      s"one-shuffle fold diverges from the CTE; first diff: ${
        folded.zip(cte).find(p => p._1 != p._2)}")
  }

  test("floor-only clamp has the windowed closed form (why the cap is load-bearing)") {
    // bal_n = S_n - min(0, min_{1<=k<=n} S_k): without a cap the fold
    // is two window functions in ONE pass — no recursion needed. The
    // rcte key therefore carries a CAP; this test pins the claim that
    // motivates it, against the same driver-side exact-decimal fold.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cust").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val win = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("cust"),
              row_number().over(
                Window.partitionBy("o_custkey")
                  .orderBy("o_orderdate", "o_orderkey")).as("i"),
              when(col("o_orderstatus") === "F", -col("o_totalprice"))
                .otherwise(col("o_totalprice"))
                .cast(Tables.DEC).as("delta"))
      .withColumn("s", sum("delta").over(w))
      .withColumn("m", least(min(col("s")).over(w),
                             lit(0).cast(Tables.DEC)))
      .select(col("cust"), col("i"),
              (col("s") - col("m")).cast("double").as("bal"))
      .orderBy("cust", "i")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val want = foldClamped(None)
    assert(win.nonEmpty && win == want,
      s"closed form diverges from the floor-only fold; first diff: ${
        win.zip(want).find(p => p._1 != p._2)}")
  }

  test("plan shapes: BFS has no UnionLoop (no recursion row limit); rcte does") {
    // The scale claim as a plan property: the contract key's aggregated
    // frontier is 3 unrolled join+agg levels — no UnionLoop node, so
    // cteRecursionRowLimit can never abort it at any scale. The linear
    // recursion key, by contrast, MUST plan as Spark 4's UnionLoop.
    val bfs = SparkEntry.queries("graph_reachability")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!bfs.contains("UnionLoop"),
      s"BFS unexpectedly planned as recursive CTE:\n$bfs")
    val rcte = SparkEntry.queries("rcte_running_clamp")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(rcte.contains("UnionLoop"),
      s"rcte_running_clamp lost its UnionLoop recursion:\n$rcte")
  }

  test("graph_reachability: aggregated-frontier BFS equals the native recursive CTE") {
    // The contract key carries walk COUNTS per node (|V|-bounded per
    // level); the WITH RECURSIVE twin enumerates the walks themselves.
    // Identical (node, dist, n_walks) output proves the aggregation
    // rewrite is exact — the CTE form stays the sf0.001-only demo
    // because its walk enumeration hits cteRecursionRowLimit at scale.
    val bfs = SparkEntry.queries("graph_reachability")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val cte = graft.operators.SqlSurface.reachabilityCte(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(bfs.nonEmpty && bfs == cte,
      s"BFS/CTE mismatch; first diff: ${bfs.zip(cte).find(p => p._1 != p._2)}")
  }

  test("udtf_sql_table: the table function INLINES — no call survives, twin-identical") {
    val df = SparkEntry.queries("udtf_sql_table")(spark, sf)
    // the lateral call decorrelates into plain joins: the optimized
    // plan must carry no trace of the function (an optimizer black box
    // would); pushdown evidence is the segment filter reaching the join
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("graft_seg_orders"),
      s"SQL table function call survived optimization:\n$optimized")
    val twin = spark.sql(
      """SELECT m.seg, count(*) AS n_orders,
                CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                     AS DECIMAL(18,2)) AS revenue
         FROM (VALUES ('BUILDING'), ('MACHINERY')) AS m(seg)
         JOIN customer c ON c.c_mktsegment = m.seg
         JOIN orders o ON o.o_custkey = c.c_custkey
         WHERE o.o_totalprice > 100000
         GROUP BY m.seg ORDER BY m.seg""")
    assert(rows(df) == rows(twin),
      "lateral table-function result drifted from the direct-join twin")
  }

  test("SQL scripting: WHILE/SET, FOR-over-query, and IF all evaluate exactly") {
    spark.conf.set("spark.sql.scripting.enabled", "true")
    // WHILE + SET arithmetic: the canonical loop, exact
    assert(spark.sql("""
      BEGIN
        DECLARE total BIGINT DEFAULT 0;
        DECLARE i INT DEFAULT 1;
        WHILE i <= 10 DO
          SET total = total + i * i;
          SET i = i + 1;
        END WHILE;
        SELECT total AS sum_sq;
      END""").collect()(0).getLong(0) == 385L)
    // FOR over a query: row-by-row accumulation equals the aggregate
    assert(spark.sql("""
      BEGIN
        DECLARE acc BIGINT DEFAULT 0;
        FOR r AS SELECT id FROM range(1, 21) DO
          SET acc = acc + r.id;
        END FOR;
        SELECT acc;
      END""").collect()(0).getLong(0) == 210L)
    // IF branches on data: the loop leaves early via a labeled LEAVE
    assert(spark.sql("""
      BEGIN
        DECLARE n INT DEFAULT 0;
        loop_label: WHILE true DO
          SET n = n + 1;
          IF n >= 7 THEN
            LEAVE loop_label;
          END IF;
        END WHILE;
        SELECT n;
      END""").collect()(0).getInt(0) == 7)
  }
}
