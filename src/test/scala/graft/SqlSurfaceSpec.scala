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

  test("rcte_running_clamp: recursion equals a hand-rolled clamped fold") {
    val got = SparkEntry.queries("rcte_running_clamp")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

    // Independent twin: build the SAME per-customer (i, delta) sequence
    // (Spark does the double->DECIMAL(38,6) cast, so the spec replicates
    // only the FOLD, not the cast), then fold bal_i = max(0, bal_{i-1} +
    // delta_i) driver-side with exact java.math.BigDecimal arithmetic —
    // the semantics the recursive CTE claims.
    import org.apache.spark.sql.expressions.Window
    val seq = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("cust"),
              row_number().over(
                Window.partitionBy("o_custkey")
                  .orderBy("o_orderdate", "o_orderkey")).as("i"),
              when(col("o_orderstatus") === "F", -col("o_totalprice"))
                .otherwise(col("o_totalprice"))
                .cast(Tables.DEC).as("delta"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2)))
    val zero = java.math.BigDecimal.ZERO
    val want = seq.groupBy(_._1).toSeq.flatMap { case (cust, rs) =>
      var bal = zero
      rs.sortBy(_._2).map { case (_, i, delta) =>
        bal = bal.add(delta).max(zero)
        (cust, i, bal.doubleValue())
      }
    }.sortBy(t => (t._1, t._2))

    assert(got.nonEmpty && got == want,
      s"fold mismatch; first diff: ${got.zip(want).find(p => p._1 != p._2)}")
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
}
