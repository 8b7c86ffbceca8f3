package graft

import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  test("graph_degree: total degree mass equals 2x distinct edge count") {
    val degRows = SparkEntry.queries("graph_degree")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mass = degRows.map { case (d, n) => d * n }.sum
    import org.apache.spark.sql.functions._
    val o = Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.load(spark, sf, "lineitem")
    val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().count()
    assert(mass == 2 * pairs, s"degree mass $mass != 2 * $pairs")
  }

  test("graph_pagerank: ranks positive, bounded, and identical across reruns") {
    val run1 = SparkEntry.queries("graph_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(run1.length == 100)
    // damping bounds: rank in (0.15, 0.15 + 0.85 * N) — loose sanity
    assert(run1.forall(_._2 > 0.15))
    // rank list sorted desc with node tie-break (the declared contract)
    val sorted = run1.sortBy { case (n, r) => (-r, n) }
    assert(run1.toSeq == sorted.toSeq, "output not in declared order")
    // determinism: a second full evaluation yields byte-identical ranks
    val run2 = SparkEntry.queries("graph_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(run1.toSeq == run2.toSeq)
  }
}
