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

  test("UNsparsified triangle counts match a brute-force count at sf0.001") {
    // The query key sparsifies the near-complete co-activity graph 1/13
    // (documented in Graph.scala); this spec runs the SAME oriented-wedge
    // algorithm with keep = true on the full sf0.001 graph and checks it
    // against an in-memory brute-force triangle enumeration, proving the
    // sparsifier is a parameter, not a load-bearing part of the count.
    import org.apache.spark.sql.functions._
    val got = graft.operators.Graph.coActivityTriangles(spark, sf, lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val DAY_US = 86400L * 1000000L
    val act = Tables.events(spark, sf)
      .select(col("event_type"), expr(s"ts_us div $DAY_US").as("day"),
              col("user_id").as("u"))
      .distinct().collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val byBlock: Map[(String, Long), Seq[Long]] =
      act.groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).distinct.toSeq }
    val pairSet: Set[(Long, Long)] = byBlock.values.flatMap { us =>
      for (a <- us; b <- us if a < b) yield (a, b)
    }.toSet
    val adj = pairSet.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((u, v) <- pairSet; w <- adj(u) & adj(v) if w > v) {
      triCount(u) += 1; triCount(v) += 1; triCount(w) += 1
    }
    assert(triCount.valuesIterator.sum > 0, "fixture graph has no triangles")
    assert(got == triCount.toMap,
      s"diff: extra=${(got.toSet -- triCount.toSet).take(5)} " +
      s"missing=${(triCount.toSet -- got.toSet).take(5)}")
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
