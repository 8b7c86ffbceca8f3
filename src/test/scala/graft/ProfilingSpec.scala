package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  test("BitmapDistinct aggregator: reduce/merge/finish vs Set semantics") {
    import operators.Profiling.BitmapDistinct
    val rnd = new scala.util.Random(42)
    val keys = Seq.fill(5000)(rnd.nextInt(3000).toLong)
    // split into uneven chunks so merge sees buffers of different lengths
    val chunks = keys.grouped(733).toSeq
    val buffers = chunks.map(_.foldLeft(BitmapDistinct.zero)(BitmapDistinct.reduce))
    val mergedLR = buffers.reduceLeft(BitmapDistinct.merge)
    val mergedRL = buffers.reverse.reduceLeft(BitmapDistinct.merge)
    assert(BitmapDistinct.finish(mergedLR) == keys.toSet.size.toLong)
    assert(BitmapDistinct.finish(mergedRL) == keys.toSet.size.toLong)
    // boundary bits: word edges 63/64 and the zero key
    val edge = Seq(0L, 63L, 64L, 127L, 128L, 63L, 0L)
      .foldLeft(BitmapDistinct.zero)(BitmapDistinct.reduce)
    assert(BitmapDistinct.finish(edge) == 5L)
  }

  test("agg_bitmap_distinct matches countDistinct on the cluster path") {
    val got = SparkEntry.queries("agg_bitmap_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct(col("l_suppkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("profile_table: 5 column-pruned scans, never the ×5 Expand multiplier") {
    // r8 redesign: one base-stats scan + one single-distinct agg per
    // column. Columnar parquet makes the per-column rescans ~free;
    // the alternative (4 countDistincts in one agg) Expands the single
    // scan ×5 BEFORE the shuffle — 4 extra full-table shuffle volumes
    // at 100 TB.
    val df = SparkEntry.queries("profile_table")(spark, sf)
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 5, s"expected 5 scans, got ${scans.size}")
    assert(!df.queryExecution.executedPlan.toString.contains("Expand"))
    assert(df.count() == 4)
  }
}
