package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of z-ordering is per-file min/max envelopes bounded in BOTH
  * dimensions. Split the same events into 8 range partitions — once by
  * the z key, once by user_id alone — and measure each partition's
  * normalized span in each dim (parquet row-group stats in miniature).
  *
  * The z guarantee is statistical, not per-file: repartitionByRange
  * draws sampled boundaries, so a partition straddling a major z-octant
  * boundary (where a top interleaved bit flips) legitimately spans
  * nearly the full range in one dim — exactly as in lakehouse
  * OPTIMIZE ZORDER output. So the z side asserts MOST partitions are
  * bounded in both dims, while the single-key layout is provably
  * full-range in the non-sort dim on this fixture (uniform ts per
  * user), so a time predicate prunes nothing there. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  private def spans(df: DataFrame, key: String): DataFrame =
    df.repartitionByRange(8, col(key))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("user_id") - min("user_id")).as("u_span"),
           (max("ts_us") - min("ts_us")).as("t_span"))

  test("z-clustered files bound both dims; user-sorted files don't bound ts") {
    val ez = graft.operators.Layout.withZ(spark, sf)
      .select("event_id", "user_id", "ts_us", "z").cache()
    try {
      val b = ez.agg((max("user_id") - min("user_id")).cast("double").as("u"),
                     (max("ts_us") - min("ts_us")).cast("double").as("t"))
        .collect()(0)
      val uRange = b.getDouble(0)
      val tRange = b.getDouble(1)

      val zS = spans(ez, "z").collect()
      val uS = spans(ez, "user_id").collect()
      assert(zS.length == 8 && uS.length == 8)

      // Most z-partitions: strictly sub-range in BOTH dims. With 8 range
      // slices of a 20-bit interleaved key the top 3 bits split u into
      // halves/quarters and t into halves — 0.75 is a loose bound; up to
      // two sampled boundaries may straddle an octant edge (see scaladoc).
      val zBounded = zS.count(r =>
        r.getLong(1) <= 0.75 * uRange && r.getLong(2) <= 0.75 * tRange)
      assert(zBounded >= 6, {
        val detail = zS.map(r => f"z${r.getInt(0)}: u=${r.getLong(1) / uRange}%.2f " +
          f"t=${r.getLong(2) / tRange}%.2f").mkString(" | ")
        s"expected >=6/8 z parts bounded in both dims, got $zBounded ($detail)"
      })
      // The single-key layout: most user_id-partitions span ~the whole
      // time range (uniform fixture), so stats cannot prune a ts filter.
      val full = uS.count(_.getLong(2) > 0.9 * tRange)
      assert(full >= 6, s"expected >=6/8 user-sorted parts with full t_span, got $full")
    } finally { ez.unpersist(); () }
  }

  test("hilbert index is a bijection with unit grid steps on a full 32x32 grid") {
    // The two defining properties of a Hilbert curve, checked exhaustively
    // at 5 bits/dim: every cell gets a distinct index in [0, 1024), and
    // consecutive indices are GRID-ADJACENT (Manhattan distance exactly 1
    // — the locality property Morton lacks, where quadrant boundaries
    // jump diagonally across the grid).
    // gx/gy survive untouched: the state machine rotates hx/hy in place
    val grid = spark.range(1024).select(
      (col("id") / 32).cast("long").as("gx"),
      (col("id") % 32).cast("long").as("gy"))
      .withColumn("hx", col("gx")).withColumn("hy", col("gy"))
    val cells = graft.operators.Layout.hilbertSteps(grid, 5)
      .select("gx", "gy", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cells.map(_._3).toSet == (0L until 1024L).toSet)
    val walk = cells.sortBy(_._3)
    walk.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, h)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step into h=$h: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert-clustered files bound both dims like z-order") {
    val eh = graft.operators.Layout.withHilbert(spark, sf)
      .select("event_id", "user_id", "ts_us", "h").cache()
    try {
      val b = eh.agg((max("user_id") - min("user_id")).cast("double").as("u"),
                     (max("ts_us") - min("ts_us")).cast("double").as("t"))
        .collect()(0)
      val hS = spans(eh, "h").collect()
      assert(hS.length == 8)
      val bounded = hS.count(r =>
        r.getLong(1) <= 0.75 * b.getDouble(0) &&
        r.getLong(2) <= 0.75 * b.getDouble(1))
      assert(bounded >= 6, {
        val detail = hS.map(r =>
          f"p${r.getInt(0)}: u=${r.getLong(1) / b.getDouble(0)}%.2f " +
          f"t=${r.getLong(2) / b.getDouble(1)}%.2f").mkString(" | ")
        s"expected >=6/8 hilbert parts bounded in both dims, got $bounded ($detail)"
      })
    } finally { eh.unpersist(); () }
  }
}
