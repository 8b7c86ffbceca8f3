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
}
