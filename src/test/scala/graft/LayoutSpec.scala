package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of z-ordering is per-file min/max envelopes bounded in BOTH
  * dimensions. Split the same events into 8 range partitions — once by
  * the z key, once by user_id alone — and measure each partition's
  * normalized span in each dim (parquet row-group stats in miniature).
  * The z layout must bound both dims; the single-key layout is provably
  * full-range in the non-sort dim, so a time predicate prunes nothing. */
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
      def dump(tag: String, rs: Array[org.apache.spark.sql.Row]) =
        rs.map(r => f"$tag${r.getInt(0)}: u=${r.getLong(1)/uRange}%.2f t=${r.getLong(2)/tRange}%.2f").mkString(" | ")
      assert(false, dump("z", zS) + "\n" + dump("u", uS))

      // Every z-partition: strictly sub-range in BOTH dims. With 8 range
      // slices of a 20-bit interleaved key the top 3 bits split u into
      // halves/quarters and t into halves — 0.75 is a loose bound.
      zS.foreach { r =>
        assert(r.getLong(1) <= 0.75 * uRange,
               s"z part ${r.getInt(0)}: u_span ${r.getLong(1)} of $uRange")
        assert(r.getLong(2) <= 0.75 * tRange,
               s"z part ${r.getInt(0)}: t_span ${r.getLong(2)} of $tRange")
      }
      // The single-key layout: most user_id-partitions span ~the whole
      // time range (uniform fixture), so stats cannot prune a ts filter.
      val full = uS.count(_.getLong(2) > 0.9 * tRange)
      assert(full >= 6, s"expected >=6/8 user-sorted parts with full t_span, got $full")
    } finally { ez.unpersist(); () }
  }
}
