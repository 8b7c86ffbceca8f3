package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  test("watermark drops the 3-hour-late row (SURVEY §2.I stream_late_drop)") {
    val rows = SparkEntry.queries("stream_late_drop")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t0win = 1699999200000000L // hour-floor of the crafted t0
    assert(rows(t0win) == 1L,
           s"late duplicate leaked into the t0 window: ${rows(t0win)}")
    assert(rows.values.forall(_ == 1L), s"unexpected counts: $rows")
    assert(rows.size == 5, s"expected 5 appended windows, got ${rows.keySet}")
  }

  test("drained tumbling stream equals its batch twin (batch-equivalence)") {
    val streamed = SparkEntry.queries("stream_tumbling")(spark, sf).collect()
    val batch = Tables.eventsTs(spark, sf)
      .groupBy(unix_micros(date_trunc("hour", col("ts_ts"))).as("win_us"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           Tables.d(sum(Tables.dec(col("value")))).as("sum_value"))
      .orderBy("win_us", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming dedup halves a doubled input back to the original set") {
    val deduped = SparkEntry.queries("stream_dedup")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    val original = Tables.load(spark, sf, "events").count()
    assert(deduped == original)
  }
}
