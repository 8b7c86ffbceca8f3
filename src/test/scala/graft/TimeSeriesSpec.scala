package graft

import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  test("ts_resample grid is dense per type: hr range covered, no holes") {
    val rows = SparkEntry.queries("ts_resample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val hrs = rs.map(_._2).sorted
      assert(hrs.last - hrs.head + 1 == hrs.length, "grid has holes")
      assert(hrs.distinct.length == hrs.length, "duplicate buckets")
    }
    assert(rows.exists(_._3 == 0L), "expected at least one gap bucket")
  }

  test("ts_interpolate fills every gap, endpoints held flat") {
    val rows = SparkEntry.queries("ts_interpolate")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
                           r.isNullAt(3)))
    assert(rows.nonEmpty)
    // every bucket — observed or gap — carries a non-null filled value
    assert(rows.forall(!_._4), "interpolation left a NULL")
    assert(rows.exists(_._3), "expected gap rows")
  }

  test("ts_ohlc invariants: low <= open,close <= high; volumes sum to count") {
    val rows = SparkEntry.queries("ts_ohlc")(spark, sf).collect()
    rows.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4),
                          r.getDouble(5))
      assert(l <= o && o <= h && l <= c && c <= h, s"bar violates OHLC: $r")
    }
    val vol = rows.map(_.getLong(6)).sum
    assert(vol == Tables.events(spark, sf).count())
  }
}
