package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  test("agg_approx_hll within 2% of exact distinct (no oracle possible)") {
    val approx = SparkEntry.queries("agg_approx_hll")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05,
             s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("typed UDAF weighted mean matches decimal-SQL computation") {
    val udafRes = SparkEntry.queries("agg_typed_udaf")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Tables.views(spark, sf, "orders")
    val sqlRes = spark.sql(
      """SELECT o_orderpriority,
               CAST(sum(CAST(o_totalprice * w AS DECIMAL(38,6))) AS DOUBLE) / sum(w) AS wavg
         FROM (SELECT o_orderpriority, o_totalprice,
                      datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS w
               FROM orders)
         GROUP BY o_orderpriority""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(udafRes.keySet == sqlRes.keySet)
    sqlRes.foreach { case (k, v) =>
      assert(math.abs(udafRes(k) - v) <= math.ulp(v) * 4, s"$k: ${udafRes(k)} vs $v")
    }
  }

  test("decimal sums are repartition-invariant (determinism rule §2.0)") {
    val li = Tables.load(spark, sf, "lineitem")
    def total(parts: Int): java.math.BigDecimal =
      li.repartition(parts)
        .agg(sum(Tables.dec(col("l_extendedprice"))).as("s"))
        .collect()(0).getDecimal(0)
    assert(total(3) == total(7))
  }
}
