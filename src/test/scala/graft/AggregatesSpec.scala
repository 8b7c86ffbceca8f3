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

  test("agg_regression closed forms match Spark's regr_* built-ins") {
    // the contract key computes OLS from exact decimal moments (the
    // deterministic formulation); Spark's own regr_* accumulate doubles
    // in partition order — values must agree to rounding noise, which
    // pins the closed forms to the reference semantics without putting
    // the nondeterministic built-ins in the oracle path
    val got = SparkEntry.queries("agg_regression")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    Tables.views(spark, sf, "lineitem")
    val ref = spark.sql(
      """SELECT l_returnflag,
               regr_slope(l_extendedprice, l_quantity) AS s,
               regr_intercept(l_extendedprice, l_quantity) AS i,
               regr_r2(l_extendedprice, l_quantity) AS r2
         FROM lineitem GROUP BY l_returnflag""")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    ref.foreach { case (k, (slope, icept, r2)) =>
      // contract values are stable4-rounded → compare at 4dp + 1 ulp
      assert(math.abs(got(k)._1 - slope) <= 5e-5, s"$k slope: ${got(k)._1} vs $slope")
      assert(math.abs(got(k)._2 - icept) <= 5e-5, s"$k intercept: ${got(k)._2} vs $icept")
      assert(math.abs(got(k)._3 - r2) <= 5e-5, s"$k r2: ${got(k)._3} vs $r2")
    }
  }

  test("agg_regression degenerate-variance guards match regr_* (r14 ADVICE)") {
    // The lineitem fixture never hits zero-variance groups, so the
    // contract oracle cannot catch a closed form that NaNs where the
    // built-ins define semantics. Pin the guards on a crafted fixture:
    //   group "cx": constant x, varying y  → slope/intercept/r2 NULL
    //   group "cy": varying x, constant y  → r2 = 1.0 (exact flat fit)
    //   group "ok": both varying           → finite everywhere
    import spark.implicits._
    val df = Seq(
      ("cx", 5.0, 1.0), ("cx", 5.0, 2.0), ("cx", 5.0, 4.0),
      ("cy", 1.0, 7.0), ("cy", 2.0, 7.0), ("cy", 4.0, 7.0),
      ("ok", 1.0, 2.0), ("ok", 2.0, 5.0), ("ok", 4.0, 8.0))
      .toDF("g", "x", "y")
    df.createOrReplaceTempView("graft_regr_degen")
    val ref = spark.sql(
      """SELECT g, regr_slope(y, x) AS s, regr_intercept(y, x) AS i,
               regr_r2(y, x) AS r2
         FROM graft_regr_degen GROUP BY g""").collect()
      .map(r => r.getString(0) -> (r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // Spark's reference semantics, asserted so a behavior change in the
    // built-ins would surface here rather than silently diverge
    assert(ref("cx") == ((true, true, None)), s"built-in cx: ${ref("cx")}")
    assert(ref("cy")._3.contains(1.0), s"built-in cy r2: ${ref("cy")}")
    // the engine's guarded closed forms over the same data (the same
    // expression tree as the contract key, moments included)
    import org.apache.spark.sql.types.DecimalType
    def d18(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))
    val m = df.groupBy("g").agg(
      count(lit(1)).as("n"),
      Tables.d(sum(d18(col("x")))).as("sx"),
      Tables.d(sum(d18(col("y")))).as("sy"),
      Tables.d(sum(d18(col("x")) * d18(col("x")))).as("sxx"),
      Tables.d(sum(d18(col("y")) * d18(col("y")))).as("syy"),
      Tables.d(sum(d18(col("x")) * d18(col("y")))).as("sxy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val cxy = col("n") * col("sxy") - col("sx") * col("sy")
    val nullD = lit(null).cast("double")
    val got = m.select(col("g"),
        when(vx === 0, nullD).otherwise(Tables.stable4(cxy / vx)).as("s"),
        when(vx === 0, nullD)
          .otherwise(Tables.stable4(col("sy") / col("n") -
                     (cxy / vx) * (col("sx") / col("n")))).as("i"),
        when(vx === 0, nullD).when(vy === 0, lit(1.0))
          .otherwise(Tables.stable4(cxy * cxy / (vx * vy))).as("r2"))
      .collect().map(r => r.getString(0) -> (r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("cx") == ((true, true, None)), s"guarded cx: ${got("cx")}")
    assert(got("cy")._3.contains(1.0), s"guarded cy r2: ${got("cy")}")
    assert(!got("ok")._1 && got("ok")._3.exists(r => r > 0 && r <= 1),
      s"guarded ok: ${got("ok")}")
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

  test("fn_percentile_approx within 1% of exact percentile per group (no-oracle gate)") {
    // The sketch query has no DuckDB oracle (sketch internals differ across
    // engines); this is its promised gate: each group's ap50/ap90 of
    // l_extendedprice within 1% of the exact sort-based percentile on
    // sf0.01 (~60k rows; accuracy=10000 bounds rank error to n/10000 ≈ 6
    // rows, far inside 1% of the value on this distribution).
    val sf01 = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("fn_percentile_approx")(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.load(spark, sf01, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
           expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.01, s"$k: ap50 $a50 vs exact $e50")
      assert(math.abs(a90 - e90) / e90 < 0.01, s"$k: ap90 $a90 vs exact $e90")
    }
  }

  test("agg_hll_partitioned: unioned sketches within 5% of exact per region (no-oracle gate)") {
    // The query emits BOTH the sketch-union estimate and the exact count
    // (per-nation distincts sum exactly at region level — custkeys are
    // unique), so the gate reads one result set: |approx − exact| / exact
    // < 5% per region. This is the promised region-level bound.
    SparkEntry.queries("agg_hll_partitioned")(spark, sf)
      .collect().foreach { r =>
        val (approx, exact) = (r.getLong(1), r.getLong(2))
        assert(math.abs(approx - exact).toDouble / exact < 0.05,
               s"region ${r.get(0)}: approx $approx vs exact $exact")
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
