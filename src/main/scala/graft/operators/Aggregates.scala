package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY.md §2.D — aggregations.
  *
  * Determinism contract (§2.0): every inexact sum goes through
  * DECIMAL(38,6) (exact + associative ⇒ partition-order independent),
  * and is emitted as DOUBLE (decimal→double is correctly rounded in
  * both engines ⇒ bit-identical). Ratios are computed in double on
  * both sides with the same expression shape, so IEEE gives identity.
  *
  * Scale note: all of these are single hash-aggregate plans —
  * partial (map-side) aggregation before the exchange is confirmed in
  * the physical plan, so the shuffle carries #groups × #partitions
  * rows, not the input.
  */
object Aggregates extends QueryModule {

  /** Typed UDAF (§2.J `udaf_weighted` twin): weighted mean of order
    * totalprice weighted by days-since-1995. The buffer quantizes the
    * per-row double product to DECIMAL-6dp exactly like the oracle's
    * CAST, so the exact sum matches DuckDB's. */
  object WeightedMean
      extends Aggregator[(Double, Int), (java.math.BigDecimal, Long), Double] {
    import java.math.{BigDecimal => JBD, RoundingMode}
    // JBD.valueOf (shortest-repr) mirrors Spark's Cast(double→decimal)
    // and, empirically, DuckDB's — `new JBD(x)` (exact expansion) does not.
    private def q(x: Double): JBD =
      JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)
    def zero: (JBD, Long) = (JBD.ZERO, 0L)
    def reduce(b: (JBD, Long), a: (Double, Int)): (JBD, Long) =
      (b._1.add(q(a._1 * a._2)), b._2 + a._2)
    def merge(x: (JBD, Long), y: (JBD, Long)): (JBD, Long) =
      (x._1.add(y._1), x._2 + y._2)
    def finish(b: (JBD, Long)): Double =
      if (b._2 == 0L) 0.0 else b._1.doubleValue() / b._2
    def bufferEncoder: Encoder[(JBD, Long)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private val rollupSql =
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
              CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_qty,
              count(*) AS n
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  private val cubeSql =
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
              count(*) AS n,
              CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_price
       FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
       ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  private val groupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
              count(*) AS n
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
       ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  val queries: Map[String, Q] = Map(
    "agg_pivot" -> ((s, dir) =>
      // Pivot with an EXPLICIT value list: no extra distinct-values scan,
      // and the output schema is static (required at scale — an implicit
      // pivot collects the key domain to the driver first).
      T.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(T.d(sum(T.dec(col("o_totalprice")))))
        .withColumnsRenamed(Map("F" -> "f_total", "O" -> "o_total",
                                "P" -> "p_total"))
        .orderBy("o_orderpriority")),

    "agg_groupby" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          T.d(sum(T.dec(col("l_quantity")))).as("sum_qty"),
          T.d(sum(T.dec(col("l_extendedprice")))).as("sum_base_price"),
          T.d(sum(T.dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
            .as("sum_disc_price"),
          (T.d(sum(T.dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "agg_global" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .agg(count(lit(1)).as("n"),
             T.d(sum(T.dec(col("l_quantity")))).as("sum_qty"),
             min(col("l_extendedprice")).as("min_price"),
             max(col("l_extendedprice")).as("max_price"),
             countDistinct(col("l_suppkey")).as("n_supp"))),

    "agg_distinct" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             T.d(sum_distinct(T.dec(col("l_quantity")))).as("sum_dist_qty"))
        .orderBy("l_returnflag")),

    "agg_multi_distinct" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n"))
        .orderBy("l_linestatus")),

    // No oracle: HLL sketches differ across engines (§2.0-5); spec-tested
    // against exact counts with 2% relative error instead.
    "agg_approx_hll" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy("l_returnflag")),

    "agg_countmin" -> ((s, dir) => {
      // COUNT-MIN SKETCH, fully oracle-checked (unlike HLL above, whose
      // engine-native sketches can only be error-gated): d=3 lanes ×
      // w=64 counters, lane hash = first 8 md5 hex chars of "lane:uid"
      // mod w — md5 is the one hash both engines share bit-for-bit (the
      // dedup_minhash_portable recipe). Build = one partial-aggregable
      // groupBy (the sketch is 192 cells regardless of input size —
      // THE point of a sketch at 100 TB: fixed-size mergeable state).
      // Readout: estimate 10 probe uids via min-over-lanes against the
      // broadcast sketch, alongside exact counts — est >= exact always
      // (one-sided CMS error), equality when no collision.
      val d = 3; val w = 64
      def bucket(lane: Int, uid: org.apache.spark.sql.Column) =
        pmod(conv(substring(md5(concat(lit(s"$lane:"),
          uid.cast("string"))), 1, 8), 16, 10).cast("long"), lit(w))
      val ev = T.events(s, dir).select(col("user_id"))
      val cells = ev.select(explode(array((0 until d).map(i =>
          struct(lit(i).as("lane"),
                 bucket(i, col("user_id")).as("bucket"))): _*)).as("lb"))
        .groupBy(col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
        .agg(count(lit(1)).as("c"))
      val probes = s.range(10).select(col("id").as("probe_uid"))
        .select(col("probe_uid"), explode(array((0 until d).map(i =>
          struct(lit(i).as("lane"),
                 bucket(i, col("probe_uid")).as("bucket"))): _*)).as("lb"))
        .select(col("probe_uid"), col("lb.lane").as("lane"),
                col("lb.bucket").as("bucket"))
      // LEFT join + coalesce 0: a probe whose (lane,bucket) cell is empty
      // must read count 0 (the one-sided CMS estimate for an unseen key),
      // not lose the lane to an inner join.
      val est = probes.join(broadcast(cells), Seq("lane", "bucket"), "left")
        .groupBy("probe_uid")
        .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
      val truth = ev.filter(col("user_id") < 10)
        .groupBy(col("user_id").as("t_uid"))
        .agg(count(lit(1)).as("true_n"))
      est.join(truth, col("probe_uid") === col("t_uid"), "left")
        .select(col("probe_uid"), coalesce(col("true_n"), lit(0L)).as("true_n"),
                col("est_n"))
        .orderBy("probe_uid")
    }),

    "agg_rollup" -> ((s, dir) => { T.views(s, dir, "lineitem"); s.sql(rollupSql) }),
    "agg_cube" -> ((s, dir) => { T.views(s, dir, "lineitem"); s.sql(cubeSql) }),
    "agg_grouping_sets" -> ((s, dir) =>
      { T.views(s, dir, "lineitem"); s.sql(groupingSetsSql) }),

    "agg_having" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n"),
             T.d(sum(T.dec(col("l_quantity")))).as("sum_qty"))
        .filter(col("n") >= 35)
        .orderBy("l_partkey")),

    "agg_stats_manual" -> ((s, dir) => {
      val li = T.load(s, dir, "lineitem")
      val base = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        T.d(sum(T.dec(col("l_quantity")))).as("s1"),
        T.d(sum(T.dec(col("l_quantity") * col("l_quantity")))).as("s2"))
      base.select(col("l_returnflag"), col("n"),
          (col("s1") / col("n")).as("mean"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
            .as("var_samp"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
            .as("stddev_samp"))
        .orderBy("l_returnflag")
    }),

    "agg_hll_partitioned" -> ((s, dir) => {
      // Mergeable-sketch rollup — the 100 TB cardinality pattern: build
      // a Datasketches HLL per fine partition (nation) ONCE, then answer
      // any coarser rollup (region) by UNIONING STORED SKETCHES instead
      // of re-scanning the fact table; countDistinct at region level
      // would re-shuffle every row, hll_union_agg moves 5 sketch blobs.
      // Sketch register updates are max-based (input-order-independent),
      // so results survive the determinism sweep. No DuckDB oracle (the
      // sketch binary isn't portable); gated by AggregatesSpec's
      // region-level ±5%-of-exact bound, with the exact per-nation
      // distincts summing exactly at region level (custkeys are unique).
      val c = T.load(s, dir, "customer")
      val n = T.load(s, dir, "nation")
      val perNation = c.groupBy("c_nationkey")
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"),
             countDistinct(col("c_custkey")).as("exact_n"))
      perNation.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
               .cast("long").as("approx_custs"),
             sum("exact_n").as("exact_custs"))
        .orderBy("n_regionkey")
    }),

    "agg_corr" -> ((s, dir) => {
      // Pearson correlation + population covariance per group WITHOUT
      // the built-in corr/covar_pop: those accumulate doubles in
      // partition order (nondeterministic under repartitioning), so the
      // five moments are summed as exact DECIMALs (associative ⇒
      // partition-count-invariant), converted once to double, and the
      // closed-form combination is a fixed IEEE expression tree both
      // engines evaluate identically. Same single-shuffle shape as the
      // built-ins: one partial+final agg, O(1) state per group.
      import org.apache.spark.sql.types.DecimalType
      def d18(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))
      val x = col("l_quantity"); val y = col("l_extendedprice")
      val m = T.load(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        T.d(sum(d18(x))).as("sx"), T.d(sum(d18(y))).as("sy"),
        T.d(sum(d18(x) * d18(x))).as("sxx"),
        T.d(sum(d18(y) * d18(y))).as("syy"),
        T.d(sum(d18(x) * d18(y))).as("sxy"))
      m.select(col("l_returnflag"), col("n"),
          T.stable4((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qp"),
          T.stable4((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"))
            .as("covar_pop_qp"))
        .orderBy("l_returnflag")
    }),

    "agg_regression" -> ((s, dir) => {
      // The regr_* linear-regression aggregate family (regr_count /
      // regr_avgx / regr_avgy / regr_slope / regr_intercept / regr_r2)
      // WITHOUT the built-ins: like agg_corr, the built-ins accumulate
      // doubles in partition order (nondeterministic under
      // repartitioning), so the five moments are summed as exact
      // DECIMALs (associative ⇒ partition-count-invariant), converted
      // once to double, and the OLS closed forms — slope =
      // (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), intercept = ȳ − slope·x̄,
      // r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)) —
      // are fixed IEEE expression trees both engines evaluate
      // identically. Same single-shuffle partial+final agg shape and
      // O(1) state per group as the built-ins; AggregatesSpec pins the
      // closed forms to Spark's own regr_* within 1e-9 ulp noise.
      import org.apache.spark.sql.types.DecimalType
      def d18(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))
      val x = col("l_quantity"); val y = col("l_extendedprice")
      val m = T.load(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        T.d(sum(d18(x))).as("sx"), T.d(sum(d18(y))).as("sy"),
        T.d(sum(d18(x) * d18(x))).as("sxx"),
        T.d(sum(d18(y) * d18(y))).as("syy"),
        T.d(sum(d18(x) * d18(y))).as("sxy"))
      val vx  = col("n") * col("sxx") - col("sx") * col("sx")
      val vy  = col("n") * col("syy") - col("sy") * col("sy")
      val cxy = col("n") * col("sxy") - col("sx") * col("sy")
      // degenerate-variance guards, pinned to Spark's regr_* semantics
      // (the closed forms alone would emit NaN/Inf here): zero
      // x-variance ⇒ slope/intercept/r2 are NULL; zero y-variance with
      // positive x-variance ⇒ r2 = 1.0 (a horizontal fit is exact).
      // The lineitem fixture never hits these; the guard exists so the
      // operator is regr_*-faithful on ANY input, not just the fixture.
      val nullD = lit(null).cast("double")
      m.select(col("l_returnflag"), col("n").as("regr_n"),
          T.stable4(col("sx") / col("n")).as("regr_avgx"),
          T.stable4(col("sy") / col("n")).as("regr_avgy"),
          when(vx === 0, nullD)
            .otherwise(T.stable4(cxy / vx)).as("regr_slope"),
          when(vx === 0, nullD)
            .otherwise(T.stable4(col("sy") / col("n") -
                       (cxy / vx) * (col("sx") / col("n"))))
            .as("regr_intercept"),
          when(vx === 0, nullD).when(vy === 0, lit(1.0))
            .otherwise(T.stable4(cxy * cxy / (vx * vy))).as("regr_r2"))
        .orderBy("l_returnflag")
    }),

    // The driver's pandas comparer cannot sort list-typed columns, so the
    // sorted collect is emitted as a joined string (the array op itself —
    // collect_list + sort_array — still runs inside the agg).
    "agg_collect_sorted" -> ((s, dir) =>
      T.load(s, dir, "nation")
        .groupBy("n_regionkey")
        .agg(concat_ws(",", sort_array(collect_list(col("n_name"))))
          .as("names"))
        .orderBy("n_regionkey")),

    "agg_skew_metrics" -> ((s, dir) => {
      // Per-group key-skew report — the diagnostic you run BEFORE
      // choosing salting/AQE-skew-join settings: rows, distinct keys,
      // mean rows per key, and the hottest key's share of the group.
      // Two partial-aggregable shuffles (key counts, then group
      // rollup); the share is a ratio of exact longs, stable4-rounded.
      val perKey = T.events(s, dir)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("kc"))
      perKey.groupBy("event_type")
        .agg(sum(col("kc")).as("n_rows"),
             count(lit(1)).as("n_keys"),
             max(col("kc")).as("hot_key_rows"))
        .select(col("event_type"), col("n_rows"), col("n_keys"),
                T.stable4(col("n_rows").cast("double") / col("n_keys"))
                  .as("mean_rows_per_key"),
                T.stable4(col("hot_key_rows").cast("double") / col("n_rows"))
                  .as("hot_key_share"))
        .orderBy("event_type")
    }),

    "agg_bitwise" -> ((s, dir) =>
      // Bitwise aggregate family — AND/OR/XOR fold over a group. All
      // three are associative + commutative, so partial aggregation and
      // shuffle order are free (the same property the bitmap-distinct
      // Aggregator leans on).
      T.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(bit_and(col("l_orderkey")).as("b_and"),
             bit_or(col("l_orderkey")).as("b_or"),
             bit_xor(col("l_orderkey")).as("b_xor"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "agg_salted" -> ((s, dir) =>
      // Two-stage SALTED aggregation — the skew-safe form of groupBy for
      // hot keys: stage 1 partials on (key, salt) spread one hot key
      // over 16 reducers; stage 2 merges the ≤16 partials per key. The
      // salt must be DETERMINISTIC (pmod of a data column, never rand())
      // or the determinism sweep and retried tasks both break. Decimal
      // partial sums keep the two-stage total exactly equal to the
      // one-stage oracle.
      T.load(s, dir, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(count(lit(1)).as("pn"),
             sum(T.dec(col("l_quantity"))).as("ps"))
        .groupBy("l_returnflag")
        .agg(sum(col("pn")).as("n"),
             T.d(sum(col("ps"))).as("sum_qty"))
        .orderBy("l_returnflag")),

    "agg_conditional" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("n_f"),
             T.d(sum(when(col("l_quantity") > 25.0,
                          T.dec(col("l_extendedprice")))
                       .otherwise(T.dec(lit(0))))).as("big_qty_price"),
             count(when(col("l_discount") > 0.05, lit(1))).as("n_disc"))
        .orderBy("l_returnflag")),

    // Exact per-group percentiles (sort-based, linear interpolation —
    // Spark `percentile` and DuckDB `quantile_cont` share the
    // lower + (upper-lower)*frac formula, so doubles match bit-for-bit).
    // Exact percentile shuffles whole groups; the 100 TB path is
    // fn_percentile_approx below.
    "fn_percentile" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
             expr("percentile(l_quantity, 0.9)").as("p90"),
             expr("percentile(l_extendedprice, 0.5)").as("med_price"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Sketch-based percentile (KLL-style, mergeable ⇒ partial agg before
    // the exchange — the scale path). No oracle: sketch internals differ
    // across engines; gated by AggregatesSpec's ±1%-of-exact bound
    // ("fn_percentile_approx within 1% of exact percentile per group").
    "fn_percentile_approx" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
               .as("ap50"),
             percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000))
               .as("ap90"))
        .orderBy("l_returnflag")),

    "agg_histogram" -> ((s, dir) => {
      // Fixed-width histogram per group — the profiling agg every data
      // audit runs first. The bin id is exact IEEE floor arithmetic
      // (width 50.0 is a power-of-2-free but exactly representable
      // divisor; floor(x/50) is identical in both engines), clamped to
      // a final overflow bin, so the whole histogram is oracle-checked.
      // One partial+final hash agg on (event_type, bin): the map side
      // pre-collapses to ≤ |types|×|bins| rows per task — at 100 TB the
      // shuffle carries histograms, not events.
      val bin = least(floor(col("value") / 50.0), lit(9.0)).cast("long")
      T.events(s, dir)
        .groupBy(col("event_type"), bin.as("bin"))
        .agg(count(lit(1)).as("n"),
             T.d(sum(T.dec(col("value")))).as("sum_v"))
        .orderBy("event_type", "bin")
    }),

    "agg_histogram_equidepth" -> ((s, dir) => {
      // Equi-depth (ntile) histogram over o_totalprice — WITHOUT the
      // single-partition global window that a bare ntile() lowers to.
      // Global rank = the range-bucketed-CDF pattern (join_theta): fixed
      // value buckets, per-bucket counts → broadcast cumulative offsets,
      // within-bucket row_number + offset; then the exact SQL NTILE
      // assignment (first N%k tiles get one extra row) computed from the
      // rank in integer arithmetic. The only data-sized shuffle is the
      // per-bucket window; the ≤64-row offset/total tables broadcast.
      import org.apache.spark.sql.expressions.Window
      val K = 10
      val B = 64
      val o = T.load(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val dom = o.agg(min(col("o_totalprice")).as("lo"),
                      max(col("o_totalprice")).as("hi"))
      val bucketed = o.crossJoin(broadcast(dom))
        .withColumn("bk", least(lit(B - 1), floor(
          (col("o_totalprice") - col("lo")) /
            ((col("hi") - col("lo")) / B + lit(1e-9))).cast("int")))
        .drop("lo", "hi")
      val counts = bucketed.groupBy("bk").agg(count(lit(1)).as("c"))
      // ≤64 rows: the unpartitioned window is a broadcast-sized table
      val wOff = Window.orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = counts
        .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
        .select("bk", "off")
      val tot = counts.agg(sum(col("c")).as("n_tot"))
      val wIn = Window.partitionBy("bk")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      bucketed.join(broadcast(offsets), "bk")
        .withColumn("rk", row_number().over(wIn) + col("off"))
        .crossJoin(broadcast(tot))
        .withColumn("qq", expr(s"n_tot div $K"))
        .withColumn("r", col("n_tot") % K)
        .withColumn("cut", col("r") * (col("qq") + 1))
        .withColumn("bucket",
          when(col("rk") <= col("cut"), expr("(rk - 1) div (qq + 1) + 1"))
            .otherwise(expr("r + (rk - cut - 1) div qq + 1")))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
             T.r4(min(col("o_totalprice"))).as("lo_v"),
             T.r4(max(col("o_totalprice"))).as("hi_v"))
        .orderBy("bucket")
    }),

    "agg_weighted_median" -> ((s, dir) => {
      // Exact weighted median (price-weighted quantity) per group via
      // the same distributed-CDF pattern as agg_histogram_equidepth:
      // value-bucket weight sums → broadcast cumulative offsets → find
      // the crossing bucket → row-level scan of ONLY that bucket
      // (~1/64 of each group). No per-group full-sort window, so a
      // 100 TB group never lands on one reducer. All cumulative weights
      // are exact decimals; the crossing test uses 2*cum >= total
      // (multiplication, not division) to stay exact.
      import org.apache.spark.sql.expressions.Window
      val B = 64
      val li = T.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"), col("l_quantity").as("q"),
                T.dec(col("l_extendedprice")).as("w"),
                col("l_orderkey"), col("l_linenumber"))
      val dom = li.groupBy("rf")
        .agg(min(col("q")).as("lo"), max(col("q")).as("hi"))
      val bucketed = li.join(broadcast(dom), "rf")
        .withColumn("bk", least(lit(B - 1), floor(
          (col("q") - col("lo")) /
            ((col("hi") - col("lo")) / B + lit(1e-9))).cast("int")))
      val bsums = bucketed.groupBy("rf", "bk").agg(sum(col("w")).as("bw"))
      val wOff = Window.partitionBy("rf").orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = bsums
        .withColumn("off", coalesce(sum(col("bw")).over(wOff),
                                    lit(0).cast(T.DEC)))
      val tot = bsums.groupBy("rf").agg(sum(col("bw")).as("tot"))
      // smallest bucket where the cumulative weight crosses total/2
      val wMin = Window.partitionBy("rf").orderBy("bk")
      val medbk = offs.join(broadcast(tot), "rf")
        .filter(lit(2) * (col("off") + col("bw")) >= col("tot"))
        .withColumn("rn", row_number().over(wMin)).filter(col("rn") === 1)
        .select(col("rf"), col("bk").as("medbk"), col("off"), col("tot"))
      val wIn = Window.partitionBy("rf")
        .orderBy(col("q"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bucketed.join(broadcast(medbk),
                    bucketed("rf") === medbk("rf") &&
                    bucketed("bk") === medbk("medbk"))
        .drop(medbk("rf"))
        .withColumn("cum", col("off") + sum(col("w")).over(wIn))
        .filter(lit(2) * col("cum") >= col("tot"))
        .groupBy("rf")
        .agg(min(col("q")).as("wmedian"), count(lit(1)).as("n_tail"))
        .select(col("rf").as("l_returnflag"), col("wmedian"))
        .orderBy("l_returnflag")
    }),

    "agg_boolean" -> ((s, dir) =>
      // Boolean aggregate family — every/some (SQL bool_and/bool_or)
      // plus count_if: all associative + commutative, so partial
      // aggregation is free and each map task ships one boolean/count
      // per group. The assertion-style scan ("do ALL rows satisfy X")
      // is the cheapest full-table data-quality check at 100 TB.
      T.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("every(l_quantity > 1.0)").as("all_gt1"),
             expr("some(l_discount > 0.09)").as("any_big_disc"),
             expr("every(l_extendedprice > 0)").as("all_pos"),
             expr("count_if(l_tax > 0.05)").as("n_high_tax"))
        .orderBy("l_returnflag")),

    "agg_listagg" -> ((s, dir) => {
      // SQL:2023 LISTAGG — ordered string aggregation: the concat order
      // is SPECIFIED (WITHIN GROUP ORDER BY), so the result is
      // deterministic under any partitioning (an unordered string_agg
      // is partition-order-dependent and banned by §2.0). Runs as a
      // sort-based aggregate after one hash shuffle; the sample filter
      // keeps group payloads bounded — at 100 TB unbounded LISTAGG
      // payloads are an anti-pattern regardless of engine.
      T.views(s, dir, "customer")
      s.sql("""SELECT c_mktsegment,
                      listagg(CAST(c_custkey AS STRING), ',')
                        WITHIN GROUP (ORDER BY c_custkey) AS keys_csv,
                      count(*) AS n
               FROM (SELECT * FROM customer WHERE c_custkey % 100 = 0)
               GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    "agg_mode" -> ((s, dir) => {
      // Per-group mode (most frequent value): count + top-1 window — the
      // distributed formulation of SQL mode(), with a deterministic
      // tie-break on the value itself. Two shuffles (group count, then
      // the per-group top-1 with WindowGroupLimit below the exchange).
      import org.apache.spark.sql.expressions.Window
      val cnt = T.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_linestatus"))
      cnt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_linestatus").as("mode_status"),
                col("cnt"))
        .orderBy("l_returnflag")
    }),

    "q1_pricing" -> ((s, dir) =>
      // TPC-H Q1 verbatim shape — the canonical pricing-summary report a
      // reference user runs as-is: one partial+final hash aggregation
      // over the filtered fact scan, products decimal-cast per row so
      // the sums stay partition-order-invariant.
      T.load(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") <=
                  lit("2001-08-06").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          T.d(sum(T.dec(col("l_quantity")))).as("sum_qty"),
          T.d(sum(T.dec(col("l_extendedprice")))).as("sum_base_price"),
          T.d(sum(T.dec(col("l_extendedprice") * (lit(1) - col("l_discount")))))
            .as("sum_disc_price"),
          T.d(sum(T.dec(col("l_extendedprice") * (lit(1) - col("l_discount"))
                          * (lit(1) + col("l_tax"))))).as("sum_charge"),
          T.stable4(T.d(sum(T.dec(col("l_quantity")))) / count(lit(1)))
            .as("avg_qty"),
          T.stable4(T.d(sum(T.dec(col("l_discount")))) / count(lit(1)))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "agg_typed_udaf" -> ((s, dir) => {
      val wavg = udaf(WeightedMean,
                      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaInt))
      T.load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"),
                datediff(col("o_orderdate").cast("date"),
                         lit("1995-01-01").cast("date")).as("w"))
        .groupBy("o_orderpriority")
        .agg(wavg(col("o_totalprice"), col("w")).as("wavg"),
             count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),
  )

  private def q1d(inner: String) =
    s"CAST(CAST(sum(CAST($inner AS DECIMAL(38,6))) AS STRING) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "agg_countmin" ->
      // same 3×64 sketch rebuilt in DuckDB: TRY_CAST('0x'||hex) is the
      // conv(hex,16,10) twin, both operands non-negative so % == pmod
      """WITH lanes AS (SELECT i FROM generate_series(0, 2) AS t(i)),
            cells AS (SELECT i AS lane,
                             TRY_CAST('0x' || substring(md5(CAST(i AS VARCHAR)
                               || ':' || CAST(user_id AS VARCHAR)), 1, 8)
                               AS BIGINT) % 64 AS bucket,
                             count(*) AS c
                      FROM events CROSS JOIN lanes
                      GROUP BY 1, 2),
            probes AS (SELECT p, i AS lane,
                              TRY_CAST('0x' || substring(md5(CAST(i AS VARCHAR)
                                || ':' || CAST(p AS VARCHAR)), 1, 8)
                                AS BIGINT) % 64 AS bucket
                       FROM generate_series(0, 9) AS g(p) CROSS JOIN lanes),
            est AS (SELECT p AS probe_uid,
                           CAST(min(coalesce(c, 0)) AS BIGINT) AS est_n
                    FROM probes LEFT JOIN cells USING (lane, bucket)
                    GROUP BY p),
            truth AS (SELECT user_id AS t_uid, count(*) AS true_n
                      FROM events WHERE user_id < 10 GROUP BY user_id)
         SELECT probe_uid, coalesce(true_n, 0) AS true_n, est_n
         FROM est LEFT JOIN truth ON probe_uid = t_uid
         ORDER BY probe_uid""",

    "agg_histogram" ->
      s"""SELECT event_type,
                 CAST(least(floor(value / 50.0), 9.0) AS BIGINT) AS bin,
                 count(*) AS n, ${q1d("value")} AS sum_v
          FROM events GROUP BY 1, 2 ORDER BY event_type, bin""",

    "agg_weighted_median" ->
      """WITH r AS (SELECT l_returnflag AS rf, l_quantity AS q,
                           CAST(l_extendedprice AS DECIMAL(38,6)) AS w,
                           l_orderkey, l_linenumber
                    FROM lineitem),
          c AS (SELECT rf, q,
                  sum(w) OVER (PARTITION BY rf
                               ORDER BY q, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum,
                  sum(w) OVER (PARTITION BY rf) AS tot
                FROM r)
         SELECT rf AS l_returnflag, min(q) AS wmedian
         FROM c WHERE 2 * cum >= tot GROUP BY rf ORDER BY l_returnflag""",

    "agg_histogram_equidepth" ->
      """WITH r AS (SELECT o_totalprice,
                           ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                             AS bucket
                    FROM orders)
         SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n,
                round(min(o_totalprice), 4) AS lo_v,
                round(max(o_totalprice), 4) AS hi_v
         FROM r GROUP BY bucket ORDER BY bucket""",

    "agg_boolean" ->
      """SELECT l_returnflag,
                bool_and(l_quantity > 1.0) AS all_gt1,
                bool_or(l_discount > 0.09) AS any_big_disc,
                bool_and(l_extendedprice > 0) AS all_pos,
                count(*) FILTER (WHERE l_tax > 0.05) AS n_high_tax
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_listagg" ->
      """SELECT c_mktsegment,
                string_agg(CAST(c_custkey AS VARCHAR), ','
                           ORDER BY c_custkey) AS keys_csv,
                count(*) AS n
         FROM customer WHERE c_custkey % 100 = 0
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "agg_mode" ->
      """SELECT l_returnflag, l_linestatus AS mode_status, cnt
         FROM (SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                      row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY count(*) DESC, l_linestatus) AS rn
               FROM lineitem GROUP BY 1, 2)
         WHERE rn = 1 ORDER BY l_returnflag""",

    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
                 ${q1d("l_quantity")} AS sum_qty,
                 ${q1d("l_extendedprice")} AS sum_base_price,
                 ${q1d("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
                 ${q1d("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
                 ${T.stable4Sql(s"${q1d("l_quantity")} / count(*)")} AS avg_qty,
                 ${T.stable4Sql(s"${q1d("l_discount")} / count(*)")} AS avg_disc,
                 count(*) AS count_order
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) <= DATE '2001-08-06'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",

    "agg_pivot" ->
      """SELECT o_orderpriority,
                CAST(CAST(sum(CAST(CASE WHEN o_orderstatus = 'F'
                       THEN o_totalprice END AS DECIMAL(38,6)))
                     AS STRING) AS DOUBLE) AS f_total,
                CAST(CAST(sum(CAST(CASE WHEN o_orderstatus = 'O'
                       THEN o_totalprice END AS DECIMAL(38,6)))
                     AS STRING) AS DOUBLE) AS o_total,
                CAST(CAST(sum(CAST(CASE WHEN o_orderstatus = 'P'
                       THEN o_totalprice END AS DECIMAL(38,6)))
                     AS STRING) AS DOUBLE) AS p_total
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_qty,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_base_price,
                CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_disc_price,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) / count(*) AS avg_qty,
                count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "agg_global" ->
      """SELECT count(*) AS n,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_qty,
                min(l_extendedprice) AS min_price,
                max(l_extendedprice) AS max_price,
                count(DISTINCT l_suppkey) AS n_supp
         FROM lineitem""",

    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                CAST(CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_dist_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_multi_distinct" ->
      """SELECT l_linestatus, count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "agg_rollup" -> rollupSql,
    "agg_cube" -> cubeSql,
    "agg_grouping_sets" -> groupingSetsSql,

    "agg_having" ->
      """SELECT l_partkey, count(*) AS n,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_partkey HAVING count(*) >= 35
         ORDER BY l_partkey""",

    "agg_corr" ->
      // DECIMAL(19,6) on the DuckDB side forces int128 storage: DuckDB
      // multiplies p<=18 decimals in their int64 representation and
      // overflows before widening; the products are exact integers in
      // both engines either way, so the width difference is invisible.
      s"""WITH m AS (
           SELECT l_returnflag, count(*) AS n,
                  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sx,
                  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sy,
                  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sxx,
                  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS syy,
                  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
                ${T.stable4Sql("(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))")} AS corr_qp,
                ${T.stable4Sql("(sxy - sx * sy / n) / n")} AS covar_pop_qp
         FROM m ORDER BY l_returnflag""",

    "agg_regression" ->
      // same decimal-moment CTE as agg_corr (see its width note); the
      // closed forms below mirror the Spark expression trees node for
      // node so the IEEE evaluation order is identical in both engines
      s"""WITH m AS (
           SELECT l_returnflag, count(*) AS n,
                  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sx,
                  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sy,
                  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sxx,
                  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS syy,
                  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS STRING) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n AS regr_n,
                ${T.stable4Sql("sx / n")} AS regr_avgx,
                ${T.stable4Sql("sy / n")} AS regr_avgy,
                CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                     ELSE ${T.stable4Sql("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} END AS regr_slope,
                CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                     ELSE ${T.stable4Sql("sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n)")} END AS regr_intercept,
                CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                     WHEN n * syy - sy * sy = 0 THEN 1.0
                     ELSE ${T.stable4Sql("(n * sxy - sx * sy) * (n * sxy - sx * sy) / ((n * sxx - sx * sx) * (n * syy - sy * sy))")} END AS regr_r2
         FROM m ORDER BY l_returnflag""",

    "agg_stats_manual" ->
      """WITH b AS (
           SELECT l_returnflag, count(*) AS n,
                  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS s1,
                  CAST(CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS s2
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n, s1 / n AS mean,
                (s2 - s1 * s1 / n) / (n - 1) AS var_samp,
                sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp
         FROM b ORDER BY l_returnflag""",

    "agg_collect_sorted" ->
      """SELECT n_regionkey,
                array_to_string(list(n_name ORDER BY n_name), ',') AS names
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "agg_skew_metrics" ->
      s"""WITH k AS (SELECT event_type, user_id, count(*) AS kc
                     FROM events GROUP BY 1, 2)
          SELECT event_type, CAST(sum(kc) AS BIGINT) AS n_rows,
                 count(*) AS n_keys,
                 ${T.stable4Sql("CAST(sum(kc) AS DOUBLE) / count(*)")}
                   AS mean_rows_per_key,
                 ${T.stable4Sql("CAST(max(kc) AS DOUBLE) / sum(kc)")}
                   AS hot_key_share
          FROM k GROUP BY event_type ORDER BY event_type""",

    "agg_bitwise" ->
      """SELECT l_returnflag,
                bit_and(l_orderkey) AS b_and, bit_or(l_orderkey) AS b_or,
                bit_xor(l_orderkey) AS b_xor, count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_salted" ->
      """SELECT l_returnflag, count(*) AS n,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_conditional" ->
      """SELECT l_returnflag,
                -- DuckDB sum(int) is HUGEINT → pandas float64; cast to match
                -- Spark's BIGINT (same trap as GROUPING_ID above)
                CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_f,
                CAST(CAST(sum(CASE WHEN l_quantity > 25.0
                              THEN CAST(l_extendedprice AS DECIMAL(38,6))
                              ELSE CAST(0 AS DECIMAL(38,6)) END) AS STRING) AS DOUBLE) AS big_qty_price,
                count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "fn_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS p50,
                quantile_cont(l_quantity, 0.9) AS p90,
                quantile_cont(l_extendedprice, 0.5) AS med_price,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_typed_udaf" ->
      """WITH t AS (
           SELECT o_orderpriority, o_totalprice,
                  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS w
           FROM orders)
         SELECT o_orderpriority,
                CAST(CAST(sum(CAST(o_totalprice * w AS DECIMAL(38,6))) AS STRING) AS DOUBLE) / sum(w) AS wavg,
                count(*) AS n
         FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority""",
  )
}
