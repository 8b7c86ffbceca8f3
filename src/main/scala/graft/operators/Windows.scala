package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.E — window functions: ranking family, lag/lead,
  * running/row frames, time-range frames, first/last over full frame.
  * (`win_topk_group` lives in Joins as a shared-SQL query.)
  *
  * Determinism: every window orders by a unique-key tiebreak so
  * rank == row_number and frames are stable (§2.0). Ranking-family SQL
  * is shared text between engines; decimal running sums hop through
  * VARCHAR on emit (see Aggregates).
  */
object Windows extends QueryModule {

  private val rankingSql = // shared Spark/DuckDB text
    """SELECT c_custkey, c_mktsegment, c_acctbal,
              row_number() OVER w AS rn,
              rank() OVER w AS rnk,
              dense_rank() OVER w AS drnk,
              ntile(4) OVER w AS quartile,
              percent_rank() OVER w AS prnk,
              cume_dist() OVER w AS cdist
       FROM customer
       WINDOW w AS (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey)
       ORDER BY c_mktsegment, rn"""

  private val rangeFrameSql = // shared text: 30-day trailing sum
    """SELECT o_orderkey, o_custkey, o_orderdate,
              CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
              ) AS STRING) AS DOUBLE) AS trailing_30d
       FROM orders
       ORDER BY o_custkey, o_orderdate, o_orderkey"""

  private val firstLastSql = // shared text
    """SELECT o_orderkey, o_custkey,
              first_value(o_orderkey) OVER w AS first_ok,
              last_value(o_orderkey) OVER w AS last_ok,
              nth_value(o_orderkey, 2) OVER w AS second_ok
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY o_custkey, o_orderkey"""

  val queries: Map[String, Q] = Map(
    "win_ranking" -> ((s, dir) =>
      { T.views(s, dir, "customer"); s.sql(rankingSql) }),

    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      T.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
        .withColumn("next_ts", lead(col("ts_us"), 1).over(w))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    "win_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
                T.d(sum(T.dec(col("o_totalprice"))).over(w)).as("running_total"),
                count(lit(1)).over(w).as("running_n"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    "win_range_frame" -> ((s, dir) =>
      { T.views(s, dir, "orders"); s.sql(rangeFrameSql) }),

    "win_first_last" -> ((s, dir) =>
      { T.views(s, dir, "orders"); s.sql(firstLastSql) }),

    "win_sessionize" -> ((s, dir) =>
      // BATCH sessionization: session_window works outside streaming too
      // — one shuffle on (gap-merged window, user), same operator the
      // streaming twin (stream_session) uses, no state store needed.
      T.eventsTs(s, dir)
        .groupBy(session_window(col("ts_ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
                unix_micros(col("session_window.start")).as("sess_start_us"),
                col("n"))
        .orderBy("user_id", "sess_start_us")),

    "win_gaps" -> ((s, dir) => {
      // Gaps-and-islands over an integer sequence: runs of CONSECUTIVE
      // event_ids per user collapse to (start, end, length) islands via
      // the classic id − row_number() group key — consecutive ids share
      // a constant difference, so the island id falls out of one window
      // over one shuffle on user_id plus a partial-aggregated groupBy on
      // the same partitioning (Catalyst reuses the exchange; no second
      // shuffle). The batch twin of sessionization for sequence data —
      // finding missing-id gaps in a 100 TB ingest ledger is exactly
      // this query.
      val w = Window.partitionBy("user_id").orderBy("event_id")
      T.events(s, dir)
        .select(col("user_id"), col("event_id"))
        .withColumn("grp", col("event_id") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(min("event_id").as("start_id"), max("event_id").as("end_id"),
             count(lit(1)).as("n"))
        .select(col("user_id"), col("start_id"), col("end_id"), col("n"))
        .orderBy("user_id", "start_id")
    }),

    "win_fill_forward" -> ((s, dir) => {
      // Forward-fill (LOCF): sensor/event streams carry nulls where a
      // reading is missing — here synthesized deterministically (error
      // events report no value) — and each null takes the latest
      // preceding non-null within its key. last(ignoreNulls) over a
      // running row frame is one window over ONE shuffle on user_id;
      // at 100 TB this is the same single-exchange cost as any
      // per-key window, with no self-join and no gaps-and-islands
      // detour.
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"),
                when(col("event_type") =!= "error", col("value")).as("v"))
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    "agg_argmax" -> ((s, dir) =>
      // Deterministic arg-max: the order with the highest totalprice per
      // priority. max(struct(price, key)) breaks price ties by key —
      // unlike bare max_by, whose tie choice is undefined — and stays a
      // single partial+final aggregation (no window, no second shuffle).
      T.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("m"),
             count(lit(1)).as("n"))
        .select(col("o_orderpriority"),
                col("m.o_orderkey").as("best_order"),
                col("m.o_totalprice").as("best_price"), col("n"))
        .orderBy("o_orderpriority")),

    "win_rolling_corr" -> ((s, dir) => {
      // Rolling autocorrelation (value vs previous value) per event type
      // over a trailing 100-row frame, fully DISTRIBUTED: the naive
      // per-type window caps parallelism at the type cardinality (5
      // tasks forever, the r6/r7 verdicts' scale-killer), so the global
      // per-type prefix sums are built with the range-bucketed-CDF
      // pattern (agg_weighted_median): each type's timeline splits into
      // B range buckets (bucket id monotone in ts_us, so (bk, ts_us,
      // event_id) order == the global order), windows run per (type,
      // bk) — B× the parallelism — and tiny per-bucket totals broadcast
      // back as cumulative offsets. The lag-1 pair and the trailing
      // frame are then (type, rn−k) equi-joins on the global row
      // number — hash-distributed over the whole key space, never one
      // reducer per type. All component sums stay EXACT decimals, so
      // prefix(i) − prefix(i−100) equals the frame sum bit-for-bit and
      // the textbook sliding-window oracle still hash-matches; the
      // Pearson assembly is pure IEEE double on identical inputs,
      // stable4-rounded.
      val B = 32
      val DEC0 = lit(0).cast(T.DEC)
      val ev = T.events(s, dir)
        .select(col("event_id"), col("event_type"), col("ts_us"),
                col("value").as("x"))
      val dom = ev.groupBy("event_type")
        .agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
      val bucketed = ev.join(broadcast(dom), "event_type")
        .withColumn("bk", least(lit(B - 1), floor(
          (col("ts_us") - col("lo")) /
            ((col("hi") - col("lo")) / B + lit(1e-9))).cast("int")))
        .drop("lo", "hi")
      val wrn = Window.partitionBy("event_type", "bk")
        .orderBy("ts_us", "event_id")
      val wP = wrn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wOff = Window.partitionBy("event_type").orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wLagB = Window.partitionBy("event_type").orderBy("bk")
      // lag-1 lives inside the bucket; only each bucket's FIRST row needs
      // the previous bucket's last x, fetched from the tiny per-bucket
      // summary below (broadcast) — no data-sized lag join.
      val local = bucketed
        .withColumn("lrn", row_number().over(wrn))
        .withColumn("y_in", lag(col("x"), 1).over(wrn))
      // per-bucket summary (≤ 5×B rows): row count → cumulative row
      // offsets; last x → cross-bucket lag-1 seed. Empty buckets simply
      // don't exist, so lag(bk) is exactly the previous row in global
      // order.
      val binfo = bucketed.groupBy("event_type", "bk")
        .agg(count(lit(1)).as("c"),
             max(struct(col("ts_us"), col("event_id"), col("x")))
               .getField("x").as("last_x"))
        .withColumn("roff", coalesce(sum("c").over(wOff), lit(0L)))
        .withColumn("prev_x", lag(col("last_x"), 1).over(wLagB))
        .select("event_type", "bk", "c", "roff", "prev_x")
      val g = local.join(broadcast(binfo), Seq("event_type", "bk"))
        .withColumn("rn", col("lrn") + col("roff"))
        .withColumn("y", when(col("lrn") === 1, col("prev_x"))
                           .otherwise(col("y_in")))
      val mC = when(col("y").isNotNull, lit(1L)).otherwise(lit(0L))
      val mx = when(col("y").isNotNull, col("x")).otherwise(lit(0.0))
      val my = coalesce(col("y"), lit(0.0))
      val measured = g
        .withColumn("m", mC)
        .withColumn("vx", T.dec(mx)).withColumn("vy", T.dec(my))
        .withColumn("vxy", T.dec(mx * my))
        .withColumn("vx2", T.dec(mx * mx))
        .withColumn("vy2", T.dec(my * my))
      val meas = Seq("m", "vx", "vy", "vxy", "vx2", "vy2")
      def zero(c: String) = if (c == "m") lit(0L).cast("long") else DEC0
      // per-(type, bk) local prefixes — same partitioning AND order as
      // wrn, so Catalyst stacks these on the existing exchange+sort.
      // localCheckpoint: THREE consumers follow (bucket offsets, the
      // probe side, the frame-lag side) — without the cut each one
      // re-executes the whole scan+window chain (measured 16 scans /
      // 3.4 s; with it, one chain + cheap replays).
      val localP = meas.foldLeft(measured)((df, c) =>
          df.withColumn(s"p_$c", sum(col(c)).over(wP)))
        .localCheckpoint()
      // bucket totals = the prefixes at each bucket's LAST row (no
      // second aggregation pass over the data) → cumulative offsets,
      // broadcast back
      val boffs = meas.foldLeft(
          localP.filter(col("lrn") === col("c")))((df, c) =>
          df.withColumn(s"o_$c",
            coalesce(sum(col(s"p_$c")).over(wOff), zero(c))))
        .select(col("event_type") +: col("bk") +:
                meas.map(c => col(s"o_$c")): _*)
      val gp = localP.join(broadcast(boffs), Seq("event_type", "bk"))
      // trailing-100 frame = global prefix(i) − global prefix(i−100),
      // fetched by one more (type, rn−100) hash join
      val lagSel = gp.select(Seq(col("event_type").as("et_l"),
                                 col("rn").as("rn_l")) ++
        meas.map(c => (col(s"p_$c") + col(s"o_$c")).as(s"l_$c")): _*)
      val framed = gp.join(lagSel,
          col("event_type") === col("et_l") &&
          col("rn") === col("rn_l") + 100, "left")
        .withColumn("n",
          col("p_m") + col("o_m") - coalesce(col("l_m"), lit(0L)))
        .withColumn("sx",
          col("p_vx") + col("o_vx") - coalesce(col("l_vx"), DEC0))
        .withColumn("sy",
          col("p_vy") + col("o_vy") - coalesce(col("l_vy"), DEC0))
        .withColumn("sxy",
          col("p_vxy") + col("o_vxy") - coalesce(col("l_vxy"), DEC0))
        .withColumn("sx2",
          col("p_vx2") + col("o_vx2") - coalesce(col("l_vx2"), DEC0))
        .withColumn("sy2",
          col("p_vy2") + col("o_vy2") - coalesce(col("l_vy2"), DEC0))
      framed.filter(col("n") >= 30)
        .select(col("event_id"), col("event_type"),
          T.stable4(
            (col("n") * T.d(col("sxy")) - T.d(col("sx")) * T.d(col("sy"))) /
            sqrt((col("n") * T.d(col("sx2")) - T.d(col("sx")) * T.d(col("sx"))) *
                 (col("n") * T.d(col("sy2")) - T.d(col("sy")) * T.d(col("sy")))))
            .as("rcorr"))
        .orderBy("event_id")
    }),

    "win_funnel" -> ((s, dir) => {
      // Ordered funnel (signup → view → purchase): per user, the first
      // signup, the first view AT OR AFTER that signup, the first
      // purchase at or after that view. Each stage is one conditional
      // min over the user's events — computed as three chained aggs on
      // the same user_id key (one real shuffle; the per-user stage
      // tables re-join broadcast). The output is the classic funnel
      // report: users remaining at each stage.
      val ev = T.events(s, dir).select("user_id", "event_type", "ts_us")
      val s1 = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", col("ts_us"))).as("t_signup"))
        .filter(col("t_signup").isNotNull)
      val s2 = ev.join(broadcast(s1), "user_id")
        .groupBy("user_id", "t_signup")
        .agg(min(when(col("event_type") === "view" &&
                      col("ts_us") >= col("t_signup"), col("ts_us"))).as("t_view"))
        .filter(col("t_view").isNotNull)
      val s3 = ev.join(broadcast(s2), "user_id")
        .groupBy("user_id", "t_view")
        .agg(min(when(col("event_type") === "purchase" &&
                      col("ts_us") >= col("t_view"), col("ts_us"))).as("t_purchase"))
        .filter(col("t_purchase").isNotNull)
      val n1 = s1.agg(count(lit(1)).as("n")).select(lit(1).as("stage"),
        lit("signup").as("stage_name"), col("n"))
      val n2 = s2.agg(count(lit(1)).as("n")).select(lit(2).as("stage"),
        lit("view_after_signup").as("stage_name"), col("n"))
      val n3 = s3.agg(count(lit(1)).as("n")).select(lit(3).as("stage"),
        lit("purchase_after_view").as("stage_name"), col("n"))
      n1.unionAll(n2).unionAll(n3).orderBy("stage")
    }),

    "win_share_of_total" -> ((s, dir) => {
      // Share-of-total contribution analytics: each order's share of its
      // customer's total and of the GRAND total. The per-customer total
      // is a whole-partition window sum (no ORDER BY → no running sort,
      // one pass over the exchange); the grand total is a 1-row
      // aggregate broadcast back — NEVER an unpartitioned window, which
      // would serialize 100 TB onto one reducer. Partition sums are
      // exact decimals; ratios stable4-rounded.
      val w = Window.partitionBy("o_custkey")
      val o = T.load(s, dir, "orders")
      val tot = o.agg(T.d(sum(T.dec(col("o_totalprice")))).as("grand"))
      o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .withColumn("cust_total",
                    T.d(sum(T.dec(col("o_totalprice"))).over(w)))
        .crossJoin(broadcast(tot))
        .select(col("o_orderkey"), col("o_custkey"),
                T.stable4(col("o_totalprice") / col("cust_total"))
                  .as("cust_share"),
                T.stable4(col("o_totalprice") / col("grand"))
                  .as("grand_share"))
        .orderBy("o_orderkey")
    }),

    "win_running_distinct" -> ((s, dir) => {
      // Running COUNT(DISTINCT) per user over event time — not directly
      // expressible as a window agg (distinct isn't frame-mergeable);
      // the distributed form marks each (user, type) FIRST occurrence
      // with one ranked window, then running-sums the 0/1 marks. Both
      // windows shuffle on user_id only — one exchange, two sorts.
      val wFirst = Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, dir)
        .withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .withColumn("n_types_seen", sum(col("first_seen")).over(wRun))
        .select(col("event_id"), col("user_id"), col("ts_us"),
                col("event_type"), col("n_types_seen"))
        .orderBy("event_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "win_ranking" -> rankingSql,

    "win_rolling_corr" -> {
      def dw(inner: String) =
        s"CAST(CAST(sum(CAST($inner AS DECIMAL(38,6))) OVER f AS STRING) AS DOUBLE)"
      s"""WITH b AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us,
                            value AS x,
                            lag(value, 1) OVER (PARTITION BY event_type
                              ORDER BY epoch_us(ts), event_id) AS y
                     FROM events),
          m AS (SELECT event_id, event_type, ts_us,
                  CASE WHEN y IS NULL THEN 0 ELSE 1 END AS mm,
                  CASE WHEN y IS NULL THEN 0.0 ELSE x END AS mx,
                  coalesce(y, 0.0) AS my
                FROM b),
          w AS (SELECT event_id, event_type,
                  CAST(sum(mm) OVER f AS BIGINT) AS n,
                  ${dw("mx")} AS sx, ${dw("my")} AS sy,
                  ${dw("mx * my")} AS sxy,
                  ${dw("mx * mx")} AS sx2, ${dw("my * my")} AS sy2
                FROM m
                WINDOW f AS (PARTITION BY event_type ORDER BY ts_us, event_id
                             ROWS BETWEEN 99 PRECEDING AND CURRENT ROW))
          SELECT event_id, event_type,
                 ${graft.Tables.stable4Sql(
                   "(n * sxy - sx * sy) / sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))")}
                   AS rcorr
          FROM w WHERE n >= 30 ORDER BY event_id"""
    },

    "win_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
                     FROM events),
          s1 AS (SELECT user_id,
                        min(CASE WHEN event_type = 'signup' THEN ts_us END)
                          AS t_signup
                 FROM ev GROUP BY user_id HAVING t_signup IS NOT NULL),
          s2 AS (SELECT ev.user_id, t_signup,
                        min(CASE WHEN event_type = 'view'
                                  AND ts_us >= t_signup THEN ts_us END)
                          AS t_view
                 FROM ev JOIN s1 ON ev.user_id = s1.user_id
                 GROUP BY ev.user_id, t_signup HAVING t_view IS NOT NULL),
          s3 AS (SELECT ev.user_id, t_view,
                        min(CASE WHEN event_type = 'purchase'
                                  AND ts_us >= t_view THEN ts_us END)
                          AS t_purchase
                 FROM ev JOIN s2 ON ev.user_id = s2.user_id
                 GROUP BY ev.user_id, t_view HAVING t_purchase IS NOT NULL)
         SELECT 1 AS stage, 'signup' AS stage_name, count(*) AS n FROM s1
         UNION ALL
         SELECT 2, 'view_after_signup', count(*) FROM s2
         UNION ALL
         SELECT 3, 'purchase_after_view', count(*) FROM s3
         ORDER BY stage""",

    "win_share_of_total" -> {
      val dw = "CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER " +
        "(PARTITION BY o_custkey) AS STRING) AS DOUBLE)"
      s"""WITH t AS (SELECT CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                            AS STRING) AS DOUBLE) AS grand FROM orders),
               c AS (SELECT o_orderkey, o_custkey, o_totalprice,
                            $dw AS cust_total
                     FROM orders)
          SELECT o_orderkey, o_custkey,
                 ${graft.Tables.stable4Sql("o_totalprice / cust_total")}
                   AS cust_share,
                 ${graft.Tables.stable4Sql("o_totalprice / grand")}
                   AS grand_share
          FROM c, t ORDER BY o_orderkey"""
    },

    "win_running_distinct" ->
      """WITH f AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                           event_type,
                           CASE WHEN row_number() OVER (
                                  PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts), event_id) = 1
                                THEN 1 ELSE 0 END AS first_seen
                    FROM events)
         SELECT event_id, user_id, ts_us, event_type,
                CAST(sum(first_seen) OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_types_seen
         FROM f ORDER BY event_id""",

    "win_lag_lead" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
                    FROM events)
         SELECT event_id, user_id, ts_us, value,
                lag(value, 1) OVER w AS prev_value,
                value - lag(value, 1) OVER w AS delta,
                lead(ts_us, 1) OVER w AS next_ts
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         ORDER BY user_id, ts_us, event_id""",

    "win_running" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w
                     AS STRING) AS DOUBLE) AS running_total,
                count(*) OVER w AS running_n
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderdate, o_orderkey""",

    "win_range_frame" -> rangeFrameSql,
    "win_first_last" -> firstLastSql,

    "win_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
              g AS (SELECT user_id, ts_us,
                      CASE WHEN ts_us - lag(ts_us) OVER
                             (PARTITION BY user_id ORDER BY ts_us)
                           >= 1800000000 THEN 1 ELSE 0 END AS brk
                    FROM e),
              sid AS (SELECT user_id, ts_us,
                        sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS UNBOUNDED PRECEDING) AS sess
                      FROM g)
         SELECT user_id, min(ts_us) AS sess_start_us, count(*) AS n
         FROM sid GROUP BY user_id, sess
         ORDER BY user_id, sess_start_us""",

    "agg_argmax" ->
      """SELECT o_orderpriority, o_orderkey AS best_order,
                o_totalprice AS best_price, n
         FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                      count(*) OVER (PARTITION BY o_orderpriority) AS n,
                      row_number() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
               FROM orders)
         WHERE rn = 1 ORDER BY o_orderpriority""",

    "win_gaps" ->
      """SELECT user_id, min(event_id) AS start_id, max(event_id) AS end_id,
                count(*) AS n
         FROM (SELECT user_id, event_id,
                      event_id - row_number() OVER (PARTITION BY user_id
                                                    ORDER BY event_id) AS grp
               FROM events)
         GROUP BY user_id, grp ORDER BY user_id, start_id""",

    "win_fill_forward" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                           CASE WHEN event_type <> 'error' THEN value END AS v
                    FROM events)
         SELECT event_id, user_id, ts_us, v,
                last_value(v IGNORE NULLS) OVER w AS v_filled
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY user_id, ts_us, event_id""",
  )
}
