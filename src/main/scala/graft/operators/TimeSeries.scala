package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2 — time-series resampling over the events table: regular
  * grids from irregular event times, gap filling, linear interpolation,
  * and OHLC bar downsampling.
  *
  * Scale notes: the time spine is `sequence()` per GROUP (5 rows → a few
  * thousand array elements), exploded — never a driver-side loop; the
  * spine side is tiny so the fill join broadcasts it or hashes on
  * (type, bucket) which is also the aggregation key, so the whole
  * resample is ONE shuffle of pre-aggregated per-bucket rows, never of
  * raw events. Interpolation is two window passes over the already
  * per-bucket series (cardinality = grid size, not event count).
  */
object TimeSeries extends QueryModule {

  private val HOUR_US = 3600L * 1000000L

  /** Per-(event_type, hour-bucket) exact aggregate + the per-type dense
    * hour spine, left-joined: missing buckets surface as NULL aggregates. */
  private def hourlyWithSpine(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val ev = T.events(s, dir)
      .withColumn("hr", expr(s"ts_us div $HOUR_US"))
    val agg = ev.groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"),
           (T.d(sum(T.dec(col("value")))) / count(lit(1))).as("avg_v"))
    val spine = ev.groupBy("event_type")
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("event_type"),
              explode(sequence(col("h0"), col("h1"))).as("hr"))
    spine.join(agg, Seq("event_type", "hr"), "left")
  }

  val queries: Map[String, Q] = Map(
    "ts_resample" -> ((s, dir) =>
      // Irregular events → dense hourly grid per type; empty buckets
      // become explicit zero-count rows (the gap-fill half of resample).
      hourlyWithSpine(s, dir)
        .select(col("event_type"), col("hr"),
                coalesce(col("n"), lit(0L)).as("n"),
                T.stable4(col("avg_v")).as("avg_v"))
        .orderBy("event_type", "hr")),

    "ts_interpolate" -> ((s, dir) => {
      // Linear interpolation of the hourly avg series across empty
      // buckets: y = y0 + (y1 - y0) * (t - t0) / (t1 - t0), edges held
      // flat (LOCF / NOCB). Two window passes over the bucket series.
      val base = hourlyWithSpine(s, dir)
      val wPrev = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsHr = when(col("avg_v").isNotNull, col("hr"))
      base
        .withColumn("pv", last(col("avg_v"), ignoreNulls = true).over(wPrev))
        .withColumn("ph", last(obsHr, ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("avg_v"), ignoreNulls = true).over(wNext))
        .withColumn("nh", first(obsHr, ignoreNulls = true).over(wNext))
        .withColumn("filled",
          when(col("avg_v").isNotNull, col("avg_v"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) *
                (col("hr") - col("ph")) / (col("nh") - col("ph")))
            .otherwise(coalesce(col("pv"), col("nv"))))
        .select(col("event_type"), col("hr"),
                col("avg_v").isNull.as("was_gap"),
                T.stable4(col("filled")).as("v"))
        .orderBy("event_type", "hr")
    }),

    "ts_ohlc" -> ((s, dir) => {
      // Daily OHLC bars per event_type. Open/close = the value at the
      // min/max (ts_us, event_id) — computed as min/max over a struct
      // ordered (ts_us, event_id, value), so the WHOLE query is ONE
      // partial+final aggregate (SortAggregate: struct buffers aren't
      // hash-able, but the map-side partial still combines first): no
      // Window, no whole-partition shuffle of raw events — each task
      // ships one candidate struct per (type, day). (ts_us, event_id)
      // is unique, so the value field never decides the comparison and
      // the result is deterministic. PlanSpec asserts no Window +
      // partial_min in the plan.
      val DAY_US = 86400L * 1000000L
      val ev = T.events(s, dir).withColumn("day", expr(s"ts_us div $DAY_US"))
      ev.groupBy("event_type", "day")
        .agg(T.r4(min(struct(col("ts_us"), col("event_id"), col("value")))
               .getField("value")).as("open"),
             T.r4(max(col("value"))).as("high"),
             T.r4(min(col("value"))).as("low"),
             T.r4(max(struct(col("ts_us"), col("event_id"), col("value")))
               .getField("value")).as("close"),
             count(lit(1)).as("volume"))
        .orderBy("event_type", "day")
    }),

    "ts_retention" -> ((s, dir) => {
      // Cohort retention matrix: customers grouped by first-activity
      // month, counted in each later month they were active, keyed
      // (cohort, month offset). ONE custkey shuffle for the whole
      // query: the per-customer month set aggregates once
      // (collect_set is bounded by the CALENDAR — ≤ ~80 distinct
      // months at any corpus size — so the buffer is O(1) per
      // customer, unlike collecting orders), the cohort is the
      // array min, and the explode back to (cohort, offset) grain
      // feeds a small final aggregate over a bounded key domain.
      // The naive twin — activity grid ⋈ first-order subquery —
      // shuffles the fact twice on different keys.
      val mi = (year(col("o_orderdate")) * 12 +
                month(col("o_orderdate")) - 1).cast("long")
      T.load(s, dir, "orders")
        .select(col("o_custkey"), mi.as("mi"))
        .groupBy("o_custkey")
        .agg(collect_set(col("mi")).as("ms"))
        .select(array_min(col("ms")).as("c0"),
                explode(col("ms")).as("mi"))
        .groupBy(expr("c0 div 12").as("cohort_year"),
                 (col("c0") % 12 + 1).as("cohort_month"),
                 (col("mi") - col("c0")).as("m_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_year", "cohort_month", "m_offset")
    }),
  )

  private val spineSql =
    s"""ev AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, value
              FROM events),
       agg AS (SELECT event_type, hr, count(*) AS n,
                      CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE)
                        / count(*) AS avg_v
               FROM ev GROUP BY event_type, hr),
       spine AS (SELECT event_type, unnest(generate_series(min(hr), max(hr))) AS hr
                 FROM ev GROUP BY event_type),
       g AS (SELECT spine.event_type, spine.hr, agg.n, agg.avg_v
             FROM spine LEFT JOIN agg
               ON spine.event_type = agg.event_type AND spine.hr = agg.hr)"""

  val oracles: Map[String, String] = Map(
    "ts_resample" ->
      s"""WITH $spineSql
          SELECT event_type, hr, coalesce(n, 0) AS n,
                 ${T.stable4Sql("avg_v")} AS avg_v
          FROM g ORDER BY event_type, hr""",

    "ts_interpolate" ->
      s"""WITH $spineSql,
          f AS (SELECT event_type, hr, avg_v,
                  last_value(avg_v IGNORE NULLS) OVER wp AS pv,
                  last_value(CASE WHEN avg_v IS NOT NULL THEN hr END IGNORE NULLS) OVER wp AS ph,
                  first_value(avg_v IGNORE NULLS) OVER wn AS nv,
                  first_value(CASE WHEN avg_v IS NOT NULL THEN hr END IGNORE NULLS) OVER wn AS nh
                FROM g
                WINDOW wp AS (PARTITION BY event_type ORDER BY hr
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       wn AS (PARTITION BY event_type ORDER BY hr
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
          SELECT event_type, hr, avg_v IS NULL AS was_gap,
                 ${T.stable4Sql("""CASE WHEN avg_v IS NOT NULL THEN avg_v
                            WHEN pv IS NOT NULL AND nv IS NOT NULL
                              THEN pv + (nv - pv) * (hr - ph) / (nh - ph)
                            ELSE coalesce(pv, nv) END""")} AS v
          FROM f ORDER BY event_type, hr""",

    "ts_ohlc" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                            epoch_us(ts) AS ts_us, event_id, value
                     FROM events),
          r AS (SELECT *,
                  row_number() OVER (PARTITION BY event_type, day
                                     ORDER BY ts_us ASC, event_id ASC) AS rn_a,
                  row_number() OVER (PARTITION BY event_type, day
                                     ORDER BY ts_us DESC, event_id DESC) AS rn_d
                FROM ev)
          SELECT event_type, day,
                 round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
                 round(max(value), 4) AS high,
                 round(min(value), 4) AS low,
                 round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
                 count(*) AS volume
          FROM r GROUP BY event_type, day ORDER BY event_type, day""",

    "ts_retention" ->
      """WITH a AS (SELECT DISTINCT o_custkey,
                           year(o_orderdate) * 12 + month(o_orderdate) - 1
                             AS mi
                    FROM orders),
              c AS (SELECT o_custkey, min(mi) AS c0 FROM a
                    GROUP BY o_custkey)
         SELECT c0 // 12 AS cohort_year, c0 % 12 + 1 AS cohort_month,
                mi - c0 AS m_offset, count(*) AS n_active
         FROM a JOIN c USING (o_custkey)
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
  )
}
