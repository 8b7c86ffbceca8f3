package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering.
  *
  * At 100 TB the scan is the cost, and single-key sort layouts only
  * prune one predicate column: files sorted by `user_id` have full-range
  * `ts` min/max, so a time filter reads everything. Interleaving the
  * bits of both dimensions into one sort key gives every file a bounded
  * min/max envelope in BOTH dimensions, so parquet row-group stats prune
  * scans on either predicate (the technique behind
  * OPTIMIZE ... ZORDER BY in lakehouse engines). LayoutSpec measures
  * exactly that: per-file spans of a z-clustered layout are bounded in
  * both dims, a single-key layout is full-range in the other dim.
  *
  * The z-value itself is a pure per-row bitwise projection (codegen'd,
  * shuffle-free); the only wide operation in a re-layout job is the
  * final range-partitioned sort-by-z write, which is exactly the shuffle
  * a single-key sort write pays too.
  */
object Layout extends QueryModule {

  private val BITS = 10 // 10 bits/dim -> 20-bit z keys, plenty for file-level stats

  /** Interleave the low BITS bits: dim-u at odd positions, dim-v even. */
  private[graft] def morton(qu: Column, qv: Column): Column =
    (0 until BITS).map { i =>
      shiftright(qu, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(qv, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** SQL twin of [[morton]] (same expression tree, DuckDB operators). */
  private def mortonSql(qu: String, qv: String): String =
    (0 until BITS).map { i =>
      s"((($qu) >> $i) & 1) * ${1L << (2 * i + 1)} + " +
        s"((($qv) >> $i) & 1) * ${1L << (2 * i)}"
    }.mkString(" + ")

  /** events + `z` column: both dims quantized to BITS-bit grid cells via
    * exact integer arithmetic against the (tiny, broadcast) global
    * bounds, then bit-interleaved. */
  private[graft] def withZ(s: SparkSession, dir: String): DataFrame = {
    val e = T.events(s, dir).select("event_id", "user_id", "ts_us")
    val bounds = e.agg(
      min("user_id").as("u_min"), max("user_id").as("u_max"),
      min("ts_us").as("t_min"), max("ts_us").as("t_max"))
    val cells = 1L << BITS
    e.crossJoin(broadcast(bounds))
      .withColumn("qu", expr(
        s"(user_id - u_min) * ${cells}L div (u_max - u_min + 1)"))
      .withColumn("qv", expr(
        s"(ts_us - t_min) * ${cells}L div (t_max - t_min + 1)"))
      .withColumn("z", morton(col("qu"), col("qv")))
  }

  val queries: Map[String, Q] = Map(
    "layout_zorder" -> ((s, dir) =>
      withZ(s, dir).select(col("event_id"), col("z"))
        .orderBy("z", "event_id")),
  )

  val oracles: Map[String, String] = Map(
    "layout_zorder" -> {
      val cells = 1L << BITS
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                     FROM events),
              b AS (SELECT min(user_id) AS u_min, max(user_id) AS u_max,
                           min(ts_us) AS t_min, max(ts_us) AS t_max
                    FROM e),
              q AS (SELECT event_id,
                           (user_id - u_min) * $cells // (u_max - u_min + 1) AS qu,
                           (ts_us - t_min) * $cells // (t_max - t_min + 1) AS qv
                    FROM e CROSS JOIN b)
          SELECT event_id, ${mortonSql("qu", "qv")} AS z
          FROM q ORDER BY z, event_id"""
    },
  )
}
