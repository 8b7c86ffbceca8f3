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

  /** events + `h` column: the HILBERT index of the (qu, qv) grid cell.
    * Hilbert beats Morton on locality (no diagonal jumps between
    * quadrant boundaries: successive indices are always grid-adjacent),
    * giving slightly tighter per-file envelopes at the same file count —
    * the curve behind OPTIMIZE ... with Hilbert clustering in newer
    * lakehouse engines.
    *
    * The classic per-bit state machine (flip + swap by quadrant) is
    * loop-carried, so it unrolls into BITS successive projections over
    * named columns — each step is a cheap integer expression layer
    * (Catalyst keeps the layers: CollapseProject does not inline
    * multiply-referenced non-trivial expressions, so the plan stays
    * linear in BITS, fully codegen'd, shuffle-free). */
  private[graft] def withHilbert(s: SparkSession, dir: String): DataFrame =
    hilbertSteps(withZ(s, dir)
      .withColumn("hx", col("qu")).withColumn("hy", col("qv")), BITS)

  /** Unrolled Hilbert state machine over existing `hx`/`hy` columns;
    * exposed with a `bits` parameter so LayoutSpec can prove the curve
    * properties (bijection + unit steps) on a complete small grid. */
  private[graft] def hilbertSteps(df0: DataFrame, bits: Int): DataFrame = {
    var df = df0.withColumn("hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val side = 1L << i
      df = df
        .withColumn("rx", shiftright(col("hx"), i).bitwiseAND(lit(1L)))
        .withColumn("ry", shiftright(col("hy"), i).bitwiseAND(lit(1L)))
        .withColumn("hd", col("hd") +
          lit(side * side) * (col("rx") * 3).bitwiseXOR(col("ry")))
        // quadrant rotation: ry=0 flips (if rx=1) then swaps x/y;
        // nx is staged first so the hy update still sees the OLD hx
        .withColumn("nx", when(col("ry") === 0,
            when(col("rx") === 1, lit(side - 1) - col("hy"))
              .otherwise(col("hy"))).otherwise(col("hx")))
        .withColumn("hy", when(col("ry") === 0,
            when(col("rx") === 1, lit(side - 1) - col("hx"))
              .otherwise(col("hx"))).otherwise(col("hy")))
        .withColumn("hx", col("nx"))
    }
    df.withColumn("h", col("hd"))
  }

  /** SQL twin of [[withHilbert]]'s index: one CTE per unrolled bit. */
  private def hilbertSql(from: String): String = {
    val steps = ((BITS - 1) to 0 by -1).zipWithIndex.map {
      case (i, step) =>
        val side = 1L << i
        val prev = if (step == 0) from else s"h$step"
        s"""h${step + 1} AS (
              SELECT event_id,
                CASE WHEN ry = 0 THEN CASE WHEN rx = 1
                       THEN ${side - 1} - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN ry = 0 THEN CASE WHEN rx = 1
                       THEN ${side - 1} - x ELSE x END
                     ELSE y END AS y,
                d + ${side * side} * xor(3 * rx, ry) AS d
              FROM (SELECT event_id, x, y, d,
                           (x >> $i) & 1 AS rx, (y >> $i) & 1 AS ry
                    FROM $prev) t)"""
    }
    steps.mkString(",\n")
  }

  val queries: Map[String, Q] = Map(
    "layout_zorder" -> ((s, dir) =>
      withZ(s, dir).select(col("event_id"), col("z"))
        .orderBy("z", "event_id")),

    "layout_hilbert" -> ((s, dir) =>
      withHilbert(s, dir).select(col("event_id"), col("h"))
        .orderBy("h", "event_id")),
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

    "layout_hilbert" -> {
      val cells = 1L << BITS
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                     FROM events),
              b AS (SELECT min(user_id) AS u_min, max(user_id) AS u_max,
                           min(ts_us) AS t_min, max(ts_us) AS t_max
                    FROM e),
              h0 AS (SELECT event_id,
                           (user_id - u_min) * $cells // (u_max - u_min + 1) AS x,
                           (ts_us - t_min) * $cells // (t_max - t_min + 1) AS y,
                           CAST(0 AS BIGINT) AS d
                    FROM e CROSS JOIN b),
              ${hilbertSql("h0")}
          SELECT event_id, d AS h
          FROM h$BITS ORDER BY h, event_id"""
    },
  )
}
