package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** SURVEY.md §2 — data-profiling / quality-diagnostic operators a
  * 100 TB curation pipeline runs before anything else: column profiles,
  * exact distinct via bitmap partial aggregation, and statistical
  * outlier flagging.
  *
  * Scale notes:
  *  - `profile_table` computes every per-column statistic in ONE scan
  *    (one partial-aggregable global agg + a constant-width unpivot),
  *    vs the naive one-scan-per-column loop — at 100 TB the difference
  *    is N full table reads.
  *  - `agg_bitmap_distinct` is the roaring-bitmap exact-distinct
  *    pattern (ClickHouse groupBitmap / Druid): the partial aggregate
  *    per map task is a fixed-size bitset OR'd in place, so the
  *    shuffle carries one bitmap per (group × partition) instead of
  *    one row per distinct value — exact answers at HLL shuffle cost
  *    when the key domain is dense-integer (suppkey here).
  *  - `anomaly_zscore` broadcasts the 5-row per-group stats table back
  *    onto the fact scan — no second shuffle of the fact side.
  */
object Profiling extends QueryModule {

  /** Exact-distinct-count bitmap over a dense non-negative Long domain.
    * Buffer = growable Array[Long] bitset; reduce sets a bit, merge ORs
    * word-wise — both associative + commutative, so partial aggregation
    * and shuffle order can't affect the result (determinism §2.0). */
  object BitmapDistinct extends Aggregator[Long, Array[Long], Long] {
    private def ensure(b: Array[Long], words: Int): Array[Long] =
      if (b.length >= words) b
      else { val n = new Array[Long](words max (b.length * 2)); System.arraycopy(b, 0, n, 0, b.length); n }
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], key: Long): Array[Long] = {
      val idx = (key >>> 6).toInt
      val out = ensure(b, idx + 1)
      out(idx) |= 1L << (key & 63)
      out
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      val (big, small) = if (x.length >= y.length) (x, y) else (y, x)
      var i = 0
      while (i < small.length) { big(i) |= small(i); i += 1 }
      big
    }
    def finish(b: Array[Long]): Long = {
      var n = 0L; var i = 0
      while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
      n
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Decimal(28,6)→string emit used for min/max of double columns so the
    * profile's VARCHAR stat cells compare exactly across engines (same
    * trick as the cell model's value serialization). */
  private def ds(c: org.apache.spark.sql.Column) =
    c.cast("decimal(28,6)").cast("string")

  val queries: Map[String, Q] = Map(
    "profile_table" -> ((s, dir) => {
      // Per-column (count, nulls, exact distinct, min, max) profile of
      // four lineitem columns, unpivoted to one row per column. FOUR
      // countDistincts in ONE agg make Catalyst Expand the scan ×5
      // before the shuffle — at 100 TB that is 4 extra full-table
      // shuffle volumes (the r7 verdict's slowest-query finding). So:
      // the non-distinct stats keep their one-scan partial agg, and
      // each exact distinct runs as its OWN single-distinct aggregate —
      // planned as partial-distinct HashAggregates over a scan pruned
      // to that column alone (parquet columnar layout makes the
      // per-column rescan ~free, and each shuffle carries only
      // pre-deduped values, not ×5 row multiples). The 1-row results
      // broadcast-cross-join back. PlanSpec asserts no Expand.
      val li = T.load(s, dir, "lineitem")
      val base = li.agg(
        count(lit(1)).as("n_rows"),
        count(col("l_quantity")).as("c_qty"),
        ds(min(col("l_quantity"))).as("mn_qty"),
        ds(max(col("l_quantity"))).as("mx_qty"),
        count(col("l_extendedprice")).as("c_px"),
        ds(min(col("l_extendedprice"))).as("mn_px"),
        ds(max(col("l_extendedprice"))).as("mx_px"),
        count(col("l_returnflag")).as("c_rf"),
        min(col("l_returnflag")).as("mn_rf"),
        max(col("l_returnflag")).as("mx_rf"),
        count(col("l_orderkey")).as("c_ok"),
        min(col("l_orderkey")).cast("string").as("mn_ok"),
        max(col("l_orderkey")).cast("string").as("mx_ok"))
      def dct(c: String, as: String) =
        li.agg(countDistinct(col(c)).as(as))
      val agg = base
        .crossJoin(broadcast(dct("l_quantity", "d_qty")))
        .crossJoin(broadcast(dct("l_extendedprice", "d_px")))
        .crossJoin(broadcast(dct("l_returnflag", "d_rf")))
        .crossJoin(broadcast(dct("l_orderkey", "d_ok")))
      agg.selectExpr(
        """stack(4,
             'l_quantity',      c_qty, n_rows - c_qty, d_qty, mn_qty, mx_qty,
             'l_extendedprice', c_px,  n_rows - c_px,  d_px,  mn_px,  mx_px,
             'l_returnflag',    c_rf,  n_rows - c_rf,  d_rf,  mn_rf,  mx_rf,
             'l_orderkey',      c_ok,  n_rows - c_ok,  d_ok,  mn_ok,  mx_ok)
           AS (column_name, n_values, n_nulls, n_distinct, min_value, max_value)""")
        .orderBy("column_name")
    }),

    "agg_bitmap_distinct" -> ((s, dir) => {
      import s.implicits._
      val bitmapCount = udaf(BitmapDistinct)
      T.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(bitmapCount(col("l_suppkey")).as("n_supp"),
             count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    "anomaly_zscore" -> ((s, dir) => {
      // Per-event-type mean/stddev from exact decimal sums (the
      // agg_stats_manual determinism recipe), broadcast back onto the
      // event scan, flag |z| > 3. One shuffle for the 5-row stats agg,
      // zero extra shuffles on the fact side.
      val ev = T.events(s, dir)
      val stats = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        T.d(sum(T.dec(col("value")))).as("s1"),
        T.d(sum(T.dec(col("value") * col("value")))).as("s2"))
        .select(col("event_type").as("et"), col("n"),
          (col("s1") / col("n")).as("mean"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
            .as("sd"))
      ev.join(broadcast(stats), ev("event_type") === stats("et"))
        .withColumn("z", (col("value") - col("mean")) / col("sd"))
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("event_type"),
                T.r4(col("value")).as("value_r"), T.r4(col("z")).as("z_r"))
        .orderBy("event_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "profile_table" ->
      """WITH a AS (
           SELECT count(*) AS n_rows,
                  count(l_quantity) AS c_qty, count(DISTINCT l_quantity) AS d_qty,
                  CAST(CAST(min(l_quantity) AS DECIMAL(28,6)) AS VARCHAR) AS mn_qty,
                  CAST(CAST(max(l_quantity) AS DECIMAL(28,6)) AS VARCHAR) AS mx_qty,
                  count(l_extendedprice) AS c_px, count(DISTINCT l_extendedprice) AS d_px,
                  CAST(CAST(min(l_extendedprice) AS DECIMAL(28,6)) AS VARCHAR) AS mn_px,
                  CAST(CAST(max(l_extendedprice) AS DECIMAL(28,6)) AS VARCHAR) AS mx_px,
                  count(l_returnflag) AS c_rf, count(DISTINCT l_returnflag) AS d_rf,
                  min(l_returnflag) AS mn_rf, max(l_returnflag) AS mx_rf,
                  count(l_orderkey) AS c_ok, count(DISTINCT l_orderkey) AS d_ok,
                  CAST(min(l_orderkey) AS VARCHAR) AS mn_ok,
                  CAST(max(l_orderkey) AS VARCHAR) AS mx_ok
           FROM lineitem)
         SELECT 'l_quantity' AS column_name, c_qty AS n_values,
                n_rows - c_qty AS n_nulls, d_qty AS n_distinct,
                mn_qty AS min_value, mx_qty AS max_value FROM a
         UNION ALL
         SELECT 'l_extendedprice', c_px, n_rows - c_px, d_px, mn_px, mx_px FROM a
         UNION ALL
         SELECT 'l_returnflag', c_rf, n_rows - c_rf, d_rf, mn_rf, mx_rf FROM a
         UNION ALL
         SELECT 'l_orderkey', c_ok, n_rows - c_ok, d_ok, mn_ok, mx_ok FROM a
         ORDER BY column_name""",

    "agg_bitmap_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
                count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "anomaly_zscore" ->
      """WITH st AS (
           SELECT event_type AS et, count(*) AS n,
                  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS s1,
                  CAST(CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS s2
           FROM events GROUP BY event_type),
         stats AS (
           SELECT et, s1 / n AS mean,
                  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
           FROM st)
         SELECT event_id, event_type,
                round(CAST(value AS DOUBLE), 4) AS value_r,
                round((value - mean) / sd, 4) AS z_r
         FROM events JOIN stats ON events.event_type = stats.et
         WHERE abs((value - mean) / sd) > 3.0
         ORDER BY event_id""",
  )
}
