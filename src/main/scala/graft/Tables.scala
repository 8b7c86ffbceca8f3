package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared table loaders + determinism helpers.
  *
  * Every oracle-checked query routes its reads through here so that the
  * two cross-engine traps documented in SURVEY.md §1.2/§2.0 are handled
  * uniformly:
  *  - T1: `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark 4
  *    refuses to read unless `spark.sql.legacy.parquet.nanosAsLong=true`;
  *    after that `ts` is a raw-nanosecond Long and `ts div 1000` (integer
  *    division — never `/1000`, which rounds) equals DuckDB `epoch_us(ts)`.
  *  - float-sum nondeterminism: aggregate on DECIMAL(38,6), emit DOUBLE.
  */
object Tables {

  /** Runtime confs every entry point needs. These are dynamic SQL confs,
    * so setting them lazily here covers sessions built by the driver's
    * Verify/Bench mains and by the test fixture alike. */
  def prep(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s
  }

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    prep(s).read.parquet(s"$dir/$name.parquet")

  /** events with `ts_us` = event time normalized to epoch microseconds,
    * the only representation both engines agree on (SURVEY §1.2 T1).
    * Schema-adaptive because the fixture's physical type has changed
    * across generations: INT64 TIMESTAMP(NANOS) reads (under
    * `nanosAsLong`) as a raw-nanosecond Long → `ts div 1000`; INT64
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as TIMESTAMP_NTZ →
    * cast via the UTC session zone to an instant and take
    * `unix_micros`, which equals DuckDB `epoch_us(ts)` exactly. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = load(s, dir, "events")
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => unix_micros(col("ts"))
      case t => throw new IllegalStateException(
        s"events.ts has unsupported type $t; expected LONG (nanos) or TIMESTAMP")
    }
    raw.withColumn("ts_us", tsUs)
  }

  /** events with `ts_ts` as a real TimestampType (µs precision), for
    * window/streaming operators that need time semantics. */
  def eventsTs(s: SparkSession, dir: String): DataFrame =
    events(s, dir).withColumn("ts_ts", timestamp_micros(col("ts_us")))

  /** Register temp views for `spark.sql`-path queries (idempotent). */
  def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => load(s, dir, n).createOrReplaceTempView(n))

  /** Scale-ADAPTIVE fan-out for expansion-heavy fronts (optimization
    * guide §2: derive partitioning from the input, never a constant
    * tuned for one deployment). A parquet ROW GROUP is the atomic scan
    * split, so a small fixture (one row group) feeds a ~25-40×
    * expansion (flatten / span posexplode / per-row md5) to a SINGLE
    * task no matter how many cores exist — RowGroupProbe measured the
    * unchanged plan 5× faster at 16 splits. When (and only when) the
    * scan yields fewer partitions than the session's parallelism,
    * hash-repartition the NARROW pre-expansion rows on `key` so the
    * expansion uses every core; at production scale a 100 TB scan has
    * thousands of row-group splits, the predicate is false, and NO
    * shuffle is added (the r9 objection to an unconditional
    * repartition). Hash clustering on a unique key is deterministic —
    * results never depend on partitioning (the CPUS=3/7 double-run
    * gate pins that for every key). */
  def fanout(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
  }

  /** Synthesized partsupp — the fixture ships no partsupp table, so the
    * TPC-H shapes that need one (Q2/Q11/Q16/Q17) derive it
    * DETERMINISTICALLY: the distinct (partkey, suppkey) pairs actually
    * traded in lineitem, with key-derived cost and availqty (integer
    * arithmetic then one exact divide — identical in both engines).
    * SQL twin: [[partsuppSql]]. */
  def partsupp(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .select(col("l_partkey").as("ps_partkey"),
              col("l_suppkey").as("ps_suppkey")).distinct()
      .withColumn("ps_supplycost",
        ((col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 1000)
          .cast("double") / 100.0)
      .withColumn("ps_availqty",
        (col("ps_partkey") * 7 + col("ps_suppkey") * 3) % 100 + 1)

  val partsuppSql: String =
    """SELECT ps_partkey, ps_suppkey,
              CAST((ps_partkey * 31 + ps_suppkey * 17) % 1000 AS DOUBLE)
                / 100.0 AS ps_supplycost,
              (ps_partkey * 7 + ps_suppkey * 3) % 100 + 1 AS ps_availqty
       FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                             l_suppkey AS ps_suppkey FROM lineitem)"""

  val DEC: DecimalType = DecimalType(38, 6)

  /** Exact, associative (partition-order-independent) aggregation input. */
  def dec(c: Column): Column = c.cast(DEC)

  /** Emit boundary for inexact aggregates: the decimal result is exact, and
    * decimal→double conversion is correctly rounded in both engines, so the
    * emitted double is bit-identical across Spark and DuckDB. */
  def d(c: Column): Column = c.cast("double")

  /** Round-to-4dp double emit, for similarity scores etc. (SURVEY §2.0-6). */
  def r4(c: Column): Column = round(c.cast("double"), 4)

  /** Mode-independent 4-dp rounding for ratio-of-small-integer outputs:
    * pure IEEE arithmetic identical in both engines. Engine-native
    * round() diverges on exact decimal ties (Spark HALF_UP on the
    * shortest string vs DuckDB half-away on the binary value), and
    * k/n ratios DO land on such ties. SQL twin: `stable4Sql`. */
  def stable4(c: Column): Column =
    floor(c * 10000 + 0.5).cast("double") / 10000.0
  def stable4Sql(x: String): String = s"floor(($x) * 10000 + 0.5) / 10000.0"
}
