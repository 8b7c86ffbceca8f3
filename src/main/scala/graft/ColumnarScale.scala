package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 evidence harness (VERDICT r18 #1 done-criterion): measured
  * full-scan throughput of the VECTORIZED connector read path vs the
  * row-at-a-time reader it replaces, on a ≥256-file store. The A/B
  * lever is `spark.graft.cell.vectorized` (the operational kill
  * switch); the store, the query and the plan shape are otherwise
  * identical — only the decode path changes. Full-store passes are
  * exactly what multiplies at 100 TB (major compaction reads,
  * verify_rep sides, SPJ fact joins, bucketed aggs), so the gain here
  * is the gain there, per core. Appended to SEEKSCALE.md at round
  * close. Usage: `runMain graft.ColumnarScale [rows] [maxRowsPerFile]
  * [reps]`. */
object ColumnarScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(2000000)
    val perFile = args.lift(1).map(_.toInt).getOrElse(8000)
    val k = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val store = s"/tmp/graft_colscale_${rows}_$perFile"
    if (!new java.io.File(s"$store/_SUCCESS").exists()) {
      spark.range(rows.toLong)
        .select(format_string("k%09d", col("id")).as("rowkey"),
                concat(lit("f"), (col("id") % 3).cast("string")).as("family"),
                concat(lit("q"), (col("id") % 7).cast("string")).as("qualifier"),
                (col("id") % 1000).cast("long").as("version"),
                format_string("value-%07d-padding-padding", col("id") % 50000)
                  .as("value"))
        .write.format("graftcell").option("maxRowsPerFile", perFile)
        .mode("overwrite").save(store)
    }
    val nFiles = graft.sources.cell.CellFooterCache.filesOf(store).size

    // TWO full-store pass shapes, both reading every column:
    //  - agg: groupBy(family) with string max/min — the bucketed-agg /
    //    compaction read shape, where downstream agg work (identical on
    //    both paths) dilutes the decode difference;
    //  - decode: one global sum over cheap per-column accessors — the
    //    decode-dominated shape (closest to a compaction's read side,
    //    whose downstream is a sort the exchange owns).
    def aggOnce(): Long = {
      val df = spark.read.format("graftcell").load(store)
        .groupBy("family")
        .agg(count(lit(1)).as("n"), max("value").as("mx"),
             min("rowkey").as("mn"), sum(length(col("qualifier"))).as("q"))
      df.queryExecution.toRdd.count()
    }
    def decodeOnce(): Long = {
      val df = spark.read.format("graftcell").load(store)
        .select((length(col("rowkey")) + length(col("family")) +
                 length(col("qualifier")) + length(col("value")))
                  .cast("long").plus(col("version")).as("x"))
        .agg(sum(col("x")))
      df.queryExecution.toRdd.count()
    }
    def minTime(once: () => Long): Double = (1 to k).map { _ =>
      val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
    }.min

    def plan(): String = spark.read.format("graftcell").load(store)
      .groupBy("family").agg(count(lit(1)))
      .queryExecution.executedPlan.toString

    spark.conf.set("spark.graft.cell.vectorized", "true")
    assert(plan().contains("batched: true"), "columnar path must engage")
    minTime(aggOnce); minTime(decodeOnce) // warmup (codegen + page cache)
    val aVec = minTime(aggOnce)
    val dVec = minTime(decodeOnce)
    spark.conf.set("spark.graft.cell.vectorized", "false")
    assert(plan().contains("batched: false"), "kill switch must disengage")
    minTime(aggOnce); minTime(decodeOnce) // row-path codegen warmup
    val aRow = minTime(aggOnce)
    val dRow = minTime(decodeOnce)
    spark.conf.set("spark.graft.cell.vectorized", "true")
    println(f"""{"probe":"columnar_full_scan","rows":$rows,"files":$nFiles,"agg_row_sec":$aRow%.2f,"agg_vec_sec":$aVec%.2f,"agg_speedup":${aRow / aVec}%.2f,"decode_row_sec":$dRow%.2f,"decode_vec_sec":$dVec%.2f,"decode_speedup":${dRow / dVec}%.2f}""")

    // r20 — the RESIDUAL-FILTERED scan (VERDICT r19 missing #4): a
    // pushed family predicate keeps 1/3 of the rows in EVERY file (no
    // file prunes — family interleaves within each region file), so
    // the A/B isolates decode+residual-eval, the exact work the
    // filtering columnar reader vectorizes. Same kill-switch lever.
    def filterOnce(): Long = {
      val df = spark.read.format("graftcell").load(store)
        .filter(col("family") === "f1")
        .select((length(col("rowkey")) + length(col("value")))
                  .cast("long").plus(col("version")).as("x"))
        .agg(sum(col("x")))
      df.queryExecution.toRdd.count()
    }
    minTime(filterOnce) // vectorized warmup
    val fVec = minTime(filterOnce)
    spark.conf.set("spark.graft.cell.vectorized", "false")
    minTime(filterOnce) // row-path warmup
    val fRow = minTime(filterOnce)
    spark.conf.set("spark.graft.cell.vectorized", "true")
    println(f"""{"probe":"columnar_filtered_scan","rows":$rows,"files":$nFiles,"filter_row_sec":$fRow%.2f,"filter_vec_sec":$fVec%.2f,"filter_speedup":${fRow / fVec}%.2f}""")
    spark.stop()
  }
}
