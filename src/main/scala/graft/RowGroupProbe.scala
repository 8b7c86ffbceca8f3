package graft

import org.apache.spark.sql.SparkSession

/** One-off evidence probe for the `sink_cells_nested` watch item
  * (VERDICT r8 #5): the fixture's events.parquet is ONE row group — the
  * atomic parquet split — so the 14-leaf recursive flatten runs as one
  * task locally no matter how many cores exist. This probe re-stages
  * events as N files (N row groups → N splits), runs the UNCHANGED
  * query against the staged copy, and prints min-of-k timings for
  * 1 vs N splits — demonstrating the shuffle-free flatten plan
  * parallelizes with input splits, which is what it would do at 100 TB
  * where a scan has thousands of row groups. Results are recorded in
  * NOISE.md. Usage: `runMain graft.RowGroupProbe [sfDir] [N] [k]`. */
object RowGroupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(4)
    val k = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val staged = s"/tmp/graft_rgprobe_${n}_$tag"
    if (!new java.io.File(s"$staged/events.parquet/_SUCCESS").exists())
      Tables.load(spark, sfDir, "events").repartition(n)
        .write.mode("overwrite").parquet(s"$staged/events.parquet")

    def minTime(dir: String): Double = (1 to k).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries("sink_cells_nested")(spark, dir)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.min

    minTime(staged) // warmup (codegen + staged-file cache)
    val tN = minTime(staged)
    val t1 = minTime(sfDir)
    println(f"""{"probe":"rowgroup_nested_flatten","sf":"$sfDir","splits_1_sec":$t1%.2f,"splits_${n}_sec":$tN%.2f,"speedup":${t1 / tN}%.2f}""")
    spark.stop()
  }
}
