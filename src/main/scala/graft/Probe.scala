package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: `sbt "runMain graft.Probe <query> [reps] [sfDir]"`
  * times one contract query in isolation (noop sink, like Bench). */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || !SparkEntry.queries.contains(args(0)) ||
        (args.length > 1 &&
         !scala.util.Try(args(1).toInt).toOption.exists(_ > 0))) {
      System.err.println("usage: runMain graft.Probe <query> [reps] [sfDir]")
      sys.exit(1)
    }
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same session extensions as Bench/Verify — the index-routing
      // keys assert their routed plans, which need IndexRoute installed
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (sys.env.contains("PROBE_EXPLAIN"))
      println(fn(spark, sfDir).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
