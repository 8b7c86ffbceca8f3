package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts (SURVEY §1.2 T1)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: pay first-query JIT/codegen once so it isn't
    // charged to whichever query sorts first alphabetically.
    locally {
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.groupBy("n_regionkey").count()
        .join(n, "n_regionkey").orderBy("n_name")
        .write.mode("overwrite").format("noop").save()
    }
    // noop sink forces full physical execution (count() would let the
    // optimizer drop sorts/projections and under-measure).
    // A failed query must NOT score ~0 s and silently inflate apparent
    // perf: record the failure, exclude it from the total, and report it.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          failed(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
          System.err.println(s"[bench] FAILED $name: ${failed(name)}")
          None
      }
    }
    // Two passes, min per query: the shared 93-query session shows rare
    // multi-second driver-side stalls at RANDOM queries (same query is
    // 1.5 s or 39 s across runs with idle CPU); the min reports
    // steady-state cost, which is what a cluster deployment sees.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = ordered.flatMap { case (n, f) => once(n, f).map(n -> _) }
    val pass2 = ordered.flatMap { case (n, f) => once(n, f).map(n -> _) }
    val results = (pass1 ++ pass2).groupBy(_._1)
      .map { case (n, ts) => n -> ts.map(_._2).min }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fj = failed.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "'") + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_pass":${results.size},"n_fail":${failed.size},"failed":$fj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
