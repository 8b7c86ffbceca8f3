package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 evidence harness (VERDICT r19 missing #5 done-criterion):
  * measured SHUFFLE WIDTH of the ExactSubstr span pipeline — raw
  * W=40-char spans (the byte-exact oracle twin) vs the xxhash64 8-byte
  * production mode — on the sf documents table. The cross-doc span
  * exchange is THE cost of substring dedup at 100 TB (every other
  * stage is row-local); this harness runs the identical
  * `substringPruneStats` pipeline both ways and reports total shuffle
  * bytes written plus wall time, min-of-k. Appended to SEEKSCALE.md at
  * round close. Usage: `runMain graft.SubstrScale [sfDir] [reps]`. */
object SubstrScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted)
          : Unit = {
        shuffleBytes.addAndGet(
          e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("t",
        when(col("doc_id") % 5 === 0,
             concat(col("text"),
                    lit(operators.DedupOps.SUB_BOILER)))
          .otherwise(col("text")))

    def runOnce(hashed: Boolean): (Double, Long) = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      operators.DedupOps.substringPruneStats(docs, hashed)
        .queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      (dt, shuffleBytes.get())
    }

    def best(hashed: Boolean): (Double, Long) = {
      runOnce(hashed) // warmup (codegen + page cache)
      (1 to k).map(_ => runOnce(hashed)).minBy(_._1)
    }

    val (rawT, rawB) = best(hashed = false)
    val (hT, hB) = best(hashed = true)
    println("## ExactSubstr span-shuffle width: raw spans vs xxhash64 " +
      "(round 20)")
    println()
    println(s"`graft.SubstrScale` on $sfDir documents, CPUS=$cpus, " +
      s"min of $k warm reps (total shuffle write bytes per full " +
      "dedup_substring_prune run; the raw mode is the oracle twin, " +
      "the hashed mode is what a 100 TB deployment runs):")
    println()
    println("| span payload | shuffle written | min time (s) |")
    println("|---|---|---|")
    println(f"| raw ${operators.DedupOps.SUB_W}-char strings | " +
      f"${rawB / 1048576.0}%.1f MiB | $rawT%.2f |")
    println(f"| xxhash64 longs | ${hB / 1048576.0}%.1f MiB | $hT%.2f |")
    println()
    println(f"Shuffle narrowing: ${rawB.toDouble / hB}%.2fx. Results " +
      "are row-identical (DedupSpec equivalence test + the raw-oracle " +
      "hash compare on dedup_substring_hashed).")
    spark.stop()
  }
}
