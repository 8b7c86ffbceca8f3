package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure probe (VERDICT r13 #3): runs contract keys under a
  * CLAMPED heap (`SPARK_DRIVER_MEM=4g sbt "runMain graft.MemoryProbe"`)
  * and reports per-key spill + peak-execution-memory task metrics, so
  * the 100 TB scale story has spill-shaped evidence, not just
  * plan-shaped.
  *
  * Two modes:
  *  - natural (default): clamped heap, stock thresholds — proves the
  *    heaviest keys complete with NO OOM at a fraction of the bench
  *    heap (headroom evidence).
  *  - `GRAFT_FORCE_SPILL=1`: additionally routes every sort / window /
  *    join buffer through its REAL spill path by lowering the engine's
  *    own force-spill thresholds (the knobs Spark's test suites use) —
  *    proves graceful UnsafeExternalSorter spills (metrics > 0), i.e.
  *    the behavior a production executor exhibits when a 100 TB
  *    partition exceeds its execution-memory share.
  *
  * Output: one JSON line per key
  * `{"key":…,"sec":…,"memSpill":…,"diskSpill":…,"peakExecMem":…,"oom":false}`.
  */
object MemoryProbe {
  private val DEFAULT_KEYS = Seq(
    "pipeline_e2e_v2", "sink_cells_nested", "rcte_running_clamp",
    "pipeline_e2e_v3", "sink_cells_variant_deep", "dedup_minhash")

  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args.toSeq else DEFAULT_KEYS
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val force = sys.env.get("GRAFT_FORCE_SPILL").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (force) {
      // the engine's own graceful-degradation knobs: force the in-memory
      // buffers onto their spill paths at small element counts, so the
      // real UnsafeExternalSorter / ExternalAppendOnlyUnsafeRowArray
      // machinery runs at test SF exactly as it would under production
      // memory pressure
      b.config("spark.shuffle.spill.numElementsForceSpillThreshold", "5000")
        .config("spark.sql.windowExec.buffer.spill.threshold", "1000")
        .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "1000")
        .config("spark.sql.sessionWindow.buffer.spill.threshold", "1000")
        .config("spark.sql.cartesianProductExec.buffer.spill.threshold", "1000")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val peakExec = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })

    println(s"""{"mode":"${if (force) "forced" else "natural"}","heap":"${Runtime.getRuntime.maxMemory() / (1 << 20)}m","cpus":$cpus,"sf":"$sfDir"}""")
    keys.foreach { key =>
      // settle the async listener bus, then snapshot deltas per key
      Thread.sleep(1500)
      val (m0, d0) = (memSpill.get, diskSpill.get)
      peakExec.set(0L)
      val t0 = System.nanoTime()
      val oom =
        try {
          SparkEntry.queries(key)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          false
        } catch {
          case e: Throwable
              if Option(e.getMessage).exists(_.contains("OutOfMemory")) ||
                 e.isInstanceOf[OutOfMemoryError] => true
        }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"""{"key":"$key","sec":$sec%.2f,"memSpill":${memSpill.get - m0},"diskSpill":${diskSpill.get - d0},"peakExecMem":${peakExec.get},"oom":$oom}""")
    }
    spark.stop()
  }
}
