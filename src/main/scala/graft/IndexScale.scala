package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the round-19 GLOBAL-SECONDARY-INDEX claim: a VALUE-RANGE
  * probe through the index costs O(matching keys), not O(store). The
  * fixture is the case NO other pruning layer can serve — a
  * high-cardinality value column (sha1 hex) probed by PREFIX RANGE
  * (`value LIKE 'aa%'`): per-file value [min,max] spans the whole hex
  * space (no range-stat prune) and value BLOOMS are point-only (no
  * membership prune for a range) — so the indexless twin scans the
  * store. The index turns the value range into a rowkey-prefix SEEK
  * on the (small) index store, and the returned back-pointers drive a
  * per-key-pruned base multiget: matching keys are uniformly
  * scattered (~rows/256 of them), so the base plans ~min(k, n) files
  * — the selectivity, not the store, bounds the cost. Per store size
  * N (region files of 50 rows): build the (d, q) index once, probe
  * 'aa%', report seconds, index and base files planned (k/n), rows,
  * vs the full-scan twin.
  *
  * Usage: `sbt "runMain graft.IndexScale"` — prints a markdown table
  * (appended to SEEKSCALE.md at round close). */
object IndexScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }
    def minOf3(body: => Long): (Double, Long) = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = body
        (System.nanoTime() - t0) / 1e9
      }
      (ts.min, rows)
    }
    val rf = "regionFiles: (\\d+)/(\\d+)".r
    def kn(df: org.apache.spark.sql.DataFrame): String =
      rf.findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("?")

    val root = "/tmp/graft_indexscale"
    println("| region files | index build (s) | probe via index (s) | idx k/n | base k/n | rows | full-scan twin (s) | twin k/n |")
    println("|---|---|---|---|---|---|---|---|")
    Seq(16, 64, 256, 1024).foreach { nFiles =>
      val store = s"$root/s_$nFiles"
      val idx = s"$root/i_$nFiles"
      Seq(store, idx).foreach { d =>
        deleteRec(new java.io.File(d))
        graft.sources.cell.CellFooterCache.invalidate(d)
      }
      val rows = nFiles * 50L
      // high-cardinality hex values: every file's value [min,max]
      // spans the probe range and blooms are point-only — no layer
      // but the index can serve a value-range probe
      spark.range(rows).select(
          format_string("%010d", col("id")).as("rowkey"),
          lit("d").as("family"), lit("q").as("qualifier"),
          col("id").as("version"),
          sha1(col("id").cast("string")).as("value"))
        .write.format("graftcell").option("maxRowsPerFile", "50")
        .mode("append").save(store)

      val t0 = System.nanoTime()
      graft.sources.cell.GraftCellMaintenance.buildIndex(
        spark, store, idx, "d", "q", maxRowsPerFile = 200L)
      val buildS = (System.nanoTime() - t0) / 1e9

      def idxSeek() = spark.read.format("graftcell").load(idx)
        .filter(col("rowkey").startsWith("aa"))
        .select("value")
      def probed(keys: Seq[String]) = spark.read.format("graftcell")
        .load(store).filter(col("rowkey").isin(keys: _*))
      val (probeS, probeRows) = minOf3 {
        val keys = idxSeek().collect().map(_.getString(0)).toSeq.sorted
        probed(keys).count()
      }
      val keys = idxSeek().collect().map(_.getString(0)).toSeq.sorted
      val idxKn = kn(idxSeek())
      val probeKn = kn(probed(keys))
      val twin = spark.read.format("graftcell").load(store)
        .filter(col("value").startsWith("aa"))
      val (twinS, twinRows) = minOf3(twin.count())
      require(probeRows == twinRows,
        s"index probe diverged: $probeRows vs $twinRows")
      println(f"| $nFiles | $buildS%.2f | $probeS%.2f | $idxKn | $probeKn | $probeRows | $twinS%.2f | ${kn(twin)} |")
    }
    spark.stop()
  }
}
