package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.cell.{CellFooterCache, CellManifest, CellTravelLog,
                           GraftCellMaintenance}

/** Measures the round-18 TOTAL-OR-LOUD `TIMESTAMP AS OF` claim: the
  * travel log is O(structural rewrites) of driver-side metadata, and a
  * clock travel INTO an archived (minor-compacted-away) window is a
  * pure metadata resolution — its cost tracks the log/manifest size,
  * never the data, and its result is the exact pre-compaction view.
  * Per store size N (region files of 50 rows; era 1 = the first half,
  * pinned by a snapshot; era 2 = the second half, unpinned):
  *  - minor-compact both eras into one generation (era 1 archives,
  *    era 2 dies) and report the travel-log size in lines/bytes;
  *  - time `TIMESTAMP AS OF t1` PLANNING (catalog resolution +
  *    planInputPartitions — the metadata half) and the full read;
  *    verify the row count is exactly era 1's;
  *  - time the LOUD REFUSAL of the era-2 window (it must fail fast,
  *    not scan).
  *
  * Usage: `sbt "runMain graft.TravelScale"` — prints a markdown table
  * (appended to SEEKSCALE.md at round close). */
object TravelScale {
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

    val root = "/tmp/graft_travelscale"
    deleteRec(new java.io.File(root))
    spark.conf.set("spark.sql.catalog.gtts",
                   classOf[graft.sources.cell.GraftCellCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtts.root", root)

    println("| region files | era-1 rows | log lines / bytes | travel plan (s) | travel read (s) | rows @ t1 | refusal (s) |")
    println("|---|---|---|---|---|---|---|")
    Seq(16, 128, 1024).foreach { nFiles =>
      val t = s"t$nFiles"
      spark.sql(s"""CREATE TABLE gtts.$t (rowkey STRING, family STRING,
                    qualifier STRING, version BIGINT, value STRING)
                    USING graftcell""")
      val store = s"$root/$t"
      def era(lo: Long, hi: Long): Unit =
        spark.range(lo, hi).select(
            format_string("%010d", col("id")).as("rowkey"),
            lit("d").as("family"), lit("q").as("qualifier"),
            col("id").as("version"),
            sha1(col("id").cast("string")).as("value"))
          .write.format("graftcell").option("maxRowsPerFile", "50")
          .mode("append").save(store)
      val half = nFiles * 50L / 2
      era(0L, half)
      spark.sql(s"CALL gtts.snapshot('$t', 'keep')")
      val t1 = CellFooterCache.committedDirs(store)
        .map(d => CellManifest.commitStampOf(store, d)).max
      era(half, nFiles * 50L)
      val t2 = CellFooterCache.committedDirs(store)
        .map(d => CellManifest.commitStampOf(store, d)).max
      spark.sql(s"CALL gtts.compact_minor('$t', ${Long.MaxValue}L)")
      val logFile = new java.io.File(store, CellTravelLog.NAME)
      val logLines = CellTravelLog.read(store).size
      // metadata half: catalog resolution + partition planning
      val p0 = System.nanoTime()
      val df = spark.sql(
        s"""SELECT count(*) AS n FROM gtts.$t
            TIMESTAMP AS OF timestamp_micros(${t1}L)""")
      df.queryExecution.executedPlan // force planning
      val planS = (System.nanoTime() - p0) / 1e9
      val r0 = System.nanoTime()
      val rows = df.collect()(0).getLong(0)
      val readS = (System.nanoTime() - r0) / 1e9
      // the lost (unpinned) era-2 window must refuse FAST and loudly
      val f0 = System.nanoTime()
      val refused = scala.util.Try(spark.sql(
        s"""SELECT count(*) FROM gtts.$t
            TIMESTAMP AS OF timestamp_micros(${t2}L)""").collect()).isFailure
      val refuseS = (System.nanoTime() - f0) / 1e9
      require(refused, "era-2 travel must refuse")
      require(rows == half, s"expected $half era-1 rows, got $rows")
      println(f"| $nFiles | $half | $logLines / ${logFile.length()} B " +
              f"| $planS%.3f | $readS%.3f | $rows | $refuseS%.3f |")
      val _ = GraftCellMaintenance // keep the import honest
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
