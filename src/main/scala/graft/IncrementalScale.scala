package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.cell.{CellFooterCache, GraftCellSnapshot}

/** Measures the round-16 incremental-read claim: `option("sinceSnapshot",
  * s)` makes a periodic consumer's cost O(delta), not O(store). Per
  * store size N (region files of 200 rows): bulk-load N files, snapshot
  * `base`, append ONE small batch (2 files), then time a content
  * aggregate (sum of crc32(value) — not pushdown-answerable, forces a
  * real read) over (a) the FULL store and (b) the since-`base` delta,
  * min of 2 passes each, plus the planned-file counts. The full-scan
  * column grows linearly with the store; the since column must stay
  * flat at the delta size.
  *
  * Usage: `sbt "runMain graft.IncrementalScale"` — prints a markdown
  * table (appended to SEEKSCALE.md at round close). */
object IncrementalScale {
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

    def timeMin2(body: => Unit): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

    val root = "/tmp/graft_incscale"
    println("| store files planned (full) | files planned (since) | full scan (s) | since scan (s) |")
    println("|---|---|---|---|")
    Seq(16, 128, 1024).foreach { nFiles =>
      val rows = nFiles * 200L
      val store = s"$root/s_$nFiles"
      deleteRec(new java.io.File(store))
      CellFooterCache.invalidate(store)
      def cells(ids: org.apache.spark.sql.DataFrame) = ids.select(
        format_string("%010d", col("id")).as("rowkey"),
        lit("d").as("family"), lit("q").as("qualifier"),
        col("id").as("version"),
        sha1(col("id").cast("string")).as("value"))
      cells(spark.range(rows).toDF())
        .write.format("graftcell").option("maxRowsPerFile", "200")
        .mode("append").save(store)
      GraftCellSnapshot.create(store, "base")
      cells(spark.range(rows, rows + 400L).toDF())
        .write.format("graftcell").option("maxRowsPerFile", "200")
        .mode("append").save(store)

      val fullPlanned = CellFooterCache.filesOf(store).size
      val sincePlanned =
        CellFooterCache.filesOf(store, None, None, Some("base")).size
      def agg(df: org.apache.spark.sql.DataFrame): Unit = {
        df.agg(sum(crc32(col("value")))).collect(); ()
      }
      val fullS = timeMin2(agg(
        spark.read.format("graftcell").load(store)))
      val sinceS = timeMin2(agg(
        spark.read.format("graftcell").option("sinceSnapshot", "base").load(store)))
      println(f"| $fullPlanned | $sincePlanned | $fullS%.3f | $sinceS%.3f |")
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
