package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.cell.CellFooterCache

/** Measures the `t.files` METADATA TABLE's scale shape (SURVEY §2.15):
  * the driver plans one InputPartition per committed dir and ships dir
  * NAMES only; each executor-side reader parses its own dir's
  * `_manifest.json`. So the query's driver cost is O(generations), the
  * parse is distributed, and the wall time across a 64× file-count
  * growth should stay far below linear at fixed parallelism.
  *
  * Method: for each (dirs, files) point, build a store of `dirs`
  * connector-committed generations × 64 region files each (50 rows per
  * file via `maxRowsPerFile`), then time the corpus-stat fold
  * `SELECT sum(n_rows), count(*) FROM cat.t.files` cold
  * (footer cache invalidated before every rep; min of 3). The row also
  * prints the partition count of the scan (must equal `dirs`) and the
  * driver footer opens (must be 0 — manifests only).
  *
  * Usage: `sbt "runMain graft.MetaScale"` — prints a markdown table
  * (appended to SEEKSCALE.md at round close). */
object MetaScale {
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

    val root = "/tmp/graft_metascale_cat"
    deleteRec(new java.io.File(root))
    spark.conf.set("spark.sql.catalog.metascale",
                   classOf[graft.sources.cell.GraftCellCatalog].getName)
    spark.conf.set("spark.sql.catalog.metascale.root", root)

    println("| dirs | region files | files-table fold (s, min of 3) | scan partitions | driver footer opens |")
    println("|---|---|---|---|---|")
    Seq(1, 8, 64).foreach { nDirs =>
      val filesPerDir = 64
      val rowsPerDir = filesPerDir * 50L
      spark.sql("DROP TABLE IF EXISTS metascale.t")
      spark.sql("""CREATE TABLE metascale.t (rowkey STRING, family STRING,
                   qualifier STRING, version BIGINT, value STRING)
                   USING graftcell""")
      val store = s"$root/t"
      (0 until nDirs).foreach { g =>
        spark.range(g * rowsPerDir, (g + 1) * rowsPerDir).select(
            format_string("%010d", col("id")).as("rowkey"),
            lit("d").as("family"), lit("q").as("qualifier"),
            col("id").as("version"),
            sha1(col("id").cast("string")).as("value"))
          .write.format("graftcell")
          .option("maxRowsPerFile", "50")
          .mode("append").save(store)
      }
      val nFiles = CellFooterCache.committedDirs(store)
        .map(d => CellFooterCache.filesUnder(store, d).size).sum
      require(nFiles == nDirs * filesPerDir,
        s"expected ${nDirs * filesPerDir} files, got $nFiles")

      val q = "SELECT sum(n_rows) AS r, count(*) AS f FROM metascale.t.files"
      var best = Double.MaxValue
      var opens = 0L
      (1 to 3).foreach { _ =>
        CellFooterCache.invalidate(store)
        val o0 = CellFooterCache.footerOpens.get()
        val t0 = System.nanoTime()
        val row = spark.sql(q).collect().head
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        opens = CellFooterCache.footerOpens.get() - o0
        require(row.getLong(0) == nDirs * rowsPerDir &&
                row.getLong(1) == nFiles.toLong,
          s"files-table fold wrong: $row")
      }
      val parts = spark.sql("SELECT * FROM metascale.t.files")
        .queryExecution.executedPlan.execute().getNumPartitions
      println(f"| $nDirs | $nFiles | $best%.3f | $parts | $opens |")
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
