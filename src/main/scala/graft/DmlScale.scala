package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.cell.CellFooterCache

/** Measures the round-15 group-granular DML win (VERDICT r14 #1): wall
  * time and rewritten-file count of a ONE-BAND UPDATE as the store
  * grows, group filtering ON (runtime `_region_file` pruning + replace
  * exactly the scanned files) vs OFF (the r14 full-table copy-on-write,
  * forced via spark.sql.optimizer.runtime.rowLevelOperationGroupFilter
  * .enabled=false — the same code path, so the comparison isolates the
  * design change).
  *
  * Per store size N (region files of 50 rows each): create a catalog
  * table, bulk-load it, run `UPDATE ... WHERE rowkey >= band_lo AND
  * rowkey < band_hi` touching exactly one region file's range, report
  * seconds (min of 2) and files rewritten (store file set diff).
  *
  * Usage: `sbt "runMain graft.DmlScale"` — prints a markdown table
  * (appended to SEEKSCALE.md at round close). */
object DmlScale {
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

    val root = "/tmp/graft_dmlscale_cat"
    spark.conf.set("spark.sql.catalog.graftdml",
                   classOf[graft.sources.cell.GraftCellCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftdml.root", root)

    println("| region files | group-filtered UPDATE (s) | files rewritten | full-COW UPDATE (s) | files rewritten |")
    println("|---|---|---|---|---|")
    Seq(16, 128, 1024).foreach { nFiles =>
      val rows = nFiles * 50L
      def stage(name: String): String = {
        val store = s"$root/$name"
        deleteRec(new java.io.File(store))
        CellFooterCache.invalidate(store)
        spark.sql(s"DROP TABLE IF EXISTS graftdml.$name")
        spark.sql(s"""CREATE TABLE graftdml.$name (rowkey STRING,
                      family STRING, qualifier STRING, version BIGINT,
                      value STRING) USING graftcell""")
        spark.range(rows).select(
            format_string("%010d", col("id")).as("rowkey"),
            lit("d").as("family"), lit("q").as("qualifier"),
            col("id").as("version"),
            sha1(col("id").cast("string")).as("value"))
          .write.format("graftcell").option("maxRowsPerFile", "50")
          .mode("append").save(store)
        store
      }
      // the one-band predicate: rows 100..149 — exactly one region file
      val where = "rowkey >= '0000000100' AND rowkey < '0000000150'"
      def measure(name: String, groupFilter: Boolean): (Double, Int) = {
        spark.conf.set(
          "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled",
          groupFilter.toString)
        var best = Double.MaxValue
        var rewritten = 0
        (1 to 2).foreach { _ =>
          val store = stage(name)
          val before = CellFooterCache.filesOf(store)
            .map(m => m.path -> new java.io.File(m.path).lastModified())
            .toMap
          val t0 = System.nanoTime()
          spark.sql(s"""UPDATE graftdml.$name
                        SET value = concat(value, '*') WHERE $where""")
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          val after = CellFooterCache.filesOf(store)
            .map(m => m.path -> new java.io.File(m.path).lastModified())
            .toMap
          rewritten = before.count { case (p, t) => !after.get(p).contains(t) }
        }
        spark.conf.set(
          "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled",
          "true")
        (best, rewritten)
      }
      val (gT, gN) = measure(s"t_g$nFiles", groupFilter = true)
      val (cT, cN) = measure(s"t_c$nFiles", groupFilter = false)
      println(f"| ~$nFiles ($rows rows) | $gT%.2f | $gN | $cT%.2f | $cN |")
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
