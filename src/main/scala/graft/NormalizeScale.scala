package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.cell.{CellFooterCache, GraftCellMaintenance}

/** Measures the r16 normalizer's scale shape: `CALL normalize(t)` cost
  * as the store grows, with ONE constant-size anomaly (an oversized
  * region file) among N uniform files. The claim under test: normalize
  * is O(anomalous bytes) — planning is a manifest read, the surgery
  * rewrites only the victims — so wall time stays FLAT across store
  * growth while a whole-store rewrite would scale linearly.
  *
  * Per store size N: stage N uniform 50-row region files (~2 KB of
  * incompressible value per row, so data outweighs the ~1 MB/file
  * rowkey-bloom floor) plus one 2000-row single-file generation (the
  * hot region), then run `GraftCellMaintenance.normalize` at the
  * default mean target. Expected: exactly one victim splits, zero
  * merges (uniform files sit AT the mean), seconds flat in N.
  *
  * Usage: `sbt "runMain graft.NormalizeScale"` — prints a markdown
  * table (appended to SEEKSCALE.md at round close). */
object NormalizeScale {
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

    val root = "/tmp/graft_normscale"
    // ~2 KB incompressible value: 50 chained sha1s of the id
    val blob = concat((1 to 50).map(k =>
      sha1(concat_ws("-", col("id").cast("string"), lit(k.toString)))): _*)

    println("| uniform files | store MB | normalize (s, min of 2) | files split | runs merged | victim MB |")
    println("|---|---|---|---|---|---|")
    Seq(16, 128, 1024).foreach { nFiles =>
      var best = Double.MaxValue
      var split = 0L; var merged = 0L; var storeMb = 0L; var victimMb = 0L
      (1 to 2).foreach { _ =>
        val store = s"$root/t$nFiles"
        deleteRec(new java.io.File(store))
        CellFooterCache.invalidate(store)
        // N uniform 50-row files in one generation
        spark.range(nFiles * 50L).select(
            format_string("%010d", col("id")).as("rowkey"),
            lit("d").as("family"), lit("q").as("qualifier"),
            col("id").as("version"), blob.as("value"))
          .write.format("graftcell").option("maxRowsPerFile", "50")
          .mode("append").save(store)
        // the anomaly: one 2000-row region file (a single write task)
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        spark.range(9000000L, 9002000L).select(
            format_string("%010d", col("id")).as("rowkey"),
            lit("d").as("family"), lit("q").as("qualifier"),
            col("id").as("version"), blob.as("value"))
          .write.format("graftcell").mode("append").save(store)
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
        val files = CellFooterCache.filesOf(store)
        storeMb = files.map(_.bytes).sum / (1 << 20)
        victimMb = files.map(_.bytes).max / (1 << 20)
        val t0 = System.nanoTime()
        val (s, r, _, _, _) =
          GraftCellMaintenance.normalize(spark, store)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        split = s; merged = r
      }
      println(f"| $nFiles | $storeMb | $best%.2f | $split | $merged | $victimMb |")
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
