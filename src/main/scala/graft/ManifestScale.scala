package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.cell.{CellFooterCache, CellManifest}

/** Measures the persisted manifest's first-plan win (VERDICT r14 #2):
  * cold plan-time metadata cost of a graftcell store as a function of
  * region-file count, manifest path vs legacy footer sweep.
  *
  * Method: for each file count N, write a synthetic cell store through
  * the connector with `maxRowsPerFile` sized to produce exactly N
  * region files (50 rows each), then time `CellFooterCache.filesOf`
  * cold (cache invalidated before every rep, min of 3):
  *   - manifest path: the store as committed (`_manifest.json` present);
  *   - footer path: the same store with its manifests deleted, forcing
  *     one `ParquetFileReader.open` per file on the driver (counted by
  *     `CellFooterCache.footerOpens` — printed as proof both paths did
  *     what they claim).
  *
  * Usage: `sbt "runMain graft.ManifestScale"` — prints a markdown
  * table (appended to SEEKSCALE.md at round close). */
object ManifestScale {
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

    println("| region files | manifest cold plan (s) | footer-sweep cold plan (s) | footer opens |")
    println("|---|---|---|---|")
    Seq(64, 512, 4096).foreach { nFiles =>
      val rows = nFiles * 50L
      val store = s"/tmp/graft_manifestscale_$nFiles"
      deleteRec(new java.io.File(store))
      CellFooterCache.invalidate(store)
      spark.range(rows).select(
          format_string("%010d", col("id")).as("rowkey"),
          lit("d").as("family"), lit("q").as("qualifier"),
          col("id").as("version"), sha1(col("id").cast("string")).as("value"))
        .write.format("graftcell").option("maxRowsPerFile", "50")
        .mode("append").save(store)

      def coldPlan(): (Double, Long, Int) = {
        var best = Double.MaxValue
        var opens = 0L
        var n = 0
        (1 to 3).foreach { _ =>
          CellFooterCache.invalidate(store)
          val o0 = CellFooterCache.footerOpens.get()
          val t0 = System.nanoTime()
          n = CellFooterCache.filesOf(store).size
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          opens = CellFooterCache.footerOpens.get() - o0
        }
        (best, opens, n)
      }

      val (mT, mOpens, mN) = coldPlan()
      require(mOpens == 0, s"manifest path opened $mOpens footers")
      // force the legacy path: drop every manifest
      CellFooterCache.committedDirs(store).foreach { d =>
        new java.io.File(new java.io.File(store, d), CellManifest.NAME)
          .delete()
      }
      val (fT, fOpens, fN) = coldPlan()
      require(fN == mN && mN >= nFiles,
        s"file counts diverged: manifest=$mN footer=$fN want>=$nFiles")
      println(f"| $mN | $mT%.3f | $fT%.3f | $fOpens |")
      deleteRec(new java.io.File(store))
    }
    spark.stop()
  }
}
