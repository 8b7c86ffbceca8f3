package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.cell.{CellFooterCache, GraftCellMaintenance}

/** Measures the round-16 §2.13 operational claims at growing store
  * size:
  *
  *  - `bulkload` is O(window), not O(store): adopting a FIXED 8-file
  *    source window into targets of 16/128/1024 region files must
  *    cost the same — the copy touches only the window's bytes and
  *    the publish is one manifest write + rename per source dir (the
  *    nightly incremental-backup restore stays flat as the table
  *    grows 64×).
  *  - `hbck` is metadata-only: the report over the grown store reads
  *    O(file names) — no data bytes — so even the 1024-file store
  *    reports in well under a second.
  *  - `verify_rep` is O(left + right) work at cluster bandwidth: the
  *    self-diff of the grown store scales linearly with the store (the
  *    one column here that SHOULD grow — it reads every cell on both
  *    sides by definition), with no driver-side blowup.
  *
  * Usage: `sbt "runMain graft.AdoptScale"` — prints a markdown table
  * (appended to SEEKSCALE.md at round close). */
object AdoptScale {
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

    def timeOnce(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val root = "/tmp/graft_adoptscale"
    deleteRec(new java.io.File(root))

    def cells(ids: org.apache.spark.sql.DataFrame) = ids.select(
      format_string("%010d", col("id")).as("rowkey"),
      lit("d").as("family"), lit("q").as("qualifier"),
      col("id").as("version"),
      sha1(col("id").cast("string")).as("value"))

    // one FIXED source window (8 files of 200 rows), shared by every
    // target size — the "last night's batches" being restored
    val src = s"$root/window"
    cells(spark.range(1000000L, 1001600L).toDF())
      .write.format("graftcell").option("maxRowsPerFile", "200")
      .mode("append").save(src)

    println("| target files before | bulkload 8-file window (s) | hbck after (s) | verify_rep self-diff (s) |")
    println("|---|---|---|---|")
    Seq(16, 128, 1024).foreach { nFiles =>
      val rows = nFiles * 200L
      val store = s"$root/t_$nFiles"
      CellFooterCache.invalidate(store)
      cells(spark.range(rows).toDF())
        .write.format("graftcell").option("maxRowsPerFile", "200")
        .mode("append").save(store)
      val before = CellFooterCache.filesOf(store).size
      val blS = timeOnce {
        GraftCellMaintenance.bulkload(spark, store, src); ()
      }
      assert(CellFooterCache.filesOf(store).size == before + 8,
        "adoption must add exactly the window's files")
      val hbS = timeOnce {
        val r = GraftCellMaintenance.hbck(store)
        assert((r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9) ==
                 ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)),
          s"unclean store: $r")
      }
      val vrS = timeOnce {
        val (ol, or, mm, _) =
          GraftCellMaintenance.verifyRep(spark, store, store)
        assert(ol == 0L && or == 0L && mm == 0L)
      }
      println(f"| $before | $blS%.3f | $hbS%.3f | $vrS%.3f |")
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
