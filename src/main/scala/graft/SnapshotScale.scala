package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.cell.{CellFooterCache, GraftCellSnapshot}

/** Measures the round-16 snapshot-clone claim: `CALL clone_snapshot`
  * is a METADATA operation (hard links + manifest copies), so its cost
  * scales with the FILE COUNT, not the data bytes — vs the naive
  * byte-copy a clone would otherwise be. Per store size N (region
  * files of 50 rows each): bulk-load, snapshot, then
  *  - clone via [[GraftCellSnapshot.clone]] (hard links) — report
  *    seconds and NEW disk bytes (files whose inode link count is 1,
  *    i.e. not shared with the source: manifests only);
  *  - copy the same dirs byte-for-byte (`Files.copy`) — report
  *    seconds and bytes, the cost a no-reference engine pays.
  *
  * Usage: `sbt "runMain graft.SnapshotScale"` — prints a markdown
  * table (appended to SEEKSCALE.md at round close). */
object SnapshotScale {
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

    def walk(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory) walk(f) else Seq(f)
      }

    /** Bytes of files NOT hard-link-shared (nlink == 1) under dir. */
    def freshBytes(dir: java.io.File): Long = walk(dir).map { f =>
      val n = java.nio.file.Files
        .getAttribute(f.toPath, "unix:nlink").asInstanceOf[Number].intValue()
      if (n == 1) f.length() else 0L
    }.sum

    val root = "/tmp/graft_snapscale"
    println("| region files | store bytes | clone (s) | fresh bytes (links) | byte-copy (s) | fresh bytes (copy) |")
    println("|---|---|---|---|---|---|")
    Seq(16, 128, 1024).foreach { nFiles =>
      val rows = nFiles * 50L
      val store = s"$root/src_$nFiles"
      deleteRec(new java.io.File(store))
      CellFooterCache.invalidate(store)
      spark.range(rows).select(
          format_string("%010d", col("id")).as("rowkey"),
          lit("d").as("family"), lit("q").as("qualifier"),
          col("id").as("version"),
          sha1(col("id").cast("string")).as("value"))
        .write.format("graftcell").option("maxRowsPerFile", "50")
        .mode("append").save(store)
      val storeBytes = CellFooterCache.filesOf(store).map(_.bytes).sum
      GraftCellSnapshot.create(store, "s")

      val linkDest = s"$root/clone_$nFiles"
      deleteRec(new java.io.File(linkDest))
      new java.io.File(linkDest).mkdirs()
      val t0 = System.nanoTime()
      GraftCellSnapshot.clone(store, "s", linkDest)
      val linkS = (System.nanoTime() - t0) / 1e9
      val linkFresh = freshBytes(new java.io.File(linkDest))

      val copyDest = new java.io.File(s"$root/copy_$nFiles")
      deleteRec(copyDest)
      val t1 = System.nanoTime()
      GraftCellSnapshot.dirs(store, "s").foreach { d =>
        val s0 = new java.io.File(store, d)
        val d0 = new java.io.File(copyDest, d)
        d0.mkdirs()
        Option(s0.listFiles).getOrElse(Array.empty)
          .filter(_.isFile).foreach { f =>
            java.nio.file.Files.copy(f.toPath,
              new java.io.File(d0, f.getName).toPath)
          }
      }
      val copyS = (System.nanoTime() - t1) / 1e9
      val copyFresh = freshBytes(copyDest)
      println(f"| ~$nFiles ($rows rows) | $storeBytes | $linkS%.3f | $linkFresh | $copyS%.3f | $copyFresh |")
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
