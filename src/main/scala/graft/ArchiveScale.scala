package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.cell.{CellArchive, CellFooterCache, GraftCellMaintenance,
                           GraftCellSnapshot}

/** Measures the round-17 SNAPSHOT-ARCHIVE claim: archiving is METADATA
  * ONLY — a compaction that must preserve a snapshot-pinned generation
  * pays O(retired dirs) renames (zero bytes copied: the archived files
  * keep their INODES), and restore-from-archive pays O(files) hard
  * links. Per store size N (region files of 50 rows each):
  *  - major-compact a store with NO snapshot (baseline: victims
  *    deleted);
  *  - the same store shape WITH a pinned snapshot (victims archived) —
  *    the delta is the archive's whole cost;
  *  - verify zero-copy by inode identity (every archived parquet keeps
  *    its pre-compact inode number);
  *  - restore the snapshot from the archive and time it.
  *
  * Usage: `sbt "runMain graft.ArchiveScale"` — prints a markdown table
  * (appended to SEEKSCALE.md at round close). */
object ArchiveScale {
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

    def inodesOf(metas: Seq[graft.sources.cell.CellFileMeta]): Set[Long] =
      metas.map { m =>
        java.nio.file.Files.getAttribute(
          new java.io.File(m.path).toPath, "unix:ino")
          .asInstanceOf[Number].longValue()
      }.toSet

    val root = "/tmp/graft_archscale"
    def load(store: String, nFiles: Int): Unit = {
      deleteRec(new java.io.File(store))
      CellFooterCache.invalidate(store)
      spark.range(nFiles * 50L).select(
          format_string("%010d", col("id")).as("rowkey"),
          lit("d").as("family"), lit("q").as("qualifier"),
          col("id").as("version"),
          sha1(col("id").cast("string")).as("value"))
        .write.format("graftcell").option("maxRowsPerFile", "50")
        .mode("append").save(store)
    }

    println("| region files | compact, no snapshot (s) | compact, archiving (s) | archived inodes kept | restore from archive (s) | rows after restore |")
    println("|---|---|---|---|---|---|")
    Seq(16, 128, 1024).foreach { nFiles =>
      // baseline: no snapshot — compaction deletes the victims
      val bare = s"$root/bare_$nFiles"
      load(bare, nFiles)
      val t0 = System.nanoTime()
      GraftCellMaintenance.majorCompact(spark, bare)
      val bareS = (System.nanoTime() - t0) / 1e9

      // archived: a snapshot pins the generation — compaction renames
      // it into _archive/; inode identity proves zero bytes copied
      val store = s"$root/pin_$nFiles"
      load(store, nFiles)
      val preInodes = inodesOf(CellFooterCache.filesOf(store))
      GraftCellSnapshot.create(store, "keep")
      val t1 = System.nanoTime()
      GraftCellMaintenance.majorCompact(spark, store)
      val archS = (System.nanoTime() - t1) / 1e9
      val archived = CellFooterCache.filesOf(store, Some("keep"))
        .filter(_.path.contains(CellArchive.DIR))
      val kept = inodesOf(archived).count(preInodes)

      val t2 = System.nanoTime()
      GraftCellSnapshot.restore(store, "keep")
      val restS = (System.nanoTime() - t2) / 1e9
      val rows = spark.read.format("graftcell").load(store).count()
      println(f"| $nFiles | $bareS%.3f | $archS%.3f | $kept/${archived.size} | $restS%.3f | $rows |")
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
