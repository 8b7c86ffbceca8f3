package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cell.{CellFooterCache, CellRetire}

/** Gates the r16 METADATA TABLES (`g.t.files` / `.snapshots` /
  * `.history` — GraftCellMetaTables.scala): exactness against the
  * store on disk, retire-intent subtraction, snapshot invalidation
  * semantics, commit ordering, and the identifier-resolution
  * precedence (data tables shadow metadata names). */
class MetaTablesSpec extends AnyFunSuite {
  private lazy val s = SparkFixture.spark

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_meta_spec_").toString
    s.conf.set("spark.sql.catalog.metaspec",
               classOf[graft.sources.cell.GraftCellCatalog].getName)
    s.conf.set("spark.sql.catalog.metaspec.root", r)
    r
  }

  /** Fresh two-generation table under the spec catalog: 4 cells in the
    * first commit, 2 in the second. Returns the store path. */
  private def staged(name: String): String = {
    val store = s"$root/$name" // forces catalog registration first
    s.sql(s"DROP TABLE IF EXISTS metaspec.$name")
    s.sql(s"""CREATE TABLE metaspec.$name (
               rowkey STRING, family STRING, qualifier STRING,
               version BIGINT, value STRING) USING graftcell""")
    s.sql(s"""INSERT INTO metaspec.$name VALUES
              ('a', 'd', 'q1', 10, 'v1'), ('b', 'd', 'q2', 11, 'v2'),
              ('c', 'd', 'q1', 12, 'v3'), ('d', 'd', 'q2', 13, 'v4')""")
    s.sql(s"""INSERT INTO metaspec.$name VALUES
              ('e', 'd', 'q3', 14, 'v5'), ('f', 'd', 'q3', 15, 'v6')""")
    store
  }

  test("files metadata table matches the store on disk exactly") {
    val store = staged("tf")
    val files = s.sql("SELECT * FROM metaspec.tf.files").collect()
    // one row per parquet file actually on disk
    val onDisk = CellFooterCache.committedDirs(store).flatMap { d =>
      Option(new java.io.File(store, d).listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    assert(files.length == onDisk.length)
    // manifest stats fold back to the true corpus stats
    assert(files.map(_.getAs[Long]("n_rows")).sum == 6L)
    assert(files.map(_.getAs[Long]("null_keys")).sum == 0L)
    assert(files.flatMap(r => Option(r.getAs[String]("min_key"))).min == "a")
    assert(files.flatMap(r => Option(r.getAs[String]("max_key"))).max == "f")
    assert(files.flatMap(r => Option(r.getAs[String]("min_qualifier"))).min == "q1")
    assert(files.flatMap(r => Option(r.getAs[String]("max_qualifier"))).max == "q3")
    assert(files.map(r => r.getAs[String]("batch_dir")).distinct.length == 2)
    // zero parquet footer opens: the scan is served from manifests
    val before = CellFooterCache.footerOpens.get()
    s.sql("SELECT sum(n_rows) FROM metaspec.tf.files").collect()
    assert(CellFooterCache.footerOpens.get() == before)
  }

  test("files metadata table subtracts retire intents like a batch read") {
    val store = staged("tr")
    val all = s.sql("SELECT file, batch_dir, n_rows FROM metaspec.tr.files")
      .collect()
    val victim = all.minBy(_.getAs[String]("file"))
    val victimRows = victim.getAs[Long]("n_rows")
    val dir = new java.io.File(store, victim.getAs[String]("batch_dir"))
    val victimPath = new java.io.File(dir, victim.getAs[String]("file")).getPath
    CellRetire.write(dir, Seq(victimPath))
    try {
      val live = s.sql("SELECT file, batch_dir, n_rows FROM metaspec.tr.files")
        .collect()
      assert(live.length == all.length - 1)
      // file NAMES repeat across batch dirs — identity is (dir, file)
      assert(!live.map(r => (r.getAs[String]("batch_dir"),
                             r.getAs[String]("file"))).contains(
        (victim.getAs[String]("batch_dir"), victim.getAs[String]("file"))))
      assert(live.map(_.getAs[Long]("n_rows")).sum ==
        all.map(_.getAs[Long]("n_rows")).sum - victimRows)
    } finally CellRetire.clear(dir)
  }

  test("snapshots metadata: VERSION AS OF stats; archived generations " +
       "keep true stats; a truly-gone pin reports NULL") {
    val store = staged("ts")
    s.sql("CALL metaspec.snapshot('ts', 'keep')")
    // the overwrite retires both dirs 'keep' pinned — r17: they move
    // to _archive/, so 'keep' stays fully readable with true stats
    s.sql("INSERT OVERWRITE metaspec.ts VALUES ('x', 'd', 'q9', 20, 'w')")
    s.sql("CALL metaspec.snapshot('ts', 'fresh')")
    // a pin that is in NEITHER live nor archive is the one remaining
    // invalidation (v1-era loss / reclaimed archive)
    graft.sources.cell.GraftCellSnapshot.createPinned(
      store, "gone", Seq("batch_nonexistent"))
    val rows = s.sql("""SELECT name, missing_dirs, n_rows, min_key, max_key
                        FROM metaspec.ts.snapshots ORDER BY name""").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("fresh", "gone", "keep"))
    val fresh = rows(0); val gone = rows(1); val keep = rows(2)
    assert(fresh.getLong(1) == 0L && fresh.getLong(2) == 1L &&
           fresh.getString(3) == "x" && fresh.getString(4) == "x")
    assert(keep.getLong(1) == 0L && keep.getLong(2) == 6L &&
           keep.getString(3) == "a" && keep.getString(4) == "f",
      s"archived snapshot must keep true stats: $keep")
    assert(gone.getLong(1) > 0L && gone.isNullAt(2) &&
           gone.isNullAt(3) && gone.isNullAt(4))
    // and VERSION AS OF the archived snapshot reads the full content
    assert(s.sql("SELECT count(*) FROM metaspec.ts VERSION AS OF 'keep'")
      .collect().head.getLong(0) == 6L)
  }

  test("history metadata: commit order, sizes, running total") {
    staged("th")
    val rows = s.sql("""SELECT generation, committed_at, n_rows,
                               cumulative_rows
                        FROM metaspec.th.history
                        ORDER BY generation""").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(4L, 2L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(4L, 6L))
    // the monotonic manifest stamp surfaces as a strictly increasing time
    val stamps = rows.map(_.getTimestamp(1).getTime)
    assert(stamps(0) < stamps(1))
    // history's final total equals the table's live count
    assert(rows.last.getLong(3) ==
      s.sql("SELECT count(*) FROM metaspec.th").collect().head.getLong(0))
  }

  test("travel_log metadata: structural-history events as rows (r18)") {
    staged("tt")
    // fresh table: no structural rewrite yet → empty log
    assert(s.sql("SELECT * FROM metaspec.tt.travel_log").count() == 0L)
    s.sql("CALL metaspec.snapshot('tt', 'pin')")
    s.sql(s"CALL metaspec.compact_minor('tt', ${Long.MaxValue}L)")
    val rows = s.sql("""SELECT event, batch_dir, stamp, at, n_files
                        FROM metaspec.tt.travel_log
                        ORDER BY at, batch_dir""").collect()
    // both staged generations retired by the minor compaction
    assert(rows.length == 2 && rows.forall(_.getString(0) == "retire"))
    assert(rows.forall(r => r.getLong(4) > 0L))
    // retire rows carry the generation stamp AND the superseding time,
    // strictly ordered (the window TIMESTAMP AS OF replays)
    rows.foreach { r =>
      assert(r.getTimestamp(2).getTime <= r.getTimestamp(3).getTime)
    }
    // a restore appends its revive event
    s.sql("CALL metaspec.restore_snapshot('tt', 'pin')")
    val kinds = s.sql("""SELECT event, count(*) FROM metaspec.tt.travel_log
                         GROUP BY event ORDER BY event""").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kinds("revive") >= 1L && kinds("retire") >= 3L, kinds.toString)
  }

  test("resolution precedence: a real data table shadows metadata names") {
    root // force catalog registration
    s.sql("CREATE NAMESPACE IF NOT EXISTS metaspec.ns1")
    s.sql("DROP TABLE IF EXISTS metaspec.ns1.snapshots")
    s.sql("""CREATE TABLE metaspec.ns1.snapshots (
               rowkey STRING, family STRING, qualifier STRING,
               version BIGINT, value STRING) USING graftcell""")
    s.sql("INSERT INTO metaspec.ns1.snapshots VALUES ('k', 'd', 'q', 1, 'v')")
    // the DATA table named 'snapshots' wins over the metadata reading
    val data = s.sql("SELECT * FROM metaspec.ns1.snapshots").collect()
    assert(data.length == 1 && data.head.getAs[String]("rowkey") == "k")
    // its OWN metadata is still reachable one level deeper (ns:table)
    val meta = s.sql("SELECT * FROM metaspec.ns1.snapshots.files").collect()
    assert(meta.map(_.getAs[Long]("n_rows")).sum == 1L)
  }

  test("metadata tables: unknown names and writes are refused") {
    staged("te")
    // unknown metadata kind and metadata of an unknown table both fail
    intercept[org.apache.spark.sql.AnalysisException](
      s.sql("SELECT * FROM metaspec.te.nope").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      s.sql("SELECT * FROM metaspec.nosuch.files").collect())
    // read-only: no SupportsWrite, so INSERT fails at analysis
    intercept[org.apache.spark.sql.AnalysisException](
      s.sql("INSERT INTO metaspec.te.files VALUES ('d', 'f', 1, 1, 0, " +
            "'a', 'b', 1, 2, 'd', 'd', 'q', 'q', 'm')"))
    // SHOW TABLES lists only data tables, never metadata views
    val listed = s.sql("SHOW TABLES IN metaspec").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(!listed.exists(GraftCellMetaNames.contains))
  }

  private val GraftCellMetaNames =
    Set("files", "snapshots", "history", "travel_log")
}
