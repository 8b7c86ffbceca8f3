package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cell.{CellFooterCache, GraftCellMaintenance, GraftCellSnapshot}

/** Gates the r20 secondary-index planner story:
  *
  *  - [[graft.plans.IndexRoute]] — a plain-SQL value predicate routes
  *    through the index IFF every soundness gate holds, and the routed
  *    plan returns BYTE-IDENTICAL rows to the plain scan (the index may
  *    change the plan, never the answer);
  *  - content-level `sync_index` — the index survives structural
  *    rewrites (compaction incl. version GC, DELETE) and always lands
  *    exactly where a full rebuild would;
  *  - the boundary-snapshot lifecycle fixes (ADVICE r19): path-keyed
  *    boundary names (leaf-name collisions cannot clobber) and
  *    owner-path vacuum orphanhood (a live non-sibling index's
  *    boundary survives vacuum; a dead one reclaims). */
class IndexRouteSpec extends AnyFunSuite {
  private lazy val s = SparkFixture.spark

  private lazy val root = {
    val r = java.nio.file.Files
      .createTempDirectory("graft_idxroute_spec_").toString
    s.conf.set("spark.sql.catalog.graftidx",
               classOf[graft.sources.cell.GraftCellCatalog].getName)
    s.conf.set("spark.sql.catalog.graftidx.root", r)
    r
  }

  /** Fresh catalog table `name` with a deterministic cell population:
    * per entity k0000..k0119 one (d, user_id) cell (17 distinct
    * values), one (d, value) cell (13 distinct values), one (m, note)
    * cell. */
  private def stage(name: String): Unit = {
    root // force catalog registration
    s.sql(s"DROP TABLE IF EXISTS graftidx.${name}_idx_uid")
    s.sql(s"DROP TABLE IF EXISTS graftidx.$name")
    s.sql(s"""CREATE TABLE graftidx.$name (
               rowkey STRING, family STRING, qualifier STRING,
               version BIGINT, value STRING) USING graftcell""")
    s.sql(s"""INSERT OVERWRITE graftidx.$name
              SELECT * FROM (
                SELECT format_string('k%04d', id) AS rowkey,
                       'd' AS family, 'user_id' AS qualifier,
                       1L AS version, concat('u', id % 17) AS value
                FROM range(0, 120)
                UNION ALL
                SELECT format_string('k%04d', id), 'd', 'value', 1L,
                       concat('v', id % 13)
                FROM range(0, 120)
                UNION ALL
                SELECT format_string('k%04d', id), 'm', 'note', 1L,
                       concat('n', id)
                FROM range(0, 120)
                UNION ALL
                SELECT format_string('k%04d', id), 'd', 'score', 1L,
                       concat('s', id % 7)
                FROM range(0, 120))""")
  }

  private def probeSql(table: String, v: String): String =
    s"""SELECT rowkey, family, qualifier, version, value
        FROM graftidx.$table
        WHERE family = 'd' AND qualifier = 'user_id' AND value = '$v'
        ORDER BY rowkey, version"""

  /** Routed = the optimized plan references an index store (since the
    * covered rewrite there is no join to look for — the plan IS one
    * index seek); unrouted = no index store appears anywhere. */
  private def routedPlan(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("_idx_")

  private def idxStore(table: String, idx: String): String =
    s"$root/${table}_idx_$idx"

  test("IndexRoute fires from plain SQL and never changes the answer " +
       "(index dropped ⇒ same rows, no join)") {
    stage("t1")
    s.sql("CALL graftidx.build_index('t1', 'uid', 'd', 'user_id')").collect()
    val routed = s.sql(probeSql("t1", "u5"))
    assert(routed.queryExecution.optimizedPlan.toString
             .contains("t1_idx_uid"),
      s"expected the covered index answer:" +
      s"\n${routed.queryExecution.optimizedPlan}")
    val routedRows = routed.collect().map(_.toSeq).toSeq
    assert(routedRows.nonEmpty)
    s.sql("DROP TABLE graftidx.t1_idx_uid")
    val plain = s.sql(probeSql("t1", "u5"))
    assert(!routedPlan(plain),
      "with the index dropped the same SQL must plan the plain scan")
    assert(plain.collect().map(_.toSeq).toSeq == routedRows,
      "routing may never change the answer")
  }

  test("an IN-list value predicate routes as a multi-seek and never " +
       "changes the answer; an over-bound list falls back") {
    stage("t1b")
    s.sql("CALL graftidx.build_index('t1b', 'uid', 'd', 'user_id')")
      .collect()
    def q(vals: Seq[String]) = s.sql(
      s"""SELECT rowkey, family, qualifier, version, value
          FROM graftidx.t1b
          WHERE family = 'd' AND qualifier = 'user_id'
            AND value IN (${vals.map(v => s"'$v'").mkString(", ")})
          ORDER BY rowkey, version""")
    val routed = q(Seq("u3", "u11"))
    assert(routedPlan(routed), "a 2-member IN must route")
    val routedRows = routed.collect().map(_.toSeq).toSeq
    assert(routedRows.nonEmpty)
    s.sql("DROP TABLE graftidx.t1b_idx_uid")
    val plain = q(Seq("u3", "u11"))
    assert(!routedPlan(plain))
    assert(plain.collect().map(_.toSeq).toSeq == routedRows,
      "IN routing may never change the answer")
    // over-bound list: > 64 members must NOT route (rebuild the index
    // first so the decline is the LIST's doing, not the missing index)
    s.sql("CALL graftidx.build_index('t1b', 'uid', 'd', 'user_id')")
      .collect()
    val big = q((0 until 70).map(i => s"u$i"))
    assert(!routedPlan(big),
      "an over-bound IN-list must fall back to the plain scan")
  }

  test("a value-prefix predicate (LIKE 'p%') routes as one unterminated " +
       "seek and never changes the answer; equality outranks it") {
    stage("t1c")
    s.sql("CALL graftidx.build_index('t1c', 'uid', 'd', 'user_id')")
      .collect()
    def q = s.sql(
      """SELECT rowkey, family, qualifier, version, value
         FROM graftidx.t1c
         WHERE family = 'd' AND qualifier = 'user_id'
           AND value LIKE 'u1%'
         ORDER BY rowkey, version""")
    val routed = q
    assert(routedPlan(routed), "a LIKE prefix must route")
    // u1% matches u1, u10..u16: the seek is UNTERMINATED — longer
    // values sharing the prefix must be candidates too
    val routedRows = routed.collect().map(_.toSeq).toSeq
    assert(routedRows.map(_(4)).distinct.toSet ==
           Set("u1", "u10", "u11", "u12", "u13", "u14", "u15", "u16"),
      s"the prefix seek must cover every matching value: " +
      s"${routedRows.map(_(4)).distinct}")
    s.sql("DROP TABLE graftidx.t1c_idx_uid")
    assert(!routedPlan(q))
    assert(q.collect().map(_.toSeq).toSeq == routedRows,
      "prefix routing may never change the answer")
  }

  test("the semi-join fallback: a metadata-column output and a " +
       "non-deterministic condition decline the covered answer but " +
       "still route through the index") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    stage("t1d")
    s.sql("CALL graftidx.build_index('t1d', 'uid', 'd', 'user_id')")
      .collect()
    def joins(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect { case j: Join => j }
    // _region_file is not reconstructable from the index: the rewrite
    // must keep the base scan and narrow it with the semi-join
    val meta = s.sql(
      """SELECT rowkey, value, _region_file FROM graftidx.t1d
         WHERE family = 'd' AND qualifier = 'user_id' AND value = 'u5'
         ORDER BY rowkey""")
    assert(routedPlan(meta) && joins(meta).nonEmpty,
      s"metadata output must take the SEMI-JOIN route:" +
      s"\n${meta.queryExecution.optimizedPlan}")
    val rows = meta.collect()
    assert(rows.nonEmpty && rows.forall(!_.isNullAt(2)),
      "the fallback must deliver the real region-file provenance")
    // a non-deterministic condition must keep evaluating on base rows
    val nd = s.sql(
      """SELECT rowkey, value FROM graftidx.t1d
         WHERE family = 'd' AND qualifier = 'user_id' AND value = 'u5'
           AND rand() < 2.0
         ORDER BY rowkey""")
    assert(routedPlan(nd) && joins(nd).nonEmpty,
      s"a non-deterministic condition must take the SEMI-JOIN route:" +
      s"\n${nd.queryExecution.optimizedPlan}")
    // rand() < 2.0 is always true: the answer is the full match set
    assert(nd.collect().map(_.getString(0)).toSeq ==
           rows.map(_.getString(0)).toSeq,
      "the semi-join fallback may never change the answer")
  }

  test("a stale index does not route; sync_index re-arms routing and " +
       "the routed answer includes the delta") {
    stage("t2")
    s.sql("CALL graftidx.build_index('t2', 'uid', 'd', 'user_id')").collect()
    s.sql("""INSERT INTO graftidx.t2 VALUES
             ('z0001', 'd', 'user_id', 1L, 'u5'),
             ('z0002', 'd', 'user_id', 1L, 'u6')""")
    val stale = s.sql(probeSql("t2", "u5"))
    assert(!routedPlan(stale),
      "delta_generations > 0 must fall back to the plain scan")
    val staleRows = stale.collect().map(_.toSeq).toSeq
    assert(staleRows.exists(_.head == "z0001"),
      "the fallback must see the un-synced row")
    val r = s.sql("CALL graftidx.sync_index('t2', 'uid')").collect()(0)
    assert(r.getLong(1) == 2L && r.getString(4) == "delta", s"$r")
    val synced = s.sql(probeSql("t2", "u5"))
    assert(routedPlan(synced),
      "a freshly synced index must route again")
    assert(synced.collect().map(_.toSeq).toSeq == staleRows,
      "the routed answer must equal the scan's, delta row included")
  }

  test("a store with any null rowkey declines routing (the semi-join " +
       "would drop the null-rowkey match)") {
    stage("t3")
    s.sql("""INSERT INTO graftidx.t3 VALUES
             (NULL, 'd', 'user_id', 1L, 'u5')""")
    s.sql("CALL graftidx.build_index('t3', 'uid', 'd', 'user_id')").collect()
    val df = s.sql(probeSql("t3", "u5"))
    assert(!routedPlan(df),
      "null rowkeys present: routing must decline")
    assert(df.collect().exists(_.isNullAt(0)),
      "the plain scan keeps the null-rowkey match the index cannot hold")
  }

  test("time travel never routes (the index mirrors the live view only)") {
    stage("t4")
    s.sql("CALL graftidx.build_index('t4', 'uid', 'd', 'user_id')").collect()
    s.sql("CALL graftidx.snapshot('t4', 's1')").collect()
    val df = s.sql(
      s"""SELECT rowkey, family, qualifier, version, value
          FROM graftidx.t4 VERSION AS OF 's1'
          WHERE family = 'd' AND qualifier = 'user_id' AND value = 'u5'
          ORDER BY rowkey, version""")
    assert(!routedPlan(df), "VERSION AS OF must not route")
    assert(df.collect().nonEmpty)
  }

  /** index content == the expected mapping over the CURRENT base view. */
  private def assertIndexExact(table: String, idx: String): Unit = {
    val got = s.sql(s"SELECT * FROM graftidx.${table}_idx_$idx")
    val want = s.sql(
      s"""SELECT concat(value, chr(0), rowkey) AS rowkey, 'i' AS family,
                 'r' AS qualifier, version, rowkey AS value
          FROM graftidx.$table
          WHERE family = 'd' AND qualifier = 'user_id'
            AND rowkey IS NOT NULL AND value IS NOT NULL""")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "the synced index must equal a fresh rebuild's content")
  }

  test("content sync across a version-GC compaction: shadowed entries " +
       "DELETE from the index and the result equals a rebuild") {
    stage("t5")
    // second generation shadows the first (same keys, newer versions)
    s.sql("""INSERT INTO graftidx.t5
             SELECT rowkey, family, qualifier, 2L AS version,
                    concat(value, '!') AS value
             FROM graftidx.t5 WHERE version = 1L""")
    s.sql("CALL graftidx.build_index('t5', 'uid', 'd', 'user_id')").collect()
    // default compact resolves to the newest version: v1 cells DROP —
    // a content-changing structural rewrite
    s.sql("CALL graftidx.compact('t5')").collect()
    s.sql("""INSERT INTO graftidx.t5 VALUES
             ('z9001', 'd', 'user_id', 3L, 'u1')""")
    val r = s.sql("CALL graftidx.sync_index('t5', 'uid')").collect()(0)
    assert(r.getString(4) == "content" && r.getLong(1) == 1L &&
           r.getLong(3) == 120L,
      s"expected 1 append + 120 shadowed-version deletes: $r")
    assertIndexExact("t5", "uid")
    // routing is armed again right after the content sync
    assert(routedPlan(s.sql(probeSql("t5", "u5"))))
  }

  test("content sync after DELETE FROM: removed rows leave the index " +
       "and the result equals a rebuild") {
    stage("t6")
    s.sql("CALL graftidx.build_index('t6', 'uid', 'd', 'user_id')").collect()
    s.sql("DELETE FROM graftidx.t6 WHERE rowkey >= 'k0100'")
    val r = s.sql("CALL graftidx.sync_index('t6', 'uid')").collect()(0)
    assert(r.getString(4) == "content" && r.getLong(1) == 0L &&
           r.getLong(3) == 20L,
      s"expected 0 appends + 20 deletes for the 20 deleted entities: $r")
    assertIndexExact("t6", "uid")
  }

  test("path-keyed boundaries: two path-mode indexes sharing a leaf " +
       "name sync independently (ADVICE r19)") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val base = s"$root/pm_base"
    s.createDataFrame(
      (0 until 20).map(i => Row(f"k$i%04d", "d", "q", 1L, s"v${i % 3}"))
        .asJava,
      graft.sources.cell.GraftCell.SCHEMA)
      .write.format("graftcell").mode("overwrite").save(base)
    val idxA = s"$root/parentA/idx"
    val idxB = s"$root/parentB/idx" // same leaf, different parent
    GraftCellMaintenance.buildIndex(s, base, idxA, "d", "q")
    GraftCellMaintenance.buildIndex(s, base, idxB, "d", "q")
    assert(GraftCellMaintenance.idxSyncSnapshot(idxA) !=
           GraftCellMaintenance.idxSyncSnapshot(idxB),
      "boundary names must carry the path discriminator")
    s.createDataFrame(
      Seq(Row("z0001", "d", "q", 1L, "v9")).asJava,
      graft.sources.cell.GraftCell.SCHEMA)
      .write.format("graftcell").mode("append").save(base)
    // sync A only: B's boundary must be untouched (r19 shared one
    // name — syncing A would have advanced B's boundary too)
    val (aSynced, _, _, _) =
      GraftCellMaintenance.syncIndex(s, base, idxA, "d", "q")
    assert(aSynced == 1L)
    val (bSynced, _, _, _) =
      GraftCellMaintenance.syncIndex(s, base, idxB, "d", "q")
    assert(bSynced == 1L,
      "B must still see the delta after A's sync — independent boundaries")
  }

  test("composite index: the row image resolves to the LATEST cell per " +
       "key column, and incremental sync refuses (rebuild-only)") {
    stage("t7")
    // a newer user_id for one entity: the composite entry must MOVE to
    // the new key prefix, and the old image must not linger
    s.sql("""INSERT INTO graftidx.t7 VALUES
             ('k0001', 'd', 'user_id', 9L, 'uNEW')""")
    s.sql("""CALL graftidx.build_index('t7', 'us', 'd',
                                       'user_id,score', -1L, 'value')""")
      .collect()
    val k1 = s.sql(
      """SELECT rowkey FROM graftidx.t7_idx_us
         WHERE family = 'i' AND value = 'k0001'""").collect()
    assert(k1.length == 1 &&
           k1(0).getString(0).startsWith("uNEW\u0000s1\u0000"),
      s"the image must use the latest user_id: ${k1.toSeq}")
    // covered cells carry the image version and the included value
    val cov = s.sql(
      """SELECT version, value FROM graftidx.t7_idx_us
         WHERE family = 'c' AND rowkey LIKE 'uNEW%'""").collect()
    assert(cov.length == 1 && cov(0).getLong(0) == 9L &&
           cov(0).getString(1) == "v1",
      s"covered cell must carry the image version + include value: " +
      s"${cov.toSeq}")
    // rebuild-only maintenance: sync refuses composites loudly
    s.sql("""INSERT INTO graftidx.t7 VALUES
             ('z0001', 'd', 'user_id', 1L, 'u0')""")
    val e = intercept[Exception] {
      s.sql("CALL graftidx.sync_index('t7', 'us')").collect()
    }
    assert(e.getMessage.contains("composite") &&
           e.getMessage.contains("build_index"),
      s"composite sync must refuse naming the rebuild verb: $e")
  }

  test("include columns without a composite key refuse (a single-column " +
       "index already covers the back-pointer)") {
    stage("t8")
    val e = intercept[Exception] {
      s.sql("""CALL graftidx.build_index('t8', 'bad', 'd', 'user_id',
                                         -1L, 'score')""").collect()
    }
    assert(e.getMessage.contains("composite"), s"$e")
  }

  test("routing engages on NAMESPACED tables (sibling-in-namespace " +
       "discovery matches the descriptor's ns:t reference)") {
    root
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftidx.prod")
    s.sql("DROP TABLE IF EXISTS graftidx.prod.t_idx_uid")
    s.sql("DROP TABLE IF EXISTS graftidx.prod.t")
    s.sql("""CREATE TABLE graftidx.prod.t (rowkey STRING, family STRING,
             qualifier STRING, version BIGINT, value STRING)
             USING graftcell""")
    s.sql("""INSERT OVERWRITE graftidx.prod.t
             SELECT format_string('k%04d', id), 'd', 'user_id', 1L,
                    concat('u', id % 9)
             FROM range(0, 90)""")
    s.sql("CALL graftidx.build_index('prod:t', 'uid', 'd', 'user_id')")
      .collect()
    val df = s.sql(
      """SELECT rowkey, version, value FROM graftidx.prod.t
         WHERE family = 'd' AND qualifier = 'user_id' AND value = 'u4'
         ORDER BY rowkey""")
    assert(df.queryExecution.optimizedPlan.toString
             .contains("t_idx_uid"),
      s"a namespaced indexed table must route:" +
      s"\n${df.queryExecution.optimizedPlan}")
    assert(df.collect().length == 10)
  }

  test("vacuum decides boundary orphanhood by the recorded owner path " +
       "(ADVICE r19): live non-sibling index survives, dead one reclaims") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val base = s"$root/vo_base"
    s.createDataFrame(
      (0 until 10).map(i => Row(f"k$i%04d", "d", "q", 1L, s"v$i")).asJava,
      graft.sources.cell.GraftCell.SCHEMA)
      .write.format("graftcell").mode("overwrite").save(base)
    val off = java.nio.file.Files
      .createTempDirectory("graft_offsite_idx_").toString + "/idx"
    GraftCellMaintenance.buildIndex(s, base, off, "d", "q")
    val snap = GraftCellMaintenance.idxSyncSnapshot(off)
    assert(GraftCellSnapshot.ownerOf(base, snap)
      .contains(new java.io.File(off).getAbsolutePath))
    // live owner at a NON-SIBLING path: vacuum must keep the boundary
    // (r19's sibling-leaf heuristic dropped it)
    GraftCellMaintenance.vacuum(base, dropInvalidSnapshots = false)
    assert(GraftCellSnapshot.names(base).contains(snap),
      "a live off-site index's boundary must survive vacuum")
    // owner gone: the boundary is an orphan and reclaims
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(off))
    GraftCellMaintenance.vacuum(base, dropInvalidSnapshots = false)
    assert(!GraftCellSnapshot.names(base).contains(snap),
      "a dead index's boundary must reclaim")
  }
  test("content sync is MULTIPLICITY-aware (r21, ADVICE r20): an exact " +
       "duplicate copy added since the boundary is appended") {
    stage("t9")
    s.sql("CALL graftidx.build_index('t9', 'uid', 'd', 'user_id')").collect()
    // a SECOND identical copy of one indexed cell (same rowkey,
    // version, value — the store enforces no uniqueness)
    s.sql("""INSERT INTO graftidx.t9
             SELECT rowkey, family, qualifier, version, value
             FROM graftidx.t9
             WHERE rowkey = 'k0003' AND family = 'd'
               AND qualifier = 'user_id'""")
    // keep-all compaction: a structural rewrite that preserves BOTH
    // copies, forcing the content-level delta path
    s.sql("CALL graftidx.compact('t9', -1L, NULL, 1000000L)").collect()
    val r = s.sql("CALL graftidx.sync_index('t9', 'uid')").collect()(0)
    assert(r.getString(4) == "content" && r.getLong(1) == 1L &&
           r.getLong(3) == 0L,
      s"the duplicate copy must append through the content sync: $r")
    assertIndexExact("t9", "uid") // exceptAll = multiset equality
    val nIdx = s.sql(
      """SELECT count(*) FROM graftidx.t9_idx_uid
         WHERE value = 'k0003'""").collect()(0).getLong(0)
    assert(nIdx == 2L, s"both copies must be indexed, got $nIdx")
  }

  test("content sync REFUSES a partial multiplicity shrink (r21): group " +
       "DML cannot remove only some copies of an identity") {
    stage("t10")
    s.sql("""INSERT INTO graftidx.t10
             SELECT rowkey, family, qualifier, version, value
             FROM graftidx.t10
             WHERE rowkey = 'k0004' AND family = 'd'
               AND qualifier = 'user_id'""")
    s.sql("CALL graftidx.build_index('t10', 'uid', 'd', 'user_id')")
      .collect()
    // DEFAULT compact keeps one row per cell key: the duplicated
    // identity shrinks 2 -> 1 (still present) — inexpressible as a
    // group delete, so the sync must refuse toward a rebuild
    s.sql("CALL graftidx.compact('t10')").collect()
    val e = intercept[Exception] {
      s.sql("CALL graftidx.sync_index('t10', 'uid')").collect()
    }
    assert(e.getMessage.contains("SHRANK") &&
           e.getMessage.contains("build_index"),
      s"partial shrink must refuse loudly: ${e.getMessage}")
    // the rebuild it names re-arms the lifecycle
    s.sql("CALL graftidx.build_index('t10', 'uid', 'd', 'user_id')")
      .collect()
    assertIndexExact("t10", "uid")
  }

  test("sync append is crash-idempotent (r21, ADVICE r20): a retry after " +
       "append-committed-but-promote-lost completes without duplicating") {
    stage("t11")
    s.sql("CALL graftidx.build_index('t11', 'uid', 'd', 'user_id')")
      .collect()
    s.sql("INSERT INTO graftidx.t11 VALUES ('z9100', 'd', 'user_id', 3L, 'u1')")
    val base = s"$root/t11"
    val idx = idxStore("t11", "uid")
    val snap = GraftCellMaintenance.idxSyncSnapshot(idx)
    val boundaryFile = new java.io.File(base, s"_snapshot_$snap.json")
    val boundaryBytes =
      java.nio.file.Files.readAllBytes(boundaryFile.toPath)
    CellFooterCache.invalidate(idx)
    val d0 = CellFooterCache.committedDirs(idx).toSet
    val r0 = CellFooterCache.filesOf(idx).map(_.rowCount).sum
    val deltaDirs = CellFooterCache.committedDirs(base).toSet --
      GraftCellSnapshot.dirs(base, snap).toSet
    // the REAL sync: appends the delta and promotes the boundary
    val real = s.sql("CALL graftidx.sync_index('t11', 'uid')").collect()(0)
    assert(real.getLong(1) == 1L, s"fixture sync must append 1: $real")
    CellFooterCache.invalidate(idx)
    val r1 = CellFooterCache.filesOf(idx).map(_.rowCount).sum
    // CRAFT the crash state the old code turned into silent duplicates:
    // boundary back at the pre-sync pin, the append already committed,
    // and the intent marker (which the crash left behind) in place
    java.nio.file.Files.write(boundaryFile.toPath, boundaryBytes)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = m.createObjectNode()
    n.put("delta", "delta|" + deltaDirs.toSeq.sorted.mkString(","))
    n.put("rows", r0)
    val arr = n.putArray("dirs"); d0.toSeq.sorted.foreach(arr.add)
    java.nio.file.Files.write(
      new java.io.File(idx, "_sync_intent.json").toPath,
      m.writeValueAsBytes(n))
    // the RETRY: must detect the committed append, skip it, promote,
    // and report the completed append's count
    val retry = s.sql("CALL graftidx.sync_index('t11', 'uid')").collect()(0)
    assert(retry.getLong(1) == r1 - r0,
      s"retry must report the completed append, not re-run it: $retry")
    CellFooterCache.invalidate(idx)
    val r2 = CellFooterCache.filesOf(idx).map(_.rowCount).sum
    assert(r2 == r1, s"retry must not duplicate index entries: $r2 != $r1")
    assert(!new java.io.File(idx, "_sync_intent.json").exists(),
      "a completed sync must clear its intent")
    assertIndexExact("t11", "uid")
    // and the boundary advanced: the next sync is a no-op
    val again = s.sql("CALL graftidx.sync_index('t11', 'uid')").collect()(0)
    assert(again.getLong(1) == 0L, s"boundary must have promoted: $again")
  }

  test("an r19-era legacy-named boundary is ADOPTED on sync (r21, ADVICE " +
       "r20): the lifecycle resumes instead of forcing a rebuild") {
    stage("t12")
    s.sql("CALL graftidx.build_index('t12', 'uid', 'd', 'user_id')")
      .collect()
    val base = s"$root/t12"
    val idx = idxStore("t12", "uid")
    val cur = GraftCellMaintenance.idxSyncSnapshot(idx)
    val legacy = s"__idx_sync_${new java.io.File(idx).getName}"
    // demote the boundary to its r19 name (no path hash)
    java.nio.file.Files.move(
      new java.io.File(base, s"_snapshot_$cur.json").toPath,
      new java.io.File(base, s"_snapshot_$legacy.json").toPath)
    s.sql("INSERT INTO graftidx.t12 VALUES ('z9200', 'd', 'user_id', 3L, 'u2')")
    val r = s.sql("CALL graftidx.sync_index('t12', 'uid')").collect()(0)
    assert(r.getString(4) == "delta" && r.getLong(1) == 1L,
      s"adoption must let the sync resume delta-granular: $r")
    assert(!GraftCellSnapshot.names(base).contains(legacy),
      "the adopted legacy boundary must not linger")
    assertIndexExact("t12", "uid")
  }

  test("vacuum reclaims an ownerless legacy-named boundary once a " +
       "path-keyed one exists for the same leaf (r21, ADVICE r20)") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val base = s"$root/vl_base"
    s.createDataFrame(
      (0 until 10).map(i => Row(f"k$i%04d", "d", "q", 1L, s"v$i")).asJava,
      graft.sources.cell.GraftCell.SCHEMA)
      .write.format("graftcell").mode("overwrite").save(base)
    val idx = s"$root/vl_base_idx_q"
    GraftCellMaintenance.buildIndex(s, base, idx, "d", "q")
    val cur = GraftCellMaintenance.idxSyncSnapshot(idx)
    val legacy = s"__idx_sync_${new java.io.File(idx).getName}"
    // an ownerless r19 leftover NEXT TO the live path-keyed boundary:
    // its sibling index dir exists, so the old heuristic kept it forever
    GraftCellSnapshot.create(base, legacy)
    GraftCellMaintenance.vacuum(base, dropInvalidSnapshots = false)
    val names = GraftCellSnapshot.names(base)
    assert(!names.contains(legacy),
      s"the superseded legacy boundary must reclaim: $names")
    assert(names.contains(cur),
      s"the live path-keyed boundary must survive: $names")
  }

  test("a composite index never routes a literally-comma-qualified " +
       "single-column predicate (r21, ADVICE r20)") {
    stage("t13")
    // base cells whose QUALIFIER is literally the comma-joined string a
    // composite descriptor persists (commas are legal in qualifiers)
    s.sql("""INSERT INTO graftidx.t13 VALUES
             ('k0001', 'd', 'user_id,score', 5L, 'vx'),
             ('k0002', 'd', 'user_id,score', 5L, 'vy')""")
    s.sql("""CALL graftidx.build_index('t13', 'us', 'd',
                                       'user_id,score', 400L, 'score')""")
      .collect()
    val df = s.sql(
      """SELECT rowkey, family, qualifier, version, value
         FROM graftidx.t13
         WHERE family = 'd' AND qualifier = 'user_id,score'
           AND value = 'vx'
         ORDER BY rowkey, version""")
    assert(!routedPlan(df),
      "a composite index's rowkey layout cannot answer a single-column " +
      s"probe: ${df.queryExecution.optimizedPlan}")
    val got = df.collect().map(_.toSeq)
    assert(got.length == 1 && got(0)(0) == "k0001",
      s"the plain scan must answer exactly: ${got.toSeq}")
  }
}
