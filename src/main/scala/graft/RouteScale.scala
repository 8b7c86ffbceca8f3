package graft

import org.apache.spark.sql.SparkSession

/** Round-20 evidence harness for AUTOMATIC index routing: the SAME
  * plain SQL value-predicate probe, measured with the index present
  * (IndexRoute answers it COVERED — one index prefix-seek, every
  * output column reconstructed from the index row, the base never
  * touched) and with the
  * index dropped (the honest fallback: a full scan + row filter).
  * The fixture must defeat EVERY other pruning layer or the twin is
  * secretly a seek too: per-file value [min,max] spans the md5 space
  * (no range prune), and region files hold 5000 rows with ~5000
  * distinct values each, so the r19 per-file value BLOOMS saturate
  * and store as no-evidence (at 50-row files the blooms alone bound
  * the point probe — measured during this harness's construction,
  * and exactly why blooms exist). Unlike IndexScale (the
  * hand-wired probe pipeline), nothing here touches the index API:
  * the QUERY TEXT is identical in both runs — the planner makes the
  * difference, which is the round-20 claim. Per store size (5000-row
  * region files): seconds (min of 3 warm reps) + matched rows (a
  * CONSTANT 6400 at every size — the probe's selectivity, not the
  * store, is the work), routed vs dropped. Appended to SEEKSCALE.md
  * at round close.
  *
  * Usage: `sbt "runMain graft.RouteScale"`. */
object RouteScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = "/tmp/graft_routescale"
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }
    deleteRec(new java.io.File(root))
    spark.conf.set("spark.sql.catalog.graftroute",
      classOf[graft.sources.cell.GraftCellCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftroute.root", root)

    def minOf3(body: => Long): (Double, Long) = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = body
        (System.nanoTime() - t0) / 1e9
      }
      (ts.min, rows)
    }
    val rf = "regionFiles: (\\d+)/(\\d+)".r
    def idxKn(df: org.apache.spark.sql.DataFrame): String = {
      val plans = rf.findAllMatchIn(
        df.queryExecution.executedPlan.toString).toSeq
      plans.map(m => s"${m.group(1)}/${m.group(2)}").mkString(" , ")
    }

    println("| store rows | routed (s) | rows matched " +
      "| planned regionFiles (base , idx) | dropped (s) | dropped k/n |")
    println("|---|---|---|---|---|---|")
    Seq(64, 256, 1024, 2048).foreach { nFiles =>
      val rows = nFiles * 5000
      val t = s"t$nFiles"
      spark.sql(s"""CREATE TABLE graftroute.$t (
                     rowkey STRING, family STRING, qualifier STRING,
                     version BIGINT, value STRING) USING graftcell""")
      // high-cardinality value column, SCATTERED by a multiplicative
      // hash so each 5000-row file's value [min,max] spans the space
      // (no range-stat prune) and holds ~5000 distinct values (blooms
      // saturate — no membership prune). The probe is a value PREFIX
      // matching exactly 100 values x 64 rows = 6400 rows at EVERY
      // size: the one probe nothing but the index can bound.
      val distinct = math.max(rows / 64, 100)
      spark.sql(s"""INSERT OVERWRITE graftroute.$t
                    SELECT format_string('k%09d', id), 'd', 'q', 1L,
                           format_string('v%08d',
                             (id * 2654435761L) % ${distinct}L)
                    FROM range(0, $rows)""")
      spark.sql(
        s"CALL graftroute.build_index('$t', 'q', 'd', 'q', 5000)").collect()
      def sql = spark.sql(
        s"""SELECT rowkey, version, value FROM graftroute.$t
            WHERE family = 'd' AND qualifier = 'q'
              AND value LIKE 'v000000%'""")
      // sanity: the rule fired (semi-join present), then is gone
      val routedPlan = sql.queryExecution.optimizedPlan.toString
      assert(routedPlan.contains("_idx_"),
        s"expected the routed (covered) plan:\n$routedPlan")
      val (tRouted, n) = minOf3(sql.count())
      val executed = sql
      executed.collect()
      val routedKn = idxKn(executed)
      spark.sql(s"DROP TABLE graftroute.${t}_idx_q")
      assert(!sql.queryExecution.optimizedPlan.toString
        .contains("_idx_"), "drop must un-route")
      val (tPlain, n2) = minOf3(sql.count())
      val plain = sql
      plain.collect()
      val plainKn = idxKn(plain)
      assert(n == n2, s"routing changed the answer: $n vs $n2")
      println(f"| $rows | $tRouted%.3f | $n | $routedKn " +
        f"| $tPlain%.3f | $plainKn |")
    }
    spark.stop()
  }
}
