package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the round-17 FUZZY-ROWKEY pushdown claim: a fixed-position
  * wildcard probe over a salted store plans only the region files whose
  * stats can hold a match, so its cost tracks the MATCHING slice while
  * the unpushed twin (the same predicate evaluated above a full scan)
  * tracks the STORE. Per store size N (region files of 50 rows, 4
  * salts, 6 years of days): probe one month across every salt with
  * `option("fuzzy", "?-2024-03")` vs `substr(rowkey, 3, 7) = '2024-03'`
  * over the plain scan; report seconds and files planned (k/n from the
  * executed plan).
  *
  * Usage: `sbt "runMain graft.FuzzyScale"` — prints a markdown table
  * (appended to SEEKSCALE.md at round close). */
object FuzzyScale {
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

    val root = "/tmp/graft_fuzzyscale"
    println("| region files | fuzzy probe (s) | planned k/n | unpushed twin (s) | rows | 2-pattern probe (s) | planned k/n | rows |")
    println("|---|---|---|---|---|---|---|---|")
    Seq(16, 64, 256, 1024).foreach { nFiles =>
      val store = s"$root/s_$nFiles"
      deleteRec(new java.io.File(store))
      graft.sources.cell.CellFooterCache.invalidate(store)
      val rows = nFiles * 50L
      // salted keys `<salt>-<date>-<id>` spread over 4 salts × 6 years
      spark.range(rows).select(
          concat(
            (col("id") % 4).cast("string"), lit("-"),
            // every size covers the same 6-year span (2020..2025), so
            // the 2024-03 probe always has a matching slice to find
            date_format(date_add(lit("2020-01-01").cast("date"),
              (col("id") * 2192L / rows).cast("int")), "yyyy-MM-dd"),
            lit("-"), format_string("%010d", col("id"))).as("rowkey"),
          lit("d").as("family"), lit("q").as("qualifier"),
          col("id").as("version"),
          sha1(col("id").cast("string")).as("value"))
        .write.format("graftcell").option("maxRowsPerFile", "50")
        .mode("append").save(store)

      val fuzzy = spark.read.format("graftcell")
        .option("fuzzy", "?-2024-03").load(store).select("rowkey")
      val (fuzzyS, fuzzyRows) = minOf3(fuzzy.count())
      val kn = rf.findFirstMatchIn(fuzzy.queryExecution.executedPlan.toString)
        .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("?")
      val twin = spark.read.format("graftcell").load(store)
        .filter(substring(col("rowkey"), 3, 7) === "2024-03")
        .select("rowkey")
      val (twinS, twinRows) = minOf3(twin.count())
      require(fuzzyRows == twinRows, s"$fuzzyRows != $twinRows")
      // r18 multi-pattern: TWO months OR-ed in one probe — the union
      // plan must track its two slices, not the store
      val multi = spark.read.format("graftcell")
        .option("fuzzy", """["?-2024-03","?-2022-07"]""")
        .load(store).select("rowkey")
      val (multiS, multiRows) = minOf3(multi.count())
      val knm = rf.findFirstMatchIn(multi.queryExecution.executedPlan.toString)
        .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("?")
      val mtwin = spark.read.format("graftcell").load(store)
        .filter(substring(col("rowkey"), 3, 7) === "2024-03" ||
                substring(col("rowkey"), 3, 7) === "2022-07")
        .select("rowkey")
      require(multiRows == mtwin.count(), s"multi twin mismatch")
      println(f"| $nFiles | $fuzzyS%.3f | $kn | $twinS%.3f | $fuzzyRows " +
              f"| $multiS%.3f | $knm | $multiRows |")
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
