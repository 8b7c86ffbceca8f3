package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the round-16 bucketed-store claim: a storage-partitioned
  * join of two co-bucketed cell tables avoids the shuffle of BOTH
  * sides, and the saving GROWS with the data while the layout cost was
  * paid once at write time. Per table size N: create two 16-bucket
  * catalog tables (75% rowkey overlap), then time the SAME
  * merge-hinted join-aggregate (sum of crc32 of both values — forces a
  * real read of both sides) with `spark.sql.sources.v2.bucketing
  * .enabled` on (SPJ: zero exchange) and off (the classic both-sides
  * shuffle), min of 2 passes each, and assert the SPJ run planned zero
  * shuffle exchanges.
  *
  * Usage: `sbt "runMain graft.SpjScale"` — prints a markdown table
  * (appended to SEEKSCALE.md at round close). */
object SpjScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val root = "/tmp/graft_spjscale"
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }
    deleteRec(new java.io.File(root))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gscale",
              classOf[graft.sources.cell.GraftCellCatalog].getName)
      .config("spark.sql.catalog.gscale.root", root)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeMin2(body: => Unit): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

    println("| rows/table | spj (s) | shuffled (s) | shuffled/spj |")
    println("|---|---|---|---|")
    Seq(100000L, 400000L, 1600000L, 6400000L).foreach { n =>
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      def cells(ids: org.apache.spark.sql.DataFrame, tilde: Boolean) =
        ids.select(
          format_string("%010d", col("id")).as("rowkey"),
          lit("d").as("family"), lit("q").as("qualifier"),
          col("id").as("version"),
          concat(sha1(col("id").cast("string")),
                 lit(if (tilde) "~" else "")).as("value"))
      Seq("pa", "pb").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS gscale.$t")
        spark.sql(s"""CREATE TABLE gscale.$t (rowkey STRING,
          family STRING, qualifier STRING, version BIGINT, value STRING)
          USING graftcell TBLPROPERTIES('buckets'='16')""")
      }
      cells(spark.range(n).toDF(), tilde = false)
        .createOrReplaceTempView("spjscale_a")
      cells(spark.range(n / 4, n + n / 4).toDF(), tilde = true)
        .createOrReplaceTempView("spjscale_b")
      spark.sql("INSERT OVERWRITE gscale.pa SELECT * FROM spjscale_a")
      spark.sql("INSERT OVERWRITE gscale.pb SELECT * FROM spjscale_b")

      def joined() = spark.sql(
        """SELECT /*+ MERGE(a) */ count(*) AS n,
                  sum(crc32(a.value)) AS ca, sum(crc32(b.value)) AS cb
           FROM gscale.pa a JOIN gscale.pb b ON a.rowkey = b.rowkey""")
      // SPJ leg: assert the claim the timing rests on — zero shuffles
      val df = joined()
      df.collect()
      val shuffles = "ShuffleExchange".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
      require(shuffles == 0,
        s"SPJ leg planned $shuffles shuffle exchanges")
      val spjS = timeMin2 { joined().collect(); () }
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val shufS = timeMin2 { joined().collect(); () }
      println(f"| $n | $spjS%.3f | $shufS%.3f | ${shufS / spjS}%.2f |")
    }
    deleteRec(new java.io.File(root))
    spark.stop()
  }
}
