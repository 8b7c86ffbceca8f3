package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end dynamic (runtime) file pruning through the graftcell
  * DSv2 scan: a broadcast join's build side delivers its rowkey set at
  * runtime (`SupportsRuntimeFiltering`), and the scan plans only the
  * region files those keys live in — the HBase "seek the joined
  * regions" behavior, driven by Spark's own DPP machinery rather than
  * a hand-written probe. */
class DppProbeSpec extends AnyFunSuite {
  private lazy val s = SparkFixture.spark
  private val dir = SparkFixture.sf001

  test("broadcast join injects a runtime IN-filter that prunes region files") {
    val sess = s.newSession()
    // the fixture store is a few hundred KB, so the DPP benefit
    // heuristic (meant for TB-scale scans) must be told pruning pays;
    // at production scale the scan's own reported statistics
    // (SupportsReportStatistics: post-pruning bytes) make this case
    sess.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    sess.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100.0")
    SparkEntry.queries("scan_cell_connector")(sess, dir).queryExecution // stage store
    val store = "/tmp/graft_cellstore_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    import sess.implicits._
    val dimPath = s"/tmp/graft_dpp_dim_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    Seq(("41", "keep"), ("42", "keep"), ("999999", "drop"))
      .toDF("rk", "flag").write.mode("overwrite").parquet(dimPath)
    // NOTE: the dim-side predicate must be a comparison — Spark's
    // isLikelySelective rejects a bare boolean column, and a
    // driver-local Seq dim constant-folds to a LocalRelation with no
    // Filter node at all, so neither triggers DPP
    val dim = sess.read.parquet(dimPath).filter(col("flag") === "keep")
    val fact = sess.read.format("graftcell").load(store)
    val j = fact.join(broadcast(dim), col("rowkey") === col("rk"))
    val rows = j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression(rowkey"),
           s"no runtime filter injected:\n$plan")
    val rf = "regionFiles: (\\d+)/(\\d+)".r.findFirstMatchIn(plan).get
    assert(rf.group(1).toInt < rf.group(2).toInt,
           s"runtime filter did not prune region files: ${rf.matched}")
    // and the join result is exactly the cells of the kept rowkeys
    val wantCells = SparkEntry.queries("sink_hbase_cells")(sess, dir)
      .filter(col("rowkey").isin("41", "42")).count()
    assert(rows.length == wantCells && rows.nonEmpty,
           s"join rows ${rows.length} != expected cells $wantCells")
  }
}
