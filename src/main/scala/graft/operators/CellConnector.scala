package graft.operators

import graft.QueryModule
import org.apache.spark.sql.functions._

/** SURVEY.md §2.A round-14 addition — the DataSource V2 cell-table
  * connector keys: the engine's HBase cell model exposed as a pluggable
  * `spark.read.format("graftcell")` source (graft.sources.cell) instead
  * of query patterns over an inline flatten.
  *
  * The staged store IS the HBase table layout: pre-split by explicit
  * rowkey ranges (region = first rowkey byte, the production pre-split
  * knob — cf. cell_bulkload_layout), each region's files sorted by
  * rowkey so parquet footers carry tight min/max stats. The connector's
  * three pruning levels (file / row-group / column — see
  * GraftCellSource.scala) then reproduce cell_scan_range /
  * cell_prefix_scan semantics INSIDE the scan, which is where a 100 TB
  * deployment needs them: a range probe touches one region's files, not
  * the table.
  *
  * Every key is oracle-checked against the SAME DuckDB cell rebuild as
  * the query-pattern twins (CellQueries.eventCellsSql), so the connector
  * path must land byte-identically on the statically-derived cells.
  */
object CellConnector extends QueryModule {

  private def storePath(dir: String): String =
    "/tmp/graft_cellstore_" + dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Stage the event-cell store once per sf-dir (write-once marker like
    * Sources staging). Pre-split on the first rowkey byte — explicit,
    * data-independent split points, so the layout is deterministic —
    * and rowkey-sorted within partitions so every data file's footer
    * carries a tight min/max rowkey (the HFile metadata the connector
    * prunes on). */
  private[operators] def stage(s: org.apache.spark.sql.SparkSession,
                               dir: String): String = {
    val path = storePath(dir)
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      CellQueries.eventCells(s, dir)
        .withColumn("region", substring(col("rowkey"), 1, 1))
        .repartition(col("region"))
        .sortWithinPartitions("region", "rowkey", "family", "qualifier")
        .write.mode("overwrite").partitionBy("region").parquet(path)
    }
    path
  }

  private def cells(s: org.apache.spark.sql.SparkSession, dir: String) =
    s.read.format("graftcell").load(stage(s, dir))

  val queries: Map[String, Q] = Map(
    "scan_cell_connector" -> ((s, dir) =>
      // Full-table read through the connector: proves the store stages
      // and reads back the complete cell set (no filter, no pruning —
      // the correctness floor the pushdown keys stand on).
      cells(s, dir).orderBy("rowkey", "qualifier")),

    "cell_connector_range" -> ((s, dir) =>
      // HBase Scan(startRow, stopRow) THROUGH the scan: the rowkey range
      // is accepted by pushFilters, prunes region files by footer
      // min/max at plan time, skips row groups inside survivors, and is
      // re-checked exactly per row. Same predicate as cell_scan_range,
      // moved from a post-scan Filter into the source.
      cells(s, dir)
        .filter(col("rowkey") >= "30" && col("rowkey") < "50")
        .orderBy("rowkey", "qualifier")),

    "cell_connector_prefix" -> ((s, dir) =>
      // PrefixFilter + addColumn + column projection: prefix becomes the
      // [p, prefixStop(p)) range for pruning, qualifier IN-list drops
      // cells inside the reader, and the projection narrows the parquet
      // read schema to 3 of 5 columns (version/family never decoded).
      cells(s, dir)
        .filter(col("rowkey").startsWith("10") &&
                col("qualifier").isin("event_type", "value"))
        .select("rowkey", "qualifier", "value")
        .orderBy("rowkey", "qualifier")),

    "sink_cell_connector_write" -> ((s, dir) => {
      // The connector WRITE path: df.write.format("graftcell") — the
      // sink itself declares the HFile layout (RequiresDistribution-
      // AndOrdering: range-cluster by rowkey, sort by the full cell
      // key), so Catalyst plans the bulk-load shuffle and every task
      // commits one sorted, non-overlapping region file via the
      // tmp→batch rename protocol. Readback probes a rowkey range
      // THROUGH the just-written store, so the round trip proves
      // write layout + footer stats + pushdown compose.
      val path = storePath(dir) + "_w"
      if (!new java.io.File(s"$path/_SUCCESS").exists())
        CellQueries.eventCells(s, dir)
          .write.format("graftcell").mode("append").save(path)
      s.read.format("graftcell").load(path)
        .filter(col("rowkey") >= "55" && col("rowkey") < "57")
        .orderBy("rowkey", "qualifier")
    }),
  )

  val oracles: Map[String, String] = Map(
    "scan_cell_connector" ->
      s"""WITH cells AS (${CellQueries.eventCellsSql})
          SELECT * FROM cells ORDER BY rowkey, qualifier""",

    "cell_connector_range" ->
      s"""WITH cells AS (${CellQueries.eventCellsSql})
          SELECT * FROM cells
          WHERE rowkey >= '30' AND rowkey < '50'
          ORDER BY rowkey, qualifier""",

    "cell_connector_prefix" ->
      s"""WITH cells AS (${CellQueries.eventCellsSql})
          SELECT rowkey, qualifier, value FROM cells
          WHERE rowkey LIKE '10%' AND qualifier IN ('event_type', 'value')
          ORDER BY rowkey, qualifier""",

    "sink_cell_connector_write" ->
      s"""WITH cells AS (${CellQueries.eventCellsSql})
          SELECT * FROM cells
          WHERE rowkey >= '55' AND rowkey < '57'
          ORDER BY rowkey, qualifier""",
  )
}
