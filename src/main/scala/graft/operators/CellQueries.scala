package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.A — scans/sources/sinks around the HBase cell model,
  * plus the flagship `pipeline_e2e` (the reference's whole job as one
  * query: parse embedded JSON → flatten to cells → analytic readback). */
object CellQueries extends QueryModule {

  /** events with props parsed into a nested struct — exercises the
    * recursive (dotted-path) branch of the flatten. */
  private def eventsNested(s: org.apache.spark.sql.SparkSession, dir: String) =
    T.events(s, dir)
      .withColumn("props", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .select(col("event_id"), col("ts_us"), col("user_id"),
              col("event_type"), col("value"), col("props"))

  private def eventCells(s: org.apache.spark.sql.SparkSession, dir: String) =
    CellFlatten.flatten(eventsNested(s, dir), col("event_id"), "d",
                        col("ts_us"), exclude = Set("event_id", "ts_us"))

  val queries: Map[String, Q] = Map(
    "scan_parquet" -> ((s, dir) =>
      T.load(s, dir, "nation").orderBy("n_nationkey")),

    "scan_events_ns" -> ((s, dir) =>
      T.events(s, dir)
        .select(col("event_id"), col("ts_us"), col("user_id"),
                col("event_type"), col("value"))
        .orderBy("event_id")),

    "sink_hbase_cells" -> ((s, dir) =>
      eventCells(s, dir).orderBy("rowkey", "qualifier")),

    "sink_cells_arrays" -> ((s, dir) =>
      CellFlatten.flatten(T.load(s, dir, "embeddings"), col("vec_id"), "e",
                          lit(0L), exclude = Set("vec_id"))
        .orderBy("rowkey", "qualifier")),

    "pipeline_e2e" -> ((s, dir) =>
      eventCells(s, dir)
        .groupBy("family", "qualifier")
        .agg(count(lit(1)).as("n_cells"),
             countDistinct(col("rowkey")).as("n_rows"),
             min(col("version")).as("min_version"),
             max(col("version")).as("max_version"))
        .orderBy("family", "qualifier")),
  )

  /** DuckDB twin of the cell flatten over events: a UNION ALL per leaf. */
  private val eventCellsSql =
    """SELECT CAST(event_id AS VARCHAR) AS rowkey, 'd' AS family,
              'event_type' AS qualifier, epoch_us(ts) AS version,
              event_type AS value FROM events
       UNION ALL
       SELECT CAST(event_id AS VARCHAR), 'd', 'props.k', epoch_us(ts),
              CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR) FROM events
       UNION ALL
       SELECT CAST(event_id AS VARCHAR), 'd', 'user_id', epoch_us(ts),
              CAST(user_id AS VARCHAR) FROM events
       UNION ALL
       SELECT CAST(event_id AS VARCHAR), 'd', 'value', epoch_us(ts),
              CAST(CAST(value AS DECIMAL(28,6)) AS VARCHAR) FROM events"""

  val oracles: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT * FROM nation ORDER BY n_nationkey",

    "scan_events_ns" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         FROM events ORDER BY event_id""",

    "sink_hbase_cells" ->
      s"""WITH cells AS ($eventCellsSql)
          SELECT * FROM cells ORDER BY rowkey, qualifier""",

    "sink_cells_arrays" ->
      """WITH cells AS (
           SELECT CAST(vec_id AS VARCHAR) AS rowkey, 'e' AS family,
                  'embedding[' || CAST(t.i AS VARCHAR) || ']' AS qualifier,
                  CAST(0 AS BIGINT) AS version,
                  CAST(CAST(CAST(embedding[t.i + 1] AS DOUBLE) AS DECIMAL(28,6)) AS VARCHAR) AS value
           FROM embeddings CROSS JOIN generate_series(0, 63) AS t(i)
           UNION ALL
           SELECT CAST(vec_id AS VARCHAR), 'e', 'label', CAST(0 AS BIGINT),
                  CAST(label AS VARCHAR) FROM embeddings)
         SELECT * FROM cells ORDER BY rowkey, qualifier""",

    "pipeline_e2e" ->
      s"""WITH cells AS ($eventCellsSql)
          SELECT family, qualifier, count(*) AS n_cells,
                 count(DISTINCT rowkey) AS n_rows,
                 min(version) AS min_version, max(version) AS max_version
          FROM cells GROUP BY family, qualifier
          ORDER BY family, qualifier""",
  )
}
