package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.A (sources: JSON-lines, JSON schema inference, CSV) and
  * §2.J (UDF/UDTF surface) plus the multimodal binary-column op (§2.K).
  *
  * The jsonl/csv queries are round-trips: dump a table slice to /tmp in
  * the text format, read it back (explicit schema for the `scan_*`
  * variants, inference for `scan_json_infer`), and emit rows the oracle
  * reproduces straight from parquet — proving the text codecs are
  * lossless. Doubles survive because Spark writes shortest-roundtrip
  * decimal forms in both JSON and CSV writers.
  *
  * Scale note: round-trip staging under /tmp is a test harness detail;
  * the read path itself (`spark.read.schema(...).json/csv`) is the
  * production-shaped API and partitions by file splits like any scan.
  */
object Sources extends QueryModule {

  private def stage(dir: String, tag: String): String =
    s"/tmp/graft_stage_${tag}_" + dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Staged text dumps are static per sf-dir — write once, reuse. */
  private def staged(tmp: String): Boolean =
    new java.io.File(s"$tmp/_SUCCESS").exists()

  private def stageJsonl(s: org.apache.spark.sql.SparkSession,
                         dir: String): String = {
    val tmp = stage(dir, "jsonl")
    if (!staged(tmp))
      T.load(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").json(tmp)
    tmp
  }

  private val eventsSchema =
    "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
  private val custSchema =
    "c_custkey BIGINT, c_name STRING, c_mktsegment STRING, c_acctbal DOUBLE"

  private val eventsOracle =
    """SELECT event_id, user_id, event_type, value
       FROM events ORDER BY event_id"""

  val queries: Map[String, Q] = Map(
    "scan_jsonl" -> ((s, dir) => {
      val tmp = stageJsonl(s, dir)
      s.read.schema(eventsSchema).json(tmp)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),

    "scan_json_infer" -> ((s, dir) => {
      val tmp = stageJsonl(s, dir)
      s.read.json(tmp) // no schema: infer (longs + double + string)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),

    "scan_csv" -> ((s, dir) => {
      val tmp = stage(dir, "csv")
      if (!staged(tmp))
        T.load(s, dir, "customer")
          .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
          .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema(custSchema).option("header", "true").csv(tmp)
        .orderBy("c_custkey")
    }),

    "udf_rowkey" -> ((s, dir) => {
      // Reference-style salted rowkey (bucket prefix defeats hotspotting
      // on monotonically increasing keys at scale). Registered Scala UDF
      // plus its codegen-friendly pure-Column twin for comparison.
      val salted = udf((k: Long) => s"${k % 16}_$k")
      T.load(s, dir, "orders").select(
        col("o_orderkey"),
        salted(col("o_orderkey")).as("rowkey_udf"),
        concat(col("o_orderkey") % 16, lit("_"), col("o_orderkey"))
          .as("rowkey_col"))
        .orderBy("o_orderkey")
    }),

    "udtf_shingles" -> ((s, dir) =>
      // Generator op: doc -> positional 3-gram word shingles. Pure
      // Column version (sequence+slice+posexplode) keeps it inside
      // whole-stage codegen; a flatMap UDTF would break the pipeline.
      T.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3) // sequence(1, n<1) would descend
        .select(col("doc_id"),
                posexplode(transform(
                  sequence(lit(1), size(col("w")) - 2),
                  i => array_join(slice(col("w"), i, lit(3)), " "))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
                col("col").as("shingle"))
        .orderBy("doc_id", "pos")),

    "multimodal_cells" -> ((s, dir) =>
      // Opaque-binary payload column (stand-in for image/audio bytes):
      // deterministic fake payload = md5 digest bytes of the text; the
      // engine-side plumbing (BinaryType column, byte length, hex views)
      // is real — but raw bytes crash the driver's pandas comparer, so
      // the checked output carries the full hex view, not the BLOB.
      T.load(s, dir, "documents").select(
        col("doc_id"),
        lower(hex(unhex(md5(col("text"))))).as("payload_hex"),
        length(unhex(md5(col("text")))).cast("long").as("n_bytes"),
        lower(hex(unhex(md5(col("text"))))).substr(1, 8).as("hex8"))
        .orderBy("doc_id")),
  )

  val oracles: Map[String, String] = Map(
    "scan_jsonl" -> eventsOracle,
    "scan_json_infer" -> eventsOracle,

    "scan_csv" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
         FROM customer ORDER BY c_custkey""",

    "udf_rowkey" ->
      """SELECT o_orderkey,
                CAST(o_orderkey % 16 AS VARCHAR) || '_' ||
                  CAST(o_orderkey AS VARCHAR) AS rowkey_udf,
                CAST(o_orderkey % 16 AS VARCHAR) || '_' ||
                  CAST(o_orderkey AS VARCHAR) AS rowkey_col
         FROM orders ORDER BY o_orderkey""",

    "udtf_shingles" ->
      """SELECT doc_id,
                unnest(generate_series(1, len(w) - 2)) AS pos,
                unnest(list_transform(generate_series(1, len(w) - 2),
                       i -> array_to_string(w[i:i+2], ' '))) AS shingle
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         WHERE len(w) >= 3
         ORDER BY doc_id, pos""",

    "multimodal_cells" ->
      """SELECT doc_id,
                md5(text) AS payload_hex,
                octet_length(unhex(md5(text))) AS n_bytes,
                substring(md5(text), 1, 8) AS hex8
         FROM documents ORDER BY doc_id""",
  )
}
