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

  /** Hive-style partitioned parquet staging: events written
    * `partitionBy(event_type)` — the layout that makes partition pruning
    * (the #1 scan-cost lever at 100 TB) possible at all. */
  private def stagePartitioned(s: org.apache.spark.sql.SparkSession,
                               dir: String): String = {
    val tmp = stage(dir, "pqpart")
    if (!staged(tmp))
      T.events(s, dir)
        .select("event_id", "user_id", "event_type", "value", "ts_us")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    tmp
  }

  /** JSONL staging with a known number of injected malformed lines. */
  private val badLines = Seq(
    """{"event_id": oops""", "not json at all", """{"event_id":}""",
    "[1,2", "{", "}{", "\"")
  private def stageCorrupt(s: org.apache.spark.sql.SparkSession,
                           dir: String): String = {
    val tmp = stage(dir, "jsonc")
    if (!staged(tmp)) {
      import s.implicits._
      // Only finite (or NULL) doubles round-trip as parseable JSON —
      // NaN/Infinity would serialize to an extra unparseable line and
      // silently break the n_bad = badLines.size contract, so enforce
      // the invariant here (the oracle applies the same filter).
      val finite = col("value").isNull ||
        (!isnan(col("value")) &&
         !col("value").isin(Double.PositiveInfinity, Double.NegativeInfinity))
      val good = T.load(s, dir, "events")
        .filter(finite)
        .select(to_json(struct(col("event_id"), col("user_id"),
                               col("event_type"), col("value"))).as("value"))
      good.unionAll(badLines.toDF("value"))
        .write.mode("overwrite").text(tmp)
    }
    tmp
  }

  /** Two parquet "generations" of the same table with drifted schemas —
    * v=1 lacks the later-added event_type column — in partition dirs, the
    * layout a long-lived ingest job actually produces. (Primitive type
    * WIDENING across files is not mergeable by Spark's StructType.merge —
    * int vs bigint throws — so the evolution modeled here is the
    * add-a-column kind; widening needs an explicit read schema.) */
  private def stageEvolve(s: org.apache.spark.sql.SparkSession,
                          dir: String): String = {
    val tmp = stage(dir, "evolve")
    if (!new java.io.File(s"$tmp/v=2/_SUCCESS").exists()) {
      val e = T.load(s, dir, "events")
      e.filter(col("event_id") % 2 === 0)
        .select("event_id", "user_id", "value")
        .write.mode("overwrite").parquet(s"$tmp/v=1")
      e.filter(col("event_id") % 2 === 1)
        .select("event_id", "user_id", "value", "event_type")
        .write.mode("overwrite").parquet(s"$tmp/v=2")
    }
    tmp
  }

  /** Tiny event_type dimension (5 rows) staged as a REAL parquet
    * relation: dynamic partition pruning only fires against a join to an
    * actual relation — an in-memory LocalRelation would constant-fold. */
  private def stageDim(s: org.apache.spark.sql.SparkSession,
                       dir: String): String = {
    val tmp = stage(dir, "typedim")
    if (!staged(tmp))
      T.events(s, dir).select("event_type").distinct()
        .withColumn("category",
          when(col("event_type").isin("purchase", "signup"), "conversion")
            .otherwise("traffic"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    tmp
  }

  /** Range-clustered, sorted-within-file layout: each output file covers
    * a narrow disjoint l_orderkey range and its parquet row groups carry
    * tight min/max stats on the sort key — the data-layout lever that
    * turns selective scans into a handful of row-group reads at 100 TB
    * (the single-column special case of Z-ordering). */
  private def stageSorted(s: org.apache.spark.sql.SparkSession,
                          dir: String): String = {
    val tmp = stage(dir, "pqsorted")
    if (!staged(tmp))
      T.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite").parquet(tmp)
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

    "scan_orc" -> ((s, dir) => {
      // ORC round-trip — the other columnar production format
      // (Hive-lineage pipelines feed ORC next to parquet; a complete
      // engine reads both). Stage four orders columns as ORC once, read
      // back with a predicate: the ORC reader does the same min/max
      // stripe skipping and column pruning as parquet's, so format
      // choice doesn't change the plan shape. The oracle reads the same
      // rows from the parquet table — the round trip must be
      // content-identical.
      val tmp = stage(dir, "orc")
      if (!staged(tmp))
        T.load(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice",
                  "o_orderpriority")
          .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .filter(col("o_totalprice") > 100000.0)
        .orderBy("o_orderkey")
    }),

    "scan_avro" -> ((s, dir) => {
      // Avro round-trip — the row-oriented production format (Kafka
      // payloads, schema-registry pipelines). This Spark build bundles
      // the avro DataSource in spark-sql itself (AvroFileFormat is on
      // the default classpath — probed r9; earlier rounds parked this
      // believing the connector jar was absent). Stage four supplier
      // columns as avro once, read back with a predicate; avro is not
      // splittable by row group like parquet, so at 100 TB parallelism
      // comes from file count — same as the binaryFile source. The
      // oracle reads the same rows from the parquet table: the round
      // trip must be content-identical.
      val tmp = stage(dir, "avro")
      if (!staged(tmp))
        T.load(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
          .write.mode("overwrite")
          .format("org.apache.spark.sql.avro.AvroFileFormat").save(tmp)
      s.read.format("org.apache.spark.sql.avro.AvroFileFormat").load(tmp)
        .filter(col("s_acctbal") > 0.0)
        .orderBy("s_suppkey")
    }),

    "sink_parquet_partitioned" -> ((s, dir) => {
      // Write partitioned, read the whole layout back and aggregate per
      // partition value — proves the round trip preserves rows and the
      // partition column rehydrates from directory names.
      val tmp = stagePartitioned(s, dir)
      s.read.parquet(tmp)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             T.d(sum(T.dec(col("value")))).as("sum_value"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }),

    "scan_binaryfile" -> ((s, dir) => {
      // Spark's binaryFile source — the entry point for opaque media
      // blobs (multimodal ingest): each file becomes (path, length,
      // content: binary). Stage 20 docs as .bin files once per sf-dir;
      // read back name, byte length, and a decoded prefix. At 100 TB
      // this source partitions by file, so the degree of parallelism is
      // the file count — the scan itself never shuffles.
      val tmp = stage(dir, "bin")
      if (!new java.io.File(s"$tmp/done.marker").exists()) {
        new java.io.File(tmp).mkdirs()
        T.load(s, dir, "documents").filter(col("doc_id") < 20)
          .select("doc_id", "text").collect().foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$tmp/doc_${r.getLong(0)}.bin"),
              r.getString(1).getBytes("UTF-8"))
          }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$tmp/done.marker"), Array[Byte]())
      }
      s.read.format("binaryFile").option("pathGlobFilter", "*.bin")
        .load(tmp)
        .select(
          regexp_extract(col("path"), "doc_([0-9]+)\\.bin$", 1)
            .cast("long").as("doc_id"),
          col("length"),
          substring(col("content").cast("string"), 1, 8).as("prefix"))
        .orderBy("doc_id")
    }),

    "sink_parquet_overwrite_dynamic" -> ((s, dir) => {
      // Dynamic partition overwrite: batch 2 rewrites ONLY the
      // partitions it contains rows for (here: purchase, values
      // doubled) — every other partition's files are untouched. This is
      // THE idempotent daily-reload primitive at 100 TB: re-running a
      // day's job replaces that day's partitions, never truncating the
      // table (static overwrite mode would). Readback aggregates per
      // partition: purchase reflects batch 2, the rest batch 1.
      val tmp = stage(dir, "pqdyn")
      val ev = T.events(s, dir)
        .select("event_id", "user_id", "event_type", "value", "ts_us")
      // batch 1: full load (re-staged every run: this sink IS the op
      // under test, so it must not reuse a previous run's files)
      ev.write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      // batch 2: reload of just the purchase partition, values doubled
      ev.filter(col("event_type") === "purchase")
        .withColumn("value", col("value") * 2)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             T.d(sum(T.dec(col("value")))).as("sum_value"))
        .orderBy("event_type")
    }),

    "scan_pruned" -> ((s, dir) => {
      // Read ONE partition back: the event_type predicate is resolved
      // against directory names (PartitionFilters in the plan — see
      // PLANS.md), so 4/5 of the data is never opened. At 100 TB this
      // is the difference between a full scan and touching one
      // partition's files.
      val tmp = stagePartitioned(s, dir)
      s.read.parquet(tmp)
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "event_type", "value", "ts_us")
        .orderBy("event_id")
    }),

    "scan_dpp" -> ((s, dir) => {
      // Dynamic partition pruning: the partition predicate is NOT in the
      // query — it only emerges at runtime from the dim-side filter
      // (category = 'conversion' selects 2 of 5 event_types). Catalyst
      // plants a dynamicpruningexpression subquery on the fact scan's
      // PartitionFilters (reusing the dim's broadcast), so 3/5 of the
      // partitioned fact is never opened even though no literal
      // event_type predicate exists. At 100 TB this is THE mechanism
      // that makes star-schema joins against partitioned facts cheap;
      // static pruning (scan_pruned) can't help when the filter lives
      // on the dimension. PlanSpec asserts the dynamic filter is planted.
      val fact = s.read.parquet(stagePartitioned(s, dir))
      val dim = s.read.parquet(stageDim(s, dir))
        .filter(col("category") === "conversion")
      fact.join(dim, Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             T.d(sum(T.dec(col("value")))).as("sum_value"))
        .orderBy("event_type")
    }),

    "sink_parquet_sorted" -> ((s, dir) => {
      // Read a narrow key range back from the range-clustered layout
      // (stageSorted): the between-predicate reaches the scan as
      // PushedFilters, and because files/row-groups are disjoint in
      // l_orderkey, footer min/max stats skip all but ~1/8 of the data
      // before any page is decoded. Same rows as an unsorted scan —
      // the oracle proves layout never changes results, only cost.
      val tmp = stageSorted(s, dir)
      s.read.parquet(tmp)
        .filter(col("l_orderkey").between(1000, 3000))
        .agg(count(lit(1)).as("n"),
             T.d(sum(T.dec(col("l_quantity")))).as("sum_qty"),
             T.d(sum(T.dec(col("l_extendedprice")))).as("sum_price"))
    }),

    "scan_json_corrupt" -> ((s, dir) => {
      // Dirty-ingest robustness: PERMISSIVE mode parks unparseable lines
      // in _corrupt_record instead of failing the job — the first thing
      // a production JSON ingest meets. Output = good/bad line counts
      // plus a payload checksum over the good rows (proves the good rows
      // actually parsed, not just counted).
      val tmp = stageCorrupt(s, dir)
      s.read
        .schema(eventsSchema + ", _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
        .agg(count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
             count(col("_corrupt_record")).as("n_bad"),
             T.d(sum(T.dec(col("value")))).as("sum_value"))
    }),

    "scan_schema_evolve" -> ((s, dir) => {
      // Schema-drift read path: mergeSchema unions the per-file schemas
      // (event_type exists only in the v=2 generation; v=1 rows get
      // NULL), and the generation id rehydrates from the partition dir.
      // Without mergeSchema the scan would pin whichever footer it
      // sampled first and silently drop the added column.
      val tmp = stageEvolve(s, dir)
      s.read.option("mergeSchema", "true").parquet(tmp)
        .select(col("event_id"), col("user_id"), col("value"),
                col("event_type"), col("v").cast("int").as("v"))
        .orderBy("event_id")
    }),

    "udf_sql" -> ((s, dir) => {
      // Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN <expr>): reusable
      // user logic that stays INSIDE Catalyst — the body INLINES into
      // the plan (the optimized plan contains no function call at all,
      // PlanSpec-verified), so it constant-folds, pushes down, and
      // codegens like a built-in. The 100 TB rule: express shared
      // business logic as SQL UDFs first; a JVM/Python closure (an
      // optimizer black box that kills pushdown) is the last resort —
      // udf_rowkey above measures that exact contrast.
      T.views(s, dir, "customer")
      // Register once per session: a re-run's CREATE OR REPLACE logs a
      // SimpleFunctionRegistry "replaced a previously registered
      // function" WARN on every warm bench pass (VERDICT r10 #6) — the
      // bodies are constants, so replacing is never needed.
      if (!s.catalog.functionExists("graft_tier"))
        s.sql("""CREATE TEMPORARY FUNCTION graft_tier(bal DOUBLE)
                 RETURNS STRING
                 RETURN CASE WHEN bal < 0 THEN 'debt'
                             WHEN bal < 5000 THEN 'low'
                             ELSE 'high' END""")
      if (!s.catalog.functionExists("graft_rk"))
        s.sql("""CREATE TEMPORARY FUNCTION
                 graft_rk(k BIGINT, seg STRING) RETURNS STRING
                 RETURN concat(seg, '#', lpad(CAST(k AS STRING), 8, '0'))""")
      s.sql("""SELECT c_custkey, graft_rk(c_custkey, c_mktsegment) AS rk,
                      graft_tier(c_acctbal) AS tier
               FROM customer ORDER BY c_custkey""")
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

    "udtf_sql_table" -> ((s, dir) => {
      // Spark 4 SQL TABLE functions (CREATE FUNCTION ... RETURNS TABLE
      // RETURN <query>): a reusable parameterized VIEW invoked in FROM,
      // incl. CORRELATED via LATERAL — and like the scalar SQL UDFs the
      // body INLINES into the plan, so the correlated call decorrelates
      // to an ordinary join and the segment predicate reaches the scan
      // (no optimizer black box, unlike a Scala/Python UDTF). The 100 TB
      // shape: shared subquery logic as a declared function, planner
      // still owns the whole tree.
      T.views(s, dir, "customer", "orders")
      if (!s.catalog.functionExists("graft_seg_orders"))
        s.sql("""CREATE TEMPORARY FUNCTION graft_seg_orders(seg STRING)
                 RETURNS TABLE (o_orderkey BIGINT, o_totalprice DOUBLE)
                 RETURN SELECT o.o_orderkey, o.o_totalprice
                        FROM orders o JOIN customer c
                          ON o.o_custkey = c.c_custkey
                        WHERE c.c_mktsegment = seg
                          AND o.o_totalprice > 100000""")
      // decimal sum: double aggregation order is nondeterministic (§2.0)
      s.sql("""SELECT m.seg, count(*) AS n_orders,
                      CAST(sum(CAST(t.o_totalprice AS DECIMAL(18,2)))
                           AS DECIMAL(18,2)) AS revenue
               FROM (VALUES ('BUILDING'), ('MACHINERY')) AS m(seg),
                    LATERAL graft_seg_orders(m.seg) t
               GROUP BY m.seg
               ORDER BY m.seg""")
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

    "scan_orc" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
         FROM orders WHERE o_totalprice > 100000.0
         ORDER BY o_orderkey""",

    "scan_avro" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
         FROM supplier WHERE s_acctbal > 0.0
         ORDER BY s_suppkey""",

    "sink_parquet_partitioned" ->
      s"""SELECT event_type, count(*) AS n,
                 CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_value,
                 count(DISTINCT user_id) AS n_users
          FROM events GROUP BY event_type ORDER BY event_type""",

    "scan_binaryfile" ->
      // documents text is ASCII (SURVEY §1.2), so byte length = n_chars
      """SELECT doc_id, n_chars AS length, substring(text, 1, 8) AS prefix
         FROM documents WHERE doc_id < 20 ORDER BY doc_id""",

    "sink_parquet_overwrite_dynamic" ->
      """SELECT event_type, count(*) AS n,
                CAST(CAST(sum(CAST(CASE WHEN event_type = 'purchase'
                                        THEN value * 2 ELSE value END
                         AS DECIMAL(38,6))) AS STRING) AS DOUBLE)
                  AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    "scan_pruned" ->
      """SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
         FROM events WHERE event_type = 'purchase' ORDER BY event_id""",

    "scan_dpp" ->
      s"""SELECT event_type, count(*) AS n,
                 CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_value
          FROM events WHERE event_type IN ('purchase', 'signup')
          GROUP BY event_type ORDER BY event_type""",

    "sink_parquet_sorted" ->
      s"""SELECT count(*) AS n,
                 CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_qty,
                 CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_price
          FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000""",

    "scan_json_corrupt" ->
      s"""SELECT count(*) AS n_good,
                 CAST(${badLines.size} AS BIGINT) AS n_bad,
                 CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_value
          FROM events WHERE value IS NULL OR isfinite(value)""",

    "scan_schema_evolve" ->
      """SELECT event_id, user_id, value,
                CASE WHEN event_id % 2 = 1 THEN event_type END AS event_type,
                CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS v
         FROM events ORDER BY event_id""",

    "udf_sql" ->
      """SELECT c_custkey,
                c_mktsegment || '#' || lpad(CAST(c_custkey AS VARCHAR), 8, '0')
                  AS rk,
                CASE WHEN c_acctbal < 0 THEN 'debt'
                     WHEN c_acctbal < 5000 THEN 'low'
                     ELSE 'high' END AS tier
         FROM customer ORDER BY c_custkey""",

    "udf_rowkey" ->
      """SELECT o_orderkey,
                CAST(o_orderkey % 16 AS VARCHAR) || '_' ||
                  CAST(o_orderkey AS VARCHAR) AS rowkey_udf,
                CAST(o_orderkey % 16 AS VARCHAR) || '_' ||
                  CAST(o_orderkey AS VARCHAR) AS rowkey_col
         FROM orders ORDER BY o_orderkey""",

    "udtf_sql_table" ->
      """SELECT m.seg, count(*) AS n_orders,
                CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS revenue
         FROM (VALUES ('BUILDING'), ('MACHINERY')) AS m(seg)
         JOIN customer c ON c.c_mktsegment = m.seg
         JOIN orders o ON o.o_custkey = c.c_custkey
         WHERE o.o_totalprice > 100000
         GROUP BY m.seg
         ORDER BY m.seg""",

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
