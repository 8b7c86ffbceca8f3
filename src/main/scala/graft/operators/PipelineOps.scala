package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.K (round-3 extension) — the remaining operators a
  * large-scale training-data pipeline runs between dedup and training:
  * deterministic corpus splitting, eval-set decontamination, PII
  * scrubbing, and sequence packing.
  *
  * Scale notes:
  *  - `split_train_test` hashes each doc id to a bucket — a pure
  *    projection, no shuffle besides the readback agg; the md5-derived
  *    bucket is the only hash Spark and DuckDB share bit-for-bit, and at
  *    100 TB the split is stable under re-runs, repartitioning, and
  *    engine changes (re-ingesting a shard never flips another shard's
  *    assignment, unlike rand()-based splits).
  *  - `dedup_blocklist` is the decontamination guard against benchmark
  *    leakage: anti-join on content hash with the (small) eval corpus
  *    broadcast — the corpus side never shuffles.
  *  - `text_pii_scrub` is one codegen'd projection (regexp_replace +
  *    regexp_extract_all); no shuffle at all before the readback sort.
  *  - `text_pack_sequences` packs docs into fixed-capacity bins by
  *    running token count per lang partition — the window shuffles once
  *    on lang, and no reducer ever holds more than one lang's docs.
  */
object PipelineOps extends QueryModule {

  /** Portable deterministic bucket in [0, 100): first 8 md5 hex chars of
    * the stringified id, mod 100 (same recipe as text_fingerprint). */
  private def bucket100(id: org.apache.spark.sql.Column) =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100)
      .cast("int")

  private val bucket100Sql =
    "CAST(TRY_CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS INT)"

  // Deterministic synthetic PII appended per doc (the fixture corpus has
  // none), so the scrub provably fires on every row in both engines.
  private def dirty(text: org.apache.spark.sql.Column,
                    id: org.apache.spark.sql.Column) =
    concat(text, lit(" contact user"), id, lit("@example.com tel 555-"),
           lpad((id % 10000).cast("string"), 4, "0"))

  private val emailRe = "[a-z0-9]+@[a-z0-9.]+"
  private val phoneRe = "[0-9]{3}-[0-9]{4}"

  val queries: Map[String, Q] = Map(
    "split_train_test" -> ((s, dir) =>
      // 90/5/5 train/valid/test split by content-independent id hash;
      // readback = per-split doc and char totals.
      T.load(s, dir, "documents")
        .withColumn("bucket", bucket100(col("doc_id")))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "valid").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
             T.d(sum(T.dec(col("n_chars")))).as("sum_chars"))
        .orderBy("split")),

    "dedup_blocklist" -> ((s, dir) => {
      // Decontamination: every doc whose exact text hash appears in the
      // "eval set" (here: doc_id % 10 == 0) is dropped from the corpus.
      val d = T.load(s, dir, "documents")
      val block = d.filter(col("doc_id") % 10 === 0)
        .select(md5(col("text")).as("bh"))
      d.join(broadcast(block), md5(col("text")) === col("bh"), "left_anti")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    "text_pii_scrub" -> ((s, dir) => {
      val d = T.load(s, dir, "documents")
        .withColumn("dirty", dirty(col("text"), col("doc_id")))
      d.select(col("doc_id"),
        regexp_replace(regexp_replace(col("dirty"), emailRe, "<email>"),
                       phoneRe, "<phone>").as("clean"),
        size(regexp_extract_all(col("dirty"), lit(emailRe), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(col("dirty"), lit(phoneRe), lit(0)))
          .cast("long").as("n_phone"))
        .orderBy("doc_id")
    }),

    "pipeline_quality_e2e" -> ((s, dir) => {
      // Quality-filter stage of corpus curation (the other half next to
      // dedup): score every doc with text_quality's formula, keep docs
      // with n_tok >= 20 AND quality >= 0.45 (thresholds sized to split
      // this fixture ~55/45), and report per-lang totals, survivors and
      // DISJOINT rejection reasons — the report a curation run ships.
      // One scan + one agg; the scoring is all codegen'd projections.
      val q = TextOps.queries("text_quality")(s, dir)
      val keep = col("n_tok") >= 20 && col("quality") >= 0.45
      T.load(s, dir, "documents").select("doc_id", "lang", "n_chars")
        .join(q, "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
             sum(when(col("n_tok") < 20, 1L).otherwise(0L)).as("n_short"),
             sum(when(col("n_tok") >= 20 && col("quality") < 0.45, 1L)
               .otherwise(0L)).as("n_lowq"),
             sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
             T.d(sum(when(keep, T.dec(col("n_chars")))
               .otherwise(T.dec(lit(0))))).as("kept_chars"))
        .orderBy("lang")
    }),

    "merge_upsert" -> ((s, dir) => {
      // MERGE INTO semantics on plain parquet tables (no table-format
      // dependency): a deterministic change set of updates (matched ⇒
      // new values), deletes (matched ⇒ drop) and inserts (unmatched ⇒
      // append) is applied to a base snapshot in ONE full outer join.
      // At 100 TB this is copy-on-write maintenance: a FULL OUTER join
      // cannot be broadcast (BroadcastHashJoin has no full-outer mode),
      // so both sides hash-shuffle on the key — but the base pays that
      // shuffle only once (or not at all when bucketed on it — see
      // join_bucketed), and the tiny change set's shuffle is free; the
      // change-capture pattern behind dimension refresh and GDPR deletes.
      val base = T.load(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_name").as("name"),
                col("c_acctbal").as("bal"))
      val updates = base.filter(col("k") % 7 === 0 && col("k") % 11 =!= 0)
        .select(lit("U").as("op"), col("k"), col("name"),
                (col("bal") + 100.0).as("bal"))
      val deletes = base.filter(col("k") % 11 === 0)
        .select(lit("D").as("op"), col("k"), col("name"), col("bal"))
      val inserts = T.load(s, dir, "nation")
        .select(lit("I").as("op"),
                (col("n_nationkey") + 900000).cast("long").as("k"),
                col("n_name").as("name"), lit(0.0).as("bal"))
      val changes = updates.unionByName(deletes).unionByName(inserts)
      base.as("b")
        .join(changes.as("c"), col("b.k") === col("c.k"), "full")
        .filter(coalesce(col("c.op"), lit("")) =!= "D")
        .select(coalesce(col("c.k"), col("b.k")).as("k"),
                coalesce(col("c.name"), col("b.name")).as("name"),
                coalesce(col("c.bal"), col("b.bal")).as("bal"))
        .orderBy("k")
    }),

    "sample_mixture" -> ((s, dir) => {
      // Target-mixture downsampling: each language stratum keeps a
      // different fraction (the domain-reweighting step every training
      // corpus runs: upweight scarce langs, downweight dominant ones).
      // The keep decision compares the doc's md5 hex prefix against a
      // per-stratum threshold string — hex chars are uniform, so
      // P(md5_4 < threshold) = int(threshold,16)/65536 — giving a
      // sample that is (a) a pure codegen'd projection with no shuffle
      // before the readback agg, (b) exactly reproducible across
      // engines, runs and repartitioning (unlike rand()-based
      // sampleBy), and (c) stable per document: re-ingesting a shard
      // never flips another shard's keep decision.
      // Rates: en 1/2, de 1/4, es 3/4, fr ~1/10, zh 7/8.
      val rate = when(col("lang") === "en", "8000")
        .when(col("lang") === "de", "4000")
        .when(col("lang") === "es", "c000")
        .when(col("lang") === "fr", "1999")
        .otherwise("e000")
      T.load(s, dir, "documents")
        .withColumn("hx", substring(md5(col("doc_id").cast("string")), 1, 4))
        .filter(col("hx") < rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
             T.d(sum(T.dec(col("n_chars")))).as("sum_chars"))
        .orderBy("lang")
    }),

    "sample_temperature" -> ((s, dir) => {
      // TEMPERATURE-scaled mixture resampling (r19) — the multilingual
      // LLM-training rule "sample source i proportional to n_i^(1/T)"
      // that keeps big domains from drowning small ones (T=2 here, the
      // classic downsampling temperature): per source, keep
      // kept_i = round(sqrt(5 · n_i)) docs, chosen as the kept_i
      // smallest content-independent md5 priorities. EXACT cross-engine
      // determinism by construction: IEEE sqrt is correctly rounded in
      // both engines and round(sqrt(integer·5)) can never sit at a
      // rounding boundary (sqrt of a non-square integer is irrational,
      // and (k+0.5)² is never an integer), so no float-tie can flip a
      // count. Plan: one partial-agg shuffle for the per-source counts,
      // broadcast of the tiny source table back onto the ranked docs,
      // one rank window per source. At 100 TB, cap the window with a
      // constant upper bound first (rk <= max_kept) so WindowGroupLimit
      // truncates below the exchange, then apply the per-source bound.
      val d = T.load(s, dir, "documents")
      val kept = d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("n_kept",
          floor(sqrt(col("n_docs").cast("double") * 5.0) + 0.5)
            .cast("long"))
      val rk = row_number().over(
        Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
      d.select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rk", rk)
        .join(broadcast(kept), Seq("source"))
        .filter(col("rk") <= col("n_kept"))
        .groupBy("source")
        .agg(max("n_docs").as("n_docs"),
             count(lit(1)).as("n_kept"),
             T.d(sum(T.dec(col("n_chars")))).as("sum_chars_kept"))
        .orderBy("source")
    }),

    "sample_stratified" -> ((s, dir) => {
      // Uniform k-per-stratum sample (the reservoir-sampling contract,
      // distributed): rank docs inside each language by a
      // content-independent hash and keep the k smallest. One shuffle on
      // the stratum key; Spark's WindowGroupLimit pushes the k-filter
      // below the exchange, so each map task forwards at most k rows per
      // stratum — at 100 TB the shuffle moves k×|strata| rows, not the
      // corpus. Hash-rank sampling is exactly reproducible across runs,
      // engines and repartitionings (a true random reservoir is not) and
      // stays uniform because md5 is uniform on distinct doc_ids.
      val rk = row_number().over(
        Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
      T.load(s, dir, "documents")
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("rk", rk).filter(col("rk") <= 5)
        .select(col("lang"), col("rk").cast("long").as("rk"),
                col("doc_id"), col("n_chars"))
        .orderBy("lang", "rk")
    }),

    "sample_weighted" -> ((s, dir) => {
      // Weighted k-per-stratum sampling WITHOUT replacement — the
      // Efraimidis–Spirakis A-Res scheme, distributed: each doc draws a
      // deterministic uniform u from its md5 (portable across engines,
      // runs and repartitionings), its priority ln(u)/w is an Exp(w)
      // variate negated, and the k LARGEST priorities per stratum are
      // exactly a w-weighted sample without replacement (here w =
      // n_chars: longer docs proportionally likelier — the "sample by
      // token count" step of corpus mixing). Same WindowGroupLimit
      // shape as sample_stratified: the k-filter runs below the
      // exchange, so the shuffle moves k×|strata| rows at 100 TB, not
      // the corpus. Priorities are rounded to fixed micro-units
      // (exact floor arithmetic) before ranking so the ln() libm ULP
      // gap between engines cannot reorder ranks; ties break on doc_id.
      val h = conv(substring(md5(concat(lit("ws:"),
                                        col("doc_id").cast("string"))),
                             1, 8), 16, 10).cast("double")
      val u = (h + lit(1.0)) / lit(4294967296.0) // (0, 1]
      val prio = floor(log(u) / col("n_chars") * 1e6 + 0.5).cast("long")
      val rk = row_number().over(
        Window.partitionBy("lang").orderBy(col("prio").desc, col("doc_id")))
      T.load(s, dir, "documents")
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("prio", prio)
        .withColumn("rk", rk).filter(col("rk") <= 5)
        .select(col("lang"), col("rk").cast("long").as("rk"),
                col("doc_id"), col("n_chars"), col("prio"))
        .orderBy("lang", "rk")
    }),

    "scd2_intervals" -> ((s, dir) => {
      // Slowly-changing-dimension (type 2) build from an event stream:
      // collapse consecutive identical states per user (lag), then
      // derive each surviving state's validity interval (lead) with an
      // open-ended current row. Two windows over ONE shuffle on
      // user_id — Catalyst plans both window frames on the same
      // partitioning, so the 100 TB cost is a single exchange + sort.
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val ch = T.events(s, dir)
        .select("user_id", "event_id", "ts_us", "event_type")
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      ch.withColumn("valid_to", lead("ts_us", 1).over(w) - 1)
        .withColumn("is_current", col("valid_to").isNull.cast("int"))
        .select(col("user_id"), col("event_type").as("state"),
                col("ts_us").as("valid_from"), col("valid_to"),
                col("is_current"))
        .orderBy("user_id", "valid_from", "state")
    }),

    "text_pack_sequences" -> ((s, dir) => {
      // Greedy-by-order packing: bin id = floor(start_offset / CAP) of
      // each doc's running token count within its lang. Emits per-bin
      // fill stats — the shape a sequence-packing pre-tokenizer needs.
      val CAP = 2048
      val w = Window.partitionBy("lang").orderBy("doc_id")
      T.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
                size(split(col("text"), " ")).as("n_tok"))
        .withColumn("bin",
          floor((sum("n_tok").over(w) - col("n_tok")) / CAP).cast("long"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .orderBy("lang", "bin")
    }),

    "sink_shards" -> ((s, dir) => {
      // Training-shard export: the corpus hash-sharded into 8 fixed
      // output files (the dataloader contract — shard count is part of
      // the dataset spec, balanced by a portable deterministic hash, so
      // any worker can recompute membership). Physically one
      // repartition(shard) write; readback proves shard balance and
      // content integrity per shard via an order-independent checksum
      // (sum of per-doc md5 prefixes — associative, so partition order
      // can't affect it).
      val shard = (bucket100(col("doc_id")) % 8).as("shard")
      val tmp = s"/tmp/graft_shards_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      val docs = T.load(s, dir, "documents").withColumn("shard", shard)
      docs.repartition(8, col("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(tmp)
      s.read.parquet(tmp)
        .withColumn("h",
          conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("n_chars"),
             sum(col("h")).as("content_sum"))
        .orderBy("shard")
    }),
  )

  val oracles: Map[String, String] = Map(
    "split_train_test" ->
      s"""WITH b AS (SELECT n_chars, $bucket100Sql AS bucket FROM documents)
          SELECT CASE WHEN bucket < 90 THEN 'train'
                      WHEN bucket < 95 THEN 'valid' ELSE 'test' END AS split,
                 count(*) AS n_docs,
                 CAST(CAST(sum(CAST(n_chars AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_chars
          FROM b GROUP BY 1 ORDER BY 1""",

    "dedup_blocklist" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE md5(text) NOT IN
               (SELECT md5(text) FROM documents WHERE doc_id % 10 = 0)
         ORDER BY doc_id""",

    "sink_shards" ->
      s"""SELECT $bucket100Sql % 8 AS shard, count(*) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS n_chars,
                 CAST(sum(TRY_CAST('0x' || substring(md5(text), 1, 8) AS BIGINT))
                      AS BIGINT) AS content_sum
          FROM documents GROUP BY 1 ORDER BY shard""",

    "text_pii_scrub" -> {
      val dirtySql = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
      s"""WITH d AS (SELECT doc_id, $dirtySql AS dirty FROM documents)
          SELECT doc_id,
                 regexp_replace(regexp_replace(dirty, '$emailRe', '<email>', 'g'),
                                '$phoneRe', '<phone>', 'g') AS clean,
                 len(regexp_extract_all(dirty, '$emailRe')) AS n_email,
                 len(regexp_extract_all(dirty, '$phoneRe')) AS n_phone
          FROM d ORDER BY doc_id"""
    },

    "pipeline_quality_e2e" -> {
      // Same score construction as text_quality's oracle (stable4'd, so
      // the >= 0.45 comparison lands identically in both engines).
      val stops = "CAST(len(list_filter(string_split(lower(text), ' '), " +
        "w -> w IN ('a','the','of','to','and','in','is'))) AS DOUBLE)"
      val nTok = "len(string_split(lower(text), ' '))"
      val alpha = "CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)"
      val qual = graft.Tables.stable4Sql(
        s"0.4 * ($stops / $nTok) + 0.4 * ($alpha / n_chars)" +
          s" + 0.2 * least($nTok / 100.0, 1.0)")
      s"""WITH q AS (SELECT doc_id, lang, n_chars, $nTok AS n_tok,
                            $qual AS quality
                     FROM documents)
          SELECT lang, count(*) AS n_total,
                 CAST(sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_short,
                 CAST(sum(CASE WHEN n_tok >= 20 AND quality < 0.45
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq,
                 CAST(sum(CASE WHEN n_tok >= 20 AND quality >= 0.45
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(CAST(sum(CAST(CASE WHEN n_tok >= 20 AND quality >= 0.45
                                    THEN n_chars ELSE 0 END
                               AS DECIMAL(38,6))) AS STRING) AS DOUBLE)
                   AS kept_chars
          FROM q GROUP BY lang ORDER BY lang"""
    },

    "merge_upsert" ->
      """WITH base AS (SELECT c_custkey AS k, c_name AS name,
                              c_acctbal AS bal
                       FROM customer),
              changes AS (
                SELECT 'U' AS op, k, name, bal + 100.0 AS bal
                FROM base WHERE k % 7 = 0 AND k % 11 <> 0
                UNION ALL
                SELECT 'D', k, name, bal FROM base WHERE k % 11 = 0
                UNION ALL
                SELECT 'I', CAST(n_nationkey + 900000 AS BIGINT), n_name,
                       0.0
                FROM nation)
         SELECT coalesce(c.k, b.k) AS k,
                coalesce(c.name, b.name) AS name,
                coalesce(c.bal, b.bal) AS bal
         FROM base b FULL JOIN changes c ON b.k = c.k
         WHERE coalesce(c.op, '') <> 'D'
         ORDER BY k""",

    "sample_mixture" ->
      s"""WITH h AS (SELECT lang, n_chars,
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hx
          FROM documents)
          SELECT lang, count(*) AS n_kept,
                 CAST(CAST(sum(CAST(n_chars AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sum_chars
          FROM h
          WHERE hx < CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '4000'
                               WHEN 'es' THEN 'c000' WHEN 'fr' THEN '1999'
                               ELSE 'e000' END
          GROUP BY lang ORDER BY lang""",

    "sample_temperature" ->
      """WITH c AS (SELECT source, count(*) AS n_docs,
                           CAST(floor(sqrt(count(*) * 5.0) + 0.5)
                                AS BIGINT) AS n_kept
                    FROM documents GROUP BY source),
              r AS (SELECT source, doc_id, n_chars,
                           row_number() OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                      doc_id) AS rk
                    FROM documents)
         SELECT r.source, max(c.n_docs) AS n_docs, count(*) AS n_kept,
                CAST(CAST(sum(CAST(r.n_chars AS DECIMAL(38,6)))
                     AS STRING) AS DOUBLE) AS sum_chars_kept
         FROM r JOIN c USING (source) WHERE r.rk <= c.n_kept
         GROUP BY r.source ORDER BY source""",

    "sample_stratified" ->
      """SELECT lang, rk, doc_id, n_chars
         FROM (SELECT lang, doc_id, n_chars,
                      row_number() OVER (PARTITION BY lang
                        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
               FROM documents)
         WHERE rk <= 5 ORDER BY lang, rk""",

    "sample_weighted" ->
      """WITH p AS (SELECT lang, doc_id, n_chars,
                CAST(floor(ln((TRY_CAST('0x' ||
                       substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) + 1.0) / 4294967296.0)
                     / n_chars * 1e6 + 0.5) AS BIGINT) AS prio
              FROM documents)
         SELECT lang, rk, doc_id, n_chars, prio
         FROM (SELECT *, row_number() OVER (PARTITION BY lang
                         ORDER BY prio DESC, doc_id) AS rk FROM p)
         WHERE rk <= 5 ORDER BY lang, rk""",

    "scd2_intervals" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                           event_type
                    FROM events),
              ch AS (SELECT user_id, event_id, ts_us, event_type
                     FROM (SELECT *, lag(event_type) OVER
                             (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS prev
                           FROM e)
                     WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type AS state, ts_us AS valid_from,
                lead(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) - 1 AS valid_to,
                CAST(CASE WHEN lead(ts_us) OVER
                       (PARTITION BY user_id
                        ORDER BY ts_us, event_id) IS NULL
                     THEN 1 ELSE 0 END AS INT) AS is_current
         FROM ch ORDER BY user_id, valid_from, state""",

    "text_pack_sequences" ->
      """WITH t AS (SELECT doc_id, lang,
                           len(string_split(text, ' ')) AS n_tok
                    FROM documents),
              c AS (SELECT lang, n_tok,
                           CAST(sum(n_tok) OVER (PARTITION BY lang
                             ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                             AS BIGINT) AS cum
                    FROM t)
         SELECT lang, CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS bin,
                count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
