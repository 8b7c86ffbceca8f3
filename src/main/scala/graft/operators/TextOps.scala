package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.K — text-analysis / dedup operators over `documents`.
  *
  * Scale notes:
  *  - `dedup_exact` is one hash-shuffle on md5(text) — the canonical
  *    100 TB dedup shape (hash, groupBy, keep min id).
  *  - `dedup_near` is blocked O(B²): the (lang, n_chars) blocking key
  *    bounds each block, so the self-join shuffles once on the block key
  *    and never goes globally quadratic. The LSH path for unblockable
  *    corpora is `dedup_minhash` (Similarity.scala).
  *  - `text_tfidf` is two hash-aggregations plus a broadcast of the tiny
  *    per-term document-frequency table — no fact-side re-shuffle.
  */
object TextOps extends QueryModule {

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> ((s, dir) =>
      T.load(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("h")),

    "dedup_near" -> ((s, dir) => {
      // Char-set Jaccard (DuckDB `jaccard` semantics: distinct characters,
      // case-sensitive), within (lang, n_chars) blocks, pairs a<b.
      // Char sets are built per SIDE before the join (O(n·len)), not per
      // pair inside it (O(n²·len)) — only set intersect/union runs in the
      // quadratic block.
      val d = T.load(s, dir, "documents")
      val cs = array_distinct(split(col("text"), ""))
      val a = d.select(col("lang"), col("n_chars"), col("doc_id").as("id_a"),
                       cs.as("cs_a"))
      val b = d.select(col("lang").as("lang_b"), col("n_chars").as("nc_b"),
                       col("doc_id").as("id_b"), cs.as("cs_b"))
      val j = size(array_intersect(col("cs_a"), col("cs_b"))).cast("double") /
        size(array_union(col("cs_a"), col("cs_b")))
      a.join(b, col("lang") === col("lang_b") && col("n_chars") === col("nc_b")
                 && col("id_a") < col("id_b"))
        .withColumn("j_raw", j)
        .filter(col("j_raw") >= 0.9)
        .select(col("id_a"), col("id_b"), round(col("j_raw"), 4).as("j"))
        .orderBy("id_a", "id_b")
    }),

    "text_wordcount" -> ((s, dir) =>
      T.load(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(20)),

    "text_tfidf" -> ((s, dir) => {
      val docs = T.load(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
                            explode(split(lower(col("text")), " ")).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // df falls out of tf ((doc,term) rows are already distinct) — no
      // second explode+distinct shuffle over the token stream
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log((col("n_docs") + 1) / (col("df") + 1)), 4))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("term"), col("tf"), col("score"))
        .orderBy("doc_id")
    }),

    "text_stats" -> ((s, dir) =>
      T.load(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             // exact decimal sum / exact count -> identical double ratio
             round(T.d(sum(T.dec(col("n_chars")))) / count(lit(1)), 4)
               .as("avg_chars"),
             countDistinct("source").as("n_sources"))
        .orderBy("lang")),
  )

  private def dsum(inner: String) =
    s"CAST(CAST(sum(CAST($inner AS DECIMAL(38,6))) AS VARCHAR(64)) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY h""",

    "dedup_near" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(jaccard(a.text, b.text), 4) AS j
         FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.n_chars = b.n_chars
             AND a.doc_id < b.doc_id
         WHERE jaccard(a.text, b.text) >= 0.9
         ORDER BY id_a, id_b""",

    "text_wordcount" ->
      """SELECT token, count(*) AS cnt
         FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
               FROM documents)
         GROUP BY token ORDER BY cnt DESC, token LIMIT 20""",

    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id,
                             unnest(string_split(lower(text), ' ')) AS term
                      FROM documents),
              tf AS (SELECT doc_id, term, count(*) AS tf
                     FROM tok GROUP BY 1, 2),
              dfreq AS (SELECT term, count(DISTINCT doc_id) AS df
                        FROM tok GROUP BY 1),
              n AS (SELECT count(*) AS n_docs FROM documents),
              scored AS (SELECT doc_id, tf.term AS term, tf,
                                round(tf * ln((n_docs + 1) / (df + 1)), 4)
                                  AS score
                         FROM tf JOIN dfreq ON tf.term = dfreq.term
                         CROSS JOIN n)
         SELECT doc_id, term, tf, score
         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, term) AS rn FROM scored)
         WHERE rn = 1 ORDER BY doc_id""",

    "text_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
                 round(${dsum("n_chars")} / count(*), 4) AS avg_chars,
                 count(DISTINCT source) AS n_sources
          FROM documents GROUP BY lang ORDER BY lang""",
  )
}
