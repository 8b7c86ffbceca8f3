package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.K — similarity search over the `embeddings` table
  * (64-dim float vectors) and the MinHash-LSH near-dup path.
  *
  * Float determinism: every fold casts elements to double inside the
  * lambda, so Spark's `aggregate` and DuckDB's `list_aggregate('sum')`
  * accumulate the identical left-to-right double sequence; scores are
  * rounded to 4 dp and every ranking tie-breaks on the id (§2.0-6).
  *
  * Scale notes:
  *  - `sim_topk` broadcasts the probe set; the corpus side streams
  *    through a BroadcastNestedLoopJoin + per-probe top-k — the
  *    brute-force baseline. The scale path for large probe sets is LSH
  *    bucketing (`dedup_minhash` shows the machinery).
  *  - `sim_knn_join` shuffles once on the label (an IVF-style coarse
  *    partition), then is quadratic only within each cell.
  */
object Similarity extends QueryModule {

  private[graft] def sumSq(c: Column): Column =
    aggregate(c, lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double"))

  private[graft] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, x) => acc + x)

  private[graft] def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(sumSq(a)) * sqrt(sumSq(b))), 4)

  // DuckDB twin of `cosine` — explicit double fold, NOT the built-in
  // list_cosine_similarity (whose accumulation precision is unspecified).
  private def duckSumSq(c: String) =
    s"list_aggregate(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
  private def duckCos(a: String, b: String) =
    s"""round(list_aggregate(list_transform(list_zip($a, $b),
            z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
          / (sqrt(${duckSumSq(a)}) * sqrt(${duckSumSq(b)})), 4)"""

  /** MinHash-LSH near-dup candidate pairs over (doc_id, text) rows:
    * 3-shingles -> HashingTF (stateless, deterministic — no fitted
    * vocabulary ordering to drift) -> MinHashLSH banded buckets ->
    * approx similarity join, keeping pairs with exact shingle-Jaccard
    * distance ≤ `maxDist`. Factored out so SimilaritySpec can run the
    * SAME pipeline on a corpus with known near-dups (the recall gate).
    *
    * Recall model: Spark's MinHashLSH buckets on `numHashTables` OR-ed
    * width-1 bands and then filters on the EXACT Jaccard distance of the
    * candidate pair, so the only recall loss is band non-collision:
    * P(candidate | sim s) = 1 - (1 - s)^5 (≥ 0.92 at s = 0.4). */
  private[graft] def minhashCandidates(docs: DataFrame,
                                       maxDist: Double): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    // Docs with <3 tokens produce an empty shingle set → all-zero TF
    // vector → MinHashLSH throws at runtime ("at least 1 non zero
    // entry"); filter them out first, as dedup_ngram does.
    val shingled = docs
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), DedupOps.shingles(col("text")).as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 18)
    // Cache the featurized set: the LSH fit scans it once and the
    // self-join consumes it on BOTH sides — uncached, the shingle build
    // and hashing run three times. The cache's lifetime is bounded to
    // THIS call: the (small) candidate-pair set is materialized eagerly
    // via localCheckpoint, which truncates the lineage so `feat` is no
    // longer referenced, and the finally unpersists it — repeated
    // invocations (Bench runs every query twice) leak nothing.
    val feat = tf.transform(shingled).persist()
    try {
      val lsh = new MinHashLSH().setInputCol("features")
        .setOutputCol("hashes").setNumHashTables(5).setSeed(42L)
      val model = lsh.fit(feat)
      model.approxSimilarityJoin(feat, feat, maxDist, "jacc_dist")
        .select(col("datasetA.doc_id").as("id_a"),
                col("datasetB.doc_id").as("id_b"),
                round(col("jacc_dist"), 4).as("dist"))
        .filter(col("id_a") < col("id_b"))
        .localCheckpoint(true)
    } finally feat.unpersist()
  }

  /** int8 scalar-quantized then DEQUANTIZED corpus `(c_id, dqc)` —
    * per-dim [min,max] from one global agg defines 255 uniform levels;
    * floor-rounded level midpoints reconstruct each value. Exact IEEE
    * arithmetic end-to-end (stable floor rounding, no engine round()),
    * so consumers stay oracle-checkable. Shared by sim_quantized and
    * sim_rerank's coarse pass. */
  private def dequantizedCorpus(e: DataFrame): DataFrame = {
    val mm = e.agg(
      array((0 until 64).map(i =>
        min(element_at(col("embedding"), i + 1))): _*)
        .cast("array<double>").as("mn"),
      array((0 until 64).map(i =>
        max(element_at(col("embedding"), i + 1))): _*)
        .cast("array<double>").as("mx"))
    val dq = transform(sequence(lit(1), lit(64)), i => {
      val x = element_at(col("embedding"), i).cast("double")
      val lo = element_at(col("mn"), i)
      val r = (element_at(col("mx"), i) - lo) / 255.0
      when(r === 0, lo)
        .otherwise(lo + floor((x - lo) / r + 0.5) * r)
    })
    e.crossJoin(broadcast(mm))
      .select(col("vec_id").as("c_id"), dq.as("dqc"))
  }

  val queries: Map[String, Q] = Map(
    "sim_topk" -> ((s, dir) => {
      val e = T.load(s, dir, "embeddings")
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q"))
      val corpus = e.select(col("vec_id").as("c_id"), col("embedding").as("c"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      corpus.crossJoin(broadcast(probes))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("cos", graft.functions.CosineSimilarity.cos4(s, "q", "c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn").cast("long").as("rn"), col("c_id"),
                col("cos"))
        .orderBy("q_id", "rn")
    }),

    "sim_knn_join" -> ((s, dir) => {
      val e = T.load(s, dir, "embeddings")
      val a = e.select(col("label"), col("vec_id").as("a_id"),
                       col("embedding").as("a"))
      val b = e.select(col("label").as("label_b"), col("vec_id").as("b_id"),
                       col("embedding").as("b"))
      val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))
      a.join(b, col("label") === col("label_b") && col("a_id") =!= col("b_id"))
        .withColumn("cos", graft.functions.CosineSimilarity.cos4(s, "a", "b"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("label").cast("long").as("label"), col("a_id"),
                col("rn").cast("long").as("rn"), col("b_id"), col("cos"))
        .orderBy("a_id", "rn")
    }),

    "sim_ivf" -> ((s, dir) => {
      // LSH-bucketed ANN — the scale path next to brute-force sim_topk:
      // coarse-quantize every vector by the sign pattern of its first 8
      // dims (8 fixed hyperplanes -> 256 cells), join probes to their
      // own cell PLUS the 8 one-bit-flip neighbor cells (multi-probe:
      // a vector near hyperplane j sits on the boundary of the cell
      // differing only in bit j, so probing the flips recovers the
      // boundary-vector recall single-probe LSH loses). Cells are
      // disjoint, so the 9 probes never duplicate a candidate pair.
      // At 100 TB the corpus shuffles once on the bucket id and each
      // probe touches ~9/256 of it.
      val e = T.load(s, dir, "embeddings")
      val bucket = (0 until 8).map(j =>
        when(element_at(col("embedding"), j + 1) >= 0f, lit(1 << j))
          .otherwise(lit(0))).reduce(_ + _)
      val withB = e.withColumn("bucket", bucket)
      val probes = withB.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q"),
                explode(array(col("bucket") +: (0 until 8).map(j =>
                  col("bucket").bitwiseXOR(lit(1 << j))): _*)).as("qb"))
      val corpus = withB
        .select(col("vec_id").as("c_id"), col("embedding").as("c"),
                col("bucket").as("cb"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      corpus.join(broadcast(probes),
                  col("qb") === col("cb") && col("q_id") =!= col("c_id"))
        .withColumn("cos", graft.functions.CosineSimilarity.cos4(s, "q", "c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn").cast("long").as("rn"), col("c_id"),
                col("cos"))
        .orderBy("q_id", "rn")
    }),

    "sim_ivf_kmeans" -> ((s, dir) => {
      // IVF with DATA-DERIVED centroids — the next rung above sim_ivf's
      // fixed hyperplane cells, whose data-independent 256 buckets skew
      // badly on clustered real-world embeddings. Seeded k-means|| fits
      // k=16 centroids on L2-NORMALIZED vectors (unit sphere ⇒ L2 rank
      // order == cosine rank order), every corpus vector joins its
      // nearest cell once, and each probe fans out to its nprobe
      // nearest cells (multi-probe: a probe near a cell boundary finds
      // its neighbors in the adjacent cells). Corpus shuffles once on the
      // cell id; probes touch nprobe/k of it. No DuckDB oracle (k-means
      // internals aren't portable); gated by SimilaritySpec: recall ≥ 0.9
      // of brute-force sim_topk's top-3 on sf0.01.
      //
      // nprobe=10/16 is sized for THIS fixture: the synthetic embeddings
      // are uniform on the sphere — no cluster structure, the hardest
      // case for IVF (measured recall: 6 probes 0.77, 10 probes ≥ 0.9).
      // Clustered real-world embeddings concentrate neighbors in far
      // fewer cells, which is when nprobe/k drops to ~1/32 and IVF earns
      // its 30× scan reduction; the architecture is unchanged.
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      import s.implicits._
      val k = 16
      val nprobe = 10
      // Norm computed ONCE into its own column — dividing by an inline
      // sqrt(sumSq(...)) inside the transform lambda would re-evaluate
      // the 64-element fold per element (O(d²) per row).
      val e = T.load(s, dir, "embeddings")
        .withColumn("nrm", sqrt(sumSq(col("embedding"))))
        .withColumn("u", transform(col("embedding").cast("array<double>"),
                                   x => x / col("nrm")))
        .drop("nrm")
        .withColumn("fv", array_to_vector(col("u")))
      // Cache ONLY the fit input: each k-means iteration rescans it, and
      // without the cache every pass re-reads parquet and re-normalizes.
      // 8 iterations is past convergence on unit-sphere cells (recall
      // gate unchanged at 0.967); unpersist as soon as the model exists.
      val fitIn = e.select("fv").persist()
      val model = try
        new KMeans().setK(k).setSeed(42L).setMaxIter(8)
          .setFeaturesCol("fv").setPredictionCol("cell").fit(fitIn)
      finally fitIn.unpersist()
      val corpus = model.transform(e)
        .select(col("vec_id").as("c_id"), col("embedding").as("c"),
                col("cell"))
      val centDf = model.clusterCenters.zipWithIndex
        .map { case (v, i) => (i, v.toArray) }.toSeq.toDF("cell_c", "centroid")
      val d2 = aggregate(
        zip_with(col("u"), col("centroid"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      val wq = Window.partitionBy("q_id").orderBy(col("d2"), col("cell_c"))
      val probeCells = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q"), col("u"))
        .crossJoin(broadcast(centDf))
        .withColumn("d2", d2)
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= nprobe)
        .select(col("q_id"), col("q"), col("cell_c"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      corpus.join(broadcast(probeCells),
                  col("cell_c") === col("cell") && col("q_id") =!= col("c_id"))
        .withColumn("cos", graft.functions.CosineSimilarity.cos4(s, "q", "c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn").cast("long").as("rn"), col("c_id"),
                col("cos"))
        .orderBy("q_id", "rn")
    }),

    "sim_quantized" -> ((s, dir) => {
      // int8 scalar-quantized ANN: per-dimension [min,max] over the
      // corpus (one global agg, 64+64 mins/maxes in a single pass)
      // defines 255 uniform levels per dim; every vector stores only the
      // level code (4 bytes -> 1 byte per dim = 75% less scan bandwidth,
      // THE lever when a 100 TB embedding store is IO-bound), and search
      // scores full-precision probes against DEQUANTIZED corpus vectors
      // (asymmetric distance). Quantize/dequantize is exact IEEE
      // arithmetic from float-derived doubles with stable floor-rounding
      // (no engine round()), so the whole thing — including the top-3
      // ranking — is oracle-checked against DuckDB, not just gated.
      // SimilaritySpec additionally gates recall vs exact sim_topk.
      val corpus = dequantizedCorpus(T.load(s, dir, "embeddings"))
      val probes = T.load(s, dir, "embeddings").filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      corpus.crossJoin(broadcast(probes))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("cos", cosine(col("q"), col("dqc")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn").cast("long").as("rn"), col("c_id"),
                col("cos"))
        .orderBy("q_id", "rn")
    }),

    "sim_rerank" -> ((s, dir) => {
      // Two-stage retrieval — the production ANN serving shape: a CHEAP
      // first pass over the whole corpus (int8-dequantized cosine, the
      // 75%-less-bandwidth scan of sim_quantized) keeps only the top-20
      // candidates per probe, then the EXACT full-precision cosine
      // reranks those ≤20 rows per probe into the final top-3. The
      // expensive exact kernel thus touches k·|probes| rows instead of
      // the corpus; the candidate→full-vector fetch is a hash join on
      // c_id — at 100 TB that is the classic "coarse scan + gather"
      // plan, and every stage here is oracle-checked (both passes are
      // exact IEEE arithmetic — no sketch, no seed).
      val e = T.load(s, dir, "embeddings")
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q"))
      val wq = Window.partitionBy("q_id").orderBy(col("qcos").desc,
                                                  col("c_id"))
      val cand = dequantizedCorpus(e).crossJoin(broadcast(probes))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("qcos", cosine(col("q"), col("dqc")))
        .withColumn("qrn", row_number().over(wq))
        .filter(col("qrn") <= 20)
        .select(col("q_id"), col("q"), col("c_id"))
      val full = e.select(col("vec_id").as("c_id"), col("embedding").as("c"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      cand.join(full, "c_id")
        .withColumn("cos", graft.functions.CosineSimilarity.cos4(s, "q", "c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn").cast("long").as("rn"), col("c_id"),
                col("cos"))
        .orderBy("q_id", "rn")
    }),

    "dedup_embedding_lsh" -> ((s, dir) => {
      // Embedding near-dup WITHOUT a label/block column — random-
      // hyperplane (sign-bit) LSH: 16 fixed axis hyperplanes give every
      // vector a 16-bit sign signature, banded 2×8; near-identical
      // vectors agree on almost all sign bits so they collide on at
      // least one whole band w.h.p., while random pairs collide with
      // p ≈ 2·2⁻⁸. Candidates meet ONLY on band-key equality (one hash
      // shuffle, never all-pairs — the same 100 TB shape as
      // dedup_simhash, transplanted from text to vectors), then exact
      // cosine rescoring keeps pairs ≥ 0.25 — fully oracle-checked
      // (sign bits and cosine are exact arithmetic, no seed).
      val e = T.load(s, dir, "embeddings")
      def bits(lo: Int): Column = (lo until lo + 8).map(j =>
        when(element_at(col("embedding"), j + 1) >= 0f,
             lit(1 << (j - lo))).otherwise(lit(0))).reduce(_ + _)
      val banded = e.select(col("vec_id"), explode(array(
          concat(lit("0:"), bits(0).cast("string")),
          concat(lit("1:"), bits(8).cast("string")))).as("bkey"))
      val pairs = banded.as("x")
        .join(banded.as("y"),
              col("x.bkey") === col("y.bkey") &&
                col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
        .distinct()
      val v = e.select(col("vec_id"), col("embedding"))
      pairs
        .join(v.select(col("vec_id").as("id_a"), col("embedding").as("va")),
              "id_a")
        .join(v.select(col("vec_id").as("id_b"), col("embedding").as("vb")),
              "id_b")
        .withColumn("cos",
                    graft.functions.CosineSimilarity.cos4(s, "va", "vb"))
        .filter(col("cos") >= 0.25)
        .select(col("id_a"), col("id_b"), col("cos"))
        .orderBy("id_a", "id_b")
    }),

    "dedup_minhash" -> ((s, dir) =>
      // Scalable near-dup candidates (see minhashCandidates above). No
      // DuckDB oracle (sketch-based); gated by SimilaritySpec's two
      // recall tests: 100% of exact-dup pairs on sf0.1, and ≥0.9 of
      // brute-force shingle-Jaccard ≥ 0.4 pairs on a corpus with known
      // near-dups run through this same pipeline.
      minhashCandidates(T.load(s, dir, "documents"), maxDist = 0.6)
        .orderBy("id_a", "id_b")),
  )

  private val duckBucket = (0 until 8).map(j =>
    s"(CASE WHEN embedding[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)")
    .mkString(" + ")

  val oracles: Map[String, String] = Map(
    "sim_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding, $duckBucket AS bucket
                     FROM embeddings),
               p AS (SELECT vec_id AS q_id, embedding AS q,
                            unnest([bucket, ${(0 until 8).map(j =>
                              s"xor(bucket, ${1 << j})").mkString(", ")}]) AS qb
                     FROM e WHERE vec_id < 10),
               c AS (SELECT vec_id AS c_id, embedding AS c, bucket AS cb
                     FROM e),
               scored AS (SELECT q_id, c_id, ${duckCos("q", "c")} AS cos
                          FROM p JOIN c ON qb = cb AND q_id != c_id)
          SELECT q_id, rn, c_id, cos
          FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                          ORDER BY cos DESC, c_id) AS rn FROM scored)
          WHERE rn <= 3 ORDER BY q_id, rn""",

    "sim_rerank" -> {
      val r = "((mx[i] - mn[i]) / 255.0)"
      s"""WITH mm AS (SELECT list(mn ORDER BY i) AS mn,
                             list(mx ORDER BY i) AS mx
                      FROM (SELECT i,
                                   CAST(min(embedding[i]) AS DOUBLE) AS mn,
                                   CAST(max(embedding[i]) AS DOUBLE) AS mx
                            FROM embeddings,
                                 (SELECT unnest(generate_series(1, 64)) AS i)
                            GROUP BY i)),
               corpus AS (SELECT vec_id AS c_id,
                                 list_transform(generate_series(1, 64),
                                   i -> CASE WHEN $r = 0 THEN mn[i]
                                        ELSE mn[i] +
                                             floor((CAST(embedding[i] AS DOUBLE)
                                                    - mn[i]) / $r + 0.5) * $r
                                        END) AS dqc
                          FROM embeddings, mm),
               p AS (SELECT vec_id AS q_id, embedding AS q FROM embeddings
                     WHERE vec_id < 10),
               coarse AS (SELECT q_id, q, c_id, ${duckCos("q", "dqc")} AS qcos
                          FROM p CROSS JOIN corpus WHERE q_id != c_id),
               cand AS (SELECT q_id, q, c_id
                        FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                ORDER BY qcos DESC, c_id) AS qrn FROM coarse)
                        WHERE qrn <= 20),
               exact AS (SELECT q_id, cand.c_id,
                                ${duckCos("q", "embedding")} AS cos
                         FROM cand JOIN embeddings
                              ON embeddings.vec_id = cand.c_id)
          SELECT q_id, rn, c_id, cos
          FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                          ORDER BY cos DESC, c_id) AS rn FROM exact)
          WHERE rn <= 3 ORDER BY q_id, rn"""
    },

    "dedup_embedding_lsh" -> {
      def bits(lo: Int) = (lo until lo + 8).map(j =>
        s"(CASE WHEN embedding[${j + 1}] >= 0 THEN ${1 << (j - lo)} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH banded AS (SELECT vec_id,
                 unnest(['0:' || CAST(${bits(0)} AS VARCHAR),
                         '1:' || CAST(${bits(8)} AS VARCHAR)]) AS bkey
               FROM embeddings),
               pairs AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                         FROM banded x JOIN banded y
                              ON x.bkey = y.bkey AND x.vec_id < y.vec_id),
               scored AS (SELECT id_a, id_b, ${duckCos("a.embedding",
                                                       "b.embedding")} AS cos
                          FROM pairs JOIN embeddings a ON a.vec_id = id_a
                                     JOIN embeddings b ON b.vec_id = id_b)
          SELECT id_a, id_b, cos FROM scored
          WHERE cos >= 0.25 ORDER BY id_a, id_b"""
    },

    "sim_quantized" -> {
      val r = "((mx[i] - mn[i]) / 255.0)"
      s"""WITH mm AS (SELECT list(mn ORDER BY i) AS mn,
                             list(mx ORDER BY i) AS mx
                      FROM (SELECT i,
                                   CAST(min(embedding[i]) AS DOUBLE) AS mn,
                                   CAST(max(embedding[i]) AS DOUBLE) AS mx
                            FROM embeddings,
                                 (SELECT unnest(generate_series(1, 64)) AS i)
                            GROUP BY i)),
               corpus AS (SELECT vec_id AS c_id,
                                 list_transform(generate_series(1, 64),
                                   i -> CASE WHEN $r = 0 THEN mn[i]
                                        ELSE mn[i] +
                                             floor((CAST(embedding[i] AS DOUBLE)
                                                    - mn[i]) / $r + 0.5) * $r
                                        END) AS dqc
                          FROM embeddings, mm),
               p AS (SELECT vec_id AS q_id, embedding AS q FROM embeddings
                     WHERE vec_id < 10),
               scored AS (SELECT q_id, c_id, ${duckCos("q", "dqc")} AS cos
                          FROM p CROSS JOIN corpus WHERE q_id != c_id)
          SELECT q_id, rn, c_id, cos
          FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                          ORDER BY cos DESC, c_id) AS rn FROM scored)
          WHERE rn <= 3 ORDER BY q_id, rn"""
    },

    "sim_topk" ->
      s"""WITH p AS (SELECT vec_id AS q_id, embedding AS q FROM embeddings
                     WHERE vec_id < 10),
               c AS (SELECT vec_id AS c_id, embedding AS c FROM embeddings),
               scored AS (SELECT q_id, c_id, ${duckCos("q", "c")} AS cos
                          FROM p CROSS JOIN c WHERE q_id != c_id)
          SELECT q_id, rn, c_id, cos
          FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                          ORDER BY cos DESC, c_id) AS rn FROM scored)
          WHERE rn <= 5 ORDER BY q_id, rn""",

    "sim_knn_join" ->
      s"""WITH a AS (SELECT label, vec_id AS a_id, embedding AS va
                     FROM embeddings),
               b AS (SELECT label AS label_b, vec_id AS b_id, embedding AS vb
                     FROM embeddings),
               scored AS (SELECT CAST(label AS BIGINT) AS label, a_id, b_id,
                                 ${duckCos("va", "vb")} AS cos
                          FROM a JOIN b
                               ON label = label_b AND a_id != b_id)
          SELECT label, a_id, rn, b_id, cos
          FROM (SELECT *, row_number() OVER (PARTITION BY a_id
                          ORDER BY cos DESC, b_id) AS rn FROM scored)
          WHERE rn <= 3 ORDER BY a_id, rn""",
  )
}
