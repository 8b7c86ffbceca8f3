package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** Input/output row shapes for the partition-wise media extractor
  * (top-level for stable Encoders). */
case class MediaRow(doc_id: Long, payload: Array[Byte])
case class MediaFeatures(doc_id: Long, width: Long, height: Long,
                         channels: Long, mean_byte: Double, thumb_hex: String,
                         n_frames: Long)

/** SURVEY.md §2.K — multimodal columns: opaque binary payloads with a
  * partition-wise decode / feature-extract operator.
  *
  * This is the Scala-idiomatic twin of the Python `mapInPandas` pattern:
  * a typed `Dataset.mapPartitions` whose iterator sees one partition's
  * rows (the batch), so a real decoder would amortize model/codec init
  * per PARTITION, not per row — the property that matters at 100 TB.
  * The pipeline plumbing (BinaryType column in, typed feature row out,
  * Encoder-backed schema, per-partition batching) is real and oracle-
  * tested; only the innermost decode is a STUB.
  */
object Multimodal extends QueryModule {

  /** STUB DECODER. A real implementation would decode image/audio bytes
    * here (no media libraries exist in this environment). The
    * deterministic fake derives "metadata" from the payload bytes so
    * every downstream stage — and the DuckDB oracle, which re-derives
    * the same bytes from the md5 hex string — stays testable. */
  private def decodeStub(payload: Array[Byte]): (Long, Long, Long, Double, Long) = {
    val b = payload.map(_ & 0xff)
    val width = 1L + b(0) % 64
    val height = 1L + b(1) % 64
    val channels = 1L + b(2) % 3
    val meanByte = b.map(_.toDouble).sum / b.length // k/16: binary-exact
    val nFrames = 1L + b(3) % 8
    (width, height, channels, meanByte, nFrames)
  }

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> ((s, dir) => {
      import s.implicits._
      T.load(s, dir, "documents")
        .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
        .as[MediaRow]
        .mapPartitions { rows =>
          // per-partition scope: a real decoder initializes here, once
          rows.map { r =>
            val (w, h, c, mean, frames) = decodeStub(r.payload)
            val thumb = r.payload.take(4).map("%02x".format(_)).mkString
            MediaFeatures(r.doc_id, w, h, c, mean, thumb, frames)
          }
        }
        .toDF()
        .orderBy("doc_id")
    }),

    "multimodal_frames" -> ((s, dir) => {
      // Frame-sampling + resize plumbing: each payload expands to its
      // n_frames deterministic frame fingerprints, sampled at stride 2
      // (sequence(1, n, 2) — the "every k-th frame" pattern), and the
      // "resize" emits an 8-char thumb per sampled frame. Pure-Column
      // generator: the explode pipelines with the scan inside
      // whole-stage codegen; a real video decoder would swap the md5
      // chain for frame bytes inside the same row shape (and move to
      // multimodal_features' per-partition init for codec state).
      val h = md5(col("text"))
      T.load(s, dir, "documents")
        .select(col("doc_id"), h.as("h"),
                (conv(substring(h, 7, 2), 16, 10).cast("long") % 8 + 1)
                  .as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
                explode(transform(
                  sequence(lit(1L), col("n_frames"), lit(2L)),
                  i => struct(
                    i.as("frame_idx"),
                    md5(concat(col("h"), i.cast("string")))
                      .as("frame_hash")))).as("f"))
        .select(col("doc_id"), col("n_frames"),
                col("f.frame_idx").as("frame_idx"),
                col("f.frame_hash").as("frame_hash"),
                substring(col("f.frame_hash"), 1, 8).as("thumb"))
        .orderBy("doc_id", "frame_idx")
    }),

    "multimodal_dedup" -> ((s, dir) =>
      // Media-dedup CANDIDATE GENERATION at the feature level (the
      // perceptual-hash bucketing pattern): bucket on the extracted
      // (width, height) envelope; buckets with >1 member are the
      // candidate groups a pairwise verifier (or a real pHash in
      // decodeStub's place) would then rescore — exactly the
      // LSH-bucket-then-verify shape of the text dedup stack. One
      // partial-aggregable shuffle on the bucket key; the candidate
      // canonical is the min doc_id (deterministic).
      queries("multimodal_features")(s, dir)
        .groupBy("width", "height")
        .agg(count(lit(1)).as("n_members"), min(col("doc_id")).as("canonical"),
             countDistinct(col("thumb_hex")).as("n_distinct_media"))
        .filter(col("n_members") > 1)
        .orderBy("width", "height")),
  )

  // Oracle re-derives the payload bytes from the md5 hex string:
  // byte i == TRY_CAST('0x' || substring(md5(text), 2i+1, 2) AS BIGINT).
  private def byteAt(i: Int) =
    s"TRY_CAST('0x' || substring(md5(text), ${2 * i + 1}, 2) AS BIGINT)"
  private val meanBytes =
    (0 until 16).map(byteAt).mkString("(", " + ", ") / 16.0")

  val oracles: Map[String, String] = Map(
    "multimodal_features" ->
      s"""SELECT doc_id,
                 1 + ${byteAt(0)} % 64 AS width,
                 1 + ${byteAt(1)} % 64 AS height,
                 1 + ${byteAt(2)} % 3 AS channels,
                 $meanBytes AS mean_byte,
                 substring(md5(text), 1, 8) AS thumb_hex,
                 1 + ${byteAt(3)} % 8 AS n_frames
          FROM documents ORDER BY doc_id""",

    "multimodal_frames" ->
      s"""WITH d AS (SELECT doc_id, md5(text) AS h,
                            ${byteAt(3)} % 8 + 1 AS n_frames
                     FROM documents),
               f AS (SELECT doc_id, n_frames,
                            unnest(generate_series(1, n_frames, 2))
                              AS frame_idx
                     FROM d)
          SELECT f.doc_id, f.n_frames, f.frame_idx,
                 md5(d.h || CAST(f.frame_idx AS VARCHAR)) AS frame_hash,
                 substring(md5(d.h || CAST(f.frame_idx AS VARCHAR)), 1, 8)
                   AS thumb
          FROM f JOIN d ON f.doc_id = d.doc_id
          ORDER BY f.doc_id, f.frame_idx""",

    "multimodal_dedup" ->
      s"""SELECT 1 + ${byteAt(0)} % 64 AS width,
                 1 + ${byteAt(1)} % 64 AS height,
                 count(*) AS n_members, min(doc_id) AS canonical,
                 count(DISTINCT substring(md5(text), 1, 8))
                   AS n_distinct_media
          FROM documents GROUP BY 1, 2 HAVING count(*) > 1
          ORDER BY width, height""",
  )
}
