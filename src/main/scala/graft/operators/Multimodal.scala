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
  )
}
