package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata; decode / feature-extraction
  * runs per-partition over the raw bytes.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * container) producing deterministic byte statistics — but the Spark-side
  * plumbing is real: binary column in the schema, partition-wise iteration
  * (executor-side, no driver collect), typed case-class output schema.
  */
object Multimodal {

  /** Decoded-feature row (stand-in for e.g. image width/height/channels). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, n_space: Int, first_byte: Int)

  /** STUB: a real pipeline would decode the payload (JPEG/WAV/MP4) here and
    * emit features. Deterministic byte stats stand in so the distributed
    * plumbing and the oracle contract stay testable.
    */
  private def stubDecode(id: Long, payload: Array[Byte]): MediaFeatures = {
    var spaces = 0
    var i = 0
    while (i < payload.length) {
      if (payload(i) == 0x20) spaces += 1
      i += 1
    }
    MediaFeatures(id, payload.length, spaces, if (payload.nonEmpty) payload(0) & 0xff else -1)
  }

  /** Resized media row: STUB resize (no codecs offline) — a real pipeline
    * would decode, scale to (target_w, target_h) and re-encode; the stand-in
    * derives deterministic "resized" dimensions and byte length from the
    * payload so the distributed shape (binary in, binary-metadata out,
    * executor-side batch iteration) is real and oracle-checkable.
    */
  final case class ResizedMedia(
      doc_id: Long, src_bytes: Int, target_w: Int, target_h: Int, resized_bytes: Long)

  private def stubResize(id: Long, payload: Array[Byte], w: Int, h: Int): ResizedMedia =
    // stand-in cost model: output bytes scale with target area, bounded by
    // the source size (a real resize re-encodes; this keeps determinism)
    ResizedMedia(id, payload.length, w, h,
      math.min(payload.length.toLong, (w.toLong * h) / 64))

  /** Per-partition stub resize to a fixed target — the image-preprocessing
    * stage shape (decode → scale → re-encode) with the codec stubbed.
    */
  def resize(docs: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubResize(id, bytes, targetW, targetH) })
      .toDF()
      .orderBy("doc_id")
  }

  /** Binary payload column (text bytes standing in for media bytes) →
    * per-partition decode → typed feature frame.
    */
  def extractFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
      .toDF()
      .orderBy("doc_id")
  }
}
