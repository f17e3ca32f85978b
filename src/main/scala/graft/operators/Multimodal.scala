package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BinaryType`
  * payloads with typed metadata, processed in per-partition batches.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[Decoder.Deterministic]] derives fake-but-stable features
  * from the payload bytes. Everything around it — payload schema,
  * partitioning, per-partition batch iteration (the Scala analog of
  * `mapInPandas`: one decoder instance per task, rows streamed through it in
  * batches, never collected), and the feature schema — is real and tested.
  * Swapping in a real decoder is a one-trait change.
  */
object Multimodal {

  /** Pluggable media decoder. One instance per partition (per task) — the
    * place a real implementation would lazily initialize native codecs.
    */
  trait Decoder extends Serializable {
    /** payload bytes → (width, height, n_frames). */
    def decode(payload: Array[Byte]): (Int, Int, Int)
  }

  object Decoder {
    /** Deterministic fake decode: features are pure arithmetic over the
      * payload length, so the SQL oracle can replicate them while the Spark
      * side still runs the full binary-column + batch-iteration path.
      */
    object Deterministic extends Decoder {
      def decode(payload: Array[Byte]): (Int, Int, Int) = {
        val n = payload.length
        (n % 640, (n * 7) % 480, n % 16 + 1)
      }
    }

    /** A real decoder would live here; unimplemented in this container. */
    object Native extends Decoder {
      def decode(payload: Array[Byte]): (Int, Int, Int) =
        throw new UnsupportedOperationException(
          "native media decode not available in this environment; use Deterministic")
    }
  }

  /** Wrap a text corpus as a multimodal table: opaque binary payload +
    * typed metadata struct — the storage shape for media at 100 TB (payload
    * stays a single parquet binary column; metadata prunes independently).
    */
  def asMultimodal(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("payload_md5", StringType)))

  /** Decode/feature-extract over per-partition batches. Row order in, row
    * out — one output row per media row; decoder failures yield null
    * features rather than failing the task.
    */
  def extractFeatures(media: DataFrame,
                      decoder: Decoder = Decoder.Deterministic): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-task decoder init point (real codecs would open here)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(payload).map("%02x".format(_)).mkString
        scala.util.Try(decoder.decode(payload)) match {
          case scala.util.Success((w, h, f)) =>
            Row(id, payload.length.toLong, w, h, f, md5hex)
          case scala.util.Failure(_) =>
            Row(id, payload.length.toLong, null, null, null, md5hex)
        }
      }
    }(Encoders.row(featureSchema)).toDF()
  }

  /** Frame sampling stub: pick every `stride`-th frame index of a fake
    * `n_frames`-frame payload — exercises the explode/array plumbing a video
    * pipeline needs (one row per sampled frame).
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.select(col("media_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize stub: scale (width, height) to fit a target box preserving
    * aspect ratio — pure metadata arithmetic here (a real implementation
    * re-encodes the payload in the same per-partition pass as
    * [[extractFeatures]]); deterministic, so the SQL oracle can mirror it.
    * Integer math only: scale = min(tw/w, th/h) capped at 1, applied as
    * floor((dim * tw_num) / denom) to stay exactly reproducible.
    */
  def resizeMeta(features: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val w = col("width"); val h = col("height")
    // choose the binding dimension: fit-to-width iff w/tw >= h/th
    val fitW = w * targetH >= h * targetW
    val outW = when(w <= targetW && h <= targetH, w)
      .when(fitW, lit(targetW))
      .otherwise(floor(w * targetH / h).cast("int"))
    val outH = when(w <= targetW && h <= targetH, h)
      .when(fitW, floor(h * targetW / w).cast("int"))
      .otherwise(lit(targetH))
    features.select(col("media_id"), w.as("src_w"), h.as("src_h"),
      outW.as("out_w"), outH.as("out_h"))
  }
}
