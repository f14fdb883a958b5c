package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus feature-extraction plumbing.
  *
  * The Spark-side mechanics are real — schema, partition-preserving batched
  * execution, column pruning friendliness. The codec itself is STUBBED
  * (`stubDecode`): this container has no image/audio libraries, so decode is
  * a deterministic byte-statistics fake with the same signature a real
  * decoder would have (bytes → fixed-dim float feature vector). Swap
  * `stubDecode` for a JNI/library call and nothing else changes.
  *
  * Batch shape: `decodeFeatures` runs via mapPartitions on the typed
  * Dataset — one JVM call per partition iterating its rows, the Scala
  * equivalent of the Python engine's mapInPandas Arrow batches. Executors
  * never hold more than one payload per row in flight; payload bytes stay
  * off the driver.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val metaFields: Seq[(String, String)] = Seq(
    "kind" -> "string",        // image | audio | video
    "width" -> "int", "height" -> "int",
    "sampleRate" -> "int", "durationMs" -> "bigint")

  /** Attach a fake binary payload + metadata derived from a text column —
    * the stand-in for reading real media files at test time. */
  def withFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
        (pmod(col(idCol), lit(640)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 1).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (length(col(textCol)) * 10).cast("bigint").as("durationMs")).as("meta"))

  /** STUB decoder: deterministic byte statistics standing in for a real
    * image/audio decode. Real implementation would decode `bytes` with a
    * codec and pool features; `???`-equivalent marked by this comment. */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i % dim) += b / 255.0f
      i += 1
    }
    val n = math.max(1, bytes.length / dim)
    var j = 0
    while (j < dim) { out(j) /= n; j += 1 }
    out
  }

  /** Batched feature extraction over (id, payload) — mapPartitions keeps the
    * per-partition iteration in one call (mapInPandas-equivalent shape). */
  def decodeFeatures(df: DataFrame, idCol: String, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
    typed.mapPartitions { it =>
      it.map { case (id, bytes) => (id, stubDecode(bytes, dim)) }
    }.toDF(idCol, "features")
  }

  /** STUB media transforms: signature-compatible byte-level fakes for
    * resize / frame-sample (a real codec call replaces the byte slicing). */
  def resizeStub(payload: org.apache.spark.sql.Column, maxBytes: Int) =
    substring(payload, 1, maxBytes)
  def frameSampleStub(payload: org.apache.spark.sql.Column, stride: Int, frame: Int) =
    substring(payload, 1 + (frame - 1) * stride, stride)
}
