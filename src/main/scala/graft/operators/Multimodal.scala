package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with a typed metadata struct riding alongside (the same pattern as the
  * streaming HriRecord's opaque `value`, SURVEY.md §1.1).
  *
  * The decode/feature-extract step is a clearly-marked deterministic STUB
  * (no image/audio codecs in this container) — but the Spark-side contract
  * is real: schema, `mapPartitions` batching, partition-parallel execution,
  * and a typed output row. Swapping the stub for a JNI/codec call changes
  * one function.
  */
object Multimodal {

  /** A media asset: opaque bytes + typed metadata. */
  case class MediaAsset(
      asset_id: Long,
      media_type: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  /** Extracted features per asset (what a real decode would emit). */
  case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      n_frames_sampled: Int,
      checksum: Long)

  /** STUB decode: a real implementation would decode `content` with a
    * codec; here a deterministic fake derives a checksum and a frame-sample
    * count from the bytes so tests can assert exact values. Runs per
    * partition so a real codec could amortize init across the batch. */
  def decodeStub(a: MediaAsset): MediaFeatures = {
    var h = 1125899906842597L // deterministic polynomial rolling hash
    var i = 0
    while (i < a.content.length) { h = 31 * h + a.content(i); i += 1 }
    MediaFeatures(a.asset_id, a.media_type, a.content.length.toLong,
      math.max(1, a.n_frames / 10), h)
  }

  /** Feature extraction over a media table: partition-parallel batched
    * decode (the Scala analogue of mapInPandas batches). */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(it => it.map(decodeStub))
  }

  /** One sampled frame of an asset: payload slice + its own checksum. */
  case class MediaFrame(
      asset_id: Long,
      frame_idx: Int,
      frame_bytes: Long,
      frame_checksum: Long)

  /** STUB resize: a real codec would decode, scale, re-encode; the
    * deterministic fake clamps the metadata dims and truncates the payload
    * proportionally to the pixel ratio, so tests can assert exact sizes.
    * The Spark contract is the real part: a typed map over the Dataset,
    * safe to run per partition on executors. */
  def resizeStub(a: MediaAsset, maxW: Int, maxH: Int): MediaAsset = {
    val scale = math.min(1.0,
      math.min(maxW.toDouble / math.max(1, a.width), maxH.toDouble / math.max(1, a.height)))
    val newLen = math.max(1, (a.content.length * scale * scale).toInt)
    a.copy(
      width = math.max(1, (a.width * scale).toInt),
      height = math.max(1, (a.height * scale).toInt),
      content = a.content.take(newLen))
  }

  def resize(assets: Dataset[MediaAsset], maxW: Int, maxH: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(resizeStub(_, maxW, maxH)))
  }

  /** STUB frame sampling: every n_frames/k-th "frame" is a fixed-stride
    * slice of the payload (a real implementation seeks keyframes). One
    * asset flatMaps to k frame rows — the row-explosion shape a video
    * pipeline needs, with frames owned by executors, never the driver. */
  def sampleFrames(assets: Dataset[MediaAsset], k: Int): Dataset[MediaFrame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val n = math.min(k, math.max(1, a.n_frames))
      (0 until n).map { i =>
        val start = (a.content.length.toLong * i / n).toInt
        val end = (a.content.length.toLong * (i + 1) / n).toInt
        val slice = java.util.Arrays.copyOfRange(a.content, start, math.max(start, end))
        var h = 1125899906842597L
        var j = 0
        while (j < slice.length) { h = 31 * h + slice(j); j += 1 }
        MediaFrame(a.asset_id, i, slice.length.toLong, h)
      }
    }
  }

  /** Builds a synthetic media table from documents: the UTF-8 text bytes
    * stand in for an encoded payload. Exercises the binary column path
    * end-to-end on driver-provided data. */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    documents(s, d).select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
      col("text").cast("binary").as("content"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      (col("n_chars") % 100 + 1).cast("int").as("n_frames")
    ).as[MediaAsset]
  }

  /** Oracle-checkable slice of the multimodal path: binary payload length,
    * content digest, and the batch shape a frame-sampler would use. */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("blob", col("text").cast("binary"))
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
        length(col("blob")).cast("long").as("n_bytes"),
        md5(col("blob")).as("content_md5"),
        ceil(length(col("blob")).cast("double") / 64.0).cast("long").as("n_chunks"))
}
