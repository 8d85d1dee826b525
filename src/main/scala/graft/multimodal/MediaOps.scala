package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media asset: opaque bytes plus typed metadata (SURVEY-adjacent
  * "multimodal columns" pipeline operator). `kind` ∈ image|audio|video.
  */
case class MediaRow(
    id: Long,
    kind: String,
    content: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int,
    duration_ms: Int)

/** Extracted feature row. */
case class MediaFeatures(id: Long, kind: String, n_bytes: Int, features: Array[Float])

/** Sampled frame row. */
case class MediaFrame(id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal column handling for a training-data pipeline: image/audio/
  * video as opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample over them.
  *
  * The Spark-side plumbing — schema, typed Dataset boundaries, partition
  * behavior, per-partition batch shape — is real and tested. The actual
  * codec step is STUBBED with a deterministic byte-hash "decoder"
  * ([[fakeDecode]]) because no image/audio libraries exist in this
  * environment; swap `decodeFrame` for a real codec to productionize.
  * Everything runs in `mapPartitions` so a real decoder amortizes any
  * per-partition model/codec initialization, the same shape a Pandas-UDF
  * `mapInPandas` would have in PySpark.
  */
object MediaOps {

  val FrameBytes = 16

  /** STUB decoder: deterministic pseudo-features from raw bytes (FNV-1a
    * rolling over fixed-stride windows). Replace with a real codec; the
    * signature (bytes → fixed-dim float features) is the contract.
    */
  def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x811c9dc5L
    var i = 0
    while (i < content.length) {
      h = (h ^ (content(i) & 0xffL)) * 0x01000193L & 0xffffffffL
      out(i % dim) += ((h % 1000L) / 1000.0f - 0.5f)
      i += 1
    }
    out
  }

  /** Feature extraction over a media Dataset: per-partition batch loop
    * (decoder init happens once per partition, not per row).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize codec/model HERE, once per partition
      rows.map { r =>
        MediaFeatures(r.id, r.kind, r.content.length, fakeDecode(r.content, dim))
      }
    }
  }

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th one — the video-frame-sampling shape (cheap
    * per-partition iteration, output exploded as its own table).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.content.grouped(FrameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % stride == 0 => MediaFrame(r.id, idx, frame)
      }
    }
  }

  /** Metadata "resize": a pure projection on the typed columns (the binary
    * payload would be re-encoded by the real codec; the stub scales metadata
    * and keeps bytes opaque — the plumbing a resize stage needs).
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(col("width"), col("height"), lit(1)))
    // round (truncation could zero a dimension at extreme aspect ratios)
    // and clamp to >= 1 — a real codec rejects zero-sized frames
    media
      .withColumn("width", greatest(round(col("width") * scale).cast("int"), lit(1)))
      .withColumn("height", greatest(round(col("height") * scale).cast("int"), lit(1)))
  }

  /** Fixture: wrap a text table as media rows (utf-8 payload bytes) —
    * exercises the binary plumbing end-to-end with deterministic content.
    */
  def fromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"), // pmod: signed % never hits 0/1 for negative ids
      encode(col(textCol), "UTF-8").as("content"),
      (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
      (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (length(col(textCol)) * 10).cast("int").as("duration_ms"))
}
