package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** A raw media record: opaque binary payload + typed metadata columns.
  * At 100 TB the payload column dominates — keep it last, project it away
  * early wherever only metadata is needed (parquet column pruning). */
case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int, duration_ms: Int, n_frames: Int, checksum: Long)

/** Multimodal column plumbing (SURVEY.md §2 row 33): image/audio/video as
  * opaque `binary` columns, decoded in executor-side batches.
  *
  * The decode itself is a STUB (the container has no media libs): a
  * deterministic fake derives dimensions from payload bytes. Everything
  * around it — the schema, the `Dataset[MediaRecord]` typed pipeline, the
  * `mapPartitions` batch shape (the Scala twin of `mapInPandas` batches),
  * the frame-sampling explode — is real and tested.
  */
object Multimodal {
  val BatchSize = 32

  /** Synthesizes a media table from the corpus: utf-8 bytes stand in for
    * encoded media; kind cycles image/audio/video. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode — replace with a real JNI/native decoder in production.
    * Deterministic: all outputs derive from the payload bytes alone. */
  private[operators] def decodeStub(m: MediaRecord): MediaMeta = {
    val n = m.payload.length.toLong
    var h = 1469598103934665603L // FNV-1a over the payload
    var i = 0
    while (i < m.payload.length) { h = (h ^ (m.payload(i) & 0xff)) * 1099511628211L; i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val dur = if (m.kind == "image") 0 else 1000 + math.floorMod(h >> 20, 60000).toInt
    val frames = m.kind match {
      case "image" => 1
      case "audio" => 0
      case _ => 1 + dur / 1000 // ~1 fps sample plan
    }
    MediaMeta(m.media_id, m.kind, n, w, ht, dur, frames, h)
  }

  /** Batched metadata extraction over the binary column. `grouped(BatchSize)`
    * mirrors the batch shape a vectorized decoder (or mapInPandas) would
    * see; per-partition work, no shuffle. */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map(decodeStub)))
  }

  /** multimodal_meta query: one metadata row per media item. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"), col("duration_ms"), col("n_frames"))

  /** Frame sampling: explode the decode plan into per-frame rows with
    * deterministic offsets — the input shape for a frame-featurizer. */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir).toDF()
      .where(col("n_frames") > 0)
      .select(col("media_id"), col("kind"), col("duration_ms"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)))
      .select(col("media_id"), col("kind"),
        col("pos").as("frame_idx"),
        when(col("n_frames") > 1,
          (col("pos") * col("duration_ms")) / (col("n_frames") - 1))
          .otherwise(lit(0)).cast("long").as("offset_ms"))
}
