package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads +
  * typed metadata, with decode / feature-extract / resize / frame-sample
  * as partition-wise typed transforms (`mapPartitions` over Datasets —
  * the JVM analogue of `mapInPandas`: per-partition batch iterators,
  * explicit schemas, no driver collect).
  *
  * REAL here: the schema, the binary payload path, the partition batch
  * shape, the typed Encoders, the join back into the relational
  * pipeline. STUBBED (clearly marked): the actual codec — no image/audio
  * libraries ship in this container, so `decodeStub` derives
  * deterministic pseudo-pixels from the payload bytes; swap
  * `decodeStub`/`resizeStub`/`frameOffsets` for real codecs (e.g.
  * javacv/ImageIO) without touching any Spark plumbing.
  */
object MediaOps {

  final case class MediaBlob(doc_id: String, media_ref: String, media_type: String,
                             payload: Array[Byte], width: Int, height: Int)
  final case class MediaFeature(doc_id: String, media_ref: String, media_type: String,
                                n_bytes: Long, width: Int, height: Int,
                                nibble_hist: Array[Long], frame_count: Int)

  /** deterministic fake payload: 64 bytes from chained md5 of media_ref
    * (reproducible in SQL for the oracle: the hex string is
    * md5(ref) || md5(ref||'1') || md5(ref||'2') || md5(ref||'3')).
    */
  def syntheticMedia(corpus: DataFrame): DataFrame = {
    val spans = CorpusOps.explodedSpans(corpus).where(col("kind") === "media")
    val hexPayload = concat(
      md5(col("media_ref").cast("binary")),
      md5(concat(col("media_ref"), lit("1")).cast("binary")),
      md5(concat(col("media_ref"), lit("2")).cast("binary")),
      md5(concat(col("media_ref"), lit("3")).cast("binary")))
    spans.select(
      col("doc_id"), col("media_ref"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("offset") % 3 + 1).cast("int")).as("media_type"),
      unhex(hexPayload).as("payload"))
      .withColumn("width", (conv(substring(hex(col("payload")), 1, 2), 16, 10)
        .cast("int") % 16 + 1) * 64)
      .withColumn("height", (conv(substring(hex(col("payload")), 3, 2), 16, 10)
        .cast("int") % 16 + 1) * 64)
  }

  // ---- STUB SECTION: replace with real codecs -------------------------

  /** STUB decode: payload bytes ARE the "pixels". A real implementation
    * would decode JPEG/PNG/PCM here.
    */
  private def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** STUB resize: deterministic subsample to at most `maxPx` "pixels". */
  private def resizeStub(pixels: Array[Byte], maxPx: Int): Array[Byte] =
    if (pixels.length <= maxPx) pixels
    else Array.tabulate(maxPx)(i => pixels(i * pixels.length / maxPx))

  /** STUB frame sampling for "video": deterministic frame count from the
    * payload (a real implementation samples keyframes).
    */
  private def frameOffsets(payload: Array[Byte]): Array[Int] = {
    val n = (payload.headOption.getOrElse(0: Byte) & 0x03) + 1
    Array.tabulate(n)(i => i * math.max(1, payload.length / n))
  }

  // ---------------------------------------------------------------------

  /** decode + feature-extract, partition-wise: one pass per partition
    * over the binary payloads producing typed feature rows (nibble
    * histogram = the stub's "embedding"; deterministic and
    * SQL-reproducible for the oracle).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_ref", "media_type", "payload", "width", "height")
      .as[(String, String, String, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (doc, ref, typ, payload, w, h) =>
          val pixels = resizeStub(decodeStub(payload), 4096)
          val hist = new Array[Long](16)
          var i = 0
          while (i < pixels.length) {
            hist((pixels(i) >> 4) & 0xF) += 1
            hist(pixels(i) & 0xF) += 1
            i += 1
          }
          val frames = if (typ == "video") frameOffsets(payload).length else 1
          MediaFeature(doc, ref, typ, payload.length.toLong, w, h, hist, frames)
        }
      }
  }

  final case class MediaFrame(doc_id: String, media_ref: String, frame_idx: Int,
                              frame_offset: Int, frame_payload: Array[Byte])

  /** frame sampling for video payloads, partition-wise: one row per
    * sampled frame carrying the frame's byte slice (the shape a training
    * pipeline hands to a per-frame encoder). Deterministic stub offsets
    * (`frameOffsets`); swap for keyframe detection without touching the
    * Spark plumbing.
    */
  def sampleFrames(media: DataFrame): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("media_type") === "video")
      .select("doc_id", "media_ref", "payload")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (doc, ref, payload) =>
          val offs = frameOffsets(payload)
          val flen = math.max(1, payload.length / offs.length)
          offs.zipWithIndex.map { case (off, i) =>
            MediaFrame(doc, ref, i, off,
              payload.slice(off, math.min(payload.length, off + flen)))
          }
        }
      }
  }

  /** features → dense float vector (joins the VectorOps ANN path). */
  def featureVectors(features: Dataset[MediaFeature]): DataFrame =
    features.toDF().select(col("doc_id"), col("media_ref"),
      transform(col("nibble_hist"), x => x.cast("float")).as("embedding"))
}
