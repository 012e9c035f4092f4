package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus the decode / feature-extract / frame-sample
  * plumbing a training-data pipeline needs.
  *
  * Images decode FOR REAL: PPM (P6) and 24-bit BMP through
  * [[ImageCodec]]'s hand-rolled byte decoders, and JPEG/PNG/GIF/TIFF
  * through the JDK's own `javax.imageio` (ships with the JRE, headless) —
  * actual pixel decode, nearest-neighbor resize, and an 8-dim visual
  * feature. Only VIDEO (MP4 frame extraction) genuinely lacks a JDK codec
  * and uses a deterministic fake container (`GRFT` magic +
  * type/width/height/frames header) with a payload-derived stub feature;
  * audio is metadata-only the same way. Everything Spark-side is real
  * either way: binary schema, per-partition batched iteration (the Scala
  * analogue of `mapInPandas` batch shape), partition-parallel execution,
  * typed output schema.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, frames: Int)
  case class MediaRow(id: Long, media: Array[Byte])
  case class DecodedRow(id: Long, format: String, width: Int, height: Int,
      frames: Int, payloadBytes: Int, feature: Array[Float])

  private val MAGIC = "GRFT".getBytes("US-ASCII")
  val FORMATS = Seq("img", "aud", "vid")

  /** Build a fake container payload (test/data-gen helper). */
  def encodeFake(format: String, width: Int, height: Int, frames: Int,
      payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 1 + 2 + 2 + 2 + payload.length)
      .order(ByteOrder.BIG_ENDIAN)
    buf.put(MAGIC)
    buf.put(FORMATS.indexOf(format).toByte)
    buf.putShort(width.toShort)
    buf.putShort(height.toShort)
    buf.putShort(frames.toShort)
    buf.put(payload)
    buf.array()
  }

  /** Parse the fake header. Returns None for unrecognized payloads
    * (corrupt rows must not kill a 100 TB job).
    */
  def parseMeta(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 11) return None
    if (!bytes.take(4).sameElements(MAGIC)) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    buf.position(4)
    val fmt = buf.get().toInt
    if (fmt < 0 || fmt >= FORMATS.length) return None
    Some(MediaMeta(FORMATS(fmt), buf.getShort() & 0xffff,
      buf.getShort() & 0xffff, buf.getShort() & 0xffff))
  }

  /** STUB — a real pipeline would decode pixels/samples here (PIL/ffmpeg
    * equivalents are not in this container). Derives a deterministic
    * 8-dim feature from the payload bytes so the plumbing is testable.
    */
  def extractFeatureStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff).toFloat / 255f
      i += 1
    }
    out
  }

  /** Evenly spaced frame indices for video sampling: n of `frames`. */
  def sampleFrameIndices(frames: Int, n: Int): Seq[Int] =
    if (frames <= 0 || n <= 0) Seq.empty
    else if (n >= frames) 0 until frames
    else (0 until n).map(i => (i.toLong * frames / n).toInt)

  /** Decode one payload: real pixels for PPM/BMP (hand-rolled) and any
    * ImageIO format (JPEG/PNG/GIF/TIFF), fake-container header for
    * video/audio, None if nothing parses.
    */
  def decodeOne(id: Long, media: Array[Byte]): Option[DecodedRow] =
    ImageCodec.decodePpm(media) match {
      case Some(img) => Some(DecodedRow(id, "ppm", img.width, img.height, 1,
        img.rgb.length, ImageCodec.feature(img)))
      case None => ImageCodec.decodeBmp(media) match {
        case Some(img) => Some(DecodedRow(id, "bmp", img.width, img.height, 1,
          img.rgb.length, ImageCodec.feature(img)))
        case None => ImageCodec.decodeImageIO(media) match {
          case Some((fmt, img)) => Some(DecodedRow(id, fmt, img.width,
            img.height, 1, img.rgb.length, ImageCodec.feature(img)))
          case None => parseMeta(media).map { m =>
            DecodedRow(id, m.format, m.width, m.height, m.frames,
              media.length - 11, extractFeatureStub(media))
          }
        }
      }
    }

  /** Decode a binary media column per partition (batched iterator — the
    * `mapInPandas` batch shape): id + metadata + feature (real pixels for
    * PPM/BMP via [[ImageCodec]], stub for fake containers). Unparseable
    * rows are dropped, not fatal.
    */
  def decode(spark: SparkSession, df: DataFrame, idCol: String,
      mediaCol: String): Dataset[DecodedRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[MediaRow]
      .mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  /** Resize one payload: REAL nearest-neighbor pixel resize for PPM/BMP
    * (re-encoded in the same format) and ImageIO formats (re-encoded PNG —
    * lossless, so a resize chain never accumulates generation loss);
    * header-dim rewrite for fake video/audio containers; unknown bytes
    * pass through.
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    ImageCodec.decodePpm(bytes) match {
      case Some(img) => ImageCodec.encodePpm(ImageCodec.resizeNearest(img, w, h))
      case None => ImageCodec.decodeBmp(bytes) match {
        case Some(img) => ImageCodec.encodeBmp(ImageCodec.resizeNearest(img, w, h))
        case None => ImageCodec.decodeImageIO(bytes) match {
          case Some((_, img)) =>
            ImageCodec.encodePng(ImageCodec.resizeNearest(img, w, h))
          case None => parseMeta(bytes) match {
            case Some(m) => encodeFake(m.format, w, h, m.frames, bytes.drop(11))
            case None    => bytes
          }
        }
      }
    }

  /** Batch resize over a media column — same per-partition batched shape as
    * [[decode]]; unparseable rows pass through untouched (a real pipeline
    * would route them to a quarantine sink).
    */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
      mediaCol: String, w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[MediaRow]
      .mapPartitions(_.map(r => MediaRow(r.id, resizeStub(r.media, w, h))))
  }

  /** Decode one payload to (format, pixels) through every real path:
    * PPM/BMP byte decoders, then ImageIO (JPEG/PNG/GIF/TIFF). None for
    * fake containers and garbage — this is the pixels-only face of
    * [[decodeOne]].
    */
  def decodeImage(media: Array[Byte]): Option[(String, ImageCodec.Image)] =
    ImageCodec.decodePpm(media).map(("ppm", _))
      .orElse(ImageCodec.decodeBmp(media).map(("bmp", _)))
      .orElse(ImageCodec.decodeImageIO(media))

  case class PixelSumRow(id: Long, format: String, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Per-image exact channel sums over a binary media column — the same
    * per-partition batched shape as [[decode]], but with integer-exact
    * outputs (an oracle can re-derive them from the source pixels with no
    * float-order concerns). Non-image rows are dropped.
    */
  def pixelSums(spark: SparkSession, df: DataFrame, idCol: String,
      mediaCol: String): Dataset[PixelSumRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        decodeImage(r.media).map { case (fmt, img) =>
          val (sr, sg, sb) = ImageCodec.channelSums(img)
          PixelSumRow(r.id, fmt, img.width, img.height, sr, sg, sb)
        }
      })
  }

  case class FrameRef(id: Long, frameIdx: Int, feature: Array[Float])

  /** Evenly sample up to `n` frames per video row: one output row per
    * sampled frame with a deterministic stub feature (a real pipeline would
    * decode the frame here). Non-video / unparseable rows produce nothing.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
      mediaCol: String, n: Int): Dataset[FrameRef] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          // videos only, per the contract — an image parses with frames=1
          // and would otherwise emit one spurious "frame" per row
          parseMeta(r.media).filter(_.format == "vid").toSeq.flatMap { m =>
            // base feature once per ROW (an O(payload) scan), cloned and
            // salted per frame — not recomputed n times
            val base = extractFeatureStub(r.media)
            sampleFrameIndices(m.frames, n).map { idx =>
              val f = base.clone()
              f(idx % f.length) += 1.0f
              FrameRef(r.id, idx, f)
            }
          }
        }
      }
  }
}
