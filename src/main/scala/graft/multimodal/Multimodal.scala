package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payload columns with typed metadata, plus the distributed plumbing a
  * training-data pipeline needs around them — decode → feature
  * extraction, frame sampling, and metadata transforms.
  *
  * IMAGE DECODE IS REAL for PNG payloads: [[PngCodec]] rides the JDK's
  * `javax.imageio` (no external codec needed), so
  * [[Multimodal.decodeFeatures]] histograms actual pixel luminance and
  * [[Multimodal.resizeImage]] resamples actual pixels and re-encodes.
  * Payloads that are not decodable images (synthetic fixtures, audio,
  * video, truncated files) fall back to a deterministic byte histogram
  * / raw-layout path — decode failure degrades, never throws, which is
  * what a 10⁹-file ingest needs. Audio/video codecs are genuinely
  * absent from this container; those kinds keep the byte-level path
  * (declared in SURVEY §2-B).
  *
  * Scale notes: payloads stay opaque until the last possible operator
  * (no decode before filters/joins on metadata — Catalyst prunes the
  * binary column away from plans that don't touch it); feature
  * extraction is a `mapPartitions` so per-partition codec init is paid
  * once, not per row.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int,
      sample_rate: Int, n_frames: Int)
  case class MediaRecord(media_id: Long, kind: String, meta: MediaMeta,
      payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Double])
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame block size for the synthetic "video" payloads (bytes). */
  val FrameBytes = 64

  /** Deterministic synthetic media table (no driver fixture carries
    * binary payloads): payload bytes are a fixed function of
    * (media_id, position). One row per media item, round-robin kinds. */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val size = kind match {
        case "image" => 256
        case "audio" => 512
        case _       => FrameBytes * (4 + (id % 5).toInt) // 4-8 frames
      }
      val payload = Array.tabulate(size)(i => (((id * 31 + i) * 2654435761L) >>> 24).toByte)
      val meta = kind match {
        case "image" => MediaMeta("png", 16, 16, 0, 1)
        case "audio" => MediaMeta("pcm16", 0, 0, 16000, 0)
        case _       => MediaMeta("rawvid", 8, 8, 0, size / FrameBytes)
      }
      MediaRecord(id, kind, meta, payload)
    }
  }

  /** Decode + feature-extract: PNG payloads decode to pixels (JDK
    * ImageIO) and yield a normalized LUMINANCE histogram of `bins`
    * buckets; everything else (audio/video/undecodable bytes) yields a
    * normalized BYTE histogram — same shape, so downstream consumers
    * are codec-agnostic. */
  def decodeFeatures(media: Dataset[MediaRecord], bins: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition init: ImageIO plugin scan happens once per JVM,
      // first use in this partition pays it
      records.map { r =>
        val counts = new Array[Double](bins)
        val total = PngCodec.decode(r.payload) match {
          case Some(img) =>
            // one bulk raster fetch — per-pixel getRGB pays a color
            // model conversion call per pixel
            val px = PngCodec.argb(img)
            var i = 0
            while (i < px.length) {
              counts((PngCodec.luminance(px(i)) * bins) / 256) += 1.0
              i += 1
            }
            px.length.toDouble
          case None =>
            r.payload.foreach { b => counts(((b & 0xff) * bins) / 256) += 1.0 }
            r.payload.length.toDouble
        }
        MediaFeatures(r.media_id, r.kind,
          if (total == 0) counts else counts.map(_ / total))
      }
    }
  }

  /** Sample every `everyN`-th fixed-size frame block from video
    * payloads — the explode (one row per sampled frame) a frame-level
    * training pipeline consumes. */
  def frameSample(media: Dataset[MediaRecord], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.payload.grouped(FrameBytes).zipWithIndex.collect {
        case (block, idx) if idx % everyN == 0 => Frame(r.media_id, idx, block)
      }
    }
  }

  /** Metadata-only resize: rewrite width/height inside the nested meta
    * struct without touching the payload (decode-free plan). */
  def resizeMeta(media: DataFrame, width: Int, height: Int): DataFrame =
    media.withColumn("meta",
      col("meta").withField("width", lit(width)).withField("height", lit(height)))

  /** Ingest raw media FILES into the payload-column model via Spark's
    * `binaryFile` source — the distributed path media actually arrives
    * through at scale (a directory tree of image/audio files), with
    * pushdown-capable path/size metadata and the payload kept opaque.
    * `kind` derives from the file extension; metadata defaults to
    * unknown dimensions until a decode pass fills them. */
  def ingestFiles(spark: SparkSession, dir: String, glob: String = "*"): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, content) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val digits = name.takeWhile(_.isDigit)
        // numeric filename prefix wins (stable, human-assigned);
        // otherwise — or when the digit run overflows Long (nanos-style
        // timestamp prefixes) — a 63-bit FNV-1a of the FULL PATH: two
        // distinct non-numeric files must never collide (the old -1
        // sentinel gave every such file the same id)
        val id =
          if (digits.isEmpty || digits.length > 18) fnv63(path)
          else digits.toLong
        val kind = name.substring(name.lastIndexOf('.') + 1) match {
          case "png" | "jpg" => "image"
          case "pcm" | "wav" => "audio"
          case _             => "video"
        }
        MediaRecord(id, kind, MediaMeta("file", -1, -1, -1, -1), content)
      }
  }

  /** Payload-level nearest-neighbor resize. PNG payloads decode,
    * resample actual pixels, and re-encode as PNG (dimensions read
    * from the image itself, metadata updated to match); raw
    * 1-byte-per-pixel payloads resample bytes using the metadata
    * dimensions; non-images pass through untouched. Nearest-neighbor
    * (not an interpolating Graphics2D scale) keeps the output a pure
    * deterministic function of input pixels. */
  def resizeImage(media: Dataset[MediaRecord], newW: Int, newH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(newW > 0 && newH > 0, "target dimensions must be positive")
    media.map { r =>
      if (r.kind != "image") r
      else PngCodec.decode(r.payload) match {
        case Some(img) =>
          val out = PngCodec.resizeNearest(img, newW, newH)
          r.copy(meta = r.meta.copy(width = newW, height = newH),
            payload = PngCodec.encode(out))
        case None if r.meta.width > 0 && r.meta.height > 0 &&
            r.payload.length >= r.meta.width * r.meta.height =>
          // guard: metadata can claim dims a truncated payload lacks —
          // such records pass through rather than throwing mid-job
          val (w, h) = (r.meta.width, r.meta.height)
          val out = Array.tabulate(newW * newH) { i =>
            val x = i % newW
            val y = i / newW
            r.payload((y * h / newH) * w + (x * w / newW))
          }
          r.copy(meta = r.meta.copy(width = newW, height = newH), payload = out)
        case None => r
      }
    }
  }

  /** 63-bit FNV-1a over UTF-8 bytes (sign bit cleared so ids sort with
    * human-assigned non-negative ones). */
  private[multimodal] def fnv63(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      h ^= (b & 0xffL)
      h *= 0x100000001b3L
    }
    h & Long.MaxValue
  }
}

/** PNG decode/encode on the JDK's built-in `javax.imageio` — no
  * external codec. Decode is signature-gated and failure-tolerant:
  * anything that is not a readable PNG yields None and callers keep
  * their byte-level fallback. */
private[multimodal] object PngCodec {

  private val Magic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)

  // the source is already an in-memory byte array — the default
  // file-backed ImageIO cache would round-trip a temp file per decode
  javax.imageio.ImageIO.setUseCache(false)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && java.util.Arrays.equals(bytes, 0, 4, Magic, 0, 4)

  // NonFatal, not just IOException: ImageIO's PNG reader throws
  // RuntimeExceptions on corrupt chunk tables, and one bad file must
  // degrade to the byte-level fallback, not kill a billion-file job
  def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!isPng(bytes)) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Integer Rec. 601 luma of a packed ARGB pixel, in [0, 255]. */
  def luminance(argb: Int): Int = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (r * 299 + g * 587 + b * 114) / 1000
  }

  /** Whole image as packed ARGB, row-major — ONE color-model
    * conversion pass instead of a virtual getRGB call per pixel. */
  def argb(img: java.awt.image.BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  def resizeNearest(img: java.awt.image.BufferedImage,
      newW: Int, newH: Int): java.awt.image.BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val src = argb(img)
    val dst = new Array[Int](newW * newH)
    var y = 0
    while (y < newH) {
      val sy = y * h / newH
      var x = 0
      while (x < newW) {
        dst(y * newW + x) = src(sy * w + x * w / newW)
        x += 1
      }
      y += 1
    }
    val out = new java.awt.image.BufferedImage(
      newW, newH, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    out.setRGB(0, 0, newW, newH, dst, 0, newW)
    out
  }
}
