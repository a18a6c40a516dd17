package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payload columns with typed metadata, plus the distributed plumbing a
  * training-data pipeline needs around them — decode → feature
  * extraction, frame sampling, and metadata transforms.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs,
  * so [[Multimodal.decodeFeatures]] derives features from payload bytes
  * deterministically (byte histogram) where a real deployment would
  * decode pixels/samples (e.g. via a JNI codec or `mapInPandas` +
  * Pillow/torchaudio on PySpark). Everything AROUND the stub is real
  * and tested: the schema, the per-partition batched iteration, the
  * explode shape for frame sampling, and the nested-struct metadata
  * updates — swapping the stub for a codec changes no plumbing.
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

  /** Decode + feature-extract: per-media normalized byte histogram of
    * `bins` buckets. THE HISTOGRAM IS THE DECODE STUB — a real system
    * decodes pixels/samples here; signature, batching, and output
    * schema are what a codec-backed version keeps. */
  def decodeFeatures(media: Dataset[MediaRecord], bins: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition init would open the codec once, here
      records.map { r =>
        val counts = new Array[Double](bins)
        r.payload.foreach { b => counts(((b & 0xff) * bins) / 256) += 1.0 }
        val total = r.payload.length.toDouble
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
        val id = if (digits.isEmpty) -1L else digits.toLong
        val kind = name.substring(name.lastIndexOf('.') + 1) match {
          case "png" | "jpg" => "image"
          case "pcm" | "wav" => "audio"
          case _             => "video"
        }
        MediaRecord(id, kind, MediaMeta("file", -1, -1, -1, -1), content)
      }
  }

  /** Payload-level resize of raw 1-byte-per-pixel images by
    * nearest-neighbor sampling; non-images pass through untouched. The
    * 1-byte-pixel layout is the decode stub's representation — a
    * codec-backed version swaps the pixel accessor and keeps the
    * map shape, metadata update, and pass-through semantics. */
  def resizeImage(media: Dataset[MediaRecord], newW: Int, newH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(newW > 0 && newH > 0, "target dimensions must be positive")
    media.map { r =>
      if (r.kind != "image" || r.meta.width <= 0 || r.meta.height <= 0) r
      else {
        val (w, h) = (r.meta.width, r.meta.height)
        val out = Array.tabulate(newW * newH) { i =>
          val x = i % newW
          val y = i / newW
          r.payload((y * h / newH) * w + (x * w / newW))
        }
        r.copy(meta = r.meta.copy(width = newW, height = newH), payload = out)
      }
    }
  }
}
