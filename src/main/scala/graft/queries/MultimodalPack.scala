package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal operators as driver-visible queries (no DuckDB oracle —
  * the inputs are synthesized binary payloads, which the fixture tables
  * don't carry; correctness lives in MultimodalSpec). The driver's
  * rows-only check still exercises the full decode→extract and
  * frame-sampling plans end to end.
  */
object MultimodalPack extends QueryPack {

  override def queries: Map[String, Query] = Map(
    "q_multimodal_features" -> ((spark, _) => {
      Multimodal.decodeFeatures(Multimodal.synthesize(spark, 300), bins = 16)
        .toDF()
        .select(col("media_id"), col("kind"),
          round(element_at(col("features"), 1), 6).as("f1"),
          round(element_at(col("features"), 16), 6).as("f16"))
        .orderBy(col("media_id"))
    }),

    "q_multimodal_audio" -> ((spark, _) => {
      Multimodal.audioStats(Multimodal.synthesize(spark, 300))
        .toDF()
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          round(col("rms"), 6).as("rms"), col("peak"))
        .orderBy(col("media_id"))
    }),

    "q_multimodal_frames" -> ((spark, _) => {
      Multimodal.frameSample(Multimodal.synthesize(spark, 300), everyN = 2)
        .toDF()
        .select(col("media_id"), col("frame_idx"),
          length(col("frame")).as("frame_bytes"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Image dedup by perceptual hash over REAL decoded PNGs: plant
    // known duplicates (2 low-id payloads re-ingested under new ids —
    // the re-crawl case), hash every decodable image, and group by the
    // 64-bit aHash. One bounded-key shuffle of (id, hash) pairs —
    // payloads never move after the map-side decode. Groups with
    // n > 1 are the dup clusters; min id is the canonical keeper
    // (same rule as the text dedup family).
    "q_multimodal_phash" -> ((spark, _) => {
      import spark.implicits._
      val media = Multimodal.synthesizePng(spark, 100)
      val dups = media.filter(_.media_id < 2)
        .map(r => r.copy(media_id = r.media_id + 10000))
      Multimodal.imageHash(media.union(dups))
        .toDF()
        .groupBy(col("phash"))
        .agg(min(col("media_id")).as("keeper"),
          count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy(col("keeper"))
    }),

    "q_multimodal_resize" -> ((spark, _) => {
      Multimodal.resizeImage(Multimodal.synthesize(spark, 300), newW = 8, newH = 8)
        .toDF()
        .select(col("media_id"), col("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          length(col("payload")).as("payload_bytes"))
        .orderBy(col("media_id"))
    })
  )

  override def oracleSql: Map[String, String] = Map.empty
}
