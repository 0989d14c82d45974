package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Streaming image dedup — the image twin of [[DocStream.curateStream]]'s
  * content-hash gate: each arriving image runs the SAME per-image pipeline
  * as the batch tier (synthesize → BMP encode → decode → 9×8 thumbnail →
  * 63-bit dHash, shared verbatim via [[Multimodal.dhashOf]] so the tiers
  * cannot drift), then first-occurrence dedup on the PERCEPTUAL hash with
  * watermark-bounded state.
  *
  * Scope split, deliberately mirroring the text tier: the stream dedups
  * EXACT perceptual matches (hamming 0 — re-uploads and recompressions,
  * which dHash's thumbnail quantization folds to the same 63 bits; the
  * dominant duplicate class in a continuous ingest), while NEAR matches
  * (1–`maxDist` bits) remain the batch compaction's job
  * ([[Multimodal.imageDupClusters]]) — a streaming near-dup would need
  * cross-band candidate state per image (8 band keys coordinating one
  * drop decision), which is a batch-shaped join, not per-key stream state.
  *
  * State posture: one row per distinct dHash inside the watermark horizon
  * — bounded by distinct content seen per horizon, not corpus size; runs
  * on RocksDB unchanged (same contract as the DocStream path).
  *
  * `media` must carry (media_id, ingest_ts).
  */
object ImageDedupStream {

  def apply(media: DataFrame, watermark: String = "10 seconds"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("ingest_ts"))
      .as[(Long, java.sql.Timestamp)]
      .mapPartitions(_.map { case (id, ts) => (id, ts, Multimodal.dhashOf(id)) })
      .toDF("media_id", "ingest_ts", "dhash")
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("dhash")
  }
}
