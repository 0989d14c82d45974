package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Streaming audio dedup — the acoustic twin of [[ImageDedupStream]],
  * completing the streaming admission family across modalities (text
  * `DocStream`, image `ImageDedupStream`, vector `VectorDedupStream`):
  * each arriving clip runs the SAME per-clip pipeline as the batch tier
  * (synthesize → WAV encode → decode → 64-frame energy slope → 63-bit
  * acoustic fingerprint, shared verbatim via [[Multimodal.audioFpOf]] so
  * the tiers cannot drift), then first-occurrence dedup on the
  * FINGERPRINT with watermark-bounded state.
  *
  * Same scope split as the image tier: the stream drops EXACT fingerprint
  * matches (the re-encoded/re-leveled copy, which the energy-slope
  * quantization folds to the same 63 bits — the dominant duplicate class
  * in a continuous feed); NEAR matches (1–`maxDist` bits) remain the
  * batch compaction's job ([[Multimodal.audioNearDup]] /
  * [[Multimodal.audioDedupIncr]]) — streaming near-dup needs cross-band
  * candidate state, a batch-shaped join, not per-key stream state.
  *
  * State posture: one row per distinct fingerprint inside the watermark
  * horizon — bounded by distinct content per horizon, never corpus size;
  * RocksDB-ready unchanged.
  *
  * `media` must carry (media_id, ingest_ts).
  */
object AudioDedupStream {

  def apply(media: DataFrame, watermark: String = "10 seconds"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("ingest_ts"))
      .as[(Long, java.sql.Timestamp)]
      .mapPartitions(_.map { case (id, ts) => (id, ts, Multimodal.audioFpOf(id)) })
      .toDF("media_id", "ingest_ts", "afp")
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("afp")
  }
}
