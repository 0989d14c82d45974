package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Exprs
import graft.functions.TextOps

/** Streaming front-end for the training-data curation pipeline: the same
  * per-row gate expressions [[TextOps.curate]] applies in batch, run over a
  * document STREAM with watermark-bounded exact dedup — what a continuous
  * ingest (crawl feed, upload queue) runs before documents ever land in the
  * corpus.
  *
  * Scale/state posture: the gates are stateless fused projections; the only
  * stateful operator is `dropDuplicatesWithinWatermark` on the content
  * md5, whose state is bounded by the watermark horizon (a crawl re-fetch
  * of the same page arrives within minutes, not days — exactly the
  * `withinWatermark` contract; cross-horizon dedup belongs to the batch
  * [[TextOps.dedupExact]] compaction). Runs unchanged on the RocksDB state
  * store provider (see StreamingSpec's provider test for the events path).
  *
  * The gate order matches the batch pipeline: cheap row-local cuts
  * (language, quality) BEFORE the stateful dedup, so dropped docs never
  * enter the state store.
  */
object DocStream {

  /** `docs` must carry (doc_id, text, source, ingest_ts). Emits the kept
    * stream: deduped, gated, with the gate columns and the whitespace token
    * count attached (the downstream [[QuotaStream]] admission input).
    */
  def curateStream(docs: DataFrame, keepLang: String = "en",
                   watermark: String = "10 seconds"): DataFrame =
    docs
      .withColumn("norm", Exprs.normText(col("text")))
      .withColumn("words", split(col("norm"), " "))
      .withColumn("pred_lang", TextOps.predLangE)
      .withColumn("quality_bucket", TextOps.qualityBucketE)
      .filter(col("pred_lang") === keepLang && col("quality_bucket") =!= "low")
      .withColumn("text_md5", md5(col("norm").cast("binary")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("text_md5")
      .select(col("doc_id"), col("ingest_ts"), col("source"), col("pred_lang"),
        col("quality_bucket"), col("text_md5"),
        size(col("words")).cast("long").as("n_tokens"))
}
