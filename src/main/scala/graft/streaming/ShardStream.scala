package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.MixOps

/** Streaming shard append — the streaming twin of [[graft.functions.MixOps.manifestIncr]]'s
  * append contract, and the tail of the streaming corpus pipeline
  * ([[DocStream.curateStream]] → [[QuotaStream]] admission → HERE): each
  * micro-batch of curated documents walks its batch-local bucketed order,
  * prefix-sums token counts from the corpus's persisted high-water mark,
  * and ships (doc → shard) assignments plus the updated manifest. Closed
  * shards are never rewritten — identical to the batch operator's
  * spec-asserted invariant.
  *
  * Exactly-once shape under foreachBatch's at-least-once contract:
  * assignments land in an append-only log partitioned BY EPOCH
  * (`assign/epoch=N`, written with overwrite — a retried epoch replaces
  * its own partial output, never double-appends), and the high-water mark
  * is computed from STRICTLY PRIOR epochs, so a retry reproduces byte-
  * identical offsets. The manifest is re-aggregated from the log each
  * epoch (bounded output: one row per shard) and swap-renamed so no
  * instant has zero copies on disk.
  *
  * Scale posture: the per-epoch walk is the same bucketed two-phase prefix
  * sum as the batch operator (no corpus-wide window); the log re-read for
  * the manifest is the demo simplification — a production fold keeps the
  * per-shard aggregates hot and merges only the batch delta (the xor
  * checksum and the counts are all associative), reading nothing but the
  * manifest itself back.
  *
  * `docs` must carry (doc_id, source, text_md5, n_tokens) —
  * [[DocStream.curateStream]]'s output schema.
  */
object ShardStream {

  def appendStream(docs: DataFrame, outPath: String, checkpointDir: String,
                   buckets: Int = 8, budget: Long = 500L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val assignRoot = new java.io.File(s"$outPath/assign")
        // tokens shipped by prior epochs only: a retried epoch excludes its
        // own partial write and then overwrites it
        val hwm =
          if (!assignRoot.exists()) 0L
          else spark.read.parquet(assignRoot.getPath)
            .filter(col("epoch") < epochId)
            .agg(coalesce(sum("tok"), lit(0L))).head().getLong(0)
        val walked = MixOps.walkOffsets(
            batch.select(col("doc_id"), col("source"), col("text_md5"),
              col("n_tokens").as("tok")), buckets)
          .withColumn("off", col("off") + lit(hwm))
          .withColumn("shard_id", expr(s"off div ${budget}L"))
          .select("doc_id", "source", "text_md5", "tok", "off", "shard_id")
        walked.write.mode("overwrite").parquet(s"$outPath/assign/epoch=$epochId")

        // manifest re-aggregated from the append-only log; one row per
        // shard, order-independent xor checksum over the content hashes
        val manifest = spark.read.parquet(s"$outPath/assign")
          .groupBy("shard_id")
          .agg(count(lit(1)).as("n_docs"),
            sum("tok").as("n_tokens"),
            expr("bit_xor(cast(conv(substring(text_md5, 1, 15), 16, 10) as bigint))")
              .as("checksum"),
            max("epoch").as("last_epoch"))
        val mDir = new java.io.File(s"$outPath/manifest")
        val mOld = new java.io.File(s"$outPath/manifest.old")
        val mTmp = s"$outPath/manifest.tmp"
        // crash between the swap renames leaves only `.old` — restore first
        if (!mDir.exists() && mOld.exists() && !mOld.renameTo(mDir))
          throw new java.io.IOException(s"manifest recover failed: $mOld -> $mDir")
        manifest.coalesce(1).write.mode("overwrite").parquet(mTmp)
        import graft.LocalFs.rmrf
        if (mOld.exists()) rmrf(mOld)
        if (mDir.exists() && !mDir.renameTo(mOld))
          throw new java.io.IOException(s"manifest swap-aside failed: $mDir")
        if (!new java.io.File(mTmp).renameTo(mDir))
          throw new java.io.IOException(s"manifest swap-in failed: $mTmp -> $mDir")
        rmrf(mOld)
      }
      .start()
}
