package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.functions.TextOps.distinctKmv]]: a running
  * per-source distinct-vocabulary monitor whose keyed state is the
  * K-minimum-values sketch itself — k longs per source, NEVER the
  * vocabulary (the whole point of the sketch at ingest scale: the batch
  * tier's exact column needs |vocabulary| state the stream cannot hold).
  *
  * The arrival side reuses the batch tier's exact expressions
  * ([[graft.Exprs.normText]] normalize + split + the salted
  * [[graft.Exprs.hex60]] hash), and the k-min merge is a semilattice —
  * order- and batching-insensitive, so replays and re-feeds converge to
  * the same state (the spec asserts 2-batch ≡ 1-batch). Each trigger
  * emits the touched sources' current estimate; because h_k is
  * nonincreasing as smaller hashes arrive, the estimate is monotone
  * nondecreasing and the LAST emission per source equals the batch
  * operator's `est` column over the same corpus (the cross-foot the spec
  * pins — the stream never sees the exact count yet lands on the same
  * number for sub-k sources too, where the sketch IS exact).
  */
object KmvStream {

  final case class HashArrival(source: String, h: Long)
  final case class KmvState(mins: List[Long])
  final case class Estimate(source: String, n_state: Int, h_k: Long, est: Long)

  val K = 16

  def estimates(docs: DataFrame)(implicit spark: SparkSession): Dataset[Estimate] = {
    import spark.implicits._
    val arrivals = docs
      .withColumn("norm", graft.Exprs.normText(col("text")))
      .select(col("source"), explode(split(col("norm"), " ")).as("w"))
      .select(col("source"),
        graft.Exprs.hex60(concat(lit("kmv:"), col("w"))).as("h"))
      .as[HashArrival]
    arrivals.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[HashArrival], state: GroupState[KmvState]) => {
          val prev = state.getOption.map(_.mins).getOrElse(Nil)
          val merged = (prev ++ rows.map(_.h)).distinct.sorted.take(K)
          state.update(KmvState(merged))
          val hK = merged.last
          val est =
            if (merged.size < K) merged.size.toLong
            else math.floor((K - 1).toDouble * 1152921504606846976.0 / hK).toLong
          Iterator.single(Estimate(source, merged.size, hK, est))
        })
  }
}
