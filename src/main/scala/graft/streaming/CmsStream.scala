package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.functions.TextOps.heavyHitters]]: a running
  * Count-Min sketch over the token stream whose keyed state is one hash
  * ROW of the sketch — `width` longs per depth key, NEVER a per-term
  * count table (the point of the sketch at ingest scale: the batch
  * tier's exact column needs |vocabulary| state the stream cannot hold).
  *
  * The arrival side reuses the batch tier's exact expressions
  * ([[graft.Exprs.normText]] normalize + split + the `cms{r}:`-salted
  * [[graft.Exprs.hex60]] bucket hash), and counter addition is
  * commutative — order- and batching-insensitive, so replays of the
  * same corpus in any split converge to the same state (the spec
  * asserts 2-batch ≡ 1-batch). Each trigger emits the touched buckets'
  * current counters; the LAST emission per (r, bkt) equals the batch
  * operator's counter relation over the same corpus, so any term's
  * streaming estimate min_r(counter[r][bkt_r(term)]) lands on the batch
  * `est` column exactly (the cross-foot the spec pins).
  */
object CmsStream {

  final case class BktArrival(r: Int, bkt: Int)
  final case class CmsRow(counts: Map[Int, Long])
  final case class Counter(r: Int, bkt: Int, c: Long)

  val Depth = 3
  val Width = 64

  def counters(docs: DataFrame)(implicit spark: SparkSession): Dataset[Counter] = {
    import spark.implicits._
    val rb = (0 until Depth).map { r =>
      struct(lit(r).as("r"),
        (graft.Exprs.hex60(concat(lit(s"cms$r:"), col("w"))) % lit(Width.toLong))
          .cast("int").as("bkt"))
    }
    val arrivals = docs
      .withColumn("norm", graft.Exprs.normText(col("text")))
      .select(explode(split(col("norm"), " ")).as("w"))
      .select(explode(array(rb: _*)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bkt").as("bkt"))
      .as[BktArrival]
    arrivals.groupByKey(_.r)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (r: Int, rows: Iterator[BktArrival], state: GroupState[CmsRow]) => {
          val prev = state.getOption.map(_.counts).getOrElse(Map.empty[Int, Long])
          val batch = rows.foldLeft(Map.empty[Int, Long]) { (m, a) =>
            m.updated(a.bkt, m.getOrElse(a.bkt, 0L) + 1L)
          }
          val merged = batch.foldLeft(prev) { case (m, (b, n)) =>
            m.updated(b, m.getOrElse(b, 0L) + n)
          }
          state.update(CmsRow(merged))
          batch.keysIterator.toSeq.sorted.iterator
            .map(b => Counter(r, b, merged(b)))
        })
  }
}
