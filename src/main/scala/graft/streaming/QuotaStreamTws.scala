package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import QuotaStream.{Decision, QDoc, QuotaState}

/** The per-source token-quota gate on `transformWithState` — the same
  * migration pairing as [[FunnelStreamTws]]/[[FunnelStream]]: typed named
  * `ValueState` instead of `GroupState`, store-managed TTL instead of
  * timeout bookkeeping. Semantics are identical to [[QuotaStream]] (the
  * spec runs both tiers on one input and asserts identical decisions);
  * quota state deliberately has NO TTL by default — a budget is a per-run
  * contract — but the TTL hook is where a daily-resetting quota would go.
  */
object QuotaStreamTws {

  class QuotaProcessor(quota: Long, ttlMs: Long)
      extends StatefulProcessor[String, QDoc, Decision] {
    @transient private var state: ValueState[QuotaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[QuotaState]("quota",
        Encoders.product[QuotaState],
        if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[QDoc],
                                 timerValues: TimerValues): Iterator[Decision] = {
      var consumed = Option(state.get()).map(_.consumed).getOrElse(0L)
      val out = rows.toSeq.sortBy(d => (d.ingest_ts.getTime, d.doc_id)).map { d =>
        val fits = consumed + d.tok <= quota
        if (fits) consumed += d.tok
        Decision(d.doc_id, source, d.tok, fits, consumed)
      }
      state.update(QuotaState(consumed))
      out.iterator
    }
  }

  def apply(docs: Dataset[QDoc], quota: Long, resetTtlMs: Long = 0L)
           (implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    val timeMode = if (resetTtlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    docs
      .groupByKey(_.source)
      .transformWithState(new QuotaProcessor(quota, resetTtlMs),
        timeMode, OutputMode.Append())
  }
}
