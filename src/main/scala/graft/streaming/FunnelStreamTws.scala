package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import FunnelStream.{Activity, FunnelState, StageHit}

/** The funnel stage machine on `transformWithState` — Spark 4's successor
  * to `flatMapGroupsWithState` and the tier a NEW deployment should write
  * against: typed named state (`ValueState`), per-state TTL instead of
  * hand-managed timeout timestamps, and RocksDB-only execution (the
  * cluster state backend is the only backend). Same semantics as
  * [[FunnelStream]] — the spec runs both tiers on one input and asserts
  * identical output — so the two implementations document the API
  * migration, not a behavior change.
  *
  * State is one [[FunnelState]] per user with a TTL: an idle user's state
  * is dropped by the store itself (no timer bookkeeping in operator code),
  * keeping state bounded by ACTIVE users.
  */
object FunnelStreamTws {

  class FunnelProcessor(stages: Seq[String], ttlMs: Long)
      extends StatefulProcessor[Long, Activity, StageHit] {
    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState],
        if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Activity],
                                 timerValues: TimerValues): Iterator[StageHit] = {
      val stageIdx = stages.zipWithIndex.toMap
      var st = Option(state.get()).getOrElse(FunnelState(0, Long.MinValue))
      val out = rows.toSeq.sortBy(_.event_time.getTime).flatMap { a =>
        val next = st.stage
        val t = a.event_time.getTime
        if (next < stages.length && stageIdx.get(a.event_type).contains(next) &&
            (next == 0 || t >= st.stageTimeMs)) {
          st = FunnelState(next + 1, t)
          Some(StageHit(user, next + 1, stages(next), a.event_time))
        } else None
      }
      state.update(st)
      out.iterator
    }
  }

  def apply(events: Dataset[Activity],
            stages: Seq[String] = FunnelStream.DefaultStages,
            idleTtlMs: Long = 3600L * 1000)
           (implicit spark: SparkSession): Dataset[StageHit] = {
    import spark.implicits._
    // TTL requires ProcessingTime mode (wall-clock expiry by the store
    // itself) — and ProcessingTime mode keeps the query triggering batches
    // to advance its clock, so deterministic processAllAvailable tests run
    // with idleTtlMs = 0 → TimeMode.None and unexpiring state
    val timeMode = if (idleTtlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .withWatermark("event_time", "10 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(stages, idleTtlMs),
        timeMode, OutputMode.Append())
  }
}
