package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import AlertCooldown.{Alert, Cooldown}

/** D2's cooldown dedup on `transformWithState` — completing the
  * [[FunnelStreamTws]]/[[QuotaStreamTws]] migration pairing across ALL
  * three custom-state operators: typed named `ValueState`, store-managed
  * TTL instead of the hand-managed event-time timeout bookkeeping the
  * `flatMapGroupsWithState` tier needs ([[AlertCooldown]] sets its own
  * timeout past the watermark each batch). Semantics are identical — the
  * spec runs both tiers on one input and asserts identical emissions —
  * so the pairing documents the API migration, not a behavior change.
  * State stays one long per key; with a TTL the store itself drops idle
  * keys.
  */
object AlertCooldownTws {

  class CooldownProcessor(cooldownMs: Long, ttlMs: Long)
      extends StatefulProcessor[String, Alert, Alert] {
    @transient private var state: ValueState[Cooldown] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Cooldown]("cooldown",
        Encoders.product[Cooldown],
        if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Alert],
                                 timerValues: TimerValues): Iterator[Alert] = {
      var last = Option(state.get()).map(_.lastEmitMs).getOrElse(Long.MinValue)
      val out = rows.toSeq.sortBy(_.event_time.getTime).flatMap { a =>
        val t = a.event_time.getTime
        if (last == Long.MinValue || t >= last + cooldownMs) {
          last = t
          Some(a)
        } else None
      }
      state.update(Cooldown(last))
      out.iterator
    }
  }

  def apply(alerts: Dataset[Alert], cooldownSec: Int = 30, idleTtlMs: Long = 0L)
           (implicit spark: SparkSession): Dataset[Alert] = {
    import spark.implicits._
    // A processing-time TTL shorter than ~2x the cooldown can evict a key
    // MID-cooldown — a re-appearing key then re-emits where the fMGWS twin
    // (event-time timeout at last + 2x cooldown) suppresses, breaking the
    // emission-identical pairing this object documents. Refuse the
    // configuration rather than silently weaken the dedup guarantee.
    require(idleTtlMs == 0L || idleTtlMs >= 2L * cooldownSec * 1000L,
      s"idleTtlMs=$idleTtlMs would evict cooldown state mid-window; " +
        s"use 0 (no TTL) or >= ${2L * cooldownSec * 1000L} ms (2x cooldown)")
    // TTL requires ProcessingTime mode (the FunnelStreamTws caveat);
    // deterministic tests run idleTtlMs = 0 → TimeMode.None
    val timeMode = if (idleTtlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    alerts
      .withWatermark("event_time", "10 seconds")
      .groupByKey(_.key)
      .transformWithState(new CooldownProcessor(cooldownSec * 1000L, idleTtlMs),
        timeMode, OutputMode.Append())
  }
}
