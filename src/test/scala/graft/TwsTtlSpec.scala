package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{AlertCooldown, AlertCooldownTws, FunnelStream, FunnelStreamTws, QuotaStream, QuotaStreamTws}

/** The TTL-ON path of the three `transformWithState` twins — the branch the
  * deterministic twin-parity specs never execute (they run `TimeMode.None`).
  * Store-managed TTL is the mechanism that bounds state at 100 TB, so each
  * test drives a real-clock ProcessingTime query with a short TTL and
  * asserts the BEHAVIORAL consequence of eviction: quota consumption
  * resets, a funnel restarts from stage 1, a cooldown key re-emits. Each
  * test also pins the pre-expiry behavior in the same run (state alive →
  * old answer), so a regression in either direction — TTL never evicting,
  * or state never persisting — fails.
  *
  * Harness note: in `TimeMode.ProcessingTime` the query triggers
  * continuously even with no data (that is HOW the store advances its TTL
  * clock), so `processAllAvailable` — which waits for an idle stream —
  * never returns. Progress is asserted by POLLING the memory sink with a
  * deadline instead; `eventuallyRows` failing its deadline is the test
  * failing. Wall-clock cost: TTL 2 s + one ~4 s idle sleep per test — the
  * documented price of exercising a wall-clock store feature (`TTLConfig`
  * has no manual clock).
  */
class TwsTtlSpec extends SparkSuite {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private def onRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  // TTL must comfortably exceed per-batch latency (RocksDB batches run
  // ~0.5-2 s here): a 2 s TTL flaked by expiring BETWEEN two back-to-back
  // data batches, making the alive-state assertion see evicted state
  private val TtlMs = 5000L
  private val IdleMs = 8000L // sleep past TTL with a 3 s margin

  /** Poll the memory sink until it holds `n` rows (the ProcessingTime
    * analog of processAllAvailable); deadline miss = assertion failure
    * with the rows seen so far.
    */
  private def eventuallyRows(name: String, n: Long, timeoutMs: Long = 60000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var cnt = spark.table(name).count()
    while (cnt < n && System.currentTimeMillis() < deadline) {
      Thread.sleep(200)
      cnt = spark.table(name).count()
    }
    assert(cnt == n, s"sink $name: expected $n rows within ${timeoutMs}ms, saw $cnt")
  }

  /** Several trigger cycles in which a suppressed row COULD have surfaced —
    * the negative-assertion settle window.
    */
  private def settle(): Unit = Thread.sleep(1500)

  test("QuotaStreamTws TTL: an exhausted quota resets after idle expiry") {
    onRocksDb {
      val in = MemoryStream[QuotaStream.QDoc]
      val q = QuotaStreamTws(in.toDS(), quota = 100L, resetTtlMs = TtlMs)
        .writeStream.format("memory").queryName("ttl_quota_t")
        .outputMode("append").start()
      try {
        def doc(id: Long) =
          QuotaStream.QDoc(id, "src0", tok = 80L, new Timestamp(1300000000000L + id))
        in.addData(doc(1))
        eventuallyRows("ttl_quota_t", 1) // 80/100 consumed
        in.addData(doc(2))
        eventuallyRows("ttl_quota_t", 2) // state alive: 160 > 100 → rejected
        Thread.sleep(IdleMs)             // > TTL: store evicts the idle state
        in.addData(doc(3))
        eventuallyRows("ttl_quota_t", 3) // evicted → restarted at 0 → admitted
        val fits = spark.table("ttl_quota_t").as[QuotaStream.Decision]
          .collect().sortBy(_.doc_id).map(d => d.doc_id -> d.admitted).toSeq
        assert(fits == Seq(1L -> true, 2L -> false, 3L -> true),
          s"expected alive-state rejection then post-TTL reset, got $fits")
      } finally q.stop()
    }
  }

  test("FunnelStreamTws TTL: an idle user's funnel restarts from stage 1") {
    onRocksDb {
      val in = MemoryStream[FunnelStream.Activity]
      val q = FunnelStreamTws(in.toDS(), idleTtlMs = TtlMs)
        .writeStream.format("memory").queryName("ttl_funnel_t")
        .outputMode("append").start()
      try {
        def act(ts: String) = FunnelStream.Activity(7L, "view", Timestamp.valueOf(ts))
        in.addData(act("2011-03-15 10:00:00"))
        eventuallyRows("ttl_funnel_t", 1) // stage-1 hit; state = stage 1 done
        in.addData(act("2011-03-15 10:00:01"))
        settle()                          // state alive: a 2nd "view" is NOT
                                          // stage 2 → nothing may surface
        assert(spark.table("ttl_funnel_t").count() == 1,
          "live funnel state wrongly re-admitted a repeated stage-1 event")
        Thread.sleep(IdleMs)
        in.addData(act("2011-03-15 10:00:02"))
        eventuallyRows("ttl_funnel_t", 2) // evicted → fresh funnel → stage 1
        val hits = spark.table("ttl_funnel_t").as[FunnelStream.StageHit]
          .collect().map(h => (h.stage, h.event_time.toString)).sorted.toSeq
        assert(hits == Seq(
          (1, "2011-03-15 10:00:00.0"),
          (1, "2011-03-15 10:00:02.0")),
          s"expected a restarted funnel after TTL eviction, got $hits")
      } finally q.stop()
    }
  }

  test("AlertCooldownTws TTL: an idle key's cooldown state is dropped by the store") {
    onRocksDb {
      val in = MemoryStream[AlertCooldown.Alert]
      // TTL == 2x cooldown — the minimum the operator's guard admits
      val q = AlertCooldownTws(in.toDS(), cooldownSec = 1, idleTtlMs = TtlMs)
        .writeStream.format("memory").queryName("ttl_cooldown_t")
        .outputMode("append").start()
      try {
        def alert(ts: String) = AlertCooldown.Alert(
          key = "warning|1.000|2.000", severity = "warning", lat = 1, lon = 2,
          value = 60, event_time = Timestamp.valueOf(ts))
        in.addData(alert("2011-03-15 10:00:00"))
        eventuallyRows("ttl_cooldown_t", 1) // emits; lastEmit = 10:00:00
        in.addData(alert("2011-03-15 10:00:00.500"))
        settle()                            // inside the 1 s cooldown → suppressed
        assert(spark.table("ttl_cooldown_t").count() == 1,
          "live cooldown state failed to suppress an in-window duplicate")
        Thread.sleep(IdleMs)
        in.addData(alert("2011-03-15 10:00:00.600"))
        eventuallyRows("ttl_cooldown_t", 2) // state evicted by TTL → emits even
                                            // though event time is in-window
        val times = spark.table("ttl_cooldown_t").as[AlertCooldown.Alert]
          .collect().map(_.event_time.toString).sorted.toSeq
        assert(times == Seq("2011-03-15 10:00:00.0", "2011-03-15 10:00:00.6"),
          s"expected suppressed-then-re-emitted after TTL eviction, got $times")
      } finally q.stop()
    }
  }

  test("AlertCooldownTws guard refuses a TTL shorter than 2x the cooldown") {
    val in = MemoryStream[AlertCooldown.Alert]
    val e = intercept[IllegalArgumentException] {
      AlertCooldownTws(in.toDS(), cooldownSec = 30, idleTtlMs = 1000L)
    }
    assert(e.getMessage.contains("mid-window"))
  }
}
