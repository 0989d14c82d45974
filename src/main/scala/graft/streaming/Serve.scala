package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicReference

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S9 — the serving fold. The reference fans the normal + critical topics
  * out to dashboard clients over WebSocket (`backend/main.py:52-71`,
  * consumer loop `:84-101` tagging each record with `data_priority`), and
  * accepts `POST /api/playback_speed` to republish the speed to the config
  * topic (`:40-50`). SURVEY §2.1 maps the WS presentation layer out of
  * engine scope; this is the thin runnable analog that closes the gap:
  *
  *  - the routed streams fold into a bounded in-memory [[Snapshot]] from
  *    inside the pipeline's own `foreachBatch` epoch (same records, same
  *    tagging);
  *  - a JDK `com.sun.net.httpserver` endpoint serves the snapshot to
  *    polling clients and accepts the playback-speed POST, feeding the
  *    SAME `AtomicReference` the S4 dynamic replay reads
  *    ([[graft.sources.Ingest.dynamicRateReplay]]) — so the reference's
  *    full control loop (client → backend → config → producer pace) is
  *    runnable end to end.
  *
  * Push-vs-poll delta, documented not hidden: a WS push holds no history,
  * so the poll side keeps the most recent `cap` records per priority —
  * the same bounded-buffer contract as the dashboard's keep-last-N alert
  * view (D3). Within a micro-batch record order is arbitrary (distributed
  * collect), exactly as the reference's per-consumer arrival order is.
  */
object Serve {

  /** Bounded, thread-safe latest-records buffer per priority. */
  final class Snapshot(val cap: Int = 100) {
    private val normal = new java.util.ArrayDeque[String]()
    private val critical = new java.util.ArrayDeque[String]()
    private var lastEpoch = Long.MinValue

    /** Claim an epoch for folding. foreachBatch is at-least-once, and while
      * the parquet sinks absorb a retried epoch idempotently (epoch-
      * partitioned overwrite), a snapshot push does not — a retry would
      * serve every record twice. Epoch ids are monotone, so "already at or
      * below the high-water mark" = already folded (or abandoned mid-fold:
      * for a lossy latest-N dashboard view, dropping a half-pushed retry
      * beats double-serving it).
      */
    def beginEpoch(id: Long): Boolean = synchronized {
      if (id <= lastEpoch) false else { lastEpoch = id; true }
    }

    private def push(q: java.util.ArrayDeque[String], rows: Iterable[String]): Unit =
      synchronized {
        rows.foreach { r => q.addLast(r); if (q.size > cap) q.removeFirst() }
      }
    def pushNormal(rows: Iterable[String]): Unit = push(normal, rows)
    def pushCritical(rows: Iterable[String]): Unit = push(critical, rows)
    def counts: (Int, Int) = synchronized((normal.size, critical.size))

    /** One JSON document of both buffers (members are already JSON objects). */
    def toJson: String = synchronized {
      import scala.jdk.CollectionConverters._
      s"""{"normal":[${normal.asScala.mkString(",")}],""" +
        s""""critical":[${critical.asScala.mkString(",")}]}"""
    }
  }

  /** Collect up to `snap.cap` records of a routed micro-batch as JSON,
    * tagged with `data_priority` exactly like the reference consumer
    * (backend/main.py:91-95). The limit bounds the driver collect — the
    * snapshot keeps at most `cap` anyway.
    */
  private def batchJson(df: DataFrame, priority: String, cap: Int): Seq[String] =
    df.select(to_json(struct(
        df.columns.map(col) :+ lit(priority).as("data_priority"): _*)).as("j"))
      .limit(cap)
      .collect().map(_.getString(0)).toSeq

  /** The epoch hook: fold one routed micro-batch into the snapshot. Wire
    * it into the pipeline via `RadiationPipeline.run(..., onEpoch = ...)`
    * — it then runs inside the SAME foreachBatch epoch as the sinks, so
    * served records are exactly the delivered ones. Idempotent per epoch
    * ([[Snapshot.beginEpoch]]): a foreachBatch retry must not double-push.
    */
  def foldEpoch(r: RadiationPipeline.Routed, snap: Snapshot, epochId: Long): Unit = {
    // Materialize BOTH collects before claiming the epoch: the collects are
    // the dominant failure source, and claiming first would let a failure
    // between the two pushes permanently drop this epoch's critical records
    // (the high-water mark skips the foreachBatch retry). With the claim
    // taken after, it covers only the cheap in-memory pushes.
    val n = batchJson(r.normal, "normal", snap.cap)
    val c = batchJson(r.critical, "critical", snap.cap)
    if (snap.beginEpoch(epochId)) {
      snap.pushNormal(n)
      snap.pushCritical(c)
    }
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  /** Minimal HTTP analog of the reference backend: GET `/api/snapshot`
    * (the poll-side WS stand-in) and POST `/api/playback_speed`
    * (backend/main.py:43-50 — updates the shared speed reference and
    * forwards to `onSpeed`, the config-topic publish hook). Port 0 binds
    * an ephemeral port; read it back via `getAddress.getPort`.
    */
  def http(snap: Snapshot, speed: AtomicReference[java.lang.Double],
           port: Int = 0, onSpeed: Double => Unit = _ => ()): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    srv.createContext("/api/snapshot", (ex: HttpExchange) =>
      respond(ex, 200, snap.toJson))
    srv.createContext("/api/playback_speed", (ex: HttpExchange) => {
      val req = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      """"playback_speed"\s*:\s*([-+0-9.eE]+)""".r.findFirstMatchIn(req)
        .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption) match {
        case Some(v) =>
          speed.set(v)
          onSpeed(v)
          respond(ex, 200, s"""{"playback_speed":$v}""")
        case None =>
          respond(ex, 400, """{"error":"playback_speed required"}""")
      }
    })
    srv.start()
    srv
  }
}
