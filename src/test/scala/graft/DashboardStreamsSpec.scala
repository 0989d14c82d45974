package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{DashboardStreams, RadiationPipeline}

/** Streaming dashboard aggregations + SQL extension registration. */
class DashboardStreamsSpec extends SparkSuite {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def rec(ct: String, v: Double, lat: Double = 35.6): String =
    s"""{"captured_time": "$ct", "latitude": $lat, "longitude": 139.7, "value": $v, "unit": "cpm", "ingestion_timestamp": 1}"""

  test("streaming stats window aggregates level histogram and mean") {
    val in = MemoryStream[String]
    val valid = RadiationPipeline.validate(RadiationPipeline.parse(in.toDF()))
      .filter(col("status") === "valid" && col("event_time").isNotNull)
    val q = DashboardStreams.statsStream(valid)
      .writeStream.format("memory").queryName("stats_t").outputMode("append").start()
    in.addData(
      rec("2011-03-15 10:00:00", 10),   // low
      rec("2011-03-15 10:00:01", 120),  // moderate
      rec("2011-03-15 10:00:02", 1500), // high + critical
      rec("2011-03-15 10:10:00", 1))    // watermark pusher
    q.processAllAvailable()
    val r = spark.table("stats_t")
      .where(col("window_start") === "2011-03-15 10:00:00").head()
    q.stop()
    assert(r.getAs[Long]("total_points") == 3)
    assert(r.getAs[Long]("n_low") == 1 && r.getAs[Long]("n_moderate") == 1 &&
           r.getAs[Long]("n_high") == 1)
    assert(r.getAs[Long]("dangerous_points") == 1)
    assert(math.abs(r.getAs[Double]("average_radiation") - (10 + 120 + 1500) / 3.0) < 1e-9)
  }

  test("streaming stats in update mode emit revisions while the window is open") {
    // the dashboard's live behavior: the open window's aggregate is
    // re-emitted per micro-batch instead of held until the watermark
    val in = MemoryStream[String]
    val valid = RadiationPipeline.validate(RadiationPipeline.parse(in.toDF()))
      .filter(col("status") === "valid" && col("event_time").isNotNull)
    val q = DashboardStreams.statsStream(valid)
      .writeStream.format("memory").queryName("stats_u").outputMode("update").start()
    in.addData(rec("2011-03-15 10:00:00", 10))
    q.processAllAvailable()
    in.addData(rec("2011-03-15 10:00:01", 120))
    q.processAllAvailable()
    val revisions = spark.table("stats_u")
      .where(col("window_start") === "2011-03-15 10:00:00")
      .select("total_points").as[Long].collect().sorted
    q.stop()
    // two micro-batches → two revisions of the same open window: 1 then 2
    assert(revisions.toSeq == Seq(1L, 2L))
  }

  test("streaming geo grid: max cpm per cell per window") {
    val in = MemoryStream[String]
    val valid = RadiationPipeline.validate(RadiationPipeline.parse(in.toDF()))
      .filter(col("status") === "valid" && col("event_time").isNotNull)
    val q = DashboardStreams.geoGridStream(valid)
      .writeStream.format("memory").queryName("geo_t").outputMode("append").start()
    in.addData(
      rec("2011-03-15 10:00:00", 10, lat = 35.6),
      rec("2011-03-15 10:00:01", 99, lat = 35.7),   // same 0.5° cell
      rec("2011-03-15 10:00:02", 50, lat = 44.0),   // different cell
      rec("2011-03-15 10:10:00", 1))
    q.processAllAvailable()
    val rows = spark.table("geo_t")
      .where(col("window_start") === "2011-03-15 10:00:00")
      .select("cell_lat", "max_cpm", "n_points")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    q.stop()
    assert(rows.toSeq == Seq((71L, 99, 2L), (88L, 50, 1L)))
  }

  test("streaming geo zoom pyramid: coarse cells merge what fine cells keep apart") {
    val in = MemoryStream[String]
    val valid = RadiationPipeline.validate(RadiationPipeline.parse(in.toDF()))
      .filter(col("status") === "valid" && col("event_time").isNotNull)
    val q = DashboardStreams.geoZoomStream(valid, maxZoom = 2)
      .writeStream.format("memory").queryName("geoz_t").outputMode("append").start()
    in.addData(
      rec("2011-03-15 10:00:00", 10, lat = 33.5), // zoom2 (1°) cell 33, zoom0 (4°) cell 8
      rec("2011-03-15 10:00:01", 99, lat = 34.5), // zoom2 cell 34, zoom0 cell 8
      rec("2011-03-15 10:10:00", 1))              // watermark pusher
    q.processAllAvailable()
    val rows = spark.table("geoz_t")
      .where(col("window_start") === "2011-03-15 10:00:00")
      .select("zoom", "cell_lat", "max_cpm", "n_points")
      .as[(Int, Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    q.stop()
    // zoom 0 (4° cells): one cell holds both points; zoom 2 (1° cells):
    // the points separate and each keeps its own max
    assert(rows.filter(_._1 == 0).map(r => (r._2, r._3, r._4)).toSeq == Seq((8L, 99, 2L)))
    assert(rows.filter(_._1 == 2).map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((33L, 10, 1L), (34L, 99, 1L)))
  }

  test("stream-stream interval join: alerts pick up same-cell readings inside the horizon") {
    val in = MemoryStream[String]
    val valid = RadiationPipeline.validate(RadiationPipeline.parse(in.toDF()))
      .filter(col("status") === "valid" && col("event_time").isNotNull)
    val q = DashboardStreams.alertFollowStream(valid)
      .writeStream.format("memory").queryName("af_t").outputMode("append").start()
    in.addData(
      rec("2011-03-15 10:00:00", 150, lat = 35.6), // the alert (>= 100)
      rec("2011-03-15 10:00:10", 20, lat = 35.7),  // same 0.5° cell, +10 s → joins
      rec("2011-03-15 10:00:30", 30, lat = 35.6),  // same cell, +30 s → joins
      rec("2011-03-15 10:01:30", 40, lat = 35.6),  // +90 s: outside horizon
      rec("2011-03-15 10:00:10", 50, lat = 44.0),  // different cell
      rec("2011-03-15 10:20:00", 1))               // watermark pusher
    q.processAllAvailable()
    val rows = spark.table("af_t")
      .select("cell_lat", "alert_cpm", "read_cpm")
      .as[(Long, Int, Int)].collect().sortBy(_._3)
    q.stop()
    assert(rows.toSeq == Seq((71L, 150, 20), (71L, 150, 30)),
      s"interval join emitted $rows")
  }

  test("streaming session window groups by gap and closes on watermark") {
    val in = MemoryStream[String]
    val valid = RadiationPipeline.validate(RadiationPipeline.parse(in.toDF()))
      .filter(col("status") === "valid" && col("event_time").isNotNull)
      .withColumn("user_key", round(col("lat"), 1)) // stand-in session key
    val q = graft.streaming.DashboardStreams.sessionStream(valid, gap = "1 minute")
      .writeStream.format("memory").queryName("sess_t").outputMode("append").start()
    in.addData(
      rec("2011-03-15 10:00:00", 10),
      rec("2011-03-15 10:00:30", 20),   // same session (gap < 1 min)
      rec("2011-03-15 10:05:00", 30),   // new session (4.5 min gap)
      rec("2011-03-15 11:00:00", 1))    // watermark pusher closes both
    q.processAllAvailable()
    val rows = spark.table("sess_t")
      .select("session_start", "n_events").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).sortBy(_._1)
    q.stop()
    assert(rows.toSeq == Seq(
      ("2011-03-15 10:00:00.0", 2L),
      ("2011-03-15 10:05:00.0", 1L)))
  }

  test("S7 console sink tails the validated stream without error") {
    val in = MemoryStream[String]
    val valid = RadiationPipeline.validate(RadiationPipeline.parse(in.toDF()))
      .filter(col("status") === "valid")
    val q = RadiationPipeline.debugConsole(valid, numRows = 5)
    in.addData(rec("2011-03-15 10:00:00", 10), rec("2011-03-15 10:00:01", 20))
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()
    assert(progress.sink.description.toLowerCase.contains("console"))
    assert(progress.numInputRows == 2)
  }

  test("active alerts view: ≤5 alerts, severity TTL (15/10/7 s) on event time") {
    import java.sql.Timestamp
    import graft.streaming.AlertCooldown.Alert
    val dir = java.nio.file.Files.createTempDirectory("graft-alerts").toString
    val in = MemoryStream[Alert]
    def alert(k: String, sec: Int, sev: String = "critical"): Alert =
      Alert(k, sev, 35.6, 139.7, 1500, Timestamp.valueOf(f"2011-03-15 10:00:$sec%02d"))
    def runEpoch(): Unit = {
      val q = DashboardStreams.activeAlertsView(in.toDF(),
        s"$dir/out", s"$dir/ckpt", maxActive = 5)
      q.awaitTermination(60000)
    }
    // 7 distinct critical alerts inside one TTL window → cap wins, newest 5
    in.addData((0 to 6).map(i => alert(s"k$i", i)))
    runEpoch()
    val after1 = spark.read.parquet(s"$dir/out").select("key").as[String].collect().sorted
    assert(after1.toSeq == Seq("k2", "k3", "k4", "k5", "k6"))
    // horizon jumps to sec 30: a critical at 18 (12 s old, TTL 15) stays,
    // a warning at 18 (TTL 10) expires, every sec≤6 alert is long gone
    in.addData(alert("c18", 18), alert("w18", 18, sev = "warning"), alert("k30", 30))
    runEpoch()
    val after2 = spark.read.parquet(s"$dir/out").select("key").as[String].collect().sorted
    assert(after2.toSeq == Seq("c18", "k30"))
  }

  test("S9 serving fold: epoch hook fills the snapshot; HTTP serves it and accepts speed POST") {
    import graft.streaming.Serve
    val dir = java.nio.file.Files.createTempDirectory("graft_serve").toString
    def full(ct: String, v: Double, lat: Double = 35.6): String =
      s"""{"captured_time": "$ct", "latitude": $lat, "longitude": 139.7, "value": $v, "unit": "cpm", "ingestion_timestamp": 1}"""
    val in = MemoryStream[String]
    in.addData(
      full("2011-03-15 10:00:00", v = 42),   // normal
      full("2011-03-15 10:00:00", v = 1500), // critical
      full("2011-03-15 10:10:00", v = 7))    // watermark pusher
    val snap = new Serve.Snapshot(cap = 10)
    val q = RadiationPipeline.run(in.toDF(), s"$dir/out", s"$dir/ckpt",
      graft.operators.Readings.Thresholds(),
      onEpoch = Serve.foldEpoch(_, snap, _))
    q.awaitTermination(60000)
    val (n, c) = snap.counts
    assert(n == 1 && c == 1, s"snapshot counts ($n, $c)")
    // served JSON carries the reference's data_priority tagging
    assert(snap.toJson.contains(""""data_priority":"critical""""))
    assert(snap.toJson.contains(""""data_priority":"normal""""))

    val speed = new java.util.concurrent.atomic.AtomicReference[java.lang.Double](1.0)
    var forwarded = Seq.empty[Double]
    val srv = Serve.http(snap, speed, onSpeed = v => forwarded :+= v)
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      def get(u: String) = new String(
        java.net.URI.create(u).toURL.openConnection().getInputStream.readAllBytes(), "UTF-8")
      val body = get(s"$base/api/snapshot")
      assert(body.startsWith("""{"normal":[""") && body.contains("critical"))
      val post = java.net.URI.create(s"$base/api/playback_speed").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      post.setRequestMethod("POST"); post.setDoOutput(true)
      post.getOutputStream.write("""{"playback_speed": 0.5}""".getBytes("UTF-8"))
      assert(new String(post.getInputStream.readAllBytes(), "UTF-8").contains("0.5"))
      assert(speed.get == 0.5 && forwarded == Seq(0.5))
      // malformed POST refuses with 400, exactly one update forwarded
      val bad = java.net.URI.create(s"$base/api/playback_speed").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      bad.setRequestMethod("POST"); bad.setDoOutput(true)
      bad.getOutputStream.write("""{"nope": 1}""".getBytes("UTF-8"))
      assert(bad.getResponseCode == 400 && forwarded.size == 1)
    } finally srv.stop(0)
  }

  test("GraftExtensions registers dot_product for SQL") {
    // getOrCreate reuses the suite session, so exercise the live-session path
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }
}
