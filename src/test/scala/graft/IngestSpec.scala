package graft

import graft.sources.Ingest

/** Ingestion-side coverage: CSV → canonical keyed records + counters. */
class IngestSpec extends SparkSuite {
  import spark.implicits._

  test("csv ingest: projection, composite key, null-row filter, counters") {
    val tmp = java.nio.file.Files.createTempDirectory("ingest").toString
    val csv =
      """Captured Time,Latitude,Longitude,Value,Unit
        |2011-03-15 10:00:00,35.6,139.7,42.0,cpm
        |2011-03-15 10:00:01,35.7,139.8,120.5,cpm
        |,,,,
        |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/in.csv"), csv)
    val (df, obs) = Ingest.readCsv(spark, s"$tmp/in.csv")
    val rows = df.collect()
    assert(rows.length == 2, "fully-null row dropped (P1)")
    val keys = rows.map(_.getAs[String]("key")).sorted
    assert(keys.head == "35.60000|139.70000|42.00|2011-03-15 10:00:00|cpm")
    assert(obs.get("total_rows") == 2L)
    // keyed sink round-trips
    Ingest.writeKeyed(df, s"$tmp/out")
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.columns.toSet == Set("key", "value"))
    assert(back.count() == 2)
  }

  test("rate replay builds a valid throttled streaming plan") {
    val data = Seq((1, "a"), (2, "b")).toDF("id", "payload")
    val stream = Ingest.rateReplay(spark, data, rowsPerSecond = 10)
    assert(stream.isStreaming)
    assert(stream.columns.toSet == Set("id", "payload"))
  }

  test("dynamic replay: speed changes rescale the per-batch row allocation") {
    import java.util.concurrent.atomic.AtomicReference
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = spark.range(1000).toDF("id")
    val speed = new AtomicReference[java.lang.Double](1.0)
    val sent = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val ticks = MemoryStream[Long]
    val q = Ingest.dynamicRateReplay(
      ticks.toDF().select($"value".as("__tick")), data,
      rowsPerSecond = 5, ticksPerSecond = 10,
      speed = () => speed.get(),
      send = df => sent.synchronized {
        sent += df.select("id").collect().map(_.getLong(0)).sorted.toSeq
      })
    // 10 ticks at speed 1.0 → 10 × 5 × 1.0 / 10 = 5 rows: [0, 5)
    ticks.addData(0L until 10L: _*)
    q.processAllAvailable()
    // the listener analog: a config update doubles the speed mid-stream
    speed.set(2.0)
    // 10 ticks at speed 2.0 → 10 rows from the cursor: [5, 15)
    ticks.addData(10L until 20L: _*)
    q.processAllAvailable()
    q.stop()
    assert(sent.toSeq == Seq(0L until 5L, 5L until 15L))
  }

  test("speed listener tracks the latest playback_speed update") {
    import java.util.concurrent.atomic.AtomicReference
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val speed = new AtomicReference[java.lang.Double](1.0)
    val control = MemoryStream[Double]
    val q = Ingest.speedListener(
      control.toDF().select($"value".as("playback_speed")), speed)
    control.addData(0.5, 3.0)
    q.processAllAvailable()
    q.stop()
    assert(speed.get() == 3.0)
  }
}
