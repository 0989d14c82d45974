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
}
