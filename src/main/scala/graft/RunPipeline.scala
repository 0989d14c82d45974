package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Readings
import graft.streaming.RadiationPipeline

/** Executable end-to-end streaming demo — the Spark analog of the
  * reference's `flink_process.py:main` wired to its `data_provider`:
  * replay the events table as radiation-shaped JSON records through a file
  * stream, run the full parse → validate → dedup → cohort-window → route
  * pipeline, and report the three sink counts.
  *
  * Usage: runMain graft.RunPipeline [sfDir] [workDir]
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val workDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipeline").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // producer side: events → radiation-record JSON files (the offline
    // stand-in for the Kafka topic; Ingest.rateReplay is the paced variant)
    val readings = Readings.readings(spark, sfDir)
    readings.select(to_json(struct(
        date_format(col("sec"), "yyyy-MM-dd HH:mm:ss").as("captured_time"),
        col("lat").as("latitude"),
        col("lon").as("longitude"),
        col("value"),
        col("unit"),
        (col("event_id") * 0L).as("ingestion_timestamp"))).as("value"))
      .write.mode(SaveMode.Overwrite).text(s"$workDir/in")

    // consumer side: file stream → full pipeline → three parquet sinks
    val raw = spark.readStream
      .schema("value STRING")
      .text(s"$workDir/in")
      .toDF("value")
    // S7 debug sink behind the demo: GRAFT_CONSOLE=1 echoes the validated
    // stream to stdout beside the real sinks (reference print(), py:393-394)
    val console = sys.env.get("GRAFT_CONSOLE").filter(_ == "1").map { _ =>
      RadiationPipeline.debugConsole(
        RadiationPipeline.validate(RadiationPipeline.parse(raw)))
    }
    val q = RadiationPipeline.run(raw, s"$workDir/out", s"$workDir/ckpt",
      Readings.Thresholds(danger = 400.0))
    q.awaitTermination(300000)
    console.foreach { c => c.processAllAvailable(); c.stop() }

    val counts = Seq("normal-data", "critical-data", "dirty-data").map { t =>
      val n = try spark.read.parquet(s"$workDir/out/$t").count() catch { case _: Throwable => 0L }
      s""""$t":$n"""
    }
    println(s"""{"pipeline":"radiation","sf":"$sfDir",${counts.mkString(",")}}""")
    spark.stop()
  }
}
