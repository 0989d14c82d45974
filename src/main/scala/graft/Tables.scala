package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All operators take a scale-factor directory so the same plan runs from
  * sf0.001 smoke data up to a 100 TB production layout — the parquet reader
  * path is the only thing that changes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType. Reading it with an explicit LongType schema yields
    * epoch-nanos and needs no session conf (works under any driver session);
    * [[graft.operators.Readings]] converts with integer arithmetic.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every table as a temp view (plus the engine's SQL functions)
    * so the full surface is reachable through `spark.sql(...)` — the
    * engine's SQL front door: `registerAll(spark, dir);
    * spark.sql("SELECT dot_product(a.embedding, b.embedding) ...")`.
    * `events` registers through the nanos-safe schema above — never
    * register it via a raw parquet read.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings")
      .foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
    graft.plans.GraftExtensions.register(spark)
  }
}
