package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed first-occurrence deduplication — the Spark form of the reference's
  * `DeduplicateProcessFunction` (`flink_process.py:265-277`: ValueState
  * "seen" per composite key, first record wins, state never expires).
  *
  * Three tiers (SURVEY.md §2.3 D1):
  *  - [[keepFirst]]          — batch, fully deterministic (oracle-checkable):
  *                             min-by-order row per key via row_number.
  *  - `df.dropDuplicates`    — batch, arbitrary survivor (what the reference
  *                             actually guarantees under races).
  *  - streaming              — `dropDuplicatesWithinWatermark` in
  *                             [[graft.streaming.RadiationPipeline]]; bounds
  *                             the reference's unbounded state (SURVEY §7.5).
  *
  * Scale note: keepFirst is one hash-shuffle on the key (window partition);
  * at 100 TB the key must be high-cardinality (it is: a composite natural
  * key) and AQE handles residual skew. No driver-side state.
  */
object Dedup {

  /** Keep the first row per key, ordered by `order` (ties impossible when
    * `order` ends in a unique id). Equivalent oracle:
    * `ROW_NUMBER() OVER (PARTITION BY key ORDER BY order) = 1`.
    */
  def keepFirst(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
