package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 1-second event-time cohort window (SURVEY.md §2.4 W3/W4).
  *
  * Flink form: `key_by(second-string)` → `TumblingEventTimeWindows.of(1s)` →
  * `TemporalOrderingProcessor` buffers the pane and re-emits every element
  * annotated with `temporal_batch_size` / `timestamp_key` /
  * `temporal_ordering:"compliant"` (`flink_process.py:23-54, 298-316`).
  *
  * Spark form: because the event time IS the truncated second (SURVEY §2.4
  * "semantic quirk"), `groupBy(window(ts,"1 second"))` ≡ grouping by the
  * second itself. Batch annotation = an analytic `count(*)` over the cohort —
  * no per-pane buffering, no collect_list materialization needed for the
  * batch form. The streaming form (watermark + window) lives in
  * [[graft.streaming.RadiationPipeline]].
  */
object CohortWindow {

  /** Per-cohort aggregate: the flagship "per 1-second cohort" query
    * (SURVEY.md §7.3). Input: validated readings (valid rows only).
    */
  def cohortAgg(valid: DataFrame): DataFrame =
    valid.groupBy(col("sec"))
      .agg(
        count(lit(1)).as("n"),
        max(col("cpm")).as("max_cpm"),
        sum(col("critical").cast("int")).as("n_critical")
      )

  /** Row-preserving batch annotation (W4): every element re-emitted with its
    * cohort size. `timestamp_key` mirrors the reference's string key
    * (`flink_process.py:304-306`).
    */
  def annotate(valid: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("sec"))
    valid
      .withColumn("temporal_batch_size", count(lit(1)).over(w))
      .withColumn("timestamp_key", date_format(col("sec"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("temporal_ordering", lit("compliant"))
  }
}
