package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-user sessionization — the gap-based grouping a user-activity stream
  * (the `events` table is exactly that) needs for dashboard analytics.
  *
  * Two tiers:
  *  - batch ([[sessionize]]): the classic gaps-and-islands formulation —
  *    lag → new-session flag → running sum as session id → group. Fully
  *    deterministic, exact DuckDB oracle.
  *  - streaming: Spark's native `session_window(event_time, gap)` (see
  *    [[graft.streaming.DashboardStreams.sessionStream]]) — merging
  *    event-time windows with watermark-bounded state.
  *
  * Scale: one hash-shuffle on user_id (window partition = the session key);
  * session state per key is a single row of lag state in batch, and the
  * open-window set bounded by the watermark in streaming.
  */
object Sessions {

  /** Batch sessionize over validated readings (`sec` event time, `user_id`
    * key). A row starts a new session when it is the user's first or
    * follows a gap > `gapSec`.
    */
  def sessionize(valid: DataFrame, gapSec: Long = 1800): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val prev = lag(col("sec"), 1).over(w)
    val newSession = when(
      prev.isNull || unix_timestamp(col("sec")) - unix_timestamp(prev) > gapSec, 1
    ).otherwise(0)
    valid
      .withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("sec")).as("session_start"),
        max(col("sec")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("cpm")).as("sum_cpm"))
  }

  /** Oracle mirror of [[sessionize]] over the validated-readings SQL. */
  def sessionizeSql(validatedSql: String, gapSec: Long = 1800): String =
    s"""SELECT user_id, session_id,
       |  min(sec) AS session_start, max(sec) AS session_end,
       |  count(*) AS n_events, CAST(sum(cpm) AS BIGINT) AS sum_cpm
       |FROM (
       |  SELECT user_id, sec, cpm,
       |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM (
       |    SELECT user_id, event_id, sec, cpm,
       |      CASE WHEN prev_sec IS NULL
       |             OR epoch(sec)::BIGINT - epoch(prev_sec)::BIGINT > $gapSec
       |           THEN 1 ELSE 0 END AS is_new
       |    FROM (
       |      SELECT user_id, event_id, sec, cpm,
       |        LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_sec
       |      FROM ($validatedSql) WHERE status = 'valid')))
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin
}
