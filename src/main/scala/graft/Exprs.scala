package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column expressions used across operators.
  *
  * Everything here is built from codegen'd Spark built-ins AND is exactly
  * reproducible in ANSI SQL (DuckDB) so the driver's differential oracle can
  * check any query that uses these. No UDFs.
  */
object Exprs {

  /** Deterministic 60-bit hash of a string via the md5 hex prefix.
    *
    * Portable across engines: Spark `conv(substring(md5(x),1,15),16,10)`
    * equals DuckDB `('0x' || substr(md5(x),1,15))::BIGINT`. 15 hex chars =
    * 60 bits, always non-negative and inside Long range.
    */
  def hex60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL-side rendering of [[hex60]] for DuckDB oracles. */
  def hex60Sql(expr: String): String =
    s"(('0x' || substr(md5($expr),1,15))::BIGINT)"

  /** Event-time truncated to the second — the reference's cohort key
    * (`flink_process.py:298-308` keys windows by the wall-clock second).
    * Second precision also sidesteps the parquet ns-vs-us precision gap
    * between Spark (µs) and DuckDB (ns) readers.
    */
  def sec(ts: Column): Column = date_trunc("second", ts)

  /** Text normalization used by all text operators: lowercase, collapse
    * whitespace runs, trim.
    */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  def normTextSql(expr: String): String =
    s"trim(regexp_replace(lower($expr), '\\s+', ' ', 'g'))"
}
