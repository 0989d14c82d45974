package graft

import org.apache.spark.sql.DataFrame

/** Mid-plan materialization strategy for operators that reuse an expensive
  * subplan across several consumers (LSH signatures, IVF assignments) or
  * iterate over it (connected-components label propagation).
  */
sealed trait Materialize {
  def apply(df: DataFrame): DataFrame
}

object Materialize {

  /** `localCheckpoint(eager = true)`: executor-local blocks. Fastest, and
    * right for single-node and verification runs — but NOT fault-tolerant:
    * on a cluster, losing an executor loses its blocks and fails the query
    * instead of recomputing them.
    */
  case object Local extends Materialize {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
  }

  /** Write to a parquet dir under `dir` (one subdir per materialization)
    * and read back. Survives executor loss — the cluster-scale posture for
    * anything long-running; also gives the re-read plan real parquet
    * statistics and column pruning.
    */
  final case class Table(dir: String) extends Materialize {
    private val n = new java.util.concurrent.atomic.AtomicInteger(0)
    def apply(df: DataFrame): DataFrame = {
      val p = s"$dir/mat-${n.getAndIncrement()}"
      df.write.mode("overwrite").parquet(p)
      df.sparkSession.read.parquet(p)
    }
  }
}

/** Session-scoped memo for DERIVED INDEX relations that several queries
  * share — trained assignments, signature tables, candidate scaffolds.
  * A production deployment stores these once and derives many consumers
  * from them; recomputing + re-materializing the identical deterministic
  * relation inside each query is pure waste, and reuse is value-neutral.
  *
  * Only `Materialize.Local` memoizes — a `Table(...)` materialization is
  * an explicit caller-owned location, not a query cache. Assumes `dir`
  * contents are immutable within a session (the testdata contract).
  * Entries are keyed by session identity and never evicted, but a STOPPED
  * session's localCheckpoint blocks die with its block manager — a stale
  * entry holds only a dead plan handle, so growth is bounded by live
  * parameterizations.
  */
object SharedRel {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def apply(spark: org.apache.spark.sql.SparkSession, key: String,
            mat: Materialize)(build: => DataFrame): DataFrame = mat match {
    case Materialize.Local =>
      memo.computeIfAbsent(
        s"${System.identityHashCode(spark)}|$key", _ => Materialize.Local(build))
    case m => m(build)
  }
}
