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
