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
  /** No-op: keep the full lineage live. NOT for production iteration
    * (lineage grows per round) — exists so plan audits can explain the
    * per-round shape that `Local`/`Table` would otherwise hide behind a
    * checkpoint scan.
    */
  case object Passthrough extends Materialize {
    def apply(df: DataFrame): DataFrame = df
  }

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
  * Entries are keyed on the session OBJECT through a WeakHashMap (an
  * identityHashCode string key could collide a new session with a stopped
  * one and hand back a DataFrame bound to a dead block manager). NOTE the
  * weak key does NOT make stopped sessions' entries collectable: the
  * cached DataFrames strongly reference their SparkSession
  * (`Dataset.sparkSession`), so the value reaches the key and pins the
  * entry for the JVM lifetime. Growth is therefore bounded by distinct
  * parameterizations per session × sessions per JVM — one session in
  * every shipped main, a handful in the test JVM — not by GC.
  */
object SharedRel {
  import org.apache.spark.sql.SparkSession

  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Any]]())

  private def forSession(spark: SparkSession) = memo.synchronized {
    memo.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, Any]())
  }

  /** Wall-clock seconds spent inside memo-miss `build`s, per session —
    * lets Bench report shared first-builds as their own `shared_build`
    * row instead of charging them to whichever query runs first.
    */
  private val buildSecs = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.atomic.DoubleAdder]())

  def buildSeconds(spark: SparkSession): Double = buildSecs.synchronized {
    Option(buildSecs.get(spark)).map(_.sum()).getOrElse(0.0)
  }

  /** Per-key wall-clock of OUTERMOST memo-miss builds (inner nested builds
    * fold into the triggering key, mirroring the [[buildSecs]] accounting)
    * — the transparency view behind Bench's single `shared_build` row.
    */
  private val buildByKey = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Double]]())

  def buildBreakdown(spark: SparkSession): Seq[(String, Double)] =
    buildByKey.synchronized {
      Option(buildByKey.get(spark)).map { m =>
        import scala.jdk.CollectionConverters._
        m.asScala.toSeq.sortBy(-_._2)
      }.getOrElse(Seq.empty)
    }

  /** Build-nesting depth, per thread: a memo-miss build may itself trigger
    * further memo-miss builds (freezeBaseState's first call builds the
    * nearDupLsh scaffold, etc.), and the OUTER build's wall-clock already
    * contains the inner ones' — adding both would double-count, and Bench
    * would then subtract more than the true build time from the triggering
    * query (masked by its `.max(0.0)`), over-reporting `shared_build`.
    * Only the outermost frame adds to [[buildSecs]].
    */
  private val buildDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  private def timed[A](spark: SparkSession, key: String)(build: => A): A = {
    val depth = buildDepth.get()
    buildDepth.set(depth + 1)
    val t0 = System.nanoTime()
    try {
      val built = build
      if (depth == 0) {
        val secs = (System.nanoTime() - t0) / 1e9
        buildSecs.synchronized {
          buildSecs.computeIfAbsent(spark,
            _ => new java.util.concurrent.atomic.DoubleAdder())
        }.add(secs)
        buildByKey.synchronized {
          buildByKey.computeIfAbsent(spark,
            _ => new java.util.concurrent.ConcurrentHashMap[String, Double]())
        }.merge(key, secs, (a, b) => a + b)
      }
      built
    } finally buildDepth.set(depth)
  }

  /** Memoize-or-build with a get/putIfAbsent double-check instead of
    * computeIfAbsent: a build may itself populate OTHER SharedRel keys
    * (freezeBaseState builds the contamination index, etc.), and a
    * reentrant computeIfAbsent on one ConcurrentHashMap throws "Recursive
    * update" whenever the keys land in the same bin — a hash-dependent
    * landmine. The cost is a possible duplicate build under a concurrent
    * race (one result discarded — value-neutral, both deterministic).
    */
  private def getOrBuild[A](spark: SparkSession, key: String)(build: => A): A = {
    val m = forSession(spark)
    val existing = m.get(key)
    if (existing != null) existing.asInstanceOf[A]
    else {
      val built = timed(spark, key)(build)
      val prev = m.putIfAbsent(key, built)
      (if (prev != null) prev else built).asInstanceOf[A]
    }
  }

  def apply(spark: SparkSession, key: String,
            mat: Materialize)(build: => DataFrame): DataFrame = mat match {
    case Materialize.Local => getOrBuild(spark, key)(Materialize.Local(build))
    case m => m(build)
  }

  /** Once-per-session SIDE-EFFECT scaffold (e.g. writing a topic dir a
    * query then reads back): `build` runs on the first call for `key`, its
    * result is memoized, and its cost lands in [[buildSeconds]] so Bench
    * charges it to the `shared_build` row — the query's own timed window
    * then measures the mechanism the query is about, not setup I/O.
    */
  def once[A](spark: SparkSession, key: String)(build: => A): A =
    getOrBuild(spark, key)(build)
}
