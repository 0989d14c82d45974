package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Queries execute through the
  * `noop` sink so the full plan runs (a bare `count()` can collapse to scan
  * metadata and under-measure); a warmup query absorbs JVM/codegen start-up
  * so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // A failed query reports -1 (never a near-zero elapsed that would read
    // as a speedup) and the process exits nonzero after the JSON line.
    // SharedRel first-builds (banded signature tables, IVF assignments)
    // are SUBTRACTED from the query that happened to trigger them and
    // accumulated into one explicit `shared_build` row — otherwise the
    // artifact charges shared infrastructure to whichever query runs first
    // alphabetically (the attribution instability behind the r8-r10
    // phantom "ANN drift"; see PLANS.md "Bench attribution rule").
    def execute(name: String): Double = {
      // drain garbage from the previous query before timing: back-to-back
      // queries otherwise hand each other a nearly-full heap and a random
      // victim pays a multi-second full-GC inside its measured window
      System.gc()
      val b0 = SharedRel.buildSeconds(spark)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val elapsed = (System.nanoTime() - t0) / 1e9
        (elapsed - (SharedRel.buildSeconds(spark) - b0)).max(0.0)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
    }

    // warmup: JIT + codegen + parquet footer caches (not reported)
    execute("q1_pricing")

    // optional args = subset of query names (dev loop); driver passes none.
    // SPARK_GRAFT_BENCH_REPS > 1 reports the per-query MEDIAN of N runs —
    // the drift-diagnosis protocol (e_resample r8/r9, ANN r9/r10) as a
    // knob instead of hand-rolled repetition; default 1 keeps the driver
    // contract unchanged. Malformed values fall back to 1 rather than
    // crash the run; even N averages the two middle runs (true median).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1")
      .toIntOption.getOrElse(1).max(1)
    def measured(n: String): Double =
      if (reps <= 1) execute(n)
      else {
        val ts = Seq.fill(reps)(execute(n))
        if (ts.exists(_ < 0)) -1.0
        else {
          val s = ts.sorted
          if (reps % 2 == 1) s(reps / 2)
          else (s(reps / 2 - 1) + s(reps / 2)) / 2.0
        }
      }
    val names =
      if (args.nonEmpty) args.toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_BENCH_SEED deterministically permutes EXECUTION order
    // (report order stays name-sorted): alphabetical runs always hand the
    // same victims the same neighbors, so adjacency effects (GC pressure,
    // page-cache shape — the q_ntile / ANN sagas) look like plan drift.
    // Two runs under different seeds separate the two in one diff. Unset =
    // sorted order, the unchanged driver contract.
    val execOrder = sys.env.get("SPARK_GRAFT_BENCH_SEED").flatMap(_.toLongOption) match {
      case Some(seed) => new scala.util.Random(seed).shuffle(names)
      case None => names
    }
    val resultsByName = execOrder.map(n => n -> measured(n)).toMap
    val results0 = names.map(n => n -> resultsByName(n))
    val failed = results0.collect { case (k, v) if v < 0 => k }
    // shared infrastructure as its own timed row (full runs only — a dev
    // subset would misattribute builds its queries didn't trigger)
    val results =
      if (args.isEmpty) results0 :+ ("shared_build" ->
        math.round(SharedRel.buildSeconds(spark) * 1000) / 1000.0)
      else results0
    // Per-query budget rule: at sf0.1 any query over the budget must carry
    // a PLANS.md justification row (a `name` backtick-reference in the
    // "Per-query bench budget" section); violations land in the JSON so
    // the verdict can gate on them. Missing PLANS.md = everything flagged.
    val budgetSec = 5.0
    val justified: Set[String] = {
      val p = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_PLANS", "PLANS.md"))
      if (!java.nio.file.Files.exists(p)) Set.empty
      else {
        val text = new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        val section = text.split("(?m)^## ").find(_.startsWith("Per-query bench budget"))
        // only a list item LEADING with the backticked name is a
        // justification row — a name merely mentioned in prose (or tokens
        // like `shared_build`) must not silently waive the gate
        section.toSeq.flatMap(
          "(?m)^[-*]\\s+`([A-Za-z0-9_]+)`".r.findAllMatchIn(_).map(_.group(1))).toSet
      }
    }
    val overBudget =
      if (!sfDir.contains("sf0.1")) Seq.empty
      else results0.collect {
        case (k, v) if v > budgetSec && !justified(k) => k
      }
    overBudget.foreach(k => System.err.println(
      s"[bench] BUDGET: $k exceeds ${budgetSec}s at sf0.1 with no PLANS.md justification row"))
    // transparency: where the shared_build lump went, largest first —
    // on stderr AND as a `shared_build_detail` object in the JSON line
    // (the driver contract tolerates extra fields; r18 VERDICT #2: the
    // largest bench row must be auditable from the committed artifact,
    // not from a log stream the driver tail truncates). PLANS.md
    // "shared_build contract" holds every key to >= 2 consuming queries.
    val breakdown = SharedRel.buildBreakdown(spark)
    breakdown.foreach { case (k, s) =>
      System.err.println(f"[bench] shared_build detail: $k%-40s ${s}%.2f s")
    }
    // keys are SharedRel-internal strings ("prepared|/root/testdata/..."),
    // escape like sfDir so a path char cannot break the one-line contract
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val detailJson = breakdown
      .map { case (k, s) => "\"" + esc(k) + "\":" + math.round(s * 1000) / 1000.0 }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // sfDir comes from the environment — escape it so a quote/backslash
    // can't break the driver's parse of the one-line JSON contract
    val sfJson = esc(sfDir)
    val budgetJson = overBudget.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"budget_violations":$budgetJson,"shared_build_detail":$detailJson,"sf":"$sfJson"}"""
    println(line)
    // The driver's log tail truncates the head of the line, hiding most
    // per-query timings from round-over-round comparison — so a FULL run
    // (no subset args) also lands the complete JSON in a committed file.
    // Dev-loop subset runs skip the write to keep the file = full runs only.
    if (args.isEmpty) {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
