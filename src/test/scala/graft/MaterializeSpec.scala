package graft

import java.nio.file.Files

import graft.functions.{TextOps, VectorOps}

/** The Materialize strategy switch: Local (executor-local checkpoint, the
  * single-node default) vs Table (parquet round-trip, the fault-tolerant
  * cluster posture). Consumers must produce identical results through both.
  */
class MaterializeSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("Table materialization writes parquet rounds and preserves the relation") {
    val dir = Files.createTempDirectory("graft-mat").toString
    val mat = Materialize.Table(dir)
    val df = spark.range(10).toDF("id")
    assert(rows(mat(df)) == rows(df))
    assert(rows(mat(df.selectExpr("id * 2 AS id"))) == rows(df.selectExpr("id * 2 AS id")))
    // one subdir per materialization — iterating consumers don't clobber
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("mat-")) == 2)
  }

  test("dupClusters through the Table path matches the Local path") {
    // the iterating consumer: banded signatures + incidence + one
    // materialization per propagation round all flow through the strategy
    val dir = Files.createTempDirectory("graft-mat-cc").toString
    val local = TextOps.dupClusters(spark, sf())
    val table = TextOps.dupClusters(spark, sf(), mat = Materialize.Table(dir))
    assert(rows(table) == rows(local))
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("mat-")))
  }

  test("kmeansStep through the Table path matches the Local path") {
    val dir = Files.createTempDirectory("graft-mat-km").toString
    val local = VectorOps.kmeansStep(spark, sf())
    val table = VectorOps.kmeansStep(spark, sf(), mat = Materialize.Table(dir))
    assert(rows(table) == rows(local))
  }

  test("SharedRel memoizes per key for Local and never caches Table materializations") {
    var builds = 0
    def build(): org.apache.spark.sql.DataFrame = {
      builds += 1
      import spark.implicits._
      Seq((1L, "x")).toDF("id", "v")
    }
    val k = s"spec-${System.nanoTime()}" // unique per run: the memo is session-global
    val a = SharedRel(spark, k, Materialize.Local)(build())
    val b = SharedRel(spark, k, Materialize.Local)(build())
    assert(builds == 1, "same (session, key) must reuse the materialized build")
    assert(a.collect().toSeq == b.collect().toSeq)
    assert(SharedRel(spark, k + "|other", Materialize.Local)(build()) ne a)
    assert(builds == 2, "a different key must build")
    // Table is caller-owned output, not a cache: every call must build
    val dir = Files.createTempDirectory("graft-sharedrel").toString
    SharedRel(spark, k, Materialize.Table(dir))(build())
    SharedRel(spark, k, Materialize.Table(dir))(build())
    assert(builds == 4, "Table materializations must never be memoized")
  }

  test("training loops run through the Table path: identical output, objective intact") {
    // the r7 carry-over: kmeansTrain / pqTrainCodebook hard-coded
    // localCheckpoint — on a cluster one lost executor killed a training
    // run. Both must take the strategy and produce identical state.
    val dir = Files.createTempDirectory("graft-mat-train").toString
    val (cLocal, objLocal) = VectorOps.kmeansTrain(spark, sf(), k = 4, iters = 2)
    val (cTable, objTable) = VectorOps.kmeansTrain(spark, sf(), k = 4, iters = 2,
      mat = Materialize.Table(s"$dir/km"))
    assert(rows(cTable) == rows(cLocal))
    // objectives are floating-point SUMS: partition/order differences
    // between the two materialization strategies can shift the last bits,
    // so compare with tolerance (the centroid rows above stay exact)
    // RELATIVE tolerance: objectives are data-magnitude sums, so a fixed
    // absolute 1e-9 would flake on larger fixtures for the very
    // reassociation error it exists to tolerate
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a))
    assert(objTable.size == objLocal.size &&
      objTable.zip(objLocal).forall { case (a, b) => close(a, b) },
      s"objectives diverged: $objTable vs $objLocal")
    objTable.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-9 * math.max(1.0, math.abs(a)))
      case _ =>
    }

    val (bLocal, trLocal) = VectorOps.pqTrainCodebook(spark, sf(), blocks = 2, k = 4, iters = 2)
    val (bTable, trTable) = VectorOps.pqTrainCodebook(spark, sf(), blocks = 2, k = 4, iters = 2,
      mat = Materialize.Table(s"$dir/pq"))
    assert(rows(bTable) == rows(bLocal))
    assert(trTable.size == trLocal.size &&
      trTable.zip(trLocal).forall { case (ta, tb) =>
        ta.size == tb.size &&
          ta.zip(tb).forall { case (a, b) => close(a, b) }
      }, s"trace diverged: $trTable vs $trLocal")
    assert(new java.io.File(s"$dir/km").listFiles().exists(_.getName.startsWith("mat-")))
  }

  test("SharedRel key inventory matches the PLANS shared_build contract, and every call site's key is extractable") {
    // the shared_build contract (PLANS.md, r19): every SharedRel key must
    // have >= 2 consuming queries or be demoted inline. The rule itself is
    // reviewed per key; THIS pin makes key ADDITION/REMOVAL a deliberate
    // act — a new key fails here until the PLANS key table names its
    // consumers and this set is updated in the same commit.
    import scala.jdk.CollectionConverters._
    val srcDir = java.nio.file.Paths.get("src/main/scala/graft")
    assume(java.nio.file.Files.isDirectory(srcDir), "runs from the repo root")
    val call = """(?s)SharedRel(?:\.once)?\(.{0,200}?s"([a-z0-9-]+)\|""".r
    // every call site, whether or not its key literal is extractable —
    // `SharedRel.buildSeconds(` etc. don't match (no `(` after the name)
    val callSite = """SharedRel(?:\.once)?\(""".r
    val walk = java.nio.file.Files.walk(srcDir)
    val keys =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { p =>
          val text = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          val sites = callSite.findAllMatchIn(text).size
          val extracted = call.findAllMatchIn(text).map(_.group(1)).toSeq
          // FAIL-CLOSED (r19 ADVICE → r20 prescription 3): a call whose key
          // the extractor can't see (helper-assembled, >200 chars away, not
          // an s"key|..." literal) would otherwise escape the inventory pin
          // SILENTLY. Convention: every SharedRel call writes its key as an
          // inline s"name|..." literal at the call site.
          assert(sites == extracted.size,
            s"$p has $sites SharedRel call sites but only ${extracted.size} " +
              s"extractable s\"key|...\" literals — every call must inline " +
              s"its key so the inventory pin can see it")
          extracted
        }.toSet
      finally walk.close()
    assert(keys == MaterializeSpec.pinnedSharedRelKeys,
      s"SharedRel key inventory drifted — update the PLANS 'shared_build " +
        s"contract' key table (naming >= 2 consumers for any new key) and " +
        s"this pin together: extra=${(keys -- MaterializeSpec.pinnedSharedRelKeys).toSeq.sorted} " +
        s"missing=${(MaterializeSpec.pinnedSharedRelKeys -- keys).toSeq.sorted}")
  }

  test("committed bench artifacts' shared_build_detail keys all parse to pinned inventory names") {
    // r20 prescription 5: the contract has three legs (bench artifact,
    // PLANS key table, the source-grep pin above) but nothing asserted
    // they AGREE — a key present in a committed BENCH_LOCAL*.json must
    // strip (at the first '|') to a name in the pinned inventory, or the
    // artifact is recording shared work the contract doesn't govern.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val artifacts = Seq("BENCH_LOCAL.json", "BENCH_LOCAL_PERMUTED.json",
      "BENCH_LOCAL_MIN.json")
      .map(java.nio.file.Paths.get(_))
      .filter(java.nio.file.Files.exists(_))
    assume(artifacts.nonEmpty, "runs from a repo root with committed bench artifacts")
    artifacts.foreach { p =>
      val root = mapper.readTree(java.nio.file.Files.readAllBytes(p))
      val detail = root.get("shared_build_detail")
      if (detail != null) {
        import scala.jdk.CollectionConverters._
        val prefixes = detail.fieldNames().asScala.map(_.split('|').head).toSet
        val rogue = prefixes -- MaterializeSpec.pinnedSharedRelKeys
        assert(rogue.isEmpty,
          s"$p records shared_build keys outside the pinned inventory: " +
            s"${rogue.toSeq.sorted} — either the key was renamed without " +
            s"updating the pin or the artifact is stale")
      }
    }
  }

  test("external-relation ANN operators refuse a mismatched codebook loudly") {
    import spark.implicits._
    // codebook trained with blocks=2 fed to a blocks=4 query must throw,
    // not silently null every adc_score (ADVICE r7)
    val (book2, _) = VectorOps.pqTrainCodebook(spark, sf(), blocks = 2, k = 4, iters = 1)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    intercept[IllegalArgumentException] {
      VectorOps.annRecallPqWith(spark, sf(), book2, blocks = 4)
    }
    // centroid relation missing cn: same contract
    val badCents = Seq((0, Seq(1.0, 0.0))).toDF("centroid_id", "cv")
    intercept[IllegalArgumentException] {
      VectorOps.annIvfMultiWith(e, badCents, nQueries = 2, kNn = 2, nProbe = 1)
    }
  }
}

object MaterializeSpec {
  /** The shared_build contract's key inventory (PLANS.md "shared_build
    * contract (round 19)") — ONE copy, consumed by both the source-grep
    * inventory pin and the committed-artifact cross-check above.
    */
  val pinnedSharedRelKeys: Set[String] = Set(
    // derived-relation keys (SharedRel.apply)
    "prepared", "readings", "minhash-banded", "minhashpairs", "jacpairs",
    "shingle-pairs", "dupcc", "dupspans", "spancuts",
    "lshsweep", "bm25idx", "contam", "decontam", "curate", "curatebase",
    "wordcounts",
    "dsir", "lm2", "nbpred", "bloombits", "bloomprobe", "ivf", "ivfsim",
    "kmtrained", "pq", "knng", "semcc", "marginexact", "staleedges",
    "stalehits", "neardup", "anngraph", "anngraphf", "phash", "afp",
    "vframes", "annhits", "knnexact", "margpairs",
    // once-scaffold keys (SharedRel.once)
    "bloomsplit", "powertop", "topics", "incrstate", "incrbase")
}
