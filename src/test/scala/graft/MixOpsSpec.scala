package graft

import org.apache.spark.sql.functions._
import graft.functions.{MixOps, TextOps, VectorOps}

/** Semantic properties of the corpus-composition operators — the invariants
  * the DuckDB hash-compare cannot state (it only proves Spark == oracle).
  */
class MixOpsSpec extends SparkSuite {

  test("shardPack: shards are contiguous prefixes of the walk and respect the budget") {
    val budget = 2000L
    val df = MixOps.shardPack(spark, sf("sf0.01"), budget = budget).cache()
    val n = Tables.documents(spark, sf("sf0.01")).count()
    assert(df.count() == n, "every document is assigned to exactly one shard")

    val shards = df.groupBy("shard_id").agg(sum("tok").as("stok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxTok = df.agg(max("tok")).head().getInt(0).toLong
    val lastShard = shards.keys.max
    // shard ids form a dense range 0..last (holds while no single doc
    // exceeds the budget — true of the testdata)
    assert(maxTok < budget && shards.keySet == (0L to lastShard).toSet)
    // a shard spans cumulative range [k*budget, (k+1)*budget): its total is
    // the budget ± the boundary documents' overshoot, i.e. within one
    // max-size document of the budget on either side
    shards.filter(_._1 != lastShard).foreach { case (id, t) =>
      assert(t > budget - maxTok && t < budget + maxTok, s"shard $id total $t")
    }
    df.unpersist()
  }

  test("manifestIncr: delta strictly appends — base assignments and closed shards untouched") {
    val dir = sf("sf0.01")
    val budget = 500L
    val asg = MixOps.incrAssignments(spark, dir, budget = budget).cache()
    val base = asg.filter(!col("from_delta"))
    val delta = asg.filter(col("from_delta"))
    assert(base.count() > 0 && delta.count() > 0,
      "both chains must contribute survivors at sf0.01")

    // append contract: every delta doc's offset starts at or after the
    // base's total token count — the delta can top up the open shard and
    // extend past it, but can never land inside a closed base shard
    val baseTok = base.agg(sum("tok")).head().getLong(0)
    assert(delta.agg(min("off")).head().getLong(0) >= baseTok,
      "a delta doc landed below the base high-water offset")

    // closed base shards are row-identical in the merged manifest: the
    // delta pass changed NOTHING below the open shard, and every closed
    // shard carries zero delta docs
    val openShard = baseTok / budget
    val merged = MixOps.manifestIncr(spark, dir, budget = budget)
      .filter(col("shard_id") < openShard).collect()
    assert(merged.forall(_.getLong(7) == 0L),
      "a closed base shard absorbed delta docs")
    val baseOnly = base.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
        expr("bit_xor(cast(conv(substring(md5(text_out), 1, 15), 16, 10) as bigint))")
          .as("checksum"))
      .filter(col("shard_id") < openShard)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val mergedMap = merged
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(mergedMap == baseOnly,
      "merged manifest diverged from the base-only build on a closed shard")
    asg.unpersist()
  }

  test("freezeBaseState/applyDeltaFrom: the persisted-state delta pass reproduces manifestIncr") {
    val dir = sf("sf0.01")
    val state = java.nio.file.Files.createTempDirectory("graft-incr-state").toString
    // phase 1 (yesterday): build the base and persist the frozen state
    MixOps.freezeBaseState(spark, dir, state)
    // phase 2 (today): ONLY the delta chain runs, against the persisted
    // relations; the merged manifest must be row-identical to the
    // oracle-checked single-query operator
    val fromState = MixOps.applyDeltaFrom(spark, dir, state)
      .collect().map(_.toSeq).toSeq
    val oneQuery = MixOps.manifestIncr(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(fromState == oneQuery,
      "persisted-state increment diverged from the in-session operator")
    assert(fromState.exists(r => r.last.asInstanceOf[Long] > 0L),
      "the delta pass must have appended docs")
  }

  test("applyDeltaFrom plan: base assignments are never read — only tiny frozen relations") {
    val dir = sf("sf0.01")
    val state = java.nio.file.Files.createTempDirectory("graft-incr-plan").toString
    MixOps.freezeBaseState(spark, dir, state)
    val inputs = MixOps.applyDeltaFrom(spark, dir, state).inputFiles
    // the corpus-size relation in the state dir is the assignments map —
    // the delta pass must plan around it, touching only the broadcast-size
    // frozen relations + the base manifest
    assert(!inputs.exists(_.contains("/assignments/")),
      "the delta pass opened the base corpus map")
    assert(inputs.exists(_.contains("/manifest")) &&
      inputs.exists(_.contains("/hashes")) &&
      inputs.exists(_.contains("/mix_stats")),
      s"expected frozen-state reads, got: ${inputs.toSeq.take(5)}")
  }

  test("manifestIncr degenerate split: an empty base drops every delta doc, loudly empty") {
    // deltaMod = 1 hashes EVERY doc into the delta: the frozen base state
    // is empty, so every delta source is unseen (no frozen mix rate) and
    // the conservative gate drops everything — the operator must return an
    // empty manifest, not crash on empty aggregates/cutoffs
    val m = MixOps.manifestIncr(spark, sf("sf0.01"), deltaMod = 1)
    assert(m.count() == 0,
      "an empty frozen base must admit no delta docs (unseen-source rule)")
  }

  test("corpusBuild: written shards respect the budget and the manifest matches the files") {
    val budget = 2000L
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    MixOps.corpusBuild(spark, sf("sf0.01"), budget = budget)
      .write.mode("overwrite").partitionBy("shard_id").parquet(out)
    val manifest = MixOps.shardManifest(spark, sf("sf0.01"), budget = budget)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(manifest.nonEmpty)

    // the written files ARE the manifest: per-shard doc count, token count
    // and content checksum recomputed from disk must match row-exactly
    // partitionBy infers the partition column back as Int — cast to match
    val back = spark.read.parquet(out)
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
        expr("bit_xor(cast(conv(substring(md5(text_out), 1, 15), 16, 10) as bigint))")
          .as("checksum"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(back == manifest, "manifest diverged from the written shard files")

    // budget compliance: every shard except the last lands within one
    // max-size document of the budget (the prefix-walk contract), and the
    // id range is dense — no phantom or skipped shards
    val toks = spark.read.parquet(out).agg(max("tok")).head().getLong(0)
    val last = manifest.keys.max
    assert(manifest.keySet == (0L to last).toSet)
    manifest.filter(_._1 != last).foreach { case (id, (_, t, _)) =>
      assert(t > budget - toks && t < budget + toks, s"shard $id total $t")
    }
    // survivors only: the build is a strict subset of the corpus that kept
    // every gate's survivors (sanity against an accidental pass-through)
    val nAll = Tables.documents(spark, sf("sf0.01")).count()
    val nBuilt = manifest.values.map(_._1).sum
    assert(nBuilt > 0 && nBuilt < nAll, s"built $nBuilt of $nAll")
  }

  test("corpusBuild temperature stage: flattens the SURVIVOR mix, dedup-then-sample order") {
    val plain = MixOps.corpusBuild(spark, sf("sf0.01")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val tb = 100L
    val flat = MixOps.corpusBuild(spark, sf("sf0.01"), tempBudget = Some(tb))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // the stage SELECTS from the survivor set — never invents docs
    val plainIds = plain.map(_._1).toSet
    assert(flat.nonEmpty && flat.forall(d => plainIds.contains(d._1)),
      "temperature stage emitted a doc the default build dropped")
    // per-source kept counts equal the α=½ integer-math targets computed
    // over SURVIVOR counts (not the raw table — the stage order contract)
    val nSrc = plain.groupBy(_._2).map { case (s, a) => s -> a.length.toLong }
    val wSum = nSrc.values.map(n => math.sqrt(n.toDouble).toLong).sum
    val kept = flat.groupBy(_._2).map { case (s, a) => s -> a.length.toLong }
    nSrc.foreach { case (s, n) =>
      val target = math.min(n, tb * math.sqrt(n.toDouble).toLong / wSum)
      assert(kept.getOrElse(s, 0L) == target,
        s"source $s: kept ${kept.getOrElse(s, 0L)}, target $target (n=$n)")
    }
    // flattening property: no source exceeds its α=½ share, so the head
    // source's share of the flat mix is at most its share of the survivors
    val head = nSrc.maxBy(_._2)._1
    assert(kept(head).toDouble / flat.length <=
      nSrc(head).toDouble / plain.length + 1e-9,
      "head source gained share under temperature flattening")
  }

  test("mixRebalance: kept share per source tracks the target weight") {
    val kept = MixOps.mixRebalance(spark, sf("sf0.01")).cache()
    val before = Tables.documents(spark, sf("sf0.01"))
      .groupBy("source").agg(count(lit(1)).as("n_before"))
    val after = kept.groupBy("source", "w").agg(count(lit(1)).as("n_kept"))
    val joined = after.join(before, Seq("source")).collect()
    joined.foreach { r =>
      val (w, nKept, nBefore) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(nKept <= nBefore)
      // weight-4 sources are over target (fraction 1 ⇒ kept everything)
      if (w == 4) assert(nKept == nBefore, s"w=4 source ${r.getString(0)}")
    }
    // the rebalanced mixture is skewed toward high weights: average kept
    // fraction strictly increases with w
    val fracByW = joined.groupBy(_.getInt(1)).map { case (w, rs) =>
      w -> rs.map(r => r.getLong(2).toDouble / r.getLong(3)).sum / rs.size
    }
    assert(fracByW(1) < fracByW(2) && fracByW(2) < fracByW(3) && fracByW(3) <= fracByW(4))
    kept.unpersist()
  }

  test("qualityTiers: thirds per language, ordered by score") {
    val df = MixOps.qualityTiers(spark, sf("sf0.01")).cache()
    // tier sizes within a language differ by at most 1
    df.groupBy("lang").pivot("tier", Seq("head", "middle", "tail"))
      .agg(count(lit(1))).collect().foreach { r =>
        val sizes = Seq(1, 2, 3).map(i => if (r.isNullAt(i)) 0L else r.getLong(i))
        assert(sizes.max - sizes.min <= 1, s"lang ${r.getString(0)} sizes $sizes")
      }
    // within a language, every head score >= every tail score
    val byLang = df.groupBy("lang").agg(
      min(when(col("tier") === "head", col("quality_score"))).as("min_head"),
      max(when(col("tier") === "tail", col("quality_score"))).as("max_tail"))
    byLang.collect().foreach { r =>
      if (!r.isNullAt(1) && !r.isNullAt(2))
        assert(r.getDouble(1) >= r.getDouble(2), s"lang ${r.getString(0)}")
    }
    df.unpersist()
  }

  test("capPerSource: hard cap of K per source, dense hash-order ranks") {
    val k = 15
    val df = MixOps.capPerSource(spark, sf("sf0.01"), k).cache()
    val per = df.groupBy("source").agg(count(lit(1)).as("n"), max("rnk").as("mx"))
    per.collect().foreach { r =>
      assert(r.getLong(1) <= k && r.getLong(1) == r.getInt(2).toLong, s"row $r")
    }
    // sources smaller than K keep everything; larger ones keep exactly K
    val before = Tables.documents(spark, sf("sf0.01"))
      .groupBy("source").agg(count(lit(1)).as("nb"))
    per.join(before, Seq("source")).collect().foreach { r =>
      assert(r.getLong(1) == math.min(k.toLong, r.getLong(3)))
    }
    df.unpersist()
  }

  test("epochUpsample: copy count equals the tier's epoch factor") {
    val ups = MixOps.epochUpsample(spark, sf("sf0.01")).cache()
    val perDoc = ups.groupBy("doc_id", "tier", "n_epochs")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("mx"), min("copy_idx").as("mn"))
    perDoc.collect().foreach { r =>
      val want = r.getString(1) match {
        case "head" => 3; case "middle" => 2; case _ => 1
      }
      assert(r.getInt(2) == want && r.getLong(3) == want &&
        r.getInt(4) == want && r.getInt(5) == 1, s"row $r")
    }
    // every quality-tiered doc appears; none invented
    assert(perDoc.count() == MixOps.qualityTiers(spark, sf("sf0.01")).count())
    ups.unpersist()
  }

  test("winnow: every w-window is covered and selections are real shingle minima") {
    val w = 4
    val fps = TextOps.winnow(spark, sf("sf0.01"), w).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(2)).sorted).toMap
    val nShingles = Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"),
        (size(split(Exprs.normText(col("text")), " ")) - 2).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    fps.foreach { case (docId, positions) =>
      val n = nShingles(docId)
      assert(positions.head <= w - 1 && positions.last >= n - w,
        s"doc $docId: selection must reach both ends")
      positions.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(1) - pair(0) <= w,
          s"doc $docId: gap ${pair(0)}->${pair(1)} violates the winnowing coverage guarantee")
      }
      assert(positions.forall(p => p >= 0 && p < n))
    }
    // density lands near the theoretical 2/(w+1)
    val total = fps.values.map(_.length).sum.toDouble
    val shingleTotal = fps.keys.toSeq.map(nShingles).sum.toDouble
    val density = total / shingleTotal
    assert(density > 1.2 / (w + 1) && density < 3.0 / (w + 1), s"density $density")
  }

  test("semanticDedup: drop decisions are justified and representatives are kept") {
    val t = 0.4
    val dropped = MixOps.semanticDedup(spark, sf("sf0.01"), threshold = t).cache()
    val pairs = VectorOps.nearDupLsh(spark, sf("sf0.01"), threshold = t)
      .select(col("id_a"), col("id_b"), col("cos_sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val rows = dropped.collect().map(r => (r.getLong(0), r.getLong(1)))
    val droppedIds = rows.map(_._1).toSet
    rows.foreach { case (docId, dupOf) =>
      assert(dupOf < docId, "representative has the smaller id")
      assert(pairs.exists(p => p._1 == dupOf && p._2 == docId && p._3 >= t),
        s"drop of $docId justified by a >=$t pair with $dupOf")
      // dup_of is the SMALLEST qualifying partner
      val minPartner = pairs.filter(_._2 == docId).map(_._1).min
      assert(dupOf == minPartner)
    }
    // no doc is dropped without appearing as an id_b in the pair list
    assert(droppedIds == pairs.map(_._2).toSet)
    dropped.unpersist()
  }

  test("packChunks: offsets tile the token line exactly; chunk spans match") {
    val seqLen = 64L
    val df = MixOps.packChunks(spark, sf("sf0.001"), seqLen = seqLen).cache()
    val rows = df.select("tok", "off", "first_chunk", "last_chunk", "n_chunks")
      .collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(_._2)
    // concatenation is gapless and non-overlapping: each doc starts where
    // the previous one ended, and the walk covers every token exactly once
    rows.foldLeft(0L) { case (expectedOff, (tok, off, _, _, _)) =>
      assert(off == expectedOff, s"offset gap at $off (expected $expectedOff)")
      off + tok
    }
    // chunk span is pure integer arithmetic off the offsets
    rows.foreach { case (tok, off, first, last, n) =>
      assert(first == off / seqLen)
      assert(last == (off + tok - 1) / seqLen)
      assert(n == last - first + 1)
    }
    // a doc longer than seqLen must straddle; total chunks = ceil(total/len)
    val total = rows.map(_._1).sum
    assert(rows.last._4 == (total - 1) / seqLen, "last chunk covers the final token")
    df.unpersist()
  }
}
