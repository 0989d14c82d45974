package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Exprs, Tables}

/** Corpus-composition operators for a training-data pipeline: shard packing
  * by token budget, source-mixture rebalancing, per-language quality tiers,
  * and embedding-cosine semantic dedup of documents.
  *
  * Like the rest of the text/vector suite these are built only from
  * codegen'd Spark built-ins plus the shared [[Exprs.hex60]] hash, and every
  * operator has an exact ANSI-SQL mirror so the driver's DuckDB differential
  * oracle can hash-compare results. Selection decisions use INTEGER
  * comparisons (hash-vs-threshold, rational cross-multiplication), never
  * pow/ln/round — the established cross-engine parity rule.
  */
object MixOps {

  // ---- shard packing by token budget (distributed prefix sum) ----

  /** Assign each document to a training shard of ~`budget` whitespace
    * tokens, walking a deterministic global order (salted hash, then
    * doc_id). The naive formulation — one cumulative-sum window over the
    * whole corpus — degenerates to a SINGLE partition at scale, so this is
    * the two-pass distributed prefix sum instead:
    *
    *   1. bucket each doc by hash prefix (`bucket = h % buckets`); the
    *      global order is (bucket, h, doc_id), so a bucket is a contiguous
    *      range of the walk;
    *   2. per-bucket token totals (tiny: `buckets` rows) → running offsets
    *      via a window over that TINY relation (the only unpartitioned
    *      window, bounded by `buckets`, never by data size);
    *   3. cumulative sum WITHIN each bucket (parallel window, `buckets`-way)
    *      plus the broadcast bucket offset = the global prefix sum;
    *   4. `shard_id = tokens_before DIV budget`.
    *
    * At 100 TB: `buckets` sized so one bucket's docs fit an executor
    * (e.g. 10k buckets), the offsets relation stays driver-trivial, and no
    * stage ever sees the corpus in one partition.
    */
  /** The shared distributed prefix sum: given (doc_id, tok, …), walk the
    * deterministic global order (salted hash, then doc_id) and emit each
    * row's running token offset `off` — per-bucket cumulative windows run
    * `buckets`-way parallel, the only unpartitioned window is over the
    * `buckets`-row totals relation, offsets come back as a broadcast join.
    * The engine under [[shardPack]], [[packChunks]] and [[corpusBuild]].
    */
  private def walkOffsets(d0: DataFrame, buckets: Int): DataFrame = {
    val d = d0
      .withColumn("h", Exprs.hex60(concat(lit("sp:"), col("doc_id").cast("string"))))
      .withColumn("bucket", pmod(col("h"), lit(buckets)))
    val totals = d.groupBy("bucket").agg(sum("tok").as("btok"))
    // window over `buckets` rows — bounded by the parameter, not the data
    val wOff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("boff", coalesce(sum("btok").over(wOff), lit(0L)))
      .select("bucket", "boff")
    val wIn = Window.partitionBy("bucket").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("cum_in", coalesce(sum("tok").over(wIn), lit(0L)))
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("off", col("boff") + col("cum_in"))
  }

  def shardPack(spark: SparkSession, dir: String, buckets: Int = 8,
                budget: Long = 2000L): DataFrame = {
    val d = TextOps.prepared(spark, dir).select(
      col("doc_id"), size(col("words")).cast("long").as("tok"))
    // `div` = exact integer division on BIGINT, mirroring DuckDB `//`
    walkOffsets(d, buckets)
      .withColumn("shard_id", expr(s"off div ${budget}L"))
      .select(col("doc_id"), col("tok").cast("int").as("tok"), col("shard_id"))
      .orderBy("doc_id")
  }

  /** Oracle: the same walk as ONE global window — semantically identical,
    * quadratically simpler to state, and fine at oracle scale.
    */
  def shardPackSql(buckets: Int = 8, budget: Long = 2000L): String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len(words) AS BIGINT) AS tok,
       |         ${Exprs.hex60Sql("'sp:' || doc_id::VARCHAR")} AS h
       |  FROM (${TextOps.preparedSql})),
       |k AS (SELECT *, h % $buckets AS bucket FROM d)
       |SELECT doc_id, CAST(tok AS INT) AS tok,
       |  CAST(COALESCE(SUM(tok) OVER (ORDER BY bucket, h, doc_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |       // $budget AS BIGINT) AS shard_id
       |FROM k ORDER BY doc_id""".stripMargin

  /** Doc → fixed-length training-sequence index map: concatenate the corpus
    * in a deterministic pseudo-random order (the [[shardPack]] bucket walk)
    * and cut it into `seqLen`-token chunks; emit each document's global
    * token offset and the chunk span it lands in. This is the
    * concat-and-chunk step that turns a curated corpus into pretraining
    * sequences — the map a dataloader uses to find which documents feed
    * sequence k, and the packing analytics (how many docs straddle a chunk
    * boundary) come straight off it.
    *
    * Scale shape: identical to [[shardPack]] — per-bucket cumulative
    * windows run `buckets`-way parallel, the only unpartitioned window is
    * over the `buckets`-row totals relation, offsets come back as a
    * broadcast join, and the chunk arithmetic is row-local integer
    * division. No global sort of the corpus at any width.
    */
  def packChunks(spark: SparkSession, dir: String, buckets: Int = 8,
                 seqLen: Long = 512L): DataFrame = {
    val d = TextOps.prepared(spark, dir).select(
      col("doc_id"), size(col("words")).cast("long").as("tok"))
    walkOffsets(d, buckets)
      // tok ≥ 1 always (split of a non-empty norm), so off+tok-1 is the
      // doc's LAST token position and the span is inclusive on both ends
      .withColumn("first_chunk", expr(s"off div ${seqLen}L"))
      .withColumn("last_chunk", expr(s"(off + tok - 1) div ${seqLen}L"))
      .select(col("doc_id"), col("tok").cast("int").as("tok"), col("off"),
        col("first_chunk"), col("last_chunk"),
        (col("last_chunk") - col("first_chunk") + 1).cast("int").as("n_chunks"))
      .orderBy("doc_id")
  }

  /** Oracle: the identical walk as ONE global window (see [[shardPackSql]]). */
  def packChunksSql(buckets: Int = 8, seqLen: Long = 512L): String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len(words) AS BIGINT) AS tok,
       |         ${Exprs.hex60Sql("'sp:' || doc_id::VARCHAR")} AS h
       |  FROM (${TextOps.preparedSql})),
       |k AS (SELECT *, h % $buckets AS bucket FROM d),
       |o AS (
       |  SELECT doc_id, tok,
       |    COALESCE(SUM(tok) OVER (ORDER BY bucket, h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM k)
       |SELECT doc_id, CAST(tok AS INT) AS tok, CAST(off AS BIGINT) AS off,
       |  CAST(off // $seqLen AS BIGINT) AS first_chunk,
       |  CAST((off + tok - 1) // $seqLen AS BIGINT) AS last_chunk,
       |  CAST((off + tok - 1) // $seqLen - off // $seqLen + 1 AS INT) AS n_chunks
       |FROM o ORDER BY doc_id""".stripMargin

  // ---- source-mixture rebalancing ----

  /** Per-source target weight: sources carry a numeric suffix in the
    * testdata (`src0`..`srcN`); weight cycles 1..4 so the target mixture is
    * deliberately skewed. A production pipeline would read (source, weight)
    * from a config relation — the shape (broadcast per-source stats, pure
    * row-local keep decision) is the same.
    */
  private def weightE(src: Column): Column =
    pmod(regexp_extract(src, "([0-9]+)", 1).cast("long"), lit(4)) + lit(1L)

  /** Rebalance the corpus toward a weighted target mixture: source `s` with
    * weight `w_s` should contribute `total * w_s / sum(w)` documents, so
    * each of its docs is kept with probability
    * `f_s = min(1, (total * w_s / sum(w)) / count_s)`, decided by the
    * salted integer hash. The keep predicate is the cross-multiplied
    * rational form
    *
    *   (h % mod) * sum(w) * count_s  <  mod * total * w_s
    *
    * — pure BIGINT comparison, no division, no floats, so re-runs and the
    * DuckDB oracle reproduce the exact selection (and `f_s >= 1` needs no
    * special case: the left side is always < mod * sum(w) * count_s).
    *
    * Scale shape: one tiny groupBy over sources (broadcast back), then a
    * row-local predicate on the corpus scan — zero shuffle of the big side.
    */
  def mixRebalance(spark: SparkSession, dir: String, mod: Int = 1000): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val stats = d.groupBy("source").agg(count(lit(1)).as("cnt"))
      .withColumn("w", weightE(col("source")))
    val tot = stats.agg(sum("cnt").as("total"), sum("w").as("sumw"))
    d.join(broadcast(stats), Seq("source"))
      .crossJoin(broadcast(tot))
      .filter(pmod(Exprs.hex60(concat(lit("mx:"), col("doc_id").cast("string"))), lit(mod))
        * col("sumw") * col("cnt") < lit(mod) * col("total") * col("w"))
      .select(col("doc_id"), col("source"), col("w").cast("int").as("w"))
      .orderBy("doc_id")
  }

  def mixRebalanceSql(mod: Int = 1000): String =
    s"""WITH d AS (SELECT doc_id, source FROM documents),
       |stats AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS cnt,
       |         (regexp_extract(source, '([0-9]+)', 1)::BIGINT % 4) + 1 AS w
       |  FROM d GROUP BY source),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
       |               CAST(sum(w) AS BIGINT) AS sumw FROM stats)
       |SELECT doc_id, source, CAST(w AS INT) AS w
       |FROM d JOIN stats USING (source) CROSS JOIN tot
       |WHERE (${Exprs.hex60Sql("'mx:' || doc_id::VARCHAR")} % $mod) * sumw * cnt
       |      < $mod * total * w
       |ORDER BY doc_id""".stripMargin

  // ---- per-language quality tiers (CCNet-style head/middle/tail) ----

  /** Rank documents within each language by the shared quality score and
    * cut into thirds — the CCNet head/middle/tail partitioning. Tier
    * boundaries use integer cross-multiplication (`rnk * 3 <= n`), not a
    * percent float.
    *
    * SKEW: a per-language `row_number` window puts an entire language on
    * ONE reducer, and AQE cannot split a window partition (skew handling
    * applies to joins only) — with one dominant language that single task
    * IS the job at 100 TB. So the global per-language rank is computed by
    * RANGE partitioning instead:
    *
    *   1. `repartitionByRange` on (lang, quality_score desc, doc_id) — the
    *      rank's own total order, so each range partition holds a
    *      contiguous slice of it and a hot language spans MANY partitions;
    *   2. per-(partition, lang) counts — tiny (`rangeParts × |langs|`
    *      rows, the only driver collect, bounded by parameters not data) —
    *      prefix-summed into the offset each slice starts at;
    *   3. a local `row_number` window keyed by (partition-id, lang) — every
    *      window partition is bounded by a range slice, never a language —
    *      plus the broadcast offset = the exact global rank.
    *
    * Output is row-identical to the single-window formulation (the spec
    * asserts it on a 90%-one-language fixture): ranks derive from the same
    * total order, only the partitioning differs. `mat` pins the ranged
    * relation (consumed by both the counts pass and the rank pass).
    */
  def qualityTiers(spark: SparkSession, dir: String, rangeParts: Int = 32,
                   mat: graft.Materialize = graft.Materialize.Local): DataFrame = {
    import spark.implicits._
    val base = TextOps.prepared(spark, dir).select(
      col("doc_id"), col("lang"), TextOps.qualityScoreE.as("quality_score"))
    val ranged = mat(base
      .repartitionByRange(rangeParts, col("lang"), col("quality_score").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id()))
    // bounded collect: rangeParts × |langs| rows — partition-slice counts,
    // never data. Range order == rank order, so offsets are prefix sums
    // over ascending pid within each lang.
    val slices = ranged.groupBy("pid", "lang").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = slices.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      val byPid = rows.sortBy(_._1)
      val nLang = byPid.map(_._3).sum
      var off = 0L
      byPid.map { case (pid, _, cnt) => val o = off; off += cnt; (pid, lang, o, nLang) }
    }
    val offDf = broadcast(offsets.toDF("pid", "lang", "off", "n_lang_l"))
    val wLocal = Window.partitionBy("pid", "lang")
      .orderBy(col("quality_score").desc, col("doc_id"))
    ranged
      .withColumn("r_local", row_number().over(wLocal))
      .join(offDf, Seq("pid", "lang"))
      .withColumn("rnk", (col("r_local") + col("off")).cast("int"))
      .withColumn("n_lang", col("n_lang_l").cast("int"))
      .withColumn("tier",
        when(col("rnk") * 3 <= col("n_lang"), "head")
          .when(col("rnk") * 3 <= col("n_lang") * 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("n_lang"), col("rnk"),
        col("quality_score"), col("tier"))
      .orderBy("doc_id")
  }

  /** The single-window formulation — the reference implementation the
    * skewed-fixture identity spec checks [[qualityTiers]] against. NOT the
    * production path: one hot language = one reducer.
    */
  private[graft] def qualityTiersWindowed(spark: SparkSession, dir: String): DataFrame = {
    val base = TextOps.prepared(spark, dir).select(
      col("doc_id"), col("lang"), TextOps.qualityScoreE.as("quality_score"))
    val part = Window.partitionBy("lang")
    val w = part.orderBy(col("quality_score").desc, col("doc_id"))
    base
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_lang", count(lit(1)).over(part).cast("int"))
      .withColumn("tier",
        when(col("rnk") * 3 <= col("n_lang"), "head")
          .when(col("rnk") * 3 <= col("n_lang") * 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("n_lang"), col("rnk"),
        col("quality_score"), col("tier"))
      .orderBy("doc_id")
  }

  /** Oracle reuses [[TextOps.qualitySql]] (the ONE score definition) and
    * joins documents back for `lang`. `quality_score` is emitted unrounded
    * on both sides — the double bits match because the arithmetic is
    * identical; `round()` at a representation boundary would not (the
    * d_quality parity rule).
    */
  def qualityTiersSql(): String =
    s"""WITH s AS (
       |  SELECT q.doc_id, d.lang, q.quality_score
       |  FROM (${TextOps.qualitySql}) q
       |  JOIN (SELECT doc_id, lang FROM documents) d ON q.doc_id = d.doc_id),
       |r AS (
       |  SELECT doc_id, lang, quality_score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
       |           ORDER BY quality_score DESC, doc_id) AS INT) AS rnk,
       |    CAST(COUNT(*) OVER (PARTITION BY lang) AS INT) AS n_lang
       |  FROM s)
       |SELECT doc_id, lang, n_lang, rnk, quality_score,
       |  CASE WHEN rnk * 3 <= n_lang THEN 'head'
       |       WHEN rnk * 3 <= n_lang * 2 THEN 'middle' ELSE 'tail' END AS tier
       |FROM r ORDER BY doc_id""".stripMargin

  // ---- exact per-source cap ----

  /** Exact-K cap per source ("at most K documents per domain"): rank each
    * source's docs by a salted hash (uniform order, independent of every
    * other sampler's salt) and keep rank ≤ K — the deterministic
    * reservoir-sample counterpart to [[mixRebalance]]'s probabilistic
    * thresholds, for when the contract is a hard cap, not an expected
    * fraction.
    *
    * SKEW: a per-source window lands a hot source on ONE reducer, and AQE
    * cannot split a window partition. Because only the top-K of a TOTAL
    * order (h, doc_id) survives, the window is two-staged instead:
    * stage 1 spreads each source over `salts` deterministic sub-partitions
    * (hash of row identity — never a nondeterministic salt, the
    * SPARK-23207 rule) and keeps top-K per (source, salt); stage 2 ranks
    * the ≤ `salts × K` survivors per source. Row-identical to the single
    * window: each true global top-K row ranks ≤ K inside its own salt
    * bucket (a sub-order of the total order), so stage 1 never drops it,
    * and every row preceding it also survives, so its stage-2 rank IS its
    * global rank. Hot-source parallelism ×`salts`; stage-2 partitions are
    * bounded by `salts × K` rows, never by the data.
    */
  def capPerSource(spark: SparkSession, dir: String, k: Int = 15,
                   salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val h = Exprs.hex60(concat(lit("cap:"), col("doc_id").cast("string")))
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .withColumn("h", h)
    val pre =
      if (salts == 1) base
      else {
        val w1 = Window.partitionBy("source", "graft_salt")
          .orderBy(col("h"), col("doc_id"))
        base
          .withColumn("graft_salt", pmod(hash(col("doc_id")), lit(salts)))
          .withColumn("r1", row_number().over(w1))
          .filter(col("r1") <= k)
          .drop("graft_salt", "r1")
      }
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    pre
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("source"), col("rnk"))
      .orderBy("doc_id")
  }

  def capPerSourceSql(k: Int = 15): String =
    s"""SELECT doc_id, source, rnk FROM (
       |  SELECT doc_id, source,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY ${Exprs.hex60Sql("'cap:' || doc_id::VARCHAR")}, doc_id) AS INT) AS rnk
       |  FROM documents)
       |WHERE rnk <= $k ORDER BY doc_id""".stripMargin

  // ---- epoch upsampling by quality tier ----

  /** The complement of [[mixRebalance]]'s downsampling: repeat documents by
    * quality tier (head×3, middle×2, tail×1 by default) — the "high-quality
    * data for multiple epochs" training recipe. Emitted as explicit
    * (doc_id, copy_idx) rows so downstream shuffles spread the copies;
    * at 100 TB the explode multiplies rows AFTER the tier shuffle, adding
    * no exchange of its own.
    */
  def epochUpsample(spark: SparkSession, dir: String, head: Int = 3,
                    middle: Int = 2, tail: Int = 1): DataFrame = {
    val epochs = when(col("tier") === "head", head)
      .when(col("tier") === "middle", middle).otherwise(tail)
    qualityTiers(spark, dir)
      .withColumn("n_epochs", epochs)
      .withColumn("copy_idx", explode(sequence(lit(1), col("n_epochs"))))
      .select(col("doc_id"), col("lang"), col("tier"), col("n_epochs"),
        col("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  def epochUpsampleSql(head: Int = 3, middle: Int = 2, tail: Int = 1): String =
    s"""WITH t AS (${qualityTiersSql()}),
       |e AS (
       |  SELECT doc_id, lang, tier,
       |    CASE tier WHEN 'head' THEN $head
       |              WHEN 'middle' THEN $middle ELSE $tail END AS n_epochs
       |  FROM t)
       |SELECT doc_id, lang, tier, CAST(n_epochs AS INT) AS n_epochs,
       |  CAST(c AS INT) AS copy_idx
       |FROM e CROSS JOIN unnest(range(1, n_epochs + 1)) AS u(c)
       |ORDER BY doc_id, copy_idx""".stripMargin

  // ---- embedding-cosine semantic dedup of documents ----

  /** Semantic dedup: a document is dropped when a SMALLER-id document in
    * the same sign-LSH bucket has cosine similarity ≥ `threshold` with it
    * (documents join their embeddings 1:1 on `doc_id = vec_id`). Output is
    * the drop list with the smallest such representative — the per-doc
    * decision a `filter`-style curation step would consume.
    *
    * Scale shape: same as [[VectorOps.nearDupLsh]] — bucket equi-join, no
    * all-pairs; the keep-smallest rule needs only a `min` per dropped doc
    * (one hash agg), not connected components, because "near-dup of
    * ANY smaller id" is already a deterministic decision.
    */
  def semanticDedup(spark: SparkSession, dir: String, threshold: Double = 0.4,
                    bits: Int = 4): DataFrame = {
    val pairs = VectorOps.nearDupLsh(spark, dir, threshold, bits)
    val dropped = pairs.groupBy(col("id_b").as("doc_id"))
      .agg(min(col("id_a")).as("dup_of"))
    dropped.join(Tables.documents(spark, dir).select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("dup_of"), col("source"))
      .orderBy("doc_id")
  }

  def semanticDedupSql(threshold: Double = 0.4, bits: Int = 4): String =
    s"""WITH pairs AS (${VectorOps.nearDupLshSql(threshold, bits)}),
       |dropped AS (
       |  SELECT id_b AS doc_id, CAST(min(id_a) AS BIGINT) AS dup_of
       |  FROM pairs GROUP BY id_b)
       |SELECT doc_id, dup_of, source
       |FROM dropped JOIN documents USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---- end-to-end corpus build: the artifact a training-data team ships ----

  /** The COMPOSED pipeline, one relation: curate (lang/quality/exact-dup/
    * benchmark/contamination/sampling gates) minus embedding-cosine
    * near-duplicates ∩ mixture-rebalance keeps, with per-doc quality tier
    * attached,
    * contaminated spans STRIPPED from the surviving text (token counts are
    * post-decontam), and every survivor placed in a token-budgeted shard
    * by the [[shardPack]] walk. Each stage is the already-oracle-checked
    * operator — this operator is their composition plus the shard
    * placement, the thing `RunDocPipeline` writes to disk.
    *
    * Scale shape: the stage outputs join on doc_id (co-partitioned hash
    * joins; every stage output is narrow), the walk is the bucketed prefix
    * sum, and nothing windows the corpus in one partition. Docs the
    * decontam pass doesn't cover (< 3 words — too short for a shingle)
    * pass through with their raw text/counts.
    */
  def corpusBuild(spark: SparkSession, dir: String, buckets: Int = 8,
                  budget: Long = 500L): DataFrame = {
    val cur = TextOps.curate(spark, dir).filter(col("keep")).select("doc_id")
    // near-dedup = embedding-cosine semantic dedup (exact dedup is already
    // one of curate's gates). NOT the MinHash-CC cluster collapse: on a
    // shared-vocabulary corpus the LSH band graph is near-complete (53k
    // candidate pairs over 500 sf0.01 docs) and one cluster swallows every
    // curated doc — measured: the build degenerated to ONE survivor. The
    // cosine threshold drops true semantic twins and keeps the corpus;
    // both operators stay available standalone, the BUILD composes the one
    // whose selectivity matches a production near-dedup stage.
    val ded = cur.join(
      semanticDedup(spark, dir).select("doc_id"), Seq("doc_id"), "left_anti")
    val mix = mixRebalance(spark, dir).select("doc_id")
    val tiers = qualityTiers(spark, dir).select(col("doc_id"), col("tier"))
    val clean = TextOps.decontamSpans(spark, dir)
      .select(col("doc_id"),
        (col("n_words") - col("n_contam")).as("tok_clean"), col("text_clean"))
    val base = TextOps.prepared(spark, dir).select(
      col("doc_id"), col("source"), col("norm"),
      size(col("words")).cast("long").as("tok_raw"))
    val survivors = base
      .join(ded, "doc_id").join(mix, "doc_id")
      .join(tiers, "doc_id")
      .join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("tier"),
        coalesce(col("tok_clean"), col("tok_raw")).as("tok"),
        coalesce(col("text_clean"), col("norm")).as("text_out"))
    walkOffsets(survivors, buckets)
      .withColumn("shard_id", expr(s"off div ${budget}L"))
      .select(col("doc_id"), col("source"), col("tier"), col("tok"),
        col("shard_id"), col("text_out"))
  }

  /** The manifest relation a consumer trusts the shards by: per shard, doc
    * count, post-decontam token count, tier composition, and an
    * order-independent content checksum (bit_xor of the per-doc text
    * hash). Oracle-checked end to end as `d_shard_manifest` — the SQL
    * recomputes the ENTIRE chain (every gate, the span strip, the walk)
    * and must land on identical manifests, so a drift anywhere in the
    * composition surfaces as a checksum mismatch.
    */
  def shardManifest(spark: SparkSession, dir: String, buckets: Int = 8,
                    budget: Long = 500L): DataFrame =
    corpusBuild(spark, dir, buckets, budget)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok").as("n_tokens"),
        // order-independent content checksum: bit_xor of the per-doc
        // 60-bit text hash (the aggregate form of Exprs.hex60)
        expr("bit_xor(cast(conv(substring(md5(text_out), 1, 15), 16, 10) as bigint))")
          .as("checksum"),
        sum(when(col("tier") === "head", 1L).otherwise(0L)).as("n_head"),
        sum(when(col("tier") === "middle", 1L).otherwise(0L)).as("n_middle"),
        sum(when(col("tier") === "tail", 1L).otherwise(0L)).as("n_tail"))
      .orderBy("shard_id")

  def shardManifestSql(buckets: Int = 8, budget: Long = 500L): String =
    s"""WITH cur AS (SELECT doc_id FROM (${TextOps.curateSql()}) WHERE keep),
       |sdrop AS (SELECT doc_id FROM (${semanticDedupSql()})),
       |ded AS (
       |  SELECT doc_id FROM cur
       |  WHERE NOT EXISTS (SELECT 1 FROM sdrop WHERE sdrop.doc_id = cur.doc_id)),
       |mix AS (SELECT doc_id FROM (${mixRebalanceSql()})),
       |tiers AS (SELECT doc_id, tier FROM (${qualityTiersSql()})),
       |clean AS (SELECT doc_id, n_words - n_contam AS tok_clean, text_clean
       |          FROM (${TextOps.decontamSpansSql()})),
       |base AS (SELECT doc_id, source, norm,
       |                CAST(len(words) AS BIGINT) AS tok_raw
       |         FROM (${TextOps.preparedSql})),
       |s AS (
       |  SELECT base.doc_id, tier,
       |    COALESCE(tok_clean, tok_raw) AS tok,
       |    COALESCE(text_clean, norm) AS text_out,
       |    ${Exprs.hex60Sql("'sp:' || base.doc_id::VARCHAR")} AS h
       |  FROM base JOIN ded USING (doc_id)
       |       JOIN mix USING (doc_id) JOIN tiers USING (doc_id)
       |       LEFT JOIN clean USING (doc_id)),
       |o AS (
       |  SELECT tier, tok, text_out,
       |    COALESCE(SUM(tok) OVER (ORDER BY h % $buckets, h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM s)
       |SELECT CAST(off // $budget AS BIGINT) AS shard_id,
       |  count(*) AS n_docs,
       |  CAST(sum(tok) AS BIGINT) AS n_tokens,
       |  CAST(bit_xor(${Exprs.hex60Sql("text_out")}) AS BIGINT) AS checksum,
       |  CAST(sum(CASE WHEN tier = 'head' THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
       |  CAST(sum(CASE WHEN tier = 'middle' THEN 1 ELSE 0 END) AS BIGINT) AS n_middle,
       |  CAST(sum(CASE WHEN tier = 'tail' THEN 1 ELSE 0 END) AS BIGINT) AS n_tail
       |FROM o GROUP BY 1 ORDER BY shard_id""".stripMargin
}
