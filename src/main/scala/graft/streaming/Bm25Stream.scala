package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Exprs

/** Standing-query BM25 alerting — the streaming twin of
  * `Retrieval.bm25Incr`: every arriving document scored row-locally
  * against the FROZEN standing queries (probe docs) under FROZEN index
  * statistics, emitting one row per (matching query, arrival). The
  * news-alert / standing-retrieval serving shape: statistics refresh is
  * a restart (recompaction), scoring is per-arrival O(|query terms|).
  *
  * Mechanism: the [[ContamStream]]/[[NbStream]] literal-compilation
  * pattern — the standing queries are tiny by definition, so each
  * query's (term, base-df) list plus the frozen (N, Σlen) scalars
  * compile into per-row expressions: tf via `size(filter(words, = term))`,
  * the SAME operand-ordered BM25 contribution as the batch tier
  * (integer-quantized per term BEFORE the sum), idf from the same
  * runtime `log` on the same exact double argument — so a one-batch feed
  * is score-for-score identical to `bm25IncrScored`, spec-pinned. ZERO
  * streaming state, zero shuffle, pure row-local expressions.
  *
  * Emission: one row per (q_id, arrival) sharing ≥ 1 scoring term — the
  * batch relation's inner-join semantics; consumers threshold on
  * `s_int` for alert routing.
  *
  * `docs` must carry (doc_id, text, ingest_ts) and is expected to be
  * ARRIVALS — documents not already in the frozen base index. Probe docs
  * (`doc_id &lt; probeMax`, carried in the frozen tuple) are filtered out
  * HERE, so a feed that replays them cannot self-match its own standing
  * queries; re-feeding base-split documents is the one remaining caller
  * responsibility (the stream cannot tell a base re-feed from a genuine
  * arrival — an arrival is by definition not in the frozen index).
  */
object Bm25Stream {

  def apply(docs: DataFrame,
            frozen: (Seq[(Long, Seq[(String, Long)])], Long, Long, Long),
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (queries, nDocs, sumLen, probeMax) = frozen
    require(queries.nonEmpty, "frozen standing-query set must not be empty")
    val withWords = docs
      .filter(col("doc_id") >= probeMax)
      .withColumn("norm", Exprs.normText(col("text")))
      .withColumn("ws", filter(split(col("norm"), " "), w => w =!= ""))
      .withColumn("len", size(col("ws")))
    def contrib(term: String, dfv: Long): Column = {
      val tf = size(filter(col("ws"), w => w === lit(term))).cast("long")
      // identical operand order to the batch tier, idf argument computed
      // with the same exact integer-derived doubles
      val idf = log(lit((nDocs - dfv + 0.5) / (dfv + 0.5) + 1.0))
      val ratio = col("len").cast("double") * lit(nDocs) / lit(sumLen)
      val c = floor(idf * (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * ratio)) * 10000 + 0.5)
        .cast("long")
      when(tf > 0, c).otherwise(lit(0L))
    }
    def hits(terms: Seq[(String, Long)]): Column =
      terms.map { case (t, _) =>
        (size(filter(col("ws"), w => w === lit(t))) > 0).cast("int")
      }.reduce(_ + _)
    val perQuery = array(queries.map { case (q, terms) =>
      struct(lit(q).as("q_id"),
        terms.map { case (t, dfv) => contrib(t, dfv) }.reduce(_ + _).as("s_int"),
        hits(terms).as("n_hit_terms"))
    }: _*)
    withWords
      .select(col("doc_id"), col("ingest_ts"), explode(perQuery).as("qs"))
      .filter(col("qs.n_hit_terms") > 0)
      .select(col("doc_id"), col("ingest_ts"),
        col("qs.q_id").as("q_id"), col("qs.s_int").as("s_int"))
  }
}
