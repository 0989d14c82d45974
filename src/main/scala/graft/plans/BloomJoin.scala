package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered join — the runtime-filter pattern made an explicit,
  * reusable operator.
  *
  * Motivation at 100 TB: a selective dimension (say 100 M surviving keys)
  * is too big to BROADCAST as a hash relation (~GBs), so the fact side
  * pays a full shuffle of every row, matched or not. A bloom sketch of the
  * same key set is ~1 MB-scale, costs one tiny aggregation of the dim, and
  * drops the vast majority of non-matching fact rows BEFORE the shuffle.
  * The exact equi-join afterwards discharges the bloom's false positives,
  * so the operator's result is bit-identical to the plain join — which is
  * exactly what the differential oracle checks.
  *
  * Built from the same Catalyst pieces Spark's own `InjectRuntimeFilter`
  * pairs ([[BloomFilterAggregate]] over `xxhash64(key)`,
  * [[BloomFilterMightContain]] on the probe side); here the pattern is
  * under user control — composable with joins AQE would not rewrite (the
  * optimizer only injects filters under size/selectivity heuristics it
  * can prove).
  *
  * The sketch itself is collected to the driver (one row, bounded by
  * `numBits` — the same cost class as any broadcast build) and shipped as
  * a literal so the probe-side filter stays inside whole-stage codegen.
  */
object BloomJoin {

  /** `facts` rows whose `factKey` MIGHT be in `dim`'s `dimKey` set —
    * bloom-exact: no false negatives, false positives at the sketch's fpp.
    */
  def bloomSemiPrefilter(facts: DataFrame, factKey: String,
                         dim: DataFrame, dimKey: String,
                         expectedItems: Long = 1000000L): DataFrame = {
    val buildAgg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(col(dimKey)))),
      expectedItems).toAggregateExpression()
    val sketch = dim.select(ColumnBridge.column(buildAgg).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (sketch == null) facts.limit(0) // empty build side: nothing can match
    else facts.filter(ColumnBridge.column(BloomFilterMightContain(
      Literal.create(sketch, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(col(factKey)))))))
  }

  /** `facts` with an extra boolean `flagName`: whether `factKey` MIGHT be
    * in `dim`'s `dimKey` set. A bloom sketch has no false negatives, so
    * `false` PROVES absence — callers can route proven-absent rows around
    * the exact join entirely (the segment-dedup fast path), paying the
    * shuffle only for the sketch's hits. An empty build side flags every
    * row false.
    */
  def bloomFlag(facts: DataFrame, factKey: String,
                dim: DataFrame, dimKey: String, flagName: String,
                expectedItems: Long = 1000000L,
                numBits: Long = 0L): DataFrame = {
    // numBits > 0 sizes the sketch by BYTE BUDGET instead of an item
    // estimate — for callers that would otherwise run an extra counting
    // job just to size the sketch. An undersized budget only raises the
    // false-positive rate (routing efficiency); the exact join downstream
    // discharges FPs either way, so correctness never depends on sizing.
    // Hash-function count is tuned for ~10 bits/item (≈1% fpp at budget).
    val buildChild = new XxHash64(Seq(ColumnBridge.expression(col(dimKey))))
    val buildAgg = (if (numBits > 0)
      new BloomFilterAggregate(buildChild,
        Literal(math.max(numBits / 10, 1L)), Literal(numBits))
    else new BloomFilterAggregate(buildChild, expectedItems))
      .toAggregateExpression()
    val sketch = dim.select(ColumnBridge.column(buildAgg).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (sketch == null) facts.withColumn(flagName, lit(false))
    else facts.withColumn(flagName, ColumnBridge.column(BloomFilterMightContain(
      Literal.create(sketch, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(col(factKey)))))))
  }

  /** Exact inner equi-join, bloom-prefiltered: semantics of
    * `facts JOIN dim ON factKey = dimKey`, with the fact side pruned by the
    * sketch before it reaches the join's shuffle. When both sides use the
    * SAME key name the join is expressed as a USING join (one merged key
    * column) — `col(factKey) === col(dimKey)` would be an ambiguous
    * self-comparison.
    */
  def bloomPrefilteredJoin(facts: DataFrame, factKey: String,
                           dim: DataFrame, dimKey: String,
                           expectedItems: Long = 1000000L): DataFrame = {
    val pruned = bloomSemiPrefilter(facts, factKey, dim, dimKey, expectedItems)
    if (factKey == dimKey) pruned.join(dim, Seq(factKey))
    else pruned.join(dim, col(factKey) === col(dimKey))
  }
}
