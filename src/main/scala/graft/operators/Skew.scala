package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew splitting isn't available (e.g. non-sort-merge plans, or a
  * deliberately pinned plan).
  *
  * A hot key (one giant radiation cluster, one dominant document language)
  * lands its entire row set on one reducer in a plain hash join. Salting
  * spreads the hot key across `salts` sub-partitions: the probe side gets a
  * per-row salt derived from row identity; the build side is replicated
  * once per salt value. Join output is identical to the unsalted join —
  * only the partitioning changes.
  *
  * Scale math: build-side cost ×`salts` (keep the build side the small
  * one), probe-side hot-key parallelism ×`salts`.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `leftKey === rightKey`, salted.
    * `right` is the replicated (smaller) side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full outer would null-extend every unmatched REPLICATED right
    // copy — `salts` duplicates per unmatched right row. Only join types
    // that never emit unmatched build-side rows preserve the contract.
    require(Set("inner", "cross", "leftouter", "leftsemi", "leftanti", "left")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support '$joinType': unmatched replicated right rows would duplicate")
    // per-row deterministic-ish spread; any distribution works for
    // correctness, uniformity is what kills the hot spot
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(col(leftKey), monotonically_increasing_id()), lit(salts)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("__salt") === saltedRight("__salt"),
        joinType)
      .drop("__salt")
  }
}
