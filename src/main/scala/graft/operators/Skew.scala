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
    // The salt must be DETERMINISTIC per row content: a nondeterministic
    // source (monotonically_increasing_id, rand) used as a join key breaks
    // under task retry — recomputed map tasks re-salt rows differently than
    // the copies already fetched by surviving reducers, duplicating or
    // dropping matches (the SPARK-23207 failure class). Hashing the full
    // row spreads a hot key as long as its rows differ anywhere; fully
    // identical rows co-locating is the acceptable residue.
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("__salt") === saltedRight("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Zipf head/tail equi-join: `left ⋈ right` on `key`, split so the
    * `headRows` heaviest `right` keys (by `weight`, e.g. a frequency
    * column) are joined by BROADCAST and only probe rows with RARE keys
    * reach a shuffle.
    *
    * The scale case: `left` = an exploded token/segment relation whose key
    * distribution is Zipf, `right` = the per-key aggregate. The head —
    * bounded by the parameter, never the data — answers the overwhelming
    * majority of probe rows with zero movement of those rows; the tail
    * shuffle carries only the rare remainder, and the tail build side is
    * pre-shrunk by the same broadcast head (an anti-join, not a scan-wide
    * filter).
    *
    * PRECONDITION: `right` must be key-unique on `key` (a per-key
    * aggregate, e.g. a groupBy result — every caller here). Under that
    * contract output is row-identical to the plain inner join, because the
    * two paths partition `right`'s key space. With DUPLICATE right keys the
    * contract breaks: `limit` can cut inside a key group, and the head
    * path would then carry only the surviving copies while the anti-join
    * removes the key from the tail — silently dropping matches.
    *
    * The head is materialized once (`localCheckpoint`): it is at most
    * `headRows` rows, and without pinning it the orderBy+limit over the
    * full aggregate would execute once per consumer (the head join AND
    * both anti-joins).
    */
  def headTailJoin(left: DataFrame, right: DataFrame, key: String,
                   headRows: Int, weight: Column): DataFrame = {
    require(headRows > 0, s"headRows must be positive, got $headRows")
    // deterministic head under weight ties: break by the key itself
    val head = right.orderBy(weight.desc, col(key)).limit(headRows)
      .localCheckpoint(eager = true)
    val headKeys = broadcast(head.select(col(key)))
    val headHits = left.join(broadcast(head), Seq(key))
    val tailRight = right.join(headKeys, Seq(key), "left_anti")
    val tailHits = left.join(headKeys, Seq(key), "left_anti")
      .join(tailRight, Seq(key))
    headHits.unionByName(tailHits)
  }
}
