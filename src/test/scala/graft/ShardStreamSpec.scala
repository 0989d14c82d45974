package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.ShardStream

/** [[ShardStreamSpec]] fixture row — top-level so the Product encoder
  * needs no outer instance.
  */
case class CuratedDoc(doc_id: Long, source: String,
                      text_md5: String, n_tokens: Long)

/** The streaming shard-append fold: batch-local walks appended at the
  * persisted high-water mark — the streaming twin of manifestIncr's
  * append-only contract.
  */
class ShardStreamSpec extends SparkSuite {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("shard append: epoch 2 extends the walk, closed epoch-1 shards stay byte-identical") {
    val out = Files.createTempDirectory("graft-shardstream").toString
    val ckpt = Files.createTempDirectory("graft-shardstream-ckpt").toString
    val budget = 100L
    val in = MemoryStream[CuratedDoc]
    val q = ShardStream.appendStream(in.toDF(), out, ckpt, budget = budget)
    try {
      def doc(id: Long, tok: Long) =
        CuratedDoc(id, s"src${id % 3}", f"${id}%032x", tok)

      // epoch 1: 8 docs x 60 tokens = 480 tokens -> shards 0..4
      in.addData((1L to 8L).map(doc(_, 60L)): _*)
      q.processAllAvailable()
      val m1 = spark.read.parquet(s"$out/manifest")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val hwm1 = m1.values.map(_._2).sum
      assert(hwm1 == 480L, s"epoch-1 token total, got $hwm1")
      assert(m1.keySet == (0L to 4L).toSet, s"epoch-1 shards, got ${m1.keySet}")

      // epoch 2: 4 more docs append at the high-water mark
      in.addData((101L to 104L).map(doc(_, 60L)): _*)
      q.processAllAvailable()
      // partition discovery types `epoch` as int — normalize to long
      val assign = spark.read.parquet(s"$out/assign")
        .withColumn("epoch", col("epoch").cast("long"))
      val e2 = assign.filter(col("epoch") > assign.agg(min("epoch")).head().getLong(0))
      assert(e2.count() == 4)
      assert(e2.agg(min("off")).head().getLong(0) >= hwm1,
        "an epoch-2 doc landed below the epoch-1 high-water mark")

      val m2 = spark.read.parquet(s"$out/manifest")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(m2.values.map(_._2).sum == 480L + 240L, "merged token total")
      // every shard strictly below the epoch-1 open shard is CLOSED: its
      // manifest row (docs, tokens, checksum) must be byte-identical
      val openShard = hwm1 / budget
      m1.filter(_._1 < openShard).foreach { case (sid, row) =>
        assert(m2(sid) == row, s"closed shard $sid was rewritten: ${m2(sid)} vs $row")
      }
    } finally q.stop()
  }
}
