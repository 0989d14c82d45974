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
}
