package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The codegen'd dot product must be BIT-identical to the interpreted
  * higher-order fold it replaced — the DuckDB oracle hashes depend on
  * the exact IEEE operation order. */
class VecFloatDotSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  GraftFunctions.register(spark)

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  test("bit-identical to aggregate(zip_with(...)) on float vectors") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      (Seq.fill(64)(rng.nextFloat() * 2 - 1), Seq.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", expr("graft_vec_dot(a, b)"))
      .withColumn("slow", expr(hof))
    // exact equality, not approximate: same op order ⇒ same bits
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("mixed float/double arrays and SQL registration") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(0.5, -1.0, 2.0))).toDF("a", "b")
    val got = df.selectExpr("graft_vec_dot(a, b)").head().getDouble(0)
    assert(got == 1.0 * 0.5 - 2.0 + 6.0)
    // non-array input is rejected at analysis
    intercept[Exception](df.selectExpr("graft_vec_dot(a, 3)").head())
  }

  test("edge semantics match the fold: length mismatch and null elements -> NULL") {
    // mismatched lengths: zip_with pads with null, the fold propagates
    val mism = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .withColumn("fast", expr("graft_vec_dot(a, b)"))
      .withColumn("slow", expr(hof))
    val r = mism.select("fast", "slow").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    // null element in either side -> NULL (both eval paths)
    val withNull = Seq(
      (Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f, 3.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .withColumn("fast", expr("graft_vec_dot(a, b)"))
      .withColumn("slow", expr(hof))
    val rows = withNull.select("fast", "slow").collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(0) && rows(1).getDouble(0) == rows(1).getDouble(1))
  }
}
