package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Test-table loaders + hash-stable numeric helpers.
  *
  * The driver's correctness gate hash-compares our results against a
  * DuckDB oracle. Double summation is order-dependent, and Spark and
  * DuckDB aggregate in different orders — so every SUM over a
  * fractional double column is computed in exact DECIMAL arithmetic
  * and cast back to DOUBLE at the end. The final decimal→double cast
  * is a single deterministic rounding, identical in both engines.
  * (Integer-valued doubles, e.g. l_quantity, sum exactly in double
  * and need no cast.)
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long and truncate to a
    * microsecond TIMESTAMP_NTZ — exactly DuckDB's nanos→micros floor,
    * so timestamp semantics hash-match the oracle. Integer `div`
    * (not `/`, which goes through double and loses precision above
    * 2^53) keeps the full nanosecond value exact.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sfDir, "events")
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }

  /** Exact 2-decimal fixed-point view of a money/ratio double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal ONE for (1 - discount)-style expressions. */
  val one2: Column = lit(1).cast(DecimalType(18, 2))

  /** price * (1 - discount), exact; stays decimal for exact SUM. */
  def netExpr(price: Column, disc: Column): Column =
    dec2(price) * (one2 - dec2(disc))
}
