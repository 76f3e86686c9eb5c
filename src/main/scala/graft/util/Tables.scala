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

  /** Normalize events.ts to a microsecond TIMESTAMP_NTZ across driver
    * testdata generations. Older generations stored TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects — those are read as long
    * (nanosAsLong) and floored to micros, exactly DuckDB's nanos→micros
    * truncation, with integer `div` (not `/`, which goes through double
    * and loses precision above 2^53) keeping the value exact. Newer
    * generations store TIMESTAMP(MICROS) directly; only a NTZ cast is
    * needed so hashes match the oracle regardless of session-TZ type.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // DELIBERATE session-global set (documented side effect): the
    // legacy nanosAsLong decode is SQLConf-only (no per-read option),
    // and a save/restore around this lazy read would race plan
    // resolution. The driver entry points (Bench/Verify/TestSpark)
    // set it at session build so semantics never depend on whether
    // events() ran first; this set covers ad-hoc sessions.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, sfDir, "events")
    val tsCol = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    df.withColumn("ts", tsCol)
  }

  /** Exact 2-decimal fixed-point view of a money/ratio double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal ONE for (1 - discount)-style expressions. */
  val one2: Column = lit(1).cast(DecimalType(18, 2))

  /** price * (1 - discount), exact; stays decimal for exact SUM. */
  def netExpr(price: Column, disc: Column): Column =
    dec2(price) * (one2 - dec2(disc))
}
