package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Record-key and partition-path generation as pure Column expressions
  * (codegen'd end-to-end; no UDF).
  *
  * Semantics replicate the reference's re-implementation of Hudi's
  * ComplexKeyGenerator and hive-style partition-path builder:
  * `java-client/.../JavaClientHive2Hudi.java:390-439` — composite key
  * `"field:value,field2:value2"`, null → `__null__`, empty →
  * `__empty__`; partition value null/empty → `default`.
  */
object KeyGen {
  val NullPlaceholder = "__null__"
  val EmptyPlaceholder = "__empty__"
  val DefaultPartition = "default"

  private def keyPart(c: String): Column = {
    val v = col(c).cast("string")
    concat(lit(c + ":"),
      when(col(c).isNull, lit(NullPlaceholder))
        .when(v === "", lit(EmptyPlaceholder))
        .otherwise(v))
  }

  /** Record-key string a SINGLE-field pk literal produces under
    * [[recordKey]]'s encoding — the driver-side mirror used for
    * read-side file skipping on key predicates. None for null (an
    * equality against null never matches a row, and the cast-based
    * encodings below don't apply). Callers must pre-restrict to
    * literal types whose Scala toString equals Spark's cast-to-string
    * (strings and integral numerics). */
  def keyForLiteral(v: Any): Option[String] = v match {
    case null => None
    case s if String.valueOf(s).isEmpty => Some(EmptyPlaceholder)
    case s => Some(String.valueOf(s))
  }

  /** Composite record key. Single-field keys use the bare value
    * (SimpleKeyGenerator); multi-field the `f:v,f2:v2` form. */
  def recordKey(fields: Seq[String]): Column = fields match {
    case Seq(single) =>
      val v = col(single).cast("string")
      when(col(single).isNull, lit(NullPlaceholder))
        .when(v === "", lit(EmptyPlaceholder)).otherwise(v)
    case many => concat_ws(",", many.map(keyPart): _*)
  }

  /** One partition-path segment: `dt=v` (hive-style) or bare `v`.
    * JavaClientHive2Hudi.java:421-439. */
  private def partSegment(c: String, hiveStyle: Boolean): Column = {
    val v = col(c).cast("string")
    val value = when(col(c).isNull || v === "", lit(DefaultPartition)).otherwise(v)
    if (hiveStyle) concat(lit(c + "="), value) else value
  }

  /** Full partition path ("" for unpartitioned tables). */
  def partitionPath(fields: Seq[String], hiveStyle: Boolean): Column =
    if (fields.isEmpty) lit("")
    else concat_ws("/", fields.map(partSegment(_, hiveStyle)): _*)
}
