package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** DataFrame helpers mirroring the reference's `common/DfUtils.scala`
  * and schema-surgery patterns — re-expressed without the `df.rdd`
  * round-trips the reference uses (pure projections keep codegen and
  * pushdown intact).
  */
object DfUtils {

  /** JDBC source with full query pushdown: the query runs inside the
    * remote database (`dbtable = "(...) a"` — DfUtils.scala:17-19,
    * SyncCommentsAcrossClusters.scala:126-139). */
  def readJdbc(
      spark: SparkSession, url: String, dbtable: String,
      user: String, password: String,
      driver: String = "com.mysql.cj.jdbc.Driver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .option("user", user).option("password", password)
      .option("driver", driver)
      .load()

  /** Lowercase + strip spaces from column names
    * (DfUtils.scala:21-26 `schemaToLowerCase`, minus the rdd rebuild).
    * Locale.ROOT so the mapping is machine-independent (a Turkish
    * default locale lowercases "ID" to dotless-ı "ıd"), and collisions
    * fail fast here instead of as a distant ambiguous-reference error
    * in whatever references the name next. */
  def lowercaseColumns(df: DataFrame): DataFrame = {
    val renamed = df.columns
      .map(_.toLowerCase(java.util.Locale.ROOT).replaceAll(" ", ""))
    val dups = renamed.groupBy(identity).collect {
      case (n, hits) if hits.length > 1 => n
    }
    require(dups.isEmpty,
      s"lowercaseColumns would collide column names: ${dups.mkString(", ")}")
    df.toDF(renamed.toSeq: _*)
  }

  /** Cast every column to string (DfUtils.scala:28-32). `df(c)` (not
    * `col(c)`): a flat column whose NAME contains a dot must not be
    * parsed as a struct-field path. */
  def castAllToString(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => df(c).cast(StringType).as(c)).toSeq: _*)

  /** Force-nullable schema (BootstrapDemo.scala:275-280
    * `makeDfColNullable`, minus the rdd rebuild): each column is
    * wrapped in `if(true, c, null)`, whose null branch makes the
    * expression nullable by construction — a pure projection, so the
    * logical plan (codegen, pushdown, AQE) survives, unlike the
    * reference's createDataFrame(df.rdd, schema) round-trip.
    * (Dataset.to does NOT work here — it keeps the stricter input
    * nullability — and when(lit(true), c) gets constant-folded back
    * to non-nullable during analysis; verified empirically.) */
  def forceNullable(df: DataFrame): DataFrame =
    df.selectExpr(df.columns.map { c0 =>
      val c = c0.replace("`", "``") // a literal backtick in a column
      s"if(true, `$c`, null) AS `$c`" // name must not escape the quote
    }.toSeq: _*)
}

/** Filesystem helpers mirroring `common/FsUtils.scala`. */
object FsUtils {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Child directory names (FsUtils.scala:12-27 dirs-only listing). */
  def listDirs(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Recursive delete-if-exists (FsUtils.scala:29-35; used by
    * IncrementalQuery.scala:28). */
  def deletePath(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path)
    val p = new Path(path)
    f.exists(p) && f.delete(p, true)
  }
}
