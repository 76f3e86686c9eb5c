package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.core.{LakeTable, MergePolicy, TableProps}

/** Path-based DataFrame surface: `spark.read.format("graft")` /
  * `df.write.format("graft")` — the reference's
  * `read.format("hudi").load(basePath)` and
  * `write.format("hudi").save(basePath)` flows (SURVEY §2.1 S1-S3,
  * §2.2 W12; BootstrapDemo.scala:261-273, IncrementalQuery.scala:48-53).
  *
  * Read options: `queryType` = snapshot (default) | incremental | cdc,
  * `beginInstant`, `endInstant`, `pathGlob`, `asOfInstant`.
  * Write options: `primaryKey`, `preCombineField`, `partitionFields`
  * (comma-separated), `operation` = upsert (default) | insert |
  * overwrite | delete, `mergePolicy` = latest (default) | overwrite,
  * `writeSaltBuckets`.
  *
  * Implemented as a DSv1 relation whose scan re-enters the DataFrame
  * API: pruning and filters are applied to the inner Catalyst plan, so
  * the parquet scans underneath stay vectorized with pushdown — and
  * incremental row-level `(begin, end]` semantics are exact.
  */
class DefaultSource extends RelationProvider with SchemaRelationProvider
  with CreatableRelationProvider
  with DataSourceRegister
  with org.apache.spark.sql.sources.StreamSinkProvider
  with org.apache.spark.sql.sources.StreamSourceProvider {

  override def shortName(): String = "graft"

  /** `spark.readStream.format("graft").option("queryType", "cdc")` —
    * the streaming change feed ([[graft.streaming.GraftCdcSource]]).
    * Row tailing (appended versions, no deletes) goes through the
    * catalog table instead: `spark.readStream.table(...)`. */
  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = streamPath(parameters)
    ("graft-cdc",
      LakeTable.load(sqlContext.sparkSession, path).cdcSchema)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val path = streamPath(parameters)
    val ci = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(parameters)
    // `startCommit` (the Flink read-start-commit analog) with
    // `beginInstant` accepted as an alias — the batch CDC read names
    // it beginInstant, and silently ignoring one spelling would replay
    // the whole history from commit 0
    new graft.streaming.GraftCdcSource(sqlContext.sparkSession,
      LakeTable.load(sqlContext.sparkSession, path),
      ci.get("startCommit").orElse(ci.get("beginInstant")).getOrElse("0"))
  }

  private def streamPath(parameters: Map[String, String]): String = {
    val ci = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(parameters)
    require(ci.get("queryType").exists(_.equalsIgnoreCase("cdc")),
      "streaming read of a graft path requires option queryType=cdc " +
        "(the change feed); for row tailing use spark.readStream.table(...)")
    ci.getOrElse("path",
      throw new IllegalArgumentException("graft streaming reads require a path"))
  }

  /** `df.writeStream.format("graft").option(...).start(path)` — the
    * streaming upsert sink (SURVEY §2.10 ST2, the Flink HoodiePipeline
    * sink / TestStreamingMOR insert-select flow). Batch replay after a
    * restart re-applies the same upsert, which converges to the same
    * state (keyed upsert is state-idempotent); the recorded batch id
    * skips clean replays entirely. */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink =
    new GraftStreamSink(sqlContext.sparkSession,
      parameters ++ (if (partitionColumns.nonEmpty)
        Map("partitionFields" -> partitionColumns.mkString(",")) else Map.empty))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft reads require a path"))
    GraftRelation(sqlContext, path, parameters)
  }

  /** Catalog-registered (saveAsTable) reads: the session catalog stores
    * the DATA schema and passes it back here — serve exactly those
    * columns. Path-based reads (no stored schema) keep exposing the
    * meta columns. */
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: StructType): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft reads require a path"))
    GraftRelation(sqlContext, path, parameters, Some(schema))
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      rawParameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val parameters: Map[String, String] =
      org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(rawParameters)
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft writes require a path"))
    val operation = parameters.getOrElse("operation", "upsert").toLowerCase
    require(Set("upsert", "insert", "overwrite", "delete")(operation),
      s"unknown operation '$operation' (upsert | insert | overwrite | delete)")
    val policy = DefaultSource.parseMergePolicy(parameters.get("mergePolicy"))
    val tableExists = LakeTable.exists(spark, path)
    // CreatableRelationProvider contract: ErrorIfExists (the
    // DataFrameWriter default) must throw on an existing table, and
    // Ignore must be a no-op — not a silent upsert
    if (tableExists && mode == SaveMode.ErrorIfExists)
      throw new IllegalStateException(
        s"graft table already exists at $path (SaveMode.ErrorIfExists)")
    if (tableExists && mode == SaveMode.Ignore)
      // declared DATA schema, same as the write-path return below:
      // saveAsTable records this relation's schema, and exposing the
      // meta columns would break every later append's column check
      return GraftRelation(sqlContext, path, parameters,
        Some(LakeTable.load(spark, path).schema))
    val lake =
      if (tableExists) LakeTable.load(spark, path)
      else {
        val props = TableProps(
          name = new org.apache.hadoop.fs.Path(path).getName,
          primaryKey = parameters.getOrElse("primaryKey",
            throw new IllegalArgumentException(
              "first write to a new graft table requires option primaryKey"))
            .split(",").map(_.trim).toSeq,
          preCombineField = parameters.get("preCombineField").filter(_.nonEmpty),
          partitionFields = parameters.get("partitionFields")
            .map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty),
          writeSaltBuckets = parameters.getOrElse("writeSaltBuckets", "1").toInt,
          bucketIndexBuckets =
            parameters.getOrElse("bucketIndexBuckets", "0").toInt)
        LakeTable.create(spark, path, props)
      }
    (mode, operation) match {
      case (SaveMode.Overwrite, _) | (_, "overwrite") => lake.overwrite(data)
      case (_, "insert") => lake.insert(data)
      case (_, "delete") => lake.delete(data)
      case _ => lake.upsert(data, policy)
    }
    // Report the DATA schema: saveAsTable records this relation's
    // schema in the session catalog, and later appends are checked
    // against it column-for-column — exposing the meta columns here
    // would make every user append fail the count check (W15,
    // SyncCommentsAcrossClusters.scala:111-113).
    GraftRelation(sqlContext, path, parameters, Some(lake.schema))
  }
}

/** DSv1 relation with column pruning + filter pushdown into the inner
  * DataFrame plan (which Catalyst then pushes into the parquet scan). */
final case class GraftRelation(
    sqlContext: SQLContext,
    path: String,
    rawParameters: Map[String, String],
    /** When set (catalog-registered tables), the relation serves
      * exactly these columns; path-based relations expose meta + data. */
    declaredSchema: Option[StructType] = None)
  extends BaseRelation with PrunedFilteredScan {

  private val parameters: Map[String, String] =
    org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(rawParameters)

  private def spark: SparkSession = sqlContext.sparkSession
  private def lake: LakeTable = LakeTable.load(spark, path)

  private def frame(): DataFrame = parameters.get("queryType") match {
    case Some("incremental") =>
      val begin = parameters.getOrElse("beginInstant",
        throw new IllegalArgumentException(
          "incremental query requires option beginInstant"))
      lake.incremental(begin,
        parameters.get("endInstant"), parameters.get("pathGlob"))
    case Some("cdc") =>
      val begin = parameters.getOrElse("beginInstant",
        throw new IllegalArgumentException(
          "cdc query requires option beginInstant"))
      lake.cdc(begin, parameters.get("endInstant"))
    case _ => lake.snapshot(parameters.get("asOfInstant"))
  }

  override lazy val schema: StructType =
    declaredSchema.getOrElse(frame().schema)

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val base = frame()
    val filtered = filters.foldLeft(base) { (df, f) =>
      GraftRelation.toColumn(f).map(df.filter).getOrElse(df)
    }
    val wanted =
      if (requiredColumns.nonEmpty) requiredColumns.toSeq
      else schema.fieldNames.toSeq // declared-schema tables: data cols only
    val pruned =
      if (wanted.isEmpty) filtered else filtered.select(wanted.map(col): _*)
    pruned.rdd
  }

  // Filters we translate are fully applied; Spark re-applies the rest.
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(f => GraftRelation.toColumn(f).isEmpty)
}

object GraftRelation {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** sources.Filter → Column; None = can't translate (left to Spark). */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }
}

object DefaultSource {
  /** Case-insensitive, validated mergePolicy parse — shared by the
    * batch write path and the streaming sink so a typo ('Overwrite',
    * 'overwrit') errors instead of silently degrading to the default
    * ordering policy. */
  private[sql] def parseMergePolicy(
      v: Option[String]): graft.core.MergePolicy =
    v.map(_.toLowerCase) match {
      case Some("overwrite") => graft.core.MergePolicy.OverwriteWithLatest
      case Some("latest") | None => graft.core.MergePolicy.LatestByOrdering
      case Some(other) => throw new IllegalArgumentException(
        s"unknown mergePolicy '$other' (latest | overwrite)")
    }
}
