package graft.sql

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.util.V2ExpressionSQLBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.LakeTable

/** DSv2 table over a [[graft.core.LakeTable]] — the SQL surface of the
  * engine (SURVEY §2.2 W1-W7, §3.1). Spark 4's own parser/planner
  * drives everything; this class only supplies connector hooks:
  *
  * - reads delegate to Spark's vectorized parquet scan over the
  *   timeline-resolved live file set (snapshot; time travel via
  *   `option("asOfInstant", t)`). Incremental reads are deliberately
  *   NOT available on catalog tables — the reference pins exactly this
  *   (read options don't apply to `spark.table`,
  *   IncrementalQuery.scala:54-55); they live on the path-based
  *   `format("graft")` source ([[DefaultSource]]);
  * - `INSERT INTO` = keyed upsert; `INSERT OVERWRITE` = replace
  *   (V1Write fallback — the write is one DataFrame handoff);
  * - `DELETE FROM ... WHERE` with pushable predicates is a metadata
  *   delete (SupportsDeleteV2) → COW rewrite of only affected files;
  * - Hudi-style meta columns are exposed as DSv2 metadata columns:
  *   `SELECT _commit_time FROM t` works, `SELECT *` stays clean.
  */
final class GraftTable(
    spark: SparkSession,
    tableName: String,
    val lake: LakeTable,
    /** pinned snapshot instant for SQL time travel (VERSION AS OF /
      * TIMESTAMP AS OF — GraftCatalog.loadTable overloads) */
    asOf: Option[String] = None)
  extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2
  with SupportsMetadataColumns with SupportsRowLevelOperations {

  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    // MOR needs no up-front compaction here: the operation's scan
    // reads the in-query merged view (InQueryMergeOption), and
    // applyDeltas scope-compacts only the file groups the statement's
    // keys touch — a DELETE hitting one partition of a large MOR
    // table leaves every other partition's delta files alone, same as
    // the native predicate/keyed DML paths.
    // Bootstrapped external files carry no stored meta columns, so the
    // delegated parquet scan would emit null row ids; migrate them to
    // managed form first (the reference's first-touch migration).
    // withOcc: a concurrent writer's commit racing the migration must
    // retry it, not spuriously abort the user's DML statement.
    lake.withOcc()(lake.migrateExternal())
    () => new GraftRowLevelOperation(spark, this, info)
  }

  override def name(): String = tableName

  override def schema(): StructType = lake.schemaAt(asOf)

  override def partitioning(): Array[Transform] =
    lake.props.partitionFields.map(Expressions.identity).toArray

  override def properties(): JMap[String, String] = Map(
    "primaryKey" -> lake.props.primaryKey.mkString(","),
    "preCombineField" -> lake.props.preCombineField.getOrElse(""),
    "type" -> lake.props.tableType,
    "path" -> lake.basePath,
    "writeSaltBuckets" -> lake.props.writeSaltBuckets.toString,
    "bucketIndexBuckets" -> lake.props.bucketIndexBuckets.toString,
    "compaction.delta_commits" -> lake.props.compactDeltaCommits.toString,
    "morPayload" -> lake.props.morPayload).asJava

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ).asJava

  // one live-file fold per table instance, not per metadataColumns()
  // call — Spark may ask several times while analyzing one query
  private lazy val hasExternalFiles: Boolean =
    lake.timeline.liveFiles(None).exists(_.external)

  override def metadataColumns(): Array[MetadataColumn] = {
    // External (bootstrapped) files read through the delegated scan
    // carry no stored meta columns → nulls; declare nullable while any
    // are live. Row-level operations migrate externals to managed form
    // first (newRowLevelOperationBuilder), so the
    // (_record_key, _partition_path) row id stays non-nullable where
    // Spark requires it.
    val hasExternal = hasExternalFiles
    LakeTable.MetaCols.map { c =>
      new MetadataColumn {
        override def name: String = c
        override def dataType: DataType = StringType
        override def isNullable: Boolean = hasExternal
        override def comment: String = "graft lake meta column"
      }
    }.toArray
  }

  // ----------------------------------------------------------------- read

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // MOR catalog reads serve the REAL-TIME (merged) view: raw delta
    // files hold multiple versions that the delegated parquet scan
    // cannot merge, so a current-state scan that finds un-compacted
    // delta files folds them into fresh base files first (compact-
    // on-read — zero staleness, amortized across subsequent reads;
    // TestBatchMOR.java:52-58 reads merged rows by table name right
    // after delta writes). Compaction preserves per-row commit times,
    // so concurrent incremental and commit-tail streaming readers see
    // no phantom changes. ONLY a lost OCC race is swallowed (a
    // concurrent writer advanced the table — read what is live then);
    // any other compaction failure must surface, or the read would
    // silently fall back to the stale read-optimized view this path
    // exists to eliminate. Delta-ness comes from FileEntry.delta, not
    // the commit action, so files whose commits were archived are
    // still recognized. Time-travel reads at an instant predating
    // compaction still serve the read-optimized view (deltas of that
    // era cannot be retro-compacted).
    val travel = asOf.orElse(Option(options.get("asOfInstant")))
    if (lake.props.tableType == "mor" && travel.isEmpty &&
        lake.timeline.liveFiles(None).exists(_.delta)) {
      val metaSchema = StructType(
        LakeTable.MetaCols.map(c =>
          org.apache.spark.sql.types.StructField(c, StringType, nullable = true)) ++
          lake.schemaAt(asOf).fields)
      def mergedFallback = new GraftMergedScanBuilder(spark, lake, metaSchema,
        _ => new graft.streaming.CommitTailStream(spark, lake, options, lake.schema))
      // Row-level rewrites read through the in-query merged view so a
      // DML statement never triggers a FULL compaction just to scan:
      // applyDeltas scope-compacts only the file groups its keys touch.
      if (options.getBoolean(GraftTable.InQueryMergeOption, false))
        return mergedFallback
      // Gate: compact-on-read amortizes the merge into fresh base files
      // but WRITES the table; sessions reading someone else's table
      // (or read-only credentials) can turn it off and get the
      // merge-at-read-time view the reference serves.
      if (!spark.conf.get("spark.graft.mor.compactOnRead", "true").toBoolean)
        return mergedFallback
      try lake.withOcc()(lake.compact())
      catch {
        case e: graft.core.CommitConflictException =>
          // retries exhausted: only proceed if some concurrent writer
          // compacted meanwhile — otherwise serving the RO view would
          // silently drop every un-compacted delta, the exact
          // staleness this path exists to eliminate
          if (lake.timeline.liveFiles(None).exists(_.delta)) throw e
        case scala.util.control.NonFatal(e) =>
          // non-conflict failure (typical: read-only storage). The read
          // must still serve the real-time view — fall back to the
          // in-query merge instead of failing the SELECT or silently
          // serving the stale RO view.
          if (lake.timeline.liveFiles(None).exists(_.delta)) {
            GraftTable.log.warn(s"compact-on-read failed on " +
              s"${lake.basePath}; serving merged read-only view: $e")
            return mergedFallback
          }
      }
    }
    val live = lake.timeline.liveFiles(travel)
    val entries = if (lake.props.tableType == "mor")
      live.filter(!_.delta) // time-travel/lost-race residue: RO view
    else live
    val files = entries.map(f => lake.abs(f.path))
    val metaSchema = StructType(
      LakeTable.MetaCols.map(c =>
        org.apache.spark.sql.types.StructField(c, StringType, nullable = true)) ++
        lake.schemaAt(asOf).fields)
    // Delegate to Spark's own vectorized parquet scan (pushdown,
    // column pruning, row-group skipping all included). An empty table
    // still needs a valid relation: point at an empty marker dir.
    def emptyMarker: Seq[String] = {
      val empty = new org.apache.hadoop.fs.Path(
        lake.basePath, graft.core.Timeline.META_DIR + "/.empty")
      empty.getFileSystem(spark.sessionState.newHadoopConf()).mkdirs(empty)
      Seq(empty.toString)
    }
    def mkDelegate(paths: Seq[String])
        : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder =
      ParquetTable(tableName, spark,
        options, (if (paths.nonEmpty) paths else emptyMarker).toList,
        Some(metaSchema), classOf[ParquetFileFormat])
        .newScanBuilder(options)
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder]
    // file skipping from timeline metadata, zero I/O: pk equality/IN
    // predicates resolve through stored key bounds + bucket routing;
    // predicates on declared statsColumns through the col-stats index
    // (sound here: COW live sets and MOR read-optimized base sets hold
    // one version per key, so data-predicate pruning cannot flip a
    // merge). None = nothing pruned, keep the negotiated delegate.
    val statsCols = lake.props.statsColumns.toSet
    val pkOpt = if (lake.props.primaryKey.size == 1)
      Some(lake.props.primaryKey.head) else None
    val pruner: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        Option[Seq[String]] = exprs => {
      val keysOpt = pkOpt.flatMap(pk => GraftScanBuilder.keyLiterals(exprs, pk))
      val preds = GraftScanBuilder.colPreds(exprs, statsCols)
      if (keysOpt.isEmpty && preds.isEmpty) None
      else {
        val kept = entries.filter(f =>
          keysOpt.forall(ks => lake.mayContainKeys(f, ks)) &&
            lake.mayMatchColStats(f, preds))
        if (kept.size == entries.size) None
        else Some(kept.map(f => lake.abs(f.path)))
      }
    }
    // Streaming relations bypass column pruning: their output is the
    // table's data schema, so that is what the stream must emit.
    new GraftScanBuilder(mkDelegate(files),
      _ => new graft.streaming.CommitTailStream(spark, lake, options, lake.schema),
      prunePaths = Some(pruner),
      rebuild = Some(mkDelegate))
  }


  // ---------------------------------------------------------------- write

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteFlag: Boolean): Unit =
              if (overwrite || overwriteFlag) lake.overwrite(data)
              else lake.upsert(data)
          }
      }
    }

  // --------------------------------------------------------------- delete

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    try { predicates.foreach(p => new V2ExpressionSQLBuilder().build(p)); true }
    catch { case _: Throwable => false }

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    val cond =
      if (predicates.isEmpty) expr("true")
      else predicates.map(p => expr(new V2ExpressionSQLBuilder().build(p)))
        .reduce(_ && _)
    lake.deleteWhere(cond)
  }

  override def toString: String = s"GraftTable($tableName)"
}

object GraftTable {
  private[sql] val log = org.slf4j.LoggerFactory.getLogger(classOf[GraftTable])

  /** Internal scan option: serve the MOR merged view in-query (no
    * compact-on-read write). Set by the row-level operation's scan. */
  private[sql] val InQueryMergeOption = "graft.internal.inQueryMerge"
}
