package graft.sql

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.core.LakeTable

/** Delta-based row-level operations (SQL UPDATE / MERGE / DELETE
  * fallback) for graft tables — SURVEY §7.4's "hard part (a)".
  *
  * Spark 4 rewrites the DML into a plan that joins the table with the
  * source and emits per-row deltas; updates are represented as
  * DELETE+INSERT (so partition-migrating updates work naturally). Row
  * identity is the engine's native `(_record_key, _partition_path)`.
  *
  * Executor-side, deltas are spooled to staging parquet (one
  * deletes/ and one inserts/ file per task, written with Spark's own
  * ParquetWriteSupport); on driver commit they are applied through the
  * native keyed DML — `delete` then `upsert` — so all COW rewrite
  * logic, preCombine semantics, and timeline bookkeeping stay in one
  * place. Only the changed rows travel through the write, never the
  * whole table.
  */
final class GraftRowLevelOperation(
    spark: SparkSession,
    table: GraftTable,
    info: RowLevelOperationInfo)
  extends RowLevelOperation with SupportsDelta {

  private def lake: LakeTable = table.lake

  override def command(): RowLevelOperation.Command = info.command()

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // the rewrite's read must see merged MOR rows but must NOT compact
    // the whole table to get them — applyDeltas scope-compacts later
    val m = new java.util.HashMap[String, String](options)
    m.put(GraftTable.InQueryMergeOption, "true")
    table.newScanBuilder(new CaseInsensitiveStringMap(m))
  }

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(LakeTable.RecordKeyCol),
      Expressions.column(LakeTable.PartitionPathCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes(): Array[NamedReference] = Array.empty

  override def newWriteBuilder(winfo: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def description(): String = s"graft delta ${command()}"
        override def toBatch: DeltaBatchWrite =
          new GraftDeltaBatchWrite(spark, lake, winfo.schema(),
            command().toString.toLowerCase)
      }
    }
}

private final class GraftDeltaBatchWrite(
    spark: SparkSession,
    lake: LakeTable,
    rowSchema: StructType,
    action: String)
  extends DeltaBatchWrite {

  private val stagingDir =
    s"${lake.basePath}/.staging-sql/${UUID.randomUUID().toString}"
  private val idSchema = StructType(Seq(
    StructField(LakeTable.RecordKeyCol, StringType),
    StructField(LakeTable.PartitionPathCol, StringType)))
  // ParquetWriteSupport + SparkToParquetSchemaConverter read these SQL
  // confs straight from the Hadoop conf and require them explicitly
  // present (ParquetFileFormat.prepareWrite normally sets them; one of
  // them is internal, so a getAllDefinedConfs sweep misses it).
  private val conf = {
    import org.apache.spark.sql.internal.SQLConf
    val hc = spark.sessionState.newHadoopConf()
    val sqlc = spark.sessionState.conf
    hc.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlc.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString)
    hc.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlc.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString)
    hc.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlc.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    hc.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlc.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    hc.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlc.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    hc.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlc.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    new SerializableConfiguration(hc)
  }

  override def createBatchWriterFactory(
      pinfo: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(stagingDir, rowSchema, idSchema, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(stagingDir).getFileSystem(conf.value)
    // read ONLY the files reported by committed task attempts: a
    // killed/speculative attempt may have left a footerless (or
    // partial) file in the staging dir, which must neither fail the
    // statement nor contribute rows
    val committed = messages.collect { case m: DeltaFilesMessage => m }
    val delFiles = committed.flatMap(_.deletes).toSeq
    val insFiles = committed.flatMap(_.inserts).toSeq
    try {
      val delDf =
        if (delFiles.nonEmpty)
          Some(spark.read.schema(idSchema).parquet(delFiles: _*))
        else None
      val insDf =
        if (insFiles.nonEmpty)
          Some(spark.read.schema(rowSchema).parquet(insFiles: _*)
            .drop(LakeTable.MetaCols: _*))
        else None
      if (delDf.nonEmpty || insDf.nonEmpty)
        lake.applyDeltas(delDf, insDf, action) // one atomic commit
    } finally fs.delete(new Path(stagingDir), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(stagingDir).getFileSystem(conf.value)
    fs.delete(new Path(stagingDir), true)
  }
}

/** Paths of the parquet files one committed task attempt wrote. */
private final case class DeltaFilesMessage(
    deletes: Option[String], inserts: Option[String])
  extends WriterCommitMessage

private final class GraftDeltaWriterFactory(
    stagingDir: String,
    rowSchema: StructType,
    idSchema: StructType,
    conf: SerializableConfiguration)
  extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stagingDir, rowSchema, idSchema, conf.value,
      partitionId, taskId)
}

/** Spools deltas to two parquet files (deletes/, inserts/) using
  * Spark's ParquetWriteSupport; files are created lazily so tasks with
  * no deltas write nothing. */
private final class GraftDeltaWriter(
    stagingDir: String,
    rowSchema: StructType,
    idSchema: StructType,
    conf: Configuration,
    partitionId: Int,
    taskId: Long)
  extends DeltaWriter[InternalRow] {

  private var deleteWriter: ParquetWriter[InternalRow] = _
  private var insertWriter: ParquetWriter[InternalRow] = _
  private var deletePath: Path = _
  private var insertPath: Path = _

  private def open(sub: String, schema: StructType): ParquetWriter[InternalRow] = {
    // taskId is attempt-unique, so speculative attempts never collide
    val path = new Path(s"$stagingDir/$sub/part-$partitionId-$taskId.parquet")
    if (sub == "deletes") deletePath = path else insertPath = path
    new GraftRowParquetWriterBuilder(path, schema)
      .withConf(new Configuration(conf))
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (deleteWriter == null) deleteWriter = open("deletes", idSchema)
    deleteWriter.write(id)
  }

  override def insert(row: InternalRow): Unit = {
    if (insertWriter == null) insertWriter = open("inserts", rowSchema)
    insertWriter.write(row)
  }

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new IllegalStateException(
      "updates are represented as delete+insert") // representUpdateAsDeleteAndInsert

  override def commit(): WriterCommitMessage = {
    close()
    DeltaFilesMessage(
      Option(deletePath).map(_.toString), Option(insertPath).map(_.toString))
  }

  /** A cleanly-aborted attempt removes its files so the driver-side
    * read cannot see them even transiently; hard-killed attempts are
    * excluded anyway because commit() only reads reported files. */
  override def abort(): Unit = {
    close()
    val f = new Configuration(conf)
    Seq(Option(deletePath), Option(insertPath)).flatten.foreach { p =>
      try p.getFileSystem(f).delete(p, false)
      catch { case _: Exception => () }
    }
  }

  override def close(): Unit = {
    if (deleteWriter != null) { deleteWriter.close(); deleteWriter = null }
    if (insertWriter != null) { insertWriter.close(); insertWriter = null }
  }
}

private final class GraftRowParquetWriterBuilder(
    path: Path,
    schema: StructType)
  extends ParquetWriter.Builder[InternalRow, GraftRowParquetWriterBuilder](path) {

  override def self(): GraftRowParquetWriterBuilder = this

  override def getWriteSupport(conf: Configuration)
      : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] = {
    ParquetWriteSupport.setSchema(schema, conf)
    new ParquetWriteSupport
  }
}
