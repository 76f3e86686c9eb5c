package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.core.LakeTable

/** Streaming offset = a commit instant (lexicographically ordered). */
final case class CommitOffset(instant: String) extends Offset {
  override def json(): String = s"""{"instant":"$instant"}"""
}

/** Commit-tailing micro-batch source (SURVEY §2.10 ST4 / §2.1 S11 —
  * the Flink `READ_AS_STREAMING` + `READ_START_COMMIT` surface,
  * HudiDemo.java:38-39): each micro-batch reads the records written by
  * the commits in `(lastOffset, latestOffset]`.
  *
  * File planning delegates to Spark's parquet scan over just the files
  * those commits added; a row-level `(begin, end]` filter on
  * `_commit_time` excludes rewritten-but-unchanged rows carried along
  * by COW rewrites — the same semantics as the batch incremental
  * query. Output honors Spark's column pruning (`outputSchema`); the
  * commit-time column is read internally and projected away when not
  * requested. At scale each micro-batch plans only the new commits'
  * files: no table-wide listing or scan ever happens.
  */
final class CommitTailStream(
    spark: SparkSession,
    lake: LakeTable,
    options: CaseInsensitiveStringMap,
    outputSchema: StructType)
  extends MicroBatchStream {

  /** Schema physically read: pruned columns plus `_commit_time` for
    * the range filter (prepended when not already requested) and, on
    * MOR tables, the `_deleted` tombstone marker — tombstone delta
    * rows carry nulled data columns and MUST NOT surface as phantom
    * records; the reader drops them and projects the marker away.
    * (The stream is a per-commit CHANGELOG: intermediate versions of
    * a key each appear with their own commit; only tombstones are
    * filtered. The batch incremental query returns the post-merge
    * view instead. Caveat, shared with Hudi incremental reads over a
    * compacted/cleaned range: compaction keeps only each key's
    * winning version, so a batch window that spans a compaction
    * emits the merged survivors of that window, not every
    * intermediate version — a caught-up stream is unaffected because
    * it consumes commits before any later compaction folds them.) */
  private val needsCtProjection =
    !outputSchema.fieldNames.contains(LakeTable.CommitTimeCol)
  private val isMor: Boolean = lake.props.tableType == "mor"
  private val prepended: Seq[StructField] =
    (if (needsCtProjection)
      Seq(StructField(LakeTable.CommitTimeCol, StringType, nullable = true))
    else Seq.empty) ++
      (if (isMor)
        Seq(StructField(LakeTable.DeletedCol,
          org.apache.spark.sql.types.BooleanType, nullable = true))
      else Seq.empty)
  private val fileSchema: StructType =
    StructType(prepended ++ outputSchema.fields)
  private val ctOrdinal: Int =
    fileSchema.fieldIndex(LakeTable.CommitTimeCol)
  private val delOrdinal: Int =
    if (isMor) fileSchema.fieldIndex(LakeTable.DeletedCol) else -1

  private val startCommit: String =
    Option(options.get("startCommit")).getOrElse("0")

  override def initialOffset(): Offset = CommitOffset(startCommit)

  /** Newest committed instant, FENCED at the earliest instant a
    * concurrent writer is still working on: a slower writer holding a
    * lower instant that commits after this batch was planned would
    * otherwise be skipped forever (its instant falls before the next
    * batch's begin offset). */
  override def latestOffset(): Offset = {
    val latest = lake.timeline.latestInstant().getOrElse(startCommit)
    val fenced = lake.timeline.earliestActiveInflight() match {
      case Some(inflight) if inflight <= latest =>
        lake.timeline.commits().map(_.instant)
          .filter(_ < inflight).lastOption.getOrElse(startCommit)
      case _ => latest
    }
    CommitOffset(if (fenced < startCommit) startCommit else fenced)
  }

  override def deserializeOffset(json: String): Offset = {
    val m = "\"instant\"\\s*:\\s*\"([^\"]*)\"".r
    m.findFirstMatchIn(json) match {
      case Some(g) => CommitOffset(g.group(1))
      case None => throw new IllegalArgumentException(s"bad offset: $json")
    }
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val begin = start.asInstanceOf[CommitOffset].instant
    val until = end.asInstanceOf[CommitOffset].instant
    if (until <= begin) return Array.empty
    // WAL-replayed batch older than the archive boundary: per-instant
    // as-of is gone (liveFiles would throw and permanently brick the
    // query on every restart). Fall back to ALL current live files —
    // rewrites preserve per-row commit times, so the row-level
    // (begin, until] filter still selects exactly the range's
    // surviving rows; it just scans more files for this one batch.
    val archivedPast =
      lake.timeline.readCheckpoint().exists(cp => until < cp.asOf)
    val entries =
      if (archivedPast) lake.timeline.liveFiles(None)
      else lake.timeline.liveFiles(Some(until)).filter(_.instant > begin)
    val files = entries.map(e => lake.abs(e.path))
    if (files.isEmpty) return Array.empty
    val inner = ParquetTable("graft-stream", spark,
      CaseInsensitiveStringMap.empty(), files.toList,
      Some(fileSchema), classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    inner.toBatch.planInputPartitions()
      .map(p => RangedPartition(p, begin, until): InputPartition)
  }

  /** One factory for the whole stream: Spark's parquet reader factory
    * is stateless w.r.t. the file list (files travel inside each
    * FilePartition), so a factory built from a template scan over an
    * empty file set reads any batch's partitions. */
  private lazy val innerFactory: PartitionReaderFactory =
    ParquetTable("graft-stream-template", spark,
      CaseInsensitiveStringMap.empty(), Nil,
      Some(fileSchema), classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      .toBatch.createReaderFactory()

  override def createReaderFactory(): PartitionReaderFactory =
    new CommitRangeFilterFactory(innerFactory, ctOrdinal, delOrdinal,
      prepended.length,
      if (prepended.nonEmpty) outputSchema.fields.map(_.dataType) else null)
}

/** An inner parquet partition plus the commit range its rows must lie in. */
final case class RangedPartition(
    inner: InputPartition, begin: String, until: String) extends InputPartition

/** Row-filtering wrapper: keeps rows with begin < _commit_time <= until,
  * drops MOR tombstone rows (`delOrdinal` >= 0), and, when
  * `projectTypes` is non-null, drops the `numPrepended` internal
  * leading columns so the output matches the pruned schema exactly. */
final class CommitRangeFilterFactory(
    inner: PartitionReaderFactory,
    ctOrdinal: Int,
    delOrdinal: Int,
    numPrepended: Int,
    projectTypes: Array[DataType])
  extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rp = partition.asInstanceOf[RangedPartition]
    val delegate = inner.createReader(rp.inner)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (delegate.next()) {
          val row = delegate.get()
          val ct = row.getUTF8String(ctOrdinal)
          val isTombstone =
            delOrdinal >= 0 && !row.isNullAt(delOrdinal) &&
              row.getBoolean(delOrdinal)
          if (ct != null && !isTombstone) {
            val s = ct.toString
            if (s > rp.begin && s <= rp.until) {
              current = if (projectTypes == null) row else project(row)
              return true
            }
          }
        }
        false
      }
      private def project(row: InternalRow): InternalRow = {
        val out = new GenericInternalRow(projectTypes.length)
        var i = 0
        while (i < projectTypes.length) {
          // internal columns (commit time / tombstone marker) are
          // prepended; shift them off
          out.update(i, if (row.isNullAt(i + numPrepended)) null
            else row.get(i + numPrepended, projectTypes(i)))
          i += 1
        }
        out
      }
      override def get(): InternalRow = current
      override def close(): Unit = delegate.close()
    }
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException("row-based only")
}
