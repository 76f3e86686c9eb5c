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

  /** Monotonic high-water mark over offered offsets (same guard as
    * [[GraftCdcSource]]): the inflight fence below can REGRESS — a
    * slow writer's marker surfacing after a newer commit was already
    * offered — and offering the lower instant would make the engine
    * record it as the committed end offset and re-emit the already-
    * delivered range on the next trigger. Seeded from every restored
    * checkpoint offset ([[deserializeOffset]]) so the guard holds
    * across restarts, not just within a session. */
  @volatile private var highWater: String = startCommit

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
    val floor = if (fenced < startCommit) startCommit else fenced
    val eff = if (floor < highWater) highWater else floor
    highWater = eff
    CommitOffset(eff)
  }

  override def deserializeOffset(json: String): Offset = {
    val instant = OffsetLog.instantOf(json)
    if (instant > highWater) highWater = instant
    CommitOffset(instant)
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
    if (entries.isEmpty) return Array.empty
    def plan(paths: Seq[String], syntheticCt: String): Array[InputPartition] =
      ParquetTable("graft-stream", spark,
        CaseInsensitiveStringMap.empty(), paths.toList,
        Some(fileSchema), classOf[ParquetFileFormat])
        .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
        .toBatch.planInputPartitions()
        .map(p => RangedPartition(p, begin, until, syntheticCt): InputPartition)
    // external (bootstrap-adopted) files carry no _commit_time column —
    // the raw read yields nulls and the range filter would silently
    // drop every adopted row. The batch incremental query synthesizes
    // the adopting commit's instant for them (readLive); mirror that
    // here by planning external files per adopting instant with that
    // instant as the rows' synthetic commit time. Typically one group
    // (the bootstrap commit); native files plan as one batch.
    val (external, native) = entries.partition(_.external)
    val nativeParts =
      if (native.isEmpty) Array.empty[InputPartition]
      else plan(native.map(e => lake.abs(e.path)), null)
    val externalParts = external.groupBy(_.instant).toSeq.sortBy(_._1)
      .flatMap { case (instant, es) =>
        plan(es.map(e => lake.abs(e.path)), instant)
      }
    nativeParts ++ externalParts
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
      prepended.length, outputSchema.fields.map(_.dataType),
      if (needsCtProjection) -1
      else outputSchema.fieldIndex(LakeTable.CommitTimeCol))
}

/** An inner parquet partition plus the commit range its rows must lie
  * in. `syntheticCt` (nullable) stands in for a missing per-row
  * `_commit_time` — external bootstrap files carry none, and their
  * rows all belong to the adopting commit. Locality hints delegate to
  * the wrapped parquet partition: dropping them would schedule every
  * micro-batch's tasks blind to block placement. */
final case class RangedPartition(
    inner: InputPartition, begin: String, until: String,
    syntheticCt: String) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Row-filtering wrapper: keeps rows with begin < _commit_time <= until
  * (a null stored commit time takes the partition's `syntheticCt` —
  * external bootstrap rows), drops MOR tombstone rows
  * (`delOrdinal` >= 0), shifts off the `numPrepended` internal leading
  * columns so the output matches the pruned schema exactly, and — when
  * the output RETAINS `_commit_time` (`outCtOrdinal` >= 0) —
  * materializes the synthetic instant into it, matching the batch
  * incremental query's readLive synthesis. */
final class CommitRangeFilterFactory(
    inner: PartitionReaderFactory,
    ctOrdinal: Int,
    delOrdinal: Int,
    numPrepended: Int,
    outTypes: Array[DataType],
    outCtOrdinal: Int)
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
          val s = if (ct != null) ct.toString else rp.syntheticCt
          if (s != null && !isTombstone) {
            if (s > rp.begin && s <= rp.until) {
              val sub = if (ct == null && outCtOrdinal >= 0) s else null
              current =
                if (numPrepended == 0 && sub == null) row
                else project(row, sub)
              return true
            }
          }
        }
        false
      }
      private def project(row: InternalRow, sub: String): InternalRow = {
        val out = new GenericInternalRow(outTypes.length)
        var i = 0
        while (i < outTypes.length) {
          // internal columns (commit time / tombstone marker) are
          // prepended; shift them off
          out.update(i, if (row.isNullAt(i + numPrepended)) null
            else row.get(i + numPrepended, outTypes(i)))
          i += 1
        }
        if (sub != null)
          out.update(outCtOrdinal,
            org.apache.spark.unsafe.types.UTF8String.fromString(sub))
        out
      }
      override def get(): InternalRow = current
      override def close(): Unit = delegate.close()
    }
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException("row-based only")
}
