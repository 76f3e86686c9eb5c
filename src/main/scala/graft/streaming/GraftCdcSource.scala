package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.types.StructType

import graft.core.LakeTable

/** V1 streaming offset = a commit instant (lexicographically ordered). */
final case class CdcOffset(instant: String) extends Offset {
  override def json(): String = s"""{"instant":"$instant"}"""
}

/** Streaming CDC source: each micro-batch is the NET change feed of
  * the commits in `(lastOffset, latestOffset]` — `_change_op` i/u/d
  * rows with after images and a `_before` struct, exactly
  * [[LakeTable.cdc]] evaluated per batch (the Hudi Flink
  * `changelog.enabled` streaming-read analog; the row-tailing
  * [[CommitTailStream]] surfaces appended versions only — no deletes,
  * no before images).
  *
  * Built on the V1 `Source` API deliberately: `getBatch` returns a
  * DataFrame, so the CDC join program (candidate keys → pruned
  * before/after images → full-outer diff) runs as a normal Spark plan
  * per batch. Offsets are commit instants: replayed batches rebuild
  * the identical net diff as long as the range's files have not been
  * cleaned — savepoint the stream's baseline to pin them. Latest
  * offset is fenced at the earliest inflight writer (same rule as
  * [[CommitTailStream]]) so a slow concurrent writer's commit is
  * never skipped.
  */
final class GraftCdcSource(
    spark: SparkSession,
    lake: LakeTable,
    startCommit: String)
  extends Source {

  override val schema: StructType = lake.cdcSchema

  /** Monotonic high-water mark over offered offsets: the inflight
    * fence can REGRESS (a slow writer's marker surfacing after a newer
    * commit was already offered), and re-offering the lower instant
    * would make the engine re-emit an already-delivered range —
    * at-least-once duplicates that a net-change consumer (an MV fold)
    * would double-apply. Never offer below what we already offered.
    * Re-seeded from the restored checkpoint offsets in [[getBatch]]
    * (the engine's WAL replay runs before any fresh [[getOffset]]), so
    * the guard holds across restarts too — a fence regression
    * straddling a restart would otherwise re-deliver the last
    * checkpointed range under a NEW batch id, past the per-batch
    * exactly-once tags. The empty-batch guard in [[batchFrame]] stays
    * as a defensive backstop, not a load-bearing path. */
  @volatile private var highWater: String = startCommit

  override def getOffset: Option[Offset] = {
    val latest = lake.timeline.latestInstant().getOrElse(startCommit)
    val fenced = lake.timeline.earliestActiveInflight() match {
      case Some(inflight) if inflight <= latest =>
        lake.timeline.commits().map(_.instant)
          .filter(_ < inflight).lastOption.getOrElse(startCommit)
      case _ => latest
    }
    val eff = if (fenced < highWater) highWater else fenced
    highWater = eff
    if (eff <= startCommit) None else Some(CdcOffset(eff))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val begin = start match {
      case Some(CdcOffset(i)) => i
      case Some(o) => parse(o.json())
      case None => startCommit
    }
    val until = end match {
      case CdcOffset(i) => i
      case o => parse(o.json())
    }
    // restart re-seed: begin/until come from the restored checkpoint
    // during WAL replay — never offer below what a previous run of
    // this query already delivered
    if (begin > highWater) highWater = begin
    if (until > highWater) highWater = until
    // V1 contract: the returned frame must carry isStreaming=true
    org.apache.spark.sql.graftshim.StreamBatchShim.asStreaming(
      batchFrame(begin, until))
  }

  /** The batch's change-set as a plain (batch) DataFrame — getBatch
    * minus the isStreaming stamp; unit-testable directly. */
  private[graft] def batchFrame(begin: String, until: String): DataFrame =
    // a fence-regressed end offset (slow writer's inflight marker
    // surfacing after a newer commit was processed) must yield an
    // EMPTY batch — cdc(begin > until) would diff the images the
    // wrong way round and emit spurious deletes
    if (until <= begin)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else conform(lake.cdc(begin, Some(until)))

  /** Aligns a batch's frame to the DECLARED schema: a range that
    * starts before an additive schema evolution carries an older-era
    * `_before` struct (and possibly fewer after-columns); pad the
    * missing fields with typed nulls so every micro-batch binds to
    * the same streaming attributes. */
  private def conform(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    if (df.schema == schema) return df
    val beforeType = schema(LakeTable.BeforeImageCol).dataType
      .asInstanceOf[StructType]
    val haveBefore = df.schema(LakeTable.BeforeImageCol).dataType
      .asInstanceOf[StructType].fieldNames.toSet
    val have = df.columns.toSet
    val cols = schema.fields.map {
      case f if f.name == LakeTable.BeforeImageCol =>
        // null stays null; present fields carry over, new-era ones pad
        when(col(f.name).isNull, lit(null).cast(beforeType))
          .otherwise(struct(beforeType.fields.toIndexedSeq.map { bf =>
            (if (haveBefore.contains(bf.name))
              col(s"${f.name}.${bf.name}")
            else lit(null).cast(bf.dataType)).as(bf.name)
          }: _*).cast(beforeType))
          .as(f.name)
      case f if have.contains(f.name) => col(f.name)
      case f => lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  private def parse(json: String): String = OffsetLog.instantOf(json)

  override def stop(): Unit = ()
}
