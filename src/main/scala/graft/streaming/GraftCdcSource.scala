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

  override def getOffset: Option[Offset] = {
    val latest = lake.timeline.latestInstant().getOrElse(startCommit)
    val fenced = lake.timeline.earliestActiveInflight() match {
      case Some(inflight) if inflight <= latest =>
        lake.timeline.commits().map(_.instant)
          .filter(_ < inflight).lastOption.getOrElse(startCommit)
      case _ => latest
    }
    val eff = if (fenced < startCommit) startCommit else fenced
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
    // V1 contract: the returned frame must carry isStreaming=true
    org.apache.spark.sql.graft.StreamFrame.asStreaming(
      lake.cdc(begin, Some(until)))
  }

  private def parse(json: String): String =
    "\"instant\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(json) match {
      case Some(g) => g.group(1)
      case None => throw new IllegalArgumentException(s"bad offset: $json")
    }

  override def stop(): Unit = ()
}
