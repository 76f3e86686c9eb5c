package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink

import graft.core.{LakeTable, MergePolicy, TableProps}

/** Streaming upsert sink: every micro-batch becomes one keyed-upsert
  * (or insert/delete) commit on the lake table. Exactly-once: the
  * per-query batch id is recorded atomically WITH the commit (the
  * commit's `tag`), so a crash between the commit and the sidecar
  * `_streaming/` marker write cannot replay the batch — not even for
  * `operation=insert`, which does no key merge. The sidecar marker is
  * just the fast path for the common clean-restart case.
  */
final class GraftStreamSink(
    spark: SparkSession,
    rawParameters: Map[String, String]) extends Sink {

  private val parameters: Map[String, String] =
    org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(rawParameters)

  private val path = parameters.getOrElse("path",
    throw new IllegalArgumentException("graft streaming sink requires a path"))
  private val operation = parameters.getOrElse("operation", "upsert")
  private val policy = parameters.get("mergePolicy") match {
    case Some("overwrite") => MergePolicy.OverwriteWithLatest
    case _ => MergePolicy.LatestByOrdering
  }

  private def lake(): LakeTable =
    if (LakeTable.exists(spark, path)) LakeTable.load(spark, path)
    else LakeTable.create(spark, path, TableProps(
      name = new Path(path).getName,
      primaryKey = parameters.getOrElse("primaryKey",
        throw new IllegalArgumentException(
          "first streaming write to a new graft table requires option primaryKey"))
        .split(",").map(_.trim).toSeq,
      preCombineField = parameters.get("preCombineField").filter(_.nonEmpty),
      partitionFields = parameters.get("partitionFields")
        .map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty),
      writeSaltBuckets = parameters.getOrElse("writeSaltBuckets", "1").toInt,
      bucketIndexBuckets =
        parameters.getOrElse("bucketIndexBuckets", "0").toInt))

  // marker scoped per query: different queries on the same table each
  // track their own last-applied batch id. The scope key is the
  // checkpointLocation option or, for conf-resolved checkpoints
  // (spark.sql.streaming.checkpointLocation + queryName, which Spark
  // does NOT pass into DSv1 sink options), the queryName. A shared
  // fallback marker would let two independent queries swallow each
  // other's batch ids — query B's early batches silently discarded as
  // "already applied" (permanent data loss) — so with NEITHER key
  // present the sink fails fast instead.
  private val markerName: String = {
    val scope = parameters.get("checkpointLocation")
      .orElse(parameters.get("queryName"))
      .getOrElse(throw new IllegalArgumentException(
        "graft streaming sink requires option checkpointLocation (or a " +
          "queryName) to scope its exactly-once batch marker per query"))
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(scope.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"last_batch_$h"
  }

  private def markerPath(l: LakeTable) =
    new Path(l.basePath, s"_streaming/$markerName")

  private def lastBatchId(l: LakeTable): Long = {
    val p = markerPath(l)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  private def writeBatchId(l: LakeTable, id: Long): Unit = {
    val p = markerPath(l)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Highest batch id recorded in a commit tag for this query — the
    * crash-window safety net. O(#active commits) driver-side JSON,
    * plus the archive checkpoint's folded tags: archiving is
    * user-triggerable at any cadence (CALL archive_commits), so the
    * tagged commit is NOT guaranteed to still be active on replay. */
  private def committedBatchId(l: LakeTable): Long = {
    val active = l.timeline.commits().flatMap(_.tag).collect {
      case t if t.startsWith(markerName + "=") =>
        t.stripPrefix(markerName + "=").toLong
    }
    val archived = l.timeline.readCheckpoint()
      .flatMap(_.tags.get(markerName))
    (active ++ archived).foldLeft(-1L)(math.max)
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val l = lake()
    if (batchId <= lastBatchId(l)) return // clean replay after restart
    if (committedBatchId(l) >= batchId) {
      // committed but the marker write was lost (crash in between):
      // repair the marker, do not re-apply
      writeBatchId(l, batchId)
      return
    }
    // a streaming Sink's frame can't feed new batch jobs directly:
    // re-wrap its rows as a batch frame (distributed, no collect)
    val batch = org.apache.spark.sql.graftshim.StreamBatchShim.rewrap(data)
    val tag = Some(s"$markerName=$batchId")
    operation match {
      case "insert" => l.insert(batch, tag)
      case "delete" => l.delete(batch, tag)
      case _ => l.upsert(batch, policy, tag)
    }
    writeBatchId(l, batchId)
  }
}
