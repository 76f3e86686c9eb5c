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
  private val operation = parameters.getOrElse("operation", "upsert").toLowerCase
  require(Set("upsert", "insert", "delete")(operation),
    s"unknown sink operation '$operation' (upsert | insert | delete)")
  private val policy = DefaultSource.parseMergePolicy(parameters.get("mergePolicy"))

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

  // Guard scoped per query ([[graft.streaming.ExactlyOnce]]):
  // different queries on the same table each track their own
  // last-applied batch id. The scope key is the checkpointLocation
  // option or, for conf-resolved checkpoints
  // (spark.sql.streaming.checkpointLocation + queryName, which Spark
  // does NOT pass into DSv1 sink options), the queryName. A shared
  // fallback marker would let two independent queries swallow each
  // other's batch ids — query B's early batches silently discarded as
  // "already applied" (permanent data loss) — so with NEITHER key
  // present the sink fails fast instead.
  private val once = new graft.streaming.ExactlyOnce(spark,
    parameters.get("checkpointLocation")
      .orElse(parameters.get("queryName"))
      .getOrElse(throw new IllegalArgumentException(
        "graft streaming sink requires option checkpointLocation (or a " +
          "queryName) to scope its exactly-once batch marker per query")))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val l = lake()
    once.runOnce(l, batchId) { tag =>
      // a streaming Sink's frame can't feed new batch jobs directly:
      // re-wrap its rows as a batch frame (distributed, no collect)
      val batch = org.apache.spark.sql.graftshim.StreamBatchShim.rewrap(data)
      operation match {
        case "insert" => l.insert(batch, tag)
        case "delete" => l.delete(batch, tag)
        case _ => l.upsert(batch, policy, tag)
      }
    }
    ()
  }
}
