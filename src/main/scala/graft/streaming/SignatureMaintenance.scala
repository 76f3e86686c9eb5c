package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.LakeTable

/** Streaming perceptual-signature maintenance: the CDC feed of a
  * media payload lake table drives a checkpointed `foreachBatch`
  * reconcile of a 64-bit signature store and a hamming-verified pairs
  * table — the STREAMING form of the maintained perceptual dedup
  * (batch gates mm7/mm10/mm12 run the same reconcile once per
  * increment; this runs it continuously), and the multimodal sibling
  * of [[NearDupMaintenance]] (text MinHash bands there; a 64-bit
  * perceptual signature here, so candidates verify straight off the
  * stored halves with no payload re-read).
  *
  * SIGNATURE-GENERIC like the reconcile it wraps: `hashFn` is the
  * modality — image aHash by default; the audio envelope and video
  * majority-fold hashes plug in unchanged, so ONE service
  * implementation maintains any of the three stores.
  *
  * Per micro-batch (CDC rows: `_change_op` i/u/d, after images +
  * `_before` struct): deleted docs' signatures leave the store and
  * upserted payloads are re-hashed (O(churn) decodes — the only
  * payload bytes ever read); candidates come from the churn's hamming
  * bands probed against the store; the pairs table reconciles in one
  * mixed tombstone+upsert commit carrying the batch id in its tag
  * ([[ExactlyOnce]]). The reconcile is STATE-based (recomputes
  * churn-adjacent pairs from current signatures), so a crash-window
  * replay converges: the signature upsert is keyed and
  * same-timestamped (idempotent), and "pairs tag present ⇒ sigs
  * batch committed" holds because the signature write is durable
  * BEFORE the tagged pairs commit
  * ([[graft.queries.MultimodalOps.phashReconcile]]'s write order).
  *
  * Bootstrap: `startCommit="0"` replays every current payload as an
  * insert, so batch 0 builds the store and pairs from the same code
  * path — no separate backfill job (the [[MvMaintenance]] convention).
  *
  * PreCombine stamps are the batch's end-offset docs commit instant
  * (pinned in the checkpoint offset log) — one version domain with
  * batch-run reconciles, monotonic across checkpoint resets, the
  * [[SearchIndexMaintenance]] convention. */
object SignatureMaintenance {

  /** JSONL decode census sidecar inside the checkpoint dir: one
    * `{"batch":…,"instant":…,"hashed":…,"dropped":…}` line per
    * non-empty micro-batch. */
  val DecodeStatsFile = "_decode_stats.jsonl"

  /** Append one census line through the checkpoint's Hadoop
    * FileSystem — NOT java.nio (local paths only; an hdfs://, s3a://,
    * or even file:/ checkpoint would throw inside foreachBatch AFTER
    * the tagged pairs commit and kill every micro-batch). Checksum
    * filesystems reject append(), so this is read + rewrite-through-
    * temp + rename (the [[ExactlyOnce]] marker pattern): the sidecar
    * is never observable half-written, and a crash mid-rewrite keeps
    * the previous file. One writer per checkpoint by construction, so
    * the fixed temp name cannot race. O(lines so far) per batch —
    * tens of bytes per line, noise next to the micro-batch itself. */
  private def appendStatsLine(
      spark: SparkSession, checkpoint: String, line: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, DecodeStatsFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val prior =
      if (!fs.exists(p)) ""
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, s".$DecodeStatsFile.tmp")
    val out = fs.create(tmp, true)
    try out.write((prior + line + "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"decode-stats rename failed: $p")
    }
  }

  /** Parse the sidecar back (for `CALL graft.system.decode_stats`):
    * (batch, instant, hashed, dropped) rows in file order; a torn
    * final line (pre-rename crash window is empty, but be lenient) is
    * skipped. Empty/missing file → no rows. */
  private[graft] def readStats(
      spark: SparkSession, checkpoint: String): Seq[(Long, Long, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, DecodeStatsFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val Line =
        """\{"batch":(-?\d+),"instant":(-?\d+),"hashed":(-?\d+),"dropped":(-?\d+)\}""".r
      txt.split("\n").toSeq.flatMap {
        case Line(b, i, h, d) => Some((b.toLong, i.toLong, h.toLong, d.toLong))
        case _ => None
      }
    }
  }

  def start(
      spark: SparkSession,
      payloadsPath: String,
      sigPath: String,
      pairsPath: String,
      checkpoint: String,
      payloadCol: String = "payload",
      hashFn: DataFrame => DataFrame =
        graft.multimodal.MediaDecoder.aHash(_, "doc_id", "payload"),
      startCommit: String = "0"): StreamingQuery = {
    require(LakeTable.exists(spark, sigPath),
      s"create the signature store (doc_id as primaryKey) first: $sigPath")
    require(LakeTable.exists(spark, pairsPath),
      s"create the pairs table ((a, b) as primaryKey) first: $pairsPath")
    // the CDC source fixes its schema at stream start; a payload table
    // with no commits would bind a metadata-only feed (the
    // NearDupMaintenance precondition). payloadCol checked here too:
    // a misnamed payload column must fail fast with the service's own
    // message, not as an opaque streaming analysis error after start
    val payloadFields = LakeTable.load(spark, payloadsPath)
      .schema.fieldNames.toSet
    require(Seq("doc_id", payloadCol).forall(payloadFields.contains),
      s"payloads table needs a first commit (schema with doc_id and " +
        s"'$payloadCol') before attaching maintenance: $payloadsPath")
    val once = new ExactlyOnce(spark, checkpoint)
    spark.readStream.format("graft")
      .option("queryType", "cdc")
      .option("startCommit", startCommit)
      .load(payloadsPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sigs = LakeTable.load(spark, sigPath)
        val pairs = LakeTable.load(spark, pairsPath)
        once.runOnce(pairs, batchId) { tag =>
          // persist the CDC micro-batch once: the churn/deleted splits
          // and the reconcile's candidate probe all consume it
          val batchC = batch.persist()
          try {
            if (!batchC.isEmpty) {
              val (ups, deletedIds) = LakeTable.cdcUpsertsAndDeletes(
                batchC, "doc_id", Seq(payloadCol))
              val upserted = ups.withColumnRenamed(payloadCol, "payload")
              val ts = OffsetLog
                .endOffsetInstant(spark, checkpoint, batchId).toLong
              val stats = graft.queries.MultimodalOps.phashReconcile(
                upserted, deletedIds, sigs, pairs, ts, tag = tag,
                hashFn = hashFn)
              // per-batch decode census, appended to a checkpoint
              // sidecar: the service's drop-rate is a monitored
              // number, not an invisible one. Written AFTER the
              // tagged pairs commit — a crash loses at most the last
              // line, never records a batch that didn't land; a
              // replayed batch (marker lost) appends a duplicate
              // line, which an aggregation by batch id collapses.
              val line = s"""{"batch":$batchId,"instant":$ts,""" +
                s""""hashed":${stats.hashed},"dropped":${stats.dropped}}"""
              appendStatsLine(spark, checkpoint, line)
            }
          } finally batchC.unpersist()
        }
        ()
      }
      .start()
  }
}
