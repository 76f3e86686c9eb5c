package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.LakeTable

/** Production-shape streaming near-duplicate maintenance: the CDC feed
  * of a documents lake table drives a checkpointed `foreachBatch`
  * reconciliation of an LSH signature store and a verified-pairs
  * table. The batch gate `pipe4_incremental_neardup` is the same
  * operator run once; this wires it to run CONTINUOUSLY — dedup state
  * stays current as the corpus ingests, at O(churn) per micro-batch,
  * never a full-corpus LSH rebuild.
  *
  * Per micro-batch (CDC rows: `_change_op` i/u/d, after images +
  * `_before` struct):
  *   1. deleted docs' signatures leave the store (keyed delete);
  *      upserted docs are re-shingled/re-hashed and their PACKED band
  *      signatures upserted — both idempotent on replay;
  *   2. candidates = the churn's exploded bands equi-joined against
  *      the store (which now holds CURRENT signatures of the whole
  *      corpus), exact-Jaccard-verified against a candidate-pruned
  *      slice of the docs snapshot;
  *   3. the pairs table reconciles in ONE 3-clause merge — delete
  *      stored pairs touching churn that no longer qualify, update
  *      re-verified ones, insert new ones — committed with the batch
  *      id in its tag ([[ExactlyOnce]]).
  *
  * Unlike the MV delta fold, this reconciliation is STATE-based (it
  * recomputes churn-adjacent pairs from current signatures rather than
  * incrementing), so a replayed batch converges to the same state; the
  * batch tag still short-circuits replays so a restart never pays the
  * LSH pass twice, and the signature-upsert→pairs-merge crash window
  * re-runs from the signature step, which is idempotent.
  *
  * Bootstrap: `startCommit="0"` replays every current doc as an
  * insert, so batch 0 builds the store and pairs from the same code
  * path — no separate backfill job (the MvMaintenance convention).
  *
  * Scale: every join is keyed (band key, doc_id, or pair key); the
  * only relation ever re-shingled is the churn plus its candidate
  * partners; the pairs semi-joins split the OR-of-keys into two hash
  * semi-joins. No full-corpus stage anywhere after batch 0. */
object NearDupMaintenance {

  def start(
      spark: SparkSession,
      docsPath: String,
      sigPath: String,
      pairsPath: String,
      checkpoint: String,
      startCommit: String = "0",
      // optional band-posting index (NearDupIndex.reconcile's postings
      // contract): create it keyed (bk, doc_id) with statsColumns
      // (bk, ts) and attach it from the service's FIRST batch
      postingsPath: Option[String] = None,
      // fold cadence: every N batches re-cluster the sig store (by
      // fp), the posting index (by bk) and the pairs table, folding
      // the accumulated delta tails so the tiered MOR merge and the
      // col-stats file skipping stay O(churn) between folds. 0 = off
      // (tiny fixtures; an external table-service cadence). The fold
      // is a replace commit — OCC-safe, and a crash mid-fold leaves
      // the table unchanged.
      clusterEvery: Int = 0): StreamingQuery = {
    require(LakeTable.exists(spark, sigPath),
      s"create the signature store (doc_id as primaryKey) first: $sigPath")
    require(LakeTable.exists(spark, pairsPath),
      s"create the pairs table ((a, b) as primaryKey) first: $pairsPath")
    postingsPath.foreach(p => require(LakeTable.exists(spark, p),
      s"create the posting index ((bk, doc_id) as primaryKey) first: $p"))
    // the CDC source fixes its schema when the stream starts; a table
    // with no commits yet has no data columns, so the maintenance
    // query would bind to a metadata-only feed and never see doc_id
    require(LakeTable.load(spark, docsPath).schema.fieldNames.contains("doc_id"),
      s"docs table needs a first commit (schema with doc_id) before " +
        s"attaching maintenance: $docsPath")
    val once = new ExactlyOnce(spark, checkpoint)
    spark.readStream.format("graft")
      .option("queryType", "cdc")
      .option("startCommit", startCommit)
      .load(docsPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sigs = LakeTable.load(spark, sigPath)
        val pairs = LakeTable.load(spark, pairsPath)
        val postings = postingsPath.map(LakeTable.load(spark, _))
        once.runOnce(pairs, batchId) { tag =>
          applyBatch(spark, docsPath, sigs, pairs, batch, checkpoint,
            batchId, tag, postings)
        }
        // maintenance fold OUTSIDE the exactly-once block: clustering
        // rewrites state, never content — replaying or skipping a
        // fold is always sound
        if (clusterEvery > 0 && batchId > 0 && batchId % clusterEvery == 0) {
          sigs.withOcc()(sigs.cluster(Seq("fp")))
          postings.foreach(p => p.withOcc()(p.cluster(Seq("bk"))))
          pairs.withOcc()(pairs.cluster())
        }
        ()
      }
      .start()
  }

  private def applyBatch(
      spark: SparkSession,
      docsPath: String,
      sigs: LakeTable,
      pairs: LakeTable,
      batch: DataFrame,
      checkpoint: String,
      batchId: Long,
      tag: Option[String],
      postings: Option[LakeTable] = None): Unit = {
    // persist the CDC micro-batch once: the churn/deleted splits and
    // the reconciliation's own consumers would otherwise re-run the
    // CDC net-diff per job on this continuously-hot path
    val batchC = batch.persist()
    try {
      if (batchC.isEmpty) return // empty micro-batch: no state to change
      val (upserted, deletedIds) = LakeTable.cdcUpsertsAndDeletes(
        batchC, "doc_id", Seq("text"))
      val docsSnap = LakeTable.load(spark, docsPath).snapshot()
        .select("doc_id", "text")
      // preCombine stamp = this batch's END-OFFSET docs commit instant
      // (pinned in the checkpoint offset log): ONE version domain with
      // the `CALL graft.system.maintain_neardups` procedure, which
      // stamps docs commit instants — a CALL-bootstrapped store hands
      // over to streaming cleanly (batch-id stamps, being tiny, would
      // LOSE every read-side merge against bootstrap-era rows and the
      // stream's updates would be silently ignored). Monotonic across
      // checkpoint resets too, unlike batch ids. Same convention as
      // [[SearchIndexMaintenance]].
      val ts = OffsetLog.endOffsetInstant(spark, checkpoint, batchId).toLong
      // candidate verification reads the docs table KEY-PRUNED
      // (snapshotForKeys bounds; candidates are O(churn) per batch)
      // instead of semi-joining the full snapshot scan
      val lookup = (ids: Seq[Long]) =>
        LakeTable.load(spark, docsPath)
          .snapshotForKeys(ids.map(_.toString).toSet)
          .select("doc_id", "text")
      graft.queries.NearDupIndex.reconcile(
        upserted, deletedIds, docsSnap, sigs, pairs, ts, tag,
        postings = postings, docsLookup = Some(lookup))
    } finally batchC.unpersist()
  }
}
