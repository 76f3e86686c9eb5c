package graft.queries

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LakeTable

/** The ONE fold algorithm behind the maintained BM25 search index —
  * shared by the `pipe6_incremental_bm25` gate (bootstrap and
  * increment passes) and the PropertySpec random-DML test, so the
  * DuckDB oracle and the property harness exercise the same code.
  *
  * State = three lake tables: POSTINGS keyed (doc_id, term) carrying
  * (n, len); DF stats keyed term; a one-row TOTALS table
  * (n_docs, tot_len). Each [[maintain]] call folds one batch of doc
  * churn (post-images + pre-images) in O(churn terms): a churned
  * doc's postings are one mixed tombstone+data commit, df and totals
  * are delta folds driven by the churn side — never a corpus recount
  * — and the three DISJOINT state writes run concurrently. */
private[graft] object SearchIndex {

  /** Tokens of the lowercased text — formatted from the ONE canonical
    * definition ([[TextOps.ToksExprFmt]]): the fold and the batch
    * oracle must tokenize byte-identically. */
  private val toksExpr = TextOps.ToksExprFmt.format("text")

  /** (doc_id, term, n, len) of a doc batch: len = total tokens of the
    * doc (equals the batch BM25's sum-of-n per doc), denormalized
    * onto every posting row so scoring needs no per-doc length join —
    * the doc's postings are rewritten wholesale on churn anyway. */
  def postingsOf(d: DataFrame): DataFrame = d
    .withColumn("toks", expr(toksExpr))
    .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
      explode(col("toks")).as("term"))
    .groupBy("doc_id", "term", "len").agg(count(lit(1)).as("n"))
    .select("doc_id", "term", "n", "len")

  /** BM25 top-10 per query (queries = the distinct terms of docs
    * 0-4 in the index) scored from the MAINTAINED state with the
    * shared exact-arithmetic contract ([[TextOps.Bm25]]) — used by
    * the pipe6 (batch folds) and st5 (streaming service) gates, whose
    * outputs must both hash-equal the batch BM25 oracle. */
  def scoreTop10(post: LakeTable, stats: LakeTable, totals: LakeTable)
      : DataFrame = {
    val postS = post.snapshot().select("doc_id", "term", "n", "len")
    val statsS = stats.snapshot().filter(col("df") > 0).select("term", "df")
    val totS = totals.snapshot().select(col("n_docs"),
      (col("tot_len").cast("double") / col("n_docs").cast("double"))
        .as("avgdl"))
    val qt = postS.filter(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"), col("term"))
    val contrib = postS.join(broadcast(qt), Seq("term"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(statsS, "term")
      .crossJoin(broadcast(totS))
      .select(col("q_id"), col("doc_id"), TextOps.Bm25.microCol.as("micro"))
    TextOps.Bm25.rankTopK(contrib)
  }

  /** Fold one churn batch into the index.
    *
    * @param after  post-image docs (doc_id, text) — inserts and the
    *               new text of updates
    * @param before pre-image docs of updated/deleted keys (empty on
    *               bootstrap)
    * @param ts     monotonic preCombine value for this batch
    * @param guard  per-table write wrapper. The df/totals folds are
    *               NON-idempotent (a replayed batch would
    *               double-increment), and the three writes are three
    *               commits — a crash can land between them. The
    *               streaming service passes a per-table
    *               [[graft.streaming.ExactlyOnce]] `runOnce` here, so
    *               each table independently skips a batch it already
    *               folded (tag recorded atomically with its commit)
    *               while tables missed by the crash apply it —
    *               convergent under crash-anywhere replay. The batch
    *               deltas derive ONLY from `after`/`before` (never
    *               from state), so a partial replay folds the same
    *               values the first attempt would have. Default: run
    *               directly, no tag (the batch gate's path).
    */
  def maintain(
      after: DataFrame,
      before: DataFrame,
      post: LakeTable,
      stats: LakeTable,
      totals: LakeTable,
      ts: Long,
      guard: (LakeTable, Option[String] => Unit) => Unit =
        (_, f) => f(None)): Unit = {
    val cached = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def cache(df: DataFrame) = { cached += df.persist(); df }
    // plans over the CURRENT state, pinned before the concurrent
    // writes below (snapshot() resolves its file list eagerly)
    val statsSnap = stats.snapshot()
    val totalsSnap = totals.snapshot()
    var writes: Seq[Future[Any]] = Seq.empty
    try {
      val newPost = cache(postingsOf(after))
      val oldPost = cache(postingsOf(before))
      val dfDelta = cache(newPost
        .select(col("term"), lit(1L).as("s"))
        .unionByName(oldPost.select(col("term"), lit(-1L).as("s")))
        .groupBy("term").agg(sum("s").as("ddf"))
        .filter(col("ddf") =!= 0))
      val lenDelta = newPost.groupBy("doc_id").agg(first("len").as("len"))
        .select(lit(1L).as("s"), col("len"))
        .unionByName(oldPost.groupBy("doc_id").agg(first("len").as("len"))
          .select(lit(-1L).as("s"), (-col("len")).as("len")))
        .agg(coalesce(sum(col("s")), lit(0L)).as("dnd"),
          coalesce(sum(col("len")), lit(0L)).as("dtl"))
      // three DISJOINT state tables — write them concurrently
      writes = Seq(
        Future {
          guard(post, { tag =>
            post.upsertWithDeletes(newPost.withColumn("ts", lit(ts)),
              oldPost.select("doc_id", "term"), tag = tag)
            ()
          })
        },
        Future {
          guard(stats, { tag =>
            val stored = if (statsSnap.columns.contains("term"))
              statsSnap.select(col("term"), col("df"))
            else dfDelta.select(col("term"), col("ddf").as("df")).limit(0)
            // O(churn terms), NOT O(vocabulary): only terms whose
            // presence count changed get a new version — the delta
            // side drives the join; unchanged dictionary rows are
            // never rewritten (preCombine keeps their stored version
            // at read time)
            val folded = dfDelta.join(stored, Seq("term"), "left")
              .select(col("term"),
                (coalesce(col("df"), lit(0L)) + col("ddf")).as("df"))
            stats.upsert(folded.withColumn("ts", lit(ts)), tag = tag)
            ()
          })
        },
        Future {
          guard(totals, { tag =>
            // the stored side is ONE row at most — read it driver-side
            // (a crossJoin against the stored relation would emit ZERO
            // rows when the table exists with schema but no row yet,
            // e.g. freshly CREATE TABLEd: empty × delta = empty)
            val cur =
              if (totalsSnap.columns.contains("n_docs"))
                totalsSnap.select(col("n_docs"), col("tot_len")).collect()
              else Array.empty[org.apache.spark.sql.Row]
            val (n0, l0) = cur.headOption
              .map(r => (r.getLong(0), r.getLong(1))).getOrElse((0L, 0L))
            totals.upsert(lenDelta
              .select(lit(0L).as("id"),
                (lit(n0) + col("dnd")).as("n_docs"),
                (lit(l0) + col("dtl")).as("tot_len"),
                lit(ts).as("ts")), tag = tag)
            ()
          })
        })
      writes.foreach(Await.result(_, Duration.Inf))
      ()
    } finally {
      // on a failure the other writes may still be in flight — never
      // unpersist their inputs from under them
      writes.foreach(Await.ready(_, Duration.Inf))
      cached.foreach(_.unpersist())
    }
  }
}
