package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** The ONE streaming drain harness behind the st2/st3/st4 parity
  * gates — the subtlest choreography in the repo, kept in a single
  * place so a watermark-semantics fix can never land in two gates out
  * of three.
  *
  * What it owns:
  *
  *  - **State-store partition pin**: the state-store partition count
  *    is fixed by `spark.sql.shuffle.partitions` at QUERY START and
  *    each partition checkpoints its own delta files per batch — 8
  *    stores instead of 32 quarters the fixed checkpoint I/O at gate
  *    scale (a production deployment sizes this to its key
  *    cardinality). The conf is set around `start` only and restored
  *    immediately; the session conf is never left dirty.
  *
  *  - **Two-sentinel drain cascade** ([[runWithSentinels]]): a
  *    watermarked stateful query has no end-of-input flush, so each
  *    gate appends far-future SENTINEL rows to the file source to
  *    drive event time. The cascade is two sentinels + three
  *    `processAllAvailable()` drains because (a) the watermark
  *    advances at a batch's END, and (b) append-mode emission /
  *    event-time timeouts fire in the NEXT data batch — so sentinel
  *    2's batch is what flushes the state sentinel 1 closed. Sentinel
  *    rows must flow THROUGH the stateful operator and be excluded at
  *    readout: a filter above `withWatermark` gets pushed below the
  *    watermark collector by the optimizer, and the sentinels would
  *    then never advance event time (observed: the last day's windows
  *    never flush).
  *
  *  - **Single-batch drain** ([[drainOnce]], st3): an INNER
  *    stream-stream join emits matches as both sides arrive, so one
  *    AvailableNow run is complete — PROVIDED the whole staged input
  *    plans as ONE micro-batch. The gates' file sources never set
  *    `maxFilesPerTrigger` (a per-source option; no session conf can
  *    inject it), which is exactly the property this relies on: were
  *    the drain split, a watermark advancing between batches could
  *    evict join state and drop late matches the batch oracle keeps.
  *    Keep the sources option-free or switch the gate to the sentinel
  *    cascade. */
private[queries] object StreamDrain {

  /** Pin the state-store partition count while `start` materializes
    * the query (restoring the session conf immediately), then run the
    * sentinel cascade: one initial drain, then for each sentinel
    * writer append-its-rows → drain. Stops the query afterwards. */
  def runWithSentinels(
      s: SparkSession,
      start: () => StreamingQuery,
      sentinels: Seq[() => Unit],
      stateParts: Int = 8): Unit = {
    val q = pinned(s, stateParts)(start())
    try {
      q.processAllAvailable()
      sentinels.foreach { write => write(); q.processAllAvailable() }
    } finally q.stop()
  }

  /** Pin the state-store partition count, run one AvailableNow query
    * to completion. See the class doc for the single-batch-drain
    * completeness contract this carries for inner joins. */
  def drainOnce(
      s: SparkSession,
      start: () => StreamingQuery,
      stateParts: Int = 8): Unit =
    pinned(s, stateParts)(start()).awaitTermination()

  private def pinned[T](s: SparkSession, stateParts: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
      body
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
