package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.LakeTable

/** The SECOND JVM of the cross-process OCC smoke (TableServicesSpec
  * "instant arbitration holds across separate JVMs"): a standalone
  * writer process performing N sequential upserts into its own
  * partition of an existing table, counting whole-write OCC retries.
  * The in-process 8-writer oracle races separate `LakeTable.load`
  * handles inside ONE JVM; the instant-arbitration fix
  * (`Timeline.scala` `exclusiveCreate` — O_EXCL marker claim) exists
  * for writers in DIFFERENT processes, where no JVM monitor can
  * serialize the claim — this main is that other process.
  *
  * Start protocol (maximizes commit overlap despite the ~15 s Spark
  * cold start): touch `<syncDir>/ready.<writerId>` once the table
  * handle is loaded, then spin until `<syncDir>/go` appears, then
  * write. Prints one machine-readable line
  * `[occjvm] writer=<id> commits=<n> attempts=<a> rows=<r>` on
  * success; any failure exits nonzero.
  *
  * Args: tablePath writerId nCommits rowsPer partition syncDir
  */
object OccJvmWriter {

  def main(args: Array[String]): Unit = {
    if (args(0) == "markers") { markersMain(args.drop(1)); return }
    val Array(path, writerId, nCommitsS, rowsPerS, part, syncDir) = args
    val nCommits = nCommitsS.toInt
    val rowsPer = rowsPerS.toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("occ-jvm-writer")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = LakeTable.load(spark, path)
    val base = writerId.toInt * 1000000
    new java.io.File(syncDir, s"ready.$writerId").createNewFile()
    val go = new java.io.File(syncDir, "go")
    val waitStart = System.currentTimeMillis()
    while (!go.exists()) {
      if (System.currentTimeMillis() - waitStart > 120000L)
        sys.error("go file never appeared")
      Thread.sleep(20)
    }
    var attempts = 0
    (1 to nCommits).foreach { c =>
      var done = false
      while (!done) {
        try {
          attempts += 1
          t.upsert((1 to rowsPer)
            .map(i => (base + (c - 1) * rowsPer + i, s"j$writerId-c$c",
              c.toLong, part))
            .toDF("id", "v", "ts", "dt"))
          done = true
        } catch {
          case e: graft.core.CommitConflictException =>
            if (attempts > 200) throw new IllegalStateException(
              s"writer $writerId: conflict not resolving", e)
        }
      }
    }
    println(s"[occjvm] writer=$writerId commits=$nCommits " +
      s"attempts=$attempts rows=${nCommits * rowsPer}")
    spark.stop()
    sys.exit(0)
  }

  /** `markers` mode — the deterministic arbitration race: tight-loop
    * `Timeline.beginWrite` claims (no Spark, no data writes — a claim
    * costs ~1 ms, so two processes flood the same wall-clock
    * milliseconds by construction), never clearing a marker during
    * the loop (a cleared name could be legitimately re-claimed by the
    * peer and fake a collision). Claimed instants go to
    * `<syncDir>/claims.<writerId>`, one per line; the spec asserts
    * the two processes' claim sets are DISJOINT — under the
    * pre-round-12 non-atomic exists-then-create, same-millisecond
    * claims of one name by both processes succeed on both sides and
    * the sets intersect.
    *
    * Args (after the mode word): tablePath writerId count syncDir */
  private def markersMain(args: Array[String]): Unit = {
    val Array(path, writerId, countS, syncDir) = args
    val count = countS.toInt
    val tl = new graft.core.Timeline(
      new org.apache.hadoop.conf.Configuration(), path)
    // warm-up claim BEFORE signaling ready: the first beginWrite pays
    // Hadoop FileSystem class-loading (~400 ms — longer than the whole
    // 400-claim loop), which would otherwise land AFTER the rendezvous
    // instant and serialize the race. Not recorded; released here, so
    // it can only ever be claimed by ONE recorded set later.
    tl.clearInflight(tl.beginWrite())
    new java.io.File(syncDir, s"ready.$writerId").createNewFile()
    // the go file CARRIES the shared start instant (same machine =
    // same clock): a bare existence gate lets the creator's loop
    // finish inside the watcher's poll latency and the race
    // serializes — both sides must spin to one wall-clock millisecond
    val go = new java.io.File(syncDir, "go")
    val waitStart = System.currentTimeMillis()
    var startAt = -1L
    while (startAt < 0) {
      if (System.currentTimeMillis() - waitStart > 120000L)
        sys.error("go file never appeared")
      if (go.exists()) {
        val txt = scala.io.Source.fromFile(go).mkString.trim
        if (txt.nonEmpty) startAt = txt.toLong
      }
      if (startAt < 0) Thread.sleep(5)
    }
    while (System.currentTimeMillis() < startAt) {}
    val loopStart = System.currentTimeMillis()
    val claims = (1 to count).map(_ => tl.beginWrite())
    val loopEnd = System.currentTimeMillis()
    val w = new java.io.PrintWriter(
      new java.io.File(syncDir, s"claims.$writerId"), "UTF-8")
    try claims.foreach(w.println) finally w.close()
    // loop window (same machine = same clock): the spec proves the
    // race was contested from WINDOW overlap, not claim-value ranges —
    // claims are clamped to the current millisecond, so a fixed
    // few-µs systematic edge lets one process win EVERY contested
    // millisecond and push the loser's claim names entirely past its
    // own window; the windows still overlap
    val ww = new java.io.PrintWriter(
      new java.io.File(syncDir, s"window.$writerId"), "UTF-8")
    try ww.print(s"$loopStart:$loopEnd") finally ww.close()
    claims.foreach(tl.clearInflight)
    println(s"[occjvm] writer=$writerId claims=${claims.size} " +
      s"distinct=${claims.distinct.size}")
    sys.exit(0)
  }
}
