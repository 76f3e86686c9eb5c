package graft.tools

import org.apache.hadoop.conf.Configuration

import graft.core.{CommitMeta, Timeline}

/** Metadata-axis scale stress (round-11 task): every SCALING.md row so
  * far scales DATA; this harness scales COMMIT COUNT and LIVE FILE
  * COUNT — the 100× axis a long-lived 100 TB table actually ages
  * along — and measures the driver-side planning costs that must stay
  * bounded: `commits()` (timeline listing), `liveFiles()` (snapshot /
  * probe planning input), `nextInstant()`, checkpoint read, and driver
  * heap. Commits are timeline-only (fake file paths with key bounds):
  * planning never opens data files, so the measured cost is exactly
  * the metadata path a 1000-executor driver pays per query.
  *
  * Two regimes:
  *   - unarchived: the active timeline grows without bound — the
  *     anti-pattern; shows where the cliff is.
  *   - archived (production cadence): `archive(min, max)` folds old
  *     commits into the checkpoint; active stays O(max) while the
  *     checkpoint carries the full live-file index.
  *
  * Usage: runMain graft.tools.TimelineStress [nCommits] [filesPer]
  * [archiveEvery] (archiveEvery 0 = never — the unarchived regime).
  * Prints one table row per 1/10th of the run plus cold-instance
  * timings at the end.
  */
object TimelineStress {

  private def timeMs[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e6)
  }

  private def heapMb(): Long = {
    System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val filesPer = args.lift(1).map(_.toInt).getOrElse(5)
    val archiveEvery = args.lift(2).map(_.toInt).getOrElse(0)
    val dir = s"target/graft_scratch/tlstress_${n}_$archiveEvery"
    val f = new java.io.File(dir)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete(); ()
    }
    if (f.exists()) rm(f)
    val tl = new Timeline(new Configuration(), dir)
    tl.writeProps(graft.core.TableProps(
      "tlstress", Seq("id"), Some("ts"), Seq.empty))

    println(s"commits=$n filesPer=$filesPer archiveEvery=$archiveEvery")
    println("n_commits  active  live_files  commit_ms  commits_ms  live_ms  next_ms  heap_mb")
    var live = 0L
    val step = math.max(1, n / 10)
    var i = 0
    var commitMs = 0.0
    while (i < n) {
      val lo = f"${i * filesPer}%09d"
      val hi = f"${i * filesPer + filesPer - 1}%09d"
      // timed region = the FULL fence lifecycle a real writer pays:
      // beginWrite (marker create + heartbeat schedule), the commit,
      // and clearInflight (marker release — also prevents a thousand
      // leaked heartbeat tasks ticking for the rest of the run)
      val (_, cms) = timeMs {
        val instant = tl.beginWrite()
        val files =
          (0 until filesPer).map(j => s"part_${instant}_$j.parquet")
        try tl.commit(CommitMeta(
          instant, "commit", files, Seq.empty, Seq.empty,
          "id INT, ts BIGINT, v STRING", filesPer.toLong * 100, Map.empty,
          keyBounds = Some(files.map(_ -> Seq(lo, hi)).toMap),
          dedupedKeys = Some(true)))
        finally tl.clearInflight(instant)
      }
      commitMs = cms
      live += filesPer
      i += 1
      if (archiveEvery > 0 && i % archiveEvery == 0)
        tl.archive(archiveEvery / 2, archiveEvery)
      if (i % step == 0 || i == n) {
        val (cs, csMs) = timeMs(tl.commits())
        val (lf, lfMs) = timeMs(tl.liveFiles(None))
        val (_, niMs) = timeMs(tl.nextInstant())
        println(f"$i%9d  ${cs.size}%6d  ${lf.size}%10d  $commitMs%9.1f" +
          f"  $csMs%10.1f  $lfMs%7.1f  $niMs%7.2f  ${heapMb()}%7d")
      }
    }
    // a FRESH instance = a new reader session opening the aged table:
    // cold commit cache, cold checkpoint — the per-query floor a new
    // driver pays
    val cold = new Timeline(new Configuration(), dir)
    val (cs1, csCold) = timeMs(cold.commits())
    val (lf1, lfCold) = timeMs(cold.liveFiles(None))
    val (_, lfWarm) = timeMs(cold.liveFiles(None))
    val (_, cpCold) = timeMs(cold.readCheckpoint())
    val (_, cpWarm) = timeMs(cold.readCheckpoint())
    println(f"cold instance: commits(${cs1.size}) ${csCold}%.1f ms, " +
      f"liveFiles(${lf1.size}) ${lfCold}%.1f ms (warm ${lfWarm}%.1f), " +
      f"checkpoint ${cpCold}%.1f ms (warm ${cpWarm}%.1f)")
    // probe planning: the candidate-selection half of a keyed upsert —
    // filter the live index down by key range overlap (footerProbe's
    // input); measures that key-bounds pruning over the aged index is
    // driver-cheap
    val probeLo = f"${n * filesPer / 2}%09d"
    val probeHi = f"${n * filesPer / 2 + 50}%09d"
    val (cand, prMs) = timeMs(cold.liveFiles(None).filter(e =>
      e.minKey.exists(_ <= probeHi) && e.maxKey.exists(_ >= probeLo)))
    println(f"probe planning over ${lf1.size} live files: " +
      f"${cand.size} candidates in ${prMs}%.1f ms")
    // correctness, not just timing: across every archive cycle the
    // live index must stay EXACT — no file lost or duplicated by the
    // checkpoint folds, and the per-file key bounds (the probe index)
    // must survive archiving
    require(lf1.size == n * filesPer,
      s"live index drifted: ${lf1.size} files, expected ${n * filesPer}")
    require(lf1.map(_.path).distinct.size == lf1.size,
      "duplicate live entries after archive folds")
    require(lf1.forall(e => e.minKey.isDefined && e.maxKey.isDefined),
      "key bounds lost across the archive boundary")
    // the 51-key probe window overlaps ⌈51/filesPer⌉ (+1 boundary)
    // commits of filesPer files each — candidates must stay in that
    // envelope, nowhere near the full index
    val maxCand = (51 / filesPer + 2) * filesPer
    require(cand.nonEmpty && cand.size <= maxCand,
      s"probe pruning broken: ${cand.size} candidates for a " +
        s"$maxCand-file key window")
    println("OK: live index exact, key bounds survive archiving, " +
      "probe pruning bounded")
  }
}
