package graft.core

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** One committed action on a lake table.
  *
  * Mirrors the Hudi commit-timeline semantics the reference exercises
  * (instant ids, `call show_commits` — reference
  * `hudi0.12_spark3.1/.../IncrementalQuery.scala:36-52`), re-expressed
  * as one JSON file per commit under `<base>/_timeline/`.
  *
  * @param instant   commit id, `yyyyMMddHHmmssSSS`, strictly increasing
  * @param action    insert | upsert | delete | merge | bootstrap | replace
  * @param added     table-relative paths of data files this commit added
  * @param removed   table-relative paths this commit replaced (COW)
  * @param external  subset of `added` that are foreign absolute paths
  *                  adopted by metadata bootstrap (no meta columns inside;
  *                  reference `BootstrapDemo.scala:207-232`)
  * @param schemaDdl Spark StructType DDL of the table schema as of this
  *                  commit (additive evolution: later commits may widen)
  * @param partitions partition-path string per added file ("" for
  *                  unpartitioned) — drives driver-side partition pruning
  *                  without parsing paths
  */
final case class CommitMeta(
    instant: String,
    action: String,
    added: Seq[String],
    removed: Seq[String],
    external: Seq[String],
    schemaDdl: String,
    totalRecords: Long,
    partitions: Map[String, String],
    /** per added file: [min, max] of `_record_key` from the parquet
      * footer — drives candidate-file pruning on keyed DML (the
      * bloom/range-index analog, SURVEY §4; JavaClientHive2Hudi
      * bloom-index tuning :167-180). */
    keyBounds: Option[Map[String, Seq[String]]] = None,
    /** opaque writer tag recorded atomically WITH the commit — the
      * streaming sink stores its per-query batch id here so a crash
      * between commit and sidecar-marker write cannot replay the batch
      * (exactly-once for all operations, including plain insert). */
    tag: Option[String] = None,
    /** per added file: its bucket id under the table's bucket index
      * (hoodie.bucket.index analog, TestStreamingMOR.java:52-53) —
      * lets keyed DML resolve affected files driver-side with no
      * probe scan. */
    buckets: Option[Map[String, Int]] = None,
    /** added paths that are MOR delta files when the commit ISN'T
      * itself a deltacommit — lets one atomic commit mirror a mixed
      * base+delta live set (catalog sync), instead of exposing a
      * mixed-instant intermediate view between two commits. */
    deltaAdded: Option[Seq[String]] = None,
    /** per added file: declared stats column → [typeTag, min, max]
      * from the parquet footer (typeTag "s" = utf8 string, "l" =
      * integral-as-long) — the col-stats data-skipping index. */
    colStats: Option[Map[String, Map[String, Seq[String]]]] = None,
    /** whether this commit's rows are key-deduped (at most one version
      * per (key, partition)). True when the pre-combine window ran OR
      * the caller passed `combine=false` — uniqueness is then a HARD
      * caller contract and the writer records true on its word (see
      * LakeTable.maybeCombine). Only a combine=true batch written
      * without a preCombine field records false, forcing the
      * single-commit read fast path back to the full merge. None
      * (older commits / COW paths) = infer from the action allowlist,
      * the pre-flag behavior. */
    dedupedKeys: Option[Boolean] = None)

/** One live data file as seen by readers: its path, the commit that
  * (logically) wrote its rows, partition path, and optional record-key
  * bounds. The unit the timeline's checkpoint stores. */
final case class FileEntry(
    path: String,
    instant: String,
    partition: String,
    external: Boolean,
    minKey: Option[String],
    maxKey: Option[String],
    /** bucket id when the table uses a bucket index */
    bucket: Option[Int] = None,
    /** true for files written by a MOR delta commit: they hold
      * multiple versions/tombstones and must go through the read-side
      * merge (or compaction). Carried on the entry itself so the flag
      * SURVIVES archiving — the commit (and its action) may be folded
      * into the checkpoint while the file is still live. */
    delta: Boolean = false,
    /** stats column → [typeTag, min, max] (see CommitMeta.colStats);
      * carried on the entry so the index survives archiving. */
    colStats: Option[Map[String, Seq[String]]] = None)

/** One conjunct usable against the col-stats index: `column <op>
  * value(s)` with values pre-rendered as strings (`isLong` selects
  * numeric vs utf8 comparison — it must match the stored typeTag or
  * the predicate is ignored for that file). op ∈ eq|gt|ge|lt|le;
  * "eq" may carry an IN-list. */
final case class ColPred(
    column: String, op: String, values: Seq[String], isLong: Boolean)

/** File-skip accounting returned by stats-pruned reads: `kept` base
  * files matched the predicates, `skipped` were pruned without any
  * IO, `deltaRead` MOR delta files were read unconditionally (see
  * LakeTable.snapshotSkipping's soundness note). */
final case class SkipStats(kept: Int, skipped: Int, deltaRead: Int) {
  def planned: Int = kept + deltaRead
}

/** Net live file set as of `asOf`, produced when old commits are
  * archived; file entries keep their original commit instants so
  * incremental reads spanning the archive boundary stay correct. */
final case class CheckpointMeta(
    asOf: String,
    files: Seq[FileEntry],
    /** schema DDL as of the archive boundary — serves time-travel reads
      * at instants between the boundary and the first active commit */
    schemaDdl: String = "",
    /** max archived writer tag VALUE per tag KEY (tags are
      * "key=number", e.g. the streaming sink's per-query batch id):
      * archiving folds commits away, but their exactly-once markers
      * must survive — a crash-replay whose tagged commit was archived
      * would otherwise re-apply the batch. */
    tags: Map[String, Long] = Map.empty,
    /** replaced-file paths recorded by commits that have since been
      * archived: clean() can only see ACTIVE commits' removed lists,
      * so without this fold-forward a file replaced by an archived
      * commit could never be physically deleted — an unbounded
      * storage leak whenever the archive window is tighter than the
      * clean retention. */
    archivedRemoved: Seq[String] = Seq.empty)

/** Declared table properties — SparkSQLDemo.scala:47-51's
  * (primaryKey, preCombineField, type, partitioned by) surface. */
final case class TableProps(
    name: String,
    primaryKey: Seq[String],
    preCombineField: Option[String],
    partitionFields: Seq[String],
    tableType: String = "cow",
    hiveStylePartitioning: Boolean = true,
    /** Files a hot partition's write is spread over (key-hash salt) —
      * the small-file/max-file sizing knob (SURVEY §4 bin packing). */
    writeSaltBuckets: Int = 1,
    /** Declared schema DDL (SQL CREATE TABLE), used until the first
      * commit records a written schema. Empty = infer from first write. */
    schemaDdl: String = "",
    /** MOR inline compaction cadence: compact after this many
      * consecutive delta commits (TestBatchMOR.java:40-46
      * `compaction.delta_commits`; 0 = never inline). */
    compactDeltaCommits: Int = 0,
    /** Bucket index (`hoodie.bucket.index.num.buckets=4`,
      * TestStreamingMOR.java:52-53): every record key hashes to one of
      * N fixed buckets per partition; files are written per bucket and
      * keyed DML resolves affected files driver-side from the batch's
      * (partition, bucket) set — no probe scan job. 0 = off (range +
      * bloom probe index instead). Supersedes writeSaltBuckets. */
    bucketIndexBuckets: Int = 0,
    /** MOR read-side merge payload, table-level like Hudi's payload
      * class: "latest" (DefaultHoodieRecordPayload — largest
      * preCombine wins) or "overwrite" (OverwriteWithLatestAvroPayload
      * — later commit wins regardless of ordering value). COW applies
      * the per-write MergePolicy at write time instead; for MOR the
      * policy MUST be table-level because the merge happens at read
      * time over commits that may have used different calls. */
    morPayload: String = "latest",
    /** Data columns whose per-file min/max are captured from parquet
      * footers at commit time and stored in the timeline — the
      * col-stats data-skipping index (Hudi metadata-table col_stats
      * analog). COW/read-optimized scans with predicates on these
      * columns skip files driver-side with zero I/O. String and
      * integral columns only (exact order-preserving driver
      * comparisons); others are ignored. */
    statsColumns: Seq[String] = Seq.empty)

/** A write lost the optimistic-concurrency race: the operation should
  * be re-run against the fresh table state ([[LakeTable.withOcc]]).
  * Extends IllegalStateException for source compatibility with callers
  * that treated commit collisions as illegal state. */
final class CommitConflictException(msg: String)
  extends IllegalStateException(msg)

/** Driver-side commit log. All metadata ops are O(#commits) small-JSON
  * reads — never a Spark job. Data-plane listing never happens at read
  * time: the live file set comes from the timeline, so a 100 TB table
  * with millions of files needs no recursive storage listing.
  */
final class Timeline(conf: Configuration, val basePath: String) {
  import Timeline._

  private val dir = new Path(basePath, META_DIR)
  private def fs: FileSystem = dir.getFileSystem(conf)

  def exists: Boolean = fs.exists(new Path(dir, TABLE_FILE))

  def writeProps(p: TableProps): Unit =
    atomicWrite(new Path(dir, TABLE_FILE), Serialization.write(p)(formats))

  def readProps(): TableProps = {
    val in = fs.open(new Path(dir, TABLE_FILE))
    try JsonMethods.parse(in).extract[TableProps](formats, manifest[TableProps])
    finally in.close()
  }

  /** Commit files are immutable once written (instants are unique and
    * never rewritten), so parsed metadata is cached per instance — a
    * write path calls commits() several times per operation, and a
    * 100 TB table can have thousands of active commits. The directory
    * listing itself stays uncached (new commits must be visible). */
  private val commitCache =
    scala.collection.concurrent.TrieMap.empty[String, CommitMeta]

  /** All commits, oldest first. */
  def commits(): Seq[CommitMeta] = {
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(COMMIT_SUFFIX))
      .sorted
      .map(f => commitCache.getOrElseUpdate(f, read(f)))
  }

  private def read(fileName: String): CommitMeta = {
    val in = fs.open(new Path(dir, fileName))
    try JsonMethods.parse(in).extract[CommitMeta](formats, manifest[CommitMeta])
    finally in.close()
  }

  def latestInstant(): Option[String] = commits().lastOption.map(_.instant)

  /** Highest instant handed out by THIS instance — lets concurrent
    * in-process writers get distinct instants even within one clock
    * millisecond (distinct staging dirs + file names). */
  private var lastIssued: String = ""

  /** Next strictly-increasing instant (wall clock, bumped past both
    * the committed timeline and instants already issued here). */
  def nextInstant(): String = this.synchronized {
    val now = instantFormat.format(java.time.Instant.now()
      .atZone(java.time.ZoneOffset.UTC))
    val floor = (latestInstant().toSeq :+ lastIssued).max
    val next = if (floor >= now) bump(floor) else now
    lastIssued = next
    next
  }

  // ------------------------------------------------- inflight markers

  private def inflightDir = new Path(dir, ".inflight")

  /** Effective marker-staleness window: `graft.inflight.stale.ms` in
    * the Hadoop conf (settable per session via
    * `spark.hadoop.graft.inflight.stale.ms`), default
    * [[Timeline.INFLIGHT_STALE_MS]]. */
  private[graft] val inflightStaleMs: Long =
    conf.getLong("graft.inflight.stale.ms", INFLIGHT_STALE_MS)

  /** Heartbeat cancellation handles for markers published by THIS
    * instance (instant → scheduled touch task). */
  private val heartbeats =
    scala.collection.concurrent.TrieMap
      .empty[String, java.util.concurrent.ScheduledFuture[_]]

  /** O_EXCL file creation — the ONE exclusive-create arbiter used by
    * both the table lock and the inflight-marker claim: on local
    * paths, `java.io.File.createNewFile` (Hadoop's ChecksumFileSystem
    * implements `create(overwrite = false)` as a NON-atomic
    * exists-then-create, so two same-millisecond writers could both
    * "create" one file through it); `FileSystem.createNewFile`
    * elsewhere. False = already exists; real I/O errors propagate. */
  private def exclusiveCreate(p: Path): Boolean = {
    // a scheme-less path inherits the TABLE's filesystem — resolving
    // it as local would create the file on the driver's disk when
    // fs.defaultFS is remote (unclaimable lock, unfenced writes)
    val scheme = Option(p.toUri.getScheme)
      .orElse(Option(fs.getUri.getScheme)).getOrElse("file")
    if (scheme == "file")
      new java.io.File(fs.makeQualified(p).toUri.getPath).createNewFile()
    else fs.createNewFile(p)
  }

  /** Publish write intent for `instant` BEFORE any data is written.
    * Streaming tails fence on these: without the marker, a slow writer
    * holding a lower instant that commits after a faster writer would
    * have its records permanently skipped by a commit-tail stream that
    * already advanced past it (Hudi caps streaming reads at the
    * earliest inflight instant for the same reason). Cleared by the
    * commit funnel; a crashed writer's marker expires after
    * `inflightStaleMs`. A background heartbeat re-touches the marker
    * at a third of that window for as long as the write is running, so
    * a LIVE writer whose data phase outlasts the window (routine for
    * large batches) never loses fence protection — only a writer whose
    * JVM died stops touching and expires. */
  def beginWrite(): String = {
    // the marker doubles as allocation-time instant ARBITRATION across
    // instances: created exclusively (no overwrite), so two writers in
    // different processes allocating inside the same millisecond
    // collide HERE — before any data is written — and the loser bumps
    // to the next instant, instead of both paying a full data write
    // and discovering the name collision at commit time (a whole-write
    // OCC retry for what was never a real conflict; rows bake the
    // instant into _commit_time, so re-instanting at commit is not an
    // option). Measured on the OccStress disjoint-partition ladder:
    // amplification 1.17-1.5 from instant collisions alone before,
    // 1.0 after.
    var instant = nextInstant()
    var attempts = 0
    var claimed = false
    // CLAIM phase. Only low-level marker-creation failure (mkdirs /
    // the exclusive create itself throwing) is best-effort — the
    // write then proceeds unfenced, the pre-arbitration behavior.
    // Arbitration OUTCOMES are not best-effort: a contested name
    // bumps, a confirmed-committed name bumps, and exhausting the
    // bump budget fails LOUDLY (IllegalStateException, deliberately
    // not an IOException) — proceeding on a name another live writer
    // holds or a committed name would guarantee the phantom
    // whole-write retry this loop exists to eliminate.
    def bump(reason: String): Unit = {
      if (attempts >= 1000) throw new IllegalStateException(
        s"could not allocate an instant near $instant on $basePath: $reason")
      attempts += 1; instant = nextInstant()
    }
    try {
      fs.mkdirs(inflightDir)
      while (!claimed) {
        if (!exclusiveCreate(new Path(inflightDir, instant)))
          bump("marker contested")
        else {
          // the marker claim alone leaves one window: the previous
          // holder of this instant COMMITTED it and cleared its marker
          // between our nextInstant() floor read and the claim above.
          // The commit funnel writes the commit file BEFORE clearing
          // the marker, so if the name was ever committed, the file is
          // visible by the time its marker is claimable — one
          // post-claim existence check closes the window exactly. If
          // the check itself fails transiently, KEEP the claim: the
          // commit funnel's own exists check still protects
          // correctness, and the worst case is the pre-arbitration
          // behavior (a commit-time conflict → one OCC retry).
          val committed =
            try fs.exists(new Path(dir, instant + COMMIT_SUFFIX))
            catch { case _: java.io.IOException => false }
          if (committed) {
            // best-effort in FULL: a RuntimeException from fs.delete
            // (not just IOException) must not escape the claim loop —
            // it would abort beginWrite after bump bookkeeping and
            // leave an orphaned marker fencing tail readers until it
            // expires. clearInflight's catch is equally broad.
            try fs.delete(new Path(inflightDir, instant), false)
            catch { case scala.util.control.NonFatal(_) => () }
            bump("instant already committed")
          } else claimed = true
        }
      }
    } catch {
      case e: java.io.IOException =>
        // fence is best-effort, but an unfenced write must be VISIBLE:
        // commit-tail streams can skip this commit if they pass it
        // while the write is still running
        log.warn(s"inflight fence marker creation failed for $instant " +
          s"on $basePath — this write proceeds unfenced: $e")
    }
    // HEARTBEAT phase — never skipped when a marker was claimed (an
    // unrefreshed marker expires mid-write and commit-tail streams
    // silently skip the commit, the exact bug the heartbeat prevents).
    if (claimed) try {
      val marker = new Path(inflightDir, instant)
      // clamp: a (mis)configured window <= 2ms would make the period 0,
      // which scheduleWithFixedDelay rejects with IllegalArgumentException
      // — degrade to a 1ms heartbeat instead of failing the write
      val period = math.max(1L, inflightStaleMs / 3)
      val task = heartbeatExec.scheduleWithFixedDelay(
        () => touchMarker(marker),
        period, period,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      heartbeats.put(instant, task)
    } catch {
      case e: java.util.concurrent.RejectedExecutionException =>
        log.warn(s"heartbeat scheduling failed for $instant on " +
          s"$basePath — the fence expires after ${inflightStaleMs}ms: $e")
    }
    instant
  }

  /** Refresh a marker's mtime (setTimes where the FS supports it,
    * re-create otherwise — we own the marker either way). The
    * re-create path only runs while the write is still registered:
    * clearInflight cancels with `cancel(false)`, so a touch already
    * executing can race the marker delete — setTimes throws
    * FileNotFoundException, and an unguarded fs.create here would
    * RESURRECT the cleared marker with a fresh mtime, fencing
    * commit-tail streams on an already-committed instant for a full
    * staleness window. */
  private def touchMarker(marker: Path): Unit =
    try fs.setTimes(marker, System.currentTimeMillis(), -1)
    catch {
      case _: Exception =>
        if (heartbeats.contains(marker.getName)) {
          try fs.create(marker, true).close()
          catch { case _: Exception => () }
          // double-check: clearInflight may have run between the map
          // check and the create — tidy our own resurrection
          if (!heartbeats.contains(marker.getName))
            try fs.delete(marker, false) catch { case _: Exception => () }
        }
    }

  def clearInflight(instant: String): Unit = {
    heartbeats.remove(instant).foreach(_.cancel(false))
    try fs.delete(new Path(inflightDir, instant), false)
    catch { case _: Exception => () }
  }

  /** Markers already warned about as expired (warn once per marker per
    * instance, not once per poll). */
  private val warnedExpired =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Smallest instant some writer is still working on (markers older
    * than `staleMs` are crashed writers and ignored). */
  def earliestActiveInflight(
      staleMs: Long = inflightStaleMs): Option[String] = {
    if (!fs.exists(inflightDir)) return None
    val now = System.currentTimeMillis()
    val (live, expired) = fs.listStatus(inflightDir).toSeq
      .partition(st => now - st.getModificationTime <= staleMs)
    expired.map(_.getPath.getName).filter(warnedExpired.add).foreach { i =>
      log.warn(s"ignoring expired inflight marker $i on $basePath " +
        "(crashed writer, or a live writer whose heartbeat stopped) — " +
        "commit-tail streams no longer fence on it")
    }
    live.map(_.getPath.getName).sorted.headOption
  }

  /** Optimistic-concurrency commit. Two conflict checks, both raising
    * [[CommitConflictException]] so writers can retry ([[LakeTable.withOcc]]):
    * - file-group conflict: a file this commit removes is no longer
    *   live, i.e. a concurrent writer rewrote or cleaned it after this
    *   writer probed — committing anyway would lose that update;
    * - instant collision: another writer took the same instant.
    * In-process writers serialize on this instance; cross-process, the
    * create-no-overwrite commit file is the (best-effort on local FS)
    * arbiter, matching Hudi's optimistic concurrency model. */
  /** Cross-process mutual exclusion for the commit critical section —
    * the analog of Hudi's FileSystemBasedLockProvider. The conflict
    * check and the commit-file write must be ATOMIC together: without
    * a table lock, two different-instant writers can both list the
    * same file as live, both pass the check, and both commit a removal
    * of it — a lost update (observed live in the cross-instance OCC
    * test). Claim = O_EXCL lock-file creation (java.io.File
    * .createNewFile locally, FileSystem.createNewFile on cluster
    * filesystems); a lock older than [[LOCK_STALE_MS]] is treated as a
    * crashed writer's leftover and broken. Timing out surfaces as a
    * [[CommitConflictException]] so withOcc retries. */
  private def withTableLock[T](f: => T): T = withTableLockOwned(_ => f)

  /** As [[withTableLock]], but hands the block this claim's owner token
    * (None when the best-effort stamp write failed — the block must
    * then SKIP the ownership re-check rather than treat the empty lock
    * body as "someone else owns it") so late-stage writes can re-verify
    * ownership via [[lockStillOwned]] — the defense against the
    * residual breaker race (a breaker with a stale view vacating a
    * freshly claimed lock). */
  private def withTableLockOwned[T](f: Option[String] => T): T = {
    val lock = new Path(dir, ".commit.lock")
    val owner = UUID.randomUUID().toString
    def tryClaim(): Boolean =
      try exclusiveCreate(lock)
      catch { case _: java.io.IOException => false }
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var claimed = tryClaim()
    while (!claimed) {
      try {
        val st = fs.getFileStatus(lock)
        if (System.currentTimeMillis() - st.getModificationTime > LOCK_STALE_MS) {
          // Break the stale lock via RENAME, not delete: rename is the
          // atomic arbiter among concurrent breakers (exactly one
          // wins), and a plain delete could zap a FRESH lock claimed
          // between our staleness check and the delete. If the renamed
          // file turns out fresh after all (a live writer slipped in),
          // restore it untouched — rename preserves mtime.
          // Residual limitation (shared with Hudi's filesystem lock
          // provider): without compare-and-swap, a breaker with a
          // stale view can briefly vacate a freshly re-claimed lock
          // before the restore below lands. The window needs a
          // crashed writer + two sub-second racing breakers; cloud
          // deployments wanting a hard guarantee should front commits
          // with a CAS-capable lock service, as Hudi recommends.
          val broken = new Path(dir, s".commit.lock.broken-${UUID.randomUUID()}")
          if (fs.rename(lock, broken)) {
            val st2 = fs.getFileStatus(broken)
            if (System.currentTimeMillis() - st2.getModificationTime > LOCK_STALE_MS)
              fs.delete(broken, false) // confirmed stale: break it
            else if (!fs.rename(broken, lock))
              fs.delete(broken, false) // restore lost its own race: tidy
          }
        }
      } catch { case _: java.io.IOException => () } // released meanwhile
      if (System.nanoTime() > deadline)
        throw new CommitConflictException(s"timed out waiting for $lock")
      Thread.sleep(10 + scala.util.Random.nextInt(40))
      claimed = tryClaim()
    }
    // Stamp ownership into the claimed lock (we hold the O_EXCL claim,
    // so only this writer legitimately writes here). The stamp is what
    // lockStillOwned re-reads before the commit-file write. Residual:
    // a breaker that vacates THIS claim in the few ms before the stamp
    // lands defeats the check — strictly narrower than the unstamped
    // race, and the create-no-overwrite commit file still backstops
    // same-instant collisions.
    val stamped =
      try {
        val out = fs.create(lock, true)
        try out.write(owner.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: java.io.IOException => false // stamp is best-effort:
        // without it the claim still holds (O_EXCL), we just lose the
        // breaker-race re-check — lockStillOwned would always read a
        // non-matching body and turn one IO hiccup into a permanent
        // CommitConflictException storm, so the caller must skip it
      }
    try f(if (stamped) Some(owner) else None)
    finally {
      try fs.delete(lock, false) catch { case _: Exception => () }
    }
  }

  /** True iff the table lock still carries `owner`'s stamp — i.e. no
    * stale-lock breaker vacated this claim and handed it to another
    * writer while the critical section was running. */
  private def lockStillOwned(owner: String): Boolean =
    try {
      val in = fs.open(new Path(dir, ".commit.lock"))
      val body = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
      body == owner
    } catch { case _: Exception => false }

  def commit(meta: CommitMeta): Unit = this.synchronized { withTableLockOwned { owner =>
    if (meta.removed.nonEmpty) {
      val liveNow = liveFiles(None).map(_.path).toSet
      val gone = meta.removed.filterNot(liveNow.contains)
      if (gone.nonEmpty)
        throw new CommitConflictException(
          s"commit ${meta.instant} conflicts: concurrently rewritten " +
            s"file(s) ${gone.take(3).mkString(", ")} on $basePath")
    }
    val target = new Path(dir, meta.instant + COMMIT_SUFFIX)
    if (fs.exists(target))
      throw new CommitConflictException(
        s"Conflicting commit ${meta.instant} already exists on $basePath")
    // Fence health check: the marker published by beginWrite should
    // still be live here (the heartbeat keeps touching it). If it is
    // gone or expired, a commit-tail stream may already have advanced
    // past this instant — the skip would otherwise be silent.
    try {
      val marker = new Path(inflightDir, meta.instant)
      val expired = !fs.exists(marker) ||
        System.currentTimeMillis() - fs.getFileStatus(marker)
          .getModificationTime > inflightStaleMs
      if (expired)
        log.warn(s"inflight fence for ${meta.instant} on $basePath was " +
          "absent or expired at commit time — a concurrent commit-tail " +
          "stream may have skipped this commit's rows")
    } catch { case _: Exception => () }
    // Re-verify the table-lock claim as late as possible: if a
    // stale-lock breaker vacated it mid-section, another writer may be
    // running its conflict check concurrently — retry instead of
    // risking a lost update. Skipped when the owner stamp never landed
    // (owner = None): the O_EXCL claim itself still held, and checking
    // against an unstamped lock would fail every attempt.
    owner.foreach { o =>
      if (!lockStillOwned(o))
        throw new CommitConflictException(
          s"table lock on $basePath was broken while committing " +
            s"${meta.instant}; retrying")
    }
    atomicWrite(target, Serialization.write(meta)(formats), allowOverwrite = false)
    commitCache.put(meta.instant + COMMIT_SUFFIX, meta)
  } }

  /** Live file set as of `asOf` (inclusive; None = latest): the
    * archive checkpoint's net files plus active commits' added files,
    * minus everything removed at-or-before `asOf`. */
  def liveFiles(asOf: Option[String] = None): Seq[FileEntry] = {
    val cp = readCheckpoint()
    cp.foreach { c =>
      asOf.foreach { t =>
        require(t >= c.asOf,
          s"history before ${c.asOf} is archived; cannot read as of $t")
      }
    }
    // A commit at-or-before the checkpoint boundary is already folded
    // into it; skip it here even if its file was not yet moved to
    // archived/ (the crash window between the checkpoint write and the
    // renames) — otherwise every file of that commit would be listed
    // twice and snapshots would return duplicated rows.
    val cs = commits().filter(c => asOf.forall(c.instant <= _))
      .filterNot(c => cp.exists(c.instant <= _.asOf))
    val removed = cs.flatMap(_.removed).toSet
    val fromCheckpoint = cp.toSeq.flatMap(_.files)
      .filterNot(f => removed.contains(f.path))
    val fromCommits = for {
      c <- cs
      // Set per commit, not a Seq scan per file: a catalog-sync commit
      // mirroring a table with many delta files would otherwise make
      // timeline resolution O(n²) in the commit's file count.
      da = c.deltaAdded.map(_.toSet).getOrElse(Set.empty[String])
      // Set for the same O(n²) reason as deltaAdded: a bootstrap
      // commit has external == added (100k files → 10^10 comparisons)
      ext = c.external.toSet
      f <- c.added if !removed.contains(f)
    } yield FileEntry(f, c.instant, c.partitions.getOrElse(f, ""),
      ext(f),
      c.keyBounds.flatMap(_.get(f)).flatMap(_.headOption),
      c.keyBounds.flatMap(_.get(f)).flatMap(_.lift(1)),
      c.buckets.flatMap(_.get(f)),
      delta = c.action == "deltacommit" || da(f),
      colStats = c.colStats.flatMap(_.get(f)))
    fromCheckpoint ++ fromCommits
  }

  // ------------------------------------------------------- table services

  private def checkpointPath = new Path(dir, CHECKPOINT_FILE)

  /** Parsed checkpoint keyed on the file's (length, modtime, head):
    * an aged table's checkpoint carries its whole live-file index
    * (50k files ≈ several MB of JSON), and every liveFiles() — i.e.
    * every snapshot or probe PLANNING — reads it. Re-parsing per call
    * made planning O(live files) in PARSE cost, the round-11
    * metadata-axis stress cliff; the status key keeps the cache
    * correct under external writers (archive() replaces the file
    * atomically, changing length and modtime).
    *
    * (length, modtime) alone can alias on filesystems with coarse
    * mtime granularity: two archive() rewrites inside one tick that
    * happen to land on equal byte length would serve a stale parse.
    * The head — the file's first 64 bytes, which start
    * `{"asOf":"<instant>"` and archive()'s boundary instant strictly
    * increases — disambiguates. Head and parse come from ONE read of
    * the file's bytes, so they can never describe different rewrites.
    * An entry is TRUSTED once the tick can no longer produce an
    * unseen same-status rewrite: on a head-verified hit ≥ 2 s of
    * READER time after the entry was born. Reader time is the one
    * clock immune to BOTH skew directions — `now - mtime` is
    * meaningless when the writer's offset differs (a writer AHEAD
    * holds it negative forever; a writer BEHIND makes a just-written
    * file look old, which is why there is deliberately no
    * mtime-derived trust shortcut at birth or at hit) — while clock
    * RATES agree even when offsets don't, so 2 s of reader time
    * bounds the writer's mtime tick too: any same-tick rewrite either
    * already happened (head differs, reparse) or can no longer
    * happen. Until then every status hit re-verifies the head, so an
    * entry cached BETWEEN two same-tick rewrites cannot outlive the
    * tick unverified, and the verify overhead is bounded at ~2 s of
    * extra 64-byte reads per entry. Steady state stays one
    * getFileStatus per call. */
  private case class CpEntry(len: Long, mod: Long, head: String,
      cp: CheckpointMeta, bornAt: Long, var trusted: Boolean)

  private var cpCache: Option[CpEntry] = None

  private def cpHead(): String = {
    val in = fs.open(checkpointPath)
    try {
      val buf = new Array[Byte](64)
      var n = 0; var r = 0
      while (n < buf.length &&
          { r = in.read(buf, n, buf.length - n); r > 0 }) n += r
      new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  def readCheckpoint(): Option[CheckpointMeta] = this.synchronized {
    if (!fs.exists(checkpointPath)) { cpCache = None; return None }
    val st = fs.getFileStatus(checkpointPath)
    cpCache match {
      case Some(e)
          if e.len == st.getLen && e.mod == st.getModificationTime &&
            (e.trusted || {
              // promotion condition evaluated BEFORE the head read
              val promote =
                System.currentTimeMillis() - e.bornAt >= 2000L
              e.head == cpHead() && { if (promote) e.trusted = true; true }
            }) =>
        Some(e.cp)
      case _ =>
        // head + parse from the SAME bytes: a concurrent replace
        // between two opens could otherwise pair one rewrite's parse
        // with another's head and defeat the head check forever
        val in = fs.open(checkpointPath)
        val bytes =
          try org.apache.commons.io.IOUtils.toByteArray(in)
          finally in.close()
        val cp = JsonMethods
          .parse(new java.io.ByteArrayInputStream(bytes))
          .extract[CheckpointMeta](formats, manifest[CheckpointMeta])
        val head = new String(bytes, 0, math.min(64, bytes.length),
          java.nio.charset.StandardCharsets.UTF_8)
        cpCache = Some(CpEntry(st.getLen, st.getModificationTime, head,
          cp, bornAt = System.currentTimeMillis(), trusted = false))
        Some(cp)
    }
  }

  /** Archive: fold the oldest active commits into the checkpoint once
    * more than `maxToKeep` are active, leaving `minToKeep`
    * (HoodieJavaWriteClientExample.java:85 archive window semantics).
    * show_commits afterwards lists only the active timeline. */
  def archive(minToKeep: Int, maxToKeep: Int): Int = withTableLock {
    val cs = commits()
    if (cs.size <= maxToKeep) return 0
    // never fold a savepointed instant (or anything after it) into the
    // checkpoint: liveFiles(Some(savepoint)) must stay resolvable, and
    // the require() there rejects as-of reads before the boundary
    val toArchive = savepoints().headOption match {
      case Some(sp) => cs.dropRight(minToKeep).filter(_.instant < sp)
      case None => cs.dropRight(minToKeep)
    }
    if (toArchive.isEmpty) return 0
    // Only removals performed by the commits being archived may be folded
    // in here: a still-active commit's removals are applied at read time by
    // liveFiles(), and excluding its victims from the checkpoint would lose
    // their rows for as-of reads between the archive boundary and that
    // later commit (which liveFiles' require explicitly allows).
    val removed = toArchive.flatMap(_.removed).toSet
    val priorCp = readCheckpoint()
    val prior = priorCp.toSeq.flatMap(_.files)
    val priorPaths = prior.map(_.path).toSet
    // priorPaths filter: a partially-failed earlier archive (rename
    // crash window) can re-present a commit already folded — folding
    // its files again would duplicate every row they hold
    val archivedEntries = for {
      c <- toArchive
      da = c.deltaAdded.map(_.toSet).getOrElse(Set.empty[String])
      ext = c.external.toSet
      f <- c.added if !removed.contains(f) && !priorPaths.contains(f)
    } yield FileEntry(f, c.instant, c.partitions.getOrElse(f, ""),
      ext(f),
      c.keyBounds.flatMap(_.get(f)).flatMap(_.headOption),
      c.keyBounds.flatMap(_.get(f)).flatMap(_.lift(1)),
      c.buckets.flatMap(_.get(f)),
      delta = c.action == "deltacommit" || da(f),
      colStats = c.colStats.flatMap(_.get(f)))
    val priorTags = priorCp.map(_.tags).getOrElse(Map.empty)
    val archivedTags = toArchive.flatMap(_.tag).flatMap { t =>
      t.split("=", 2) match {
        case Array(k, v) => v.toLongOption.map(k -> _)
        case _ => None
      }
    }
    val tags = (priorTags.toSeq ++ archivedTags)
      .groupMapReduce(_._1)(_._2)(math.max)
    val cp = CheckpointMeta(
      asOf = toArchive.last.instant,
      files = (prior.filterNot(f => removed.contains(f.path)) ++ archivedEntries),
      schemaDdl = toArchive.last.schemaDdl,
      tags = tags,
      archivedRemoved =
        (priorCp.toSeq.flatMap(_.archivedRemoved) ++
          toArchive.flatMap(_.removed)).distinct)
    atomicWrite(checkpointPath, Serialization.write(cp)(formats))
    // this instance just replaced the checkpoint: drop the cached
    // parse rather than relying on the status/head key to notice
    this.synchronized { cpCache = None }
    val archiveDir = new Path(dir, "archived")
    fs.mkdirs(archiveDir)
    toArchive.foreach { c =>
      val name = c.instant + COMMIT_SUFFIX
      // result deliberately unchecked: a failed move leaves the file
      // in the active dir, where liveFiles ignores it (at-or-before
      // the checkpoint boundary) and the next archive() re-moves it
      fs.rename(new Path(dir, name), new Path(archiveDir, name))
      // the listing no longer returns the archived name — drop its
      // cache entry so a long-lived writer's heap tracks the ACTIVE
      // window, not the table's whole commit history
      commitCache.remove(name)
    }
    toArchive.size
  }

  // ---------------------------------------------------------- savepoints

  private def savepointPath(instant: String) =
    new Path(dir, s"savepoint_$instant.json")

  /** Pin `instant` (Hudi `create_savepoint` analog): [[clean]] keeps
    * every file live as of it and [[archive]] never folds it or later
    * commits into the checkpoint, so time travel / incremental / CDC
    * reads anchored at the savepoint stay serveable past the retention
    * window until [[deleteSavepoint]].
    *
    * The pin is only useful if the pinned snapshot is still READABLE:
    * an active commit whose replaced file versions were already
    * reclaimed by an earlier clean would resolve in liveFiles but 404
    * on scan. Every path in the instant's live set is existence-checked
    * under the table lock (so a concurrent clean cannot race the
    * check), and a missing file fails the savepoint loudly. */
  def createSavepoint(instant: String): Unit =
    withTableLock {
      require(commits().exists(_.instant == instant),
        s"cannot savepoint $instant: not an active commit")
      def resolve(rel: String) =
        if (Timeline.isAbsolutePath(rel)) new Path(rel)
        else new Path(basePath, rel)
      // per-path FileSystem (external/mirrored files may live on a
      // different scheme than the table), checked CONCURRENTLY — the
      // lock is held here, and a sequential pass over a large live set
      // on a remote store would stall every writer for its duration.
      // IO errors propagate (a throttled exists() must fail the
      // savepoint with the real cause, not masquerade as a cleaned
      // file), and the wait is bounded so a hung store cannot hold the
      // table lock forever.
      def missing(rel: String): Boolean = {
        val p = resolve(rel)
        !p.getFileSystem(conf).exists(p)
      }
      val paths = liveFiles(Some(instant)).map(_.path)
      val gone =
        if (paths.size <= 1) paths.filter(missing)
        else {
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration._
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(16, paths.size))
          try {
            implicit val ec: ExecutionContext =
              ExecutionContext.fromExecutorService(pool)
            Await.result(
              Future.sequence(paths.map(p => Future(p -> missing(p)))),
              10.minutes).collect { case (p, true) => p }
          } finally pool.shutdownNow()
        }
      require(gone.isEmpty,
        s"cannot savepoint $instant: ${gone.size} live file(s) already " +
          s"cleaned (create savepoints within the clean-retention " +
          s"window); first missing: ${gone.head}")
      atomicWrite(savepointPath(instant),
        Serialization.write(Map("instant" -> instant))(formats))
    }

  /** Drop the pin; returns whether a savepoint existed. */
  def deleteSavepoint(instant: String): Boolean = withTableLock {
    fs.delete(savepointPath(instant), false)
  }

  /** Pinned instants, oldest first. */
  def savepoints(): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("savepoint_") && n.endsWith(".json"))
      .map(_.stripPrefix("savepoint_").stripSuffix(".json")).sorted

  /** Clean: physically delete files replaced by commits older than the
    * `retainCommits`-th newest commit (JavaClientHive2Hudi.java:185
    * retainCommits semantics). Snapshots as-of instants older than the
    * cutoff can no longer be served — EXCEPT savepointed instants,
    * whose live file sets are always kept. Runs under the table lock
    * so a savepoint created mid-clean cannot be half-deleted (the
    * pinned set is computed and acted on atomically w.r.t.
    * createSavepoint). Returns paths deleted. */
  def clean(retainCommits: Int): Seq[String] = withTableLock {
    val cs = commits()
    // archived commits' removed lists are folded into the checkpoint;
    // they predate every active commit, so they are always past the
    // retention cutoff — cleanable even when the active timeline is
    // shorter than the retention window (or empty after an archive)
    val folded = readCheckpoint().toSeq.flatMap(_.archivedRemoved)
    if (cs.size <= retainCommits && folded.isEmpty) return Seq.empty
    val activeRemoved =
      if (cs.size <= retainCommits) Seq.empty
      else {
        // retainCommits = 0 retains nothing: every commit's removals
        // are eligible (cs(cs.size) would be out of bounds)
        val cutoff =
          if (retainCommits == 0) cs.last.instant
          else cs(cs.size - retainCommits).instant
        cs.filter(_.instant <= cutoff).flatMap(_.removed)
      }
    val live = liveFiles(None).map(_.path).toSet
    // savepointed snapshots' files are pinned regardless of retention
    val pinned = savepoints().flatMap(sp => liveFiles(Some(sp)).map(_.path))
      .toSet
    val candidates = (activeRemoved ++ folded).distinct
      .filterNot(live.contains).filterNot(pinned.contains)
    // A table OWNS only files under its own base path. Absolute paths
    // outside it are adopted REFERENCES (metadata bootstrap, catalog-
    // sync mirrors): dropping them from the live set must never
    // physically delete another table's data — a clean on a mirror
    // would otherwise reap the SOURCE table's files.
    def owned(rel: String): Boolean =
      !Timeline.isAbsolutePath(rel) || rel.startsWith(basePath + "/")
    val (own, foreign) = candidates.partition(owned)
    val deleted = own.filter { rel =>
      val p = new Path(basePath, rel)
      !fs.exists(p) || fs.delete(p, false)
    }
    // drop confirmed-deleted paths — and foreign references, which are
    // "cleaned" by forgetting them — from the checkpoint fold: without
    // this the removal history grows forever and every clean re-stats
    // all of it. (Already under the method's table lock — the
    // file-based lock is NOT reentrant, so no inner acquisition.)
    val done = (deleted ++ foreign).toSet
    if (folded.exists(done.contains)) {
      readCheckpoint().foreach { cp =>
        atomicWrite(checkpointPath, Serialization.write(
          cp.copy(archivedRemoved =
            cp.archivedRemoved.filterNot(done.contains)))(formats))
      }
    }
    deleted
  }

  /** Write-then-rename. Commit files are the cross-process OCC arbiter
    * and must be create-no-overwrite: `allowOverwrite = false` attempts
    * the rename directly (local FS rename refuses to replace an existing
    * target) and maps failure to [[CommitConflictException]] — never
    * delete-then-rename, which would let a racing writer silently
    * overwrite an already-acknowledged commit (lost commit). Rewrites of
    * table.json / checkpoint.json keep overwrite semantics. */
  private def atomicWrite(
      target: Path, body: String, allowOverwrite: Boolean = true): Unit = {
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // Commit files are written create-no-overwrite while the table
    // lock (withTableLock) serializes writers; the rename refusal
    // below is the residual backstop for lock expiry edge cases.
    if (allowOverwrite && fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      if (!allowOverwrite)
        throw new CommitConflictException(
          s"Conflicting commit already exists at $target")
      throw new IllegalStateException(s"Commit rename failed for $target")
    }
  }
}

object Timeline {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[Timeline])

  /** Whether a timeline path entry is absolute (a plain path or a
    * scheme URI) vs table-relative — the ONE owned/adopted-reference
    * predicate; keep [[LakeTable.abs]], [[Timeline.clean]]'s `owned`,
    * and [[Timeline.createSavepoint]]'s `resolve` on it. A URI is
    * recognized only by a LEADING scheme (RFC 3986 shape), not by
    * `contains(":/")` — a relative partition path whose VALUE embeds
    * a URL (`u=http://x/part.parquet`) must stay table-relative, or
    * reads resolve a bogus scheme and clean() classifies the table's
    * own file as foreign (never physically deleted). */
  private val SchemePrefix = "^[A-Za-z][A-Za-z0-9+.-]*:/".r
  private[graft] def isAbsolutePath(rel: String): Boolean =
    rel.startsWith("/") || SchemePrefix.findPrefixOf(rel).isDefined

  /** Shared daemon scheduler for inflight-marker heartbeats: one
    * thread serves every Timeline instance in the JVM (touches are
    * sub-ms metadata ops at a multi-second cadence). */
  private[core] lazy val heartbeatExec: java.util.concurrent.ScheduledExecutorService =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-inflight-heartbeat")
      t.setDaemon(true)
      t
    }

  val META_DIR = "_timeline"
  /** A .commit.lock older than this is a crashed writer's leftover. */
  val LOCK_STALE_MS: Long = 60000L
  /** Default: an .inflight marker older than this is treated as a
    * crashed writer's leftover and stops fencing streaming offsets.
    * Live writers heartbeat-touch their marker at a third of this
    * window ([[Timeline#beginWrite]]), so slow writes keep their fence
    * indefinitely; only a dead JVM's marker expires. Short on purpose:
    * an expired marker merely degrades to the unfenced behavior for
    * that one writer, while a leaked marker would stall every
    * commit-tail stream for the full duration. Override per table via
    * Hadoop conf `graft.inflight.stale.ms`
    * (`spark.hadoop.graft.inflight.stale.ms` session-wide). */
  val INFLIGHT_STALE_MS: Long = 120000L
  val TABLE_FILE = "table.json"
  val COMMIT_SUFFIX = ".commit.json"
  val CHECKPOINT_FILE = "checkpoint.json"
  private val formats: Formats = DefaultFormats
  private val instantFormat =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")

  /** Epoch millis an instant id encodes (it is the issuing writer's
    * UTC wall clock at [[Timeline.beginWrite]]); None if malformed. */
  def instantMillis(instant: String): Option[Long] =
    try Some(java.time.LocalDateTime.parse(instant, instantFormat)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    catch { case _: Exception => None }

  /** Lexicographic +1 on the millis part keeps ids sortable. */
  private def bump(instant: String): String =
    (BigInt(instant) + 1).toString.reverse.padTo(17, '0').reverse.mkString
}
