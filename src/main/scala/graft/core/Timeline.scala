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
    partitions: Map[String, String])

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
    schemaDdl: String = "")

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

  /** All commits, oldest first. */
  def commits(): Seq[CommitMeta] = {
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(COMMIT_SUFFIX))
      .sorted
      .map(read)
  }

  private def read(fileName: String): CommitMeta = {
    val in = fs.open(new Path(dir, fileName))
    try JsonMethods.parse(in).extract[CommitMeta](formats, manifest[CommitMeta])
    finally in.close()
  }

  def latestInstant(): Option[String] = commits().lastOption.map(_.instant)

  /** Next strictly-increasing instant (wall clock, bumped on collision). */
  def nextInstant(): String = {
    val now = instantFormat.format(java.time.Instant.now()
      .atZone(java.time.ZoneOffset.UTC))
    latestInstant() match {
      case Some(last) if last >= now => bump(last)
      case _ => now
    }
  }

  /** Single-writer optimistic commit: atomic create-no-overwrite of the
    * commit file; a concurrent commit with the same instant loses. */
  def commit(meta: CommitMeta): Unit = {
    val target = new Path(dir, meta.instant + COMMIT_SUFFIX)
    if (fs.exists(target))
      throw new IllegalStateException(
        s"Conflicting commit ${meta.instant} already exists on $basePath")
    atomicWrite(target, Serialization.write(meta)(formats))
  }

  /** Live file set as of `asOf` (inclusive; None = latest): all added
    * minus later removed. Returns (relativePath, commitMeta-that-added). */
  def liveFiles(asOf: Option[String] = None): Seq[(String, CommitMeta)] = {
    val cs = commits().filter(c => asOf.forall(c.instant <= _))
    val removed = cs.flatMap(_.removed).toSet
    for {
      c <- cs
      f <- c.added if !removed.contains(f)
    } yield (f, c)
  }

  private def atomicWrite(target: Path, body: String): Unit = {
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"Commit rename failed for $target")
    }
  }
}

object Timeline {
  val META_DIR = "_timeline"
  val TABLE_FILE = "table.json"
  val COMMIT_SUFFIX = ".commit.json"
  private val formats: Formats = DefaultFormats
  private val instantFormat =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")

  /** Lexicographic +1 on the millis part keeps ids sortable. */
  private def bump(instant: String): String =
    (BigInt(instant) + 1).toString.reverse.padTo(17, '0').reverse.mkString
}
