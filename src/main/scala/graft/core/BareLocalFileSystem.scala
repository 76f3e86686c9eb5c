package graft.core


import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystems with `setPermission` disabled.
  *
  * No native hadoop library ships in this environment, so EVERY
  * permission change on the local FS is a `chmod` SHELL-OUT
  * (`Shell.execCommand`), and Hadoop's local FS applies permissions on
  * every file create and mkdirs. Process spawning here costs ~20 ms
  * (measured: `/bin/true` 20.9 ms, `fs.create`+close 48.9 ms ≈ 2
  * execs, `fs.mkdirs` 24.1 ms ≈ 1 exec, vs `java.io` create 0.04 ms —
  * `graft.tools.FsFloor`), which put a ~0.5-2 s pure-overhead floor
  * under every tiny lake commit: a Spark parquet write of ONE small
  * file measured 926 ms vs 64 ms for the same plan into the noop sink,
  * the difference being almost entirely the committer's and writers'
  * chmod execs. That floor is a LOCAL-SANDBOX artifact, not an engine
  * cost: at cluster scale the table lives on an object store (no POSIX
  * permissions at all) or HDFS with native IO (an in-process call).
  *
  * These subclasses no-op `setPermission`, making local scratch files
  * keep their umask defaults — semantically irrelevant for a
  * single-user benchmark sandbox — and removing every exec from the
  * write path. Wired via
  * `spark.hadoop.fs.file.impl = graft.core.BareLocalFileSystem` (the
  * FileSystem API: all table/timeline/parquet IO).
  *
  * Deliberately NOT wired: `fs.AbstractFileSystem.file.impl` (the
  * FileContext API, which structured streaming's checkpoint managers
  * and state stores use). A raw DelegateToFileSystem there was
  * measured making the stateful streaming gates 3-21× SLOWER
  * (st2/st3/st4 at ~65-70 s vs ~4 s) — the state-store/checkpoint
  * rename-and-recovery protocol depends on LocalFs semantics the
  * delegate did not reproduce. FileContext stays on Hadoop's stock
  * `LocalFs`.
  */
class BareRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

/** Checksummed local FS (the default `file://` behavior) over the
  * no-chmod raw FS. Must be a subclass of [[LocalFileSystem]] so
  * callers that pattern-match or downcast keep working. */
class BareLocalFileSystem extends LocalFileSystem(new BareRawLocalFileSystem) {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}
