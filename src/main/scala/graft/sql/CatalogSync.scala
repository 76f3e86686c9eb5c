package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core.{CommitMeta, FileEntry, LakeTable}

/** Foreign-catalog sync — the reference's database-wide Hive sync job
  * (`SyncHiveWithDatabase.scala:37-74`: walk a database directory,
  * detect Hudi tables by their metadata folder, push each into the
  * metastore via HiveSyncTool, isolate per-table failures) re-expressed
  * graft-native:
  *
  *   - the "metastore" is any registered [[GraftCatalog]] (its
  *     warehouse directory IS its catalog state, the Spark-4 shape);
  *   - "sync one table" = mirror the source table's LIVE FILE SET into
  *     a same-named table under the target warehouse as file-pointer
  *     commits — data stays in place, exactly like HiveSyncTool pushing
  *     table/partition entries, and the target serves full snapshot /
  *     pruned / SQL reads through the ordinary read path;
  *   - re-running the job is incremental at file/partition granularity:
  *     only files that appeared (new commits/partitions) or disappeared
  *     (clean/compaction/rewrite) in the source since the last run are
  *     committed, mirroring HiveSyncTool's last-sync-time partition
  *     diff;
  *   - each run appends one audit row per table to a `sync_audit`
  *     table in the target database, the
  *     `SyncCommentsAcrossClusters.scala:111-113` success-mark shape.
  *
  * Scale: pure driver-side metadata work — two timeline listings per
  * table and one commit write; no data is read or moved, so cost is
  * O(live files) per table regardless of data size.
  */
object CatalogSync {

  /** One table's sync outcome; also the audit row. */
  final case class TableSync(
      num: Int,
      tableName: String,
      mark: String, // success | up_to_date | schema_synced | skipped | failed
      syncTime: String,
      filesAdded: Int,
      filesRemoved: Int,
      detail: String)

  /** Mirror every lake table under `sourceDir` into
    * `targetCatalog.targetDb`. `syncTime` is injectable for
    * deterministic tests; defaults to the wall clock. */
  def syncDatabase(
      spark: SparkSession,
      sourceDir: String,
      targetCatalog: String,
      targetDb: String,
      auditTable: String = "sync_audit",
      syncTime: Option[String] = None): Seq[TableSync] = {
    val warehouse = spark.conf
      .getOption(s"spark.sql.catalog.$targetCatalog.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"catalog '$targetCatalog' is not registered " +
          s"(missing spark.sql.catalog.$targetCatalog.warehouse)"))
    syncInto(spark, sourceDir, warehouse, targetDb, auditTable, syncTime)
  }

  /** Same job addressed by target warehouse directory — the form the
    * `CALL <catalog>.system.sync_database(...)` procedure uses (the
    * procedure already executes inside its catalog). */
  def syncInto(
      spark: SparkSession,
      sourceDir: String,
      warehouse: String,
      targetDb: String,
      auditTable: String = "sync_audit",
      syncTime: Option[String] = None): Seq[TableSync] = {
    // millisecond precision: syncTime is part of the audit table's
    // primary key, and two runs inside the same second must not
    // collide into duplicate-key rows
    val ts = syncTime.getOrElse(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .format(java.time.LocalDateTime.now()))
    val fs = new Path(sourceDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(new Path(sourceDir)).toSeq
      .filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
    var num = 0
    val results = dirs.map { d =>
      num += 1
      val name = d.getName
      if (!LakeTable.exists(spark, d.toString))
        TableSync(num, name, "skipped", ts, 0, 0, "not a lake table")
      else
        try {
          val (added, removed, schemaOnly) =
            syncTable(spark, d.toString, s"$warehouse/$targetDb/$name")
          TableSync(num, name,
            if (added != 0 || removed != 0) "success"
            // a props-only schema propagation is NOT a no-op: surface
            // it distinctly so callers/logs can see metadata moved
            else if (schemaOnly) "schema_synced"
            else "up_to_date",
            ts, added, removed, "")
        } catch {
          // per-table isolation, like the reference's try/catch per sync
          case e: Exception =>
            TableSync(num, name, "failed", ts, 0, 0, String.valueOf(e.getMessage))
        }
    }
    writeAudit(spark, s"$warehouse/$targetDb/$auditTable", results)
    results
  }

  /** Mirror one source table's live file set into `tgtPath`; returns
    * (files added, files dropped, schema-only sync). The third flag is
    * true only for the props-only branch — an unchanged file set whose
    * source schema drifted, propagated without a commit — so callers
    * can tell a metadata sync from a genuine no-op.
    * The target is created on first sync
    * with the source's table properties (pk / preCombine / partition /
    * type / payload), so keyed DML against the mirror behaves like the
    * source. Mirrored entries keep the source's key bounds, bucket ids,
    * delta flags, and external markers — probes prune and MOR merges
    * exactly as they would at the source. */
  private[graft] def syncTable(
      spark: SparkSession, srcPath: String, tgtPath: String)
      : (Int, Int, Boolean) = {
    val src = LakeTable.load(spark, srcPath)
    val tgt =
      if (LakeTable.exists(spark, tgtPath)) LakeTable.load(spark, tgtPath)
      else LakeTable.create(spark, tgtPath,
        src.props.copy(schemaDdl = src.schema.toDDL))
    val srcLive = src.timeline.liveFiles(None)
      .map(f => f.copy(path = src.abs(f.path)))
    val tgtLive = tgt.timeline.liveFiles(None)
    val tgtPaths = tgtLive.map(_.path).toSet
    val srcPaths = srcLive.map(_.path).toSet
    val fresh = srcLive.filterNot(f => tgtPaths.contains(f.path))
    val stale = tgtLive.map(_.path).filterNot(srcPaths.contains)
    // schema-only source changes (ALTER TABLE ADD COLUMN writes props,
    // no files) must still sync: an unchanged file set with a drifted
    // schema would otherwise report up_to_date while mirror readers
    // keep the stale schema until the next data commit
    val schemaDrift = src.schema.toDDL != tgt.schema.toDDL
    if (fresh.isEmpty && stale.isEmpty && !schemaDrift) return (0, 0, false)
    if (fresh.isEmpty && stale.isEmpty) {
      tgt.timeline.writeProps(tgt.props.copy(schemaDdl = src.schema.toDDL))
      return (0, 0, true)
    }
    // managed graft files carry their meta columns in-file, so the
    // mirror references them as managed too (reads see the ORIGINAL
    // per-row commit times); source-external (bootstrapped) files stay
    // external so the read path keeps synthesizing their meta. MOR
    // delta files are marked via deltaAdded so the target's read-side
    // merge applies. ONE commit for base + delta + removals: a reader
    // racing the sync sees either the old mirror or the new one,
    // never a mixed-instant view the source never had.
    tgt.timeline.commit(CommitMeta(
      tgt.timeline.nextInstant(), "sync",
      added = fresh.map(_.path),
      removed = stale,
      external = fresh.filter(_.external).map(_.path),
      schemaDdl = src.schema.toDDL,
      totalRecords = -1L,
      partitions = fresh.map(f => f.path -> f.partition).toMap,
      keyBounds = Some(fresh.collect {
        case f if f.minKey.isDefined && f.maxKey.isDefined =>
          f.path -> Seq(f.minKey.get, f.maxKey.get)
      }.toMap).filter(_.nonEmpty),
      buckets = Some(fresh.collect {
        case f if f.bucket.isDefined => f.path -> f.bucket.get
      }.toMap).filter(_.nonEmpty),
      deltaAdded = Some(fresh.filter(_.delta).map(_.path)).filter(_.nonEmpty)))
    (fresh.size, stale.size, false)
  }

  /** Append this run's outcomes to the audit table
    * (SyncCommentsAcrossClusters.scala:111-113: num, table_name, mark,
    * sync_time — extended with the file counts and failure detail). */
  private def writeAudit(
      spark: SparkSession, auditPath: String, rows: Seq[TableSync]): Unit = {
    if (rows.isEmpty) return
    import spark.implicits._
    val audit =
      if (LakeTable.exists(spark, auditPath)) LakeTable.load(spark, auditPath)
      else LakeTable.create(spark, auditPath, graft.core.TableProps(
        name = "sync_audit",
        primaryKey = Seq("num", "tableName", "syncTime"),
        preCombineField = None,
        partitionFields = Seq.empty))
    audit.insert(rows.toDF())
  }
}
