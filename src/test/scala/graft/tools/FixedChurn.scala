package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-churn scaling point (round-15 task; round-16: the indexed
  * production shape): pipe9's sf10 step was linear only because that
  * scenario's churn is a corpus FRACTION; the 100 TB steady-state
  * claim is "reconcile cost tracks churn, not corpus". Measured here
  * directly on the two reconcile primitives pipe9's four maintained
  * arms call — [[graft.queries.MultimodalOps.phashReconcile]]
  * (image/audio/video arms) and
  * [[graft.queries.NearDupIndex.reconcile]] (text arm) — with a
  * CONSTANT churn batch (500 updates + 300 inserts + 200 deletes)
  * against corpora growing 10× per rung.
  *
  * Round-16 shape: the stores declare statsColumns and are CLUSTERED
  * by fp / (hash_hi, hash_lo) after bootstrap, a BAND-POSTING INDEX
  * (clustered by its band key) replaces the store-wide rep explode,
  * and text verification reads the docs lake key-pruned
  * (docsLookup). A churn batch then plans O(affected files) — the
  * printed skip counts are the evidence; the churn leg must be ~flat
  * in corpus size (the pre-r16 path grew ~2× per 10×: 5.5→12.4 s
  * image, 6.6→12.9 s text for 10⁵→10⁶).
  *
  * Output: target/fixed_churn_rows.md (SCALING.md table fragment). */
object FixedChurn {

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // GRAFT_PROFILE=1: per-job wall times with call sites — the
    // decisive attribution when stage-level prof marks overlap
    // background write futures
    if (sys.env.get("GRAFT_PROFILE").contains("1"))
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          val t0 = new java.util.concurrent.ConcurrentHashMap[
            Int, (Long, String)]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            t0.put(j.jobId, (System.nanoTime(), Option(j.properties
              .getProperty("spark.job.description")).getOrElse("?")))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val v = t0.remove(j.jobId)
            if (v != null) {
              val secs = (System.nanoTime() - v._1) / 1e9
              if (secs > 0.5) Console.err.println(
                f"[job] ${j.jobId}%4d $secs%7.2fs ${v._2.take(100)}")
            }
          }
        })
    import s.implicits._
    import graft.core.{LakeTable, TableProps}
    import graft.multimodal.MediaDecoder

    val ns = args.headOption.map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(10000, 100000, 1000000))
    // rows per clustered file: the skipping-granularity knob (see the
    // cluster() call-site comment). Env-tunable for A/B bisects.
    val fileRows = sys.env.getOrElse("SPARK_FC_FILE_ROWS", "2500").toInt
    // posting tables hold 16-64 entries PER DOC — file-size them by
    // POSTING rows, not docs, or a micro-batch probe of K band keys
    // cannot skip (K scattered keys prune only when files >> K, and
    // the kept-file read is O(K x postFileRows))
    val postFileRows =
      sys.env.getOrElse("SPARK_FC_POST_FILE_ROWS", "5000").toInt

    def scratch(n: String): String = {
      val p = s"target/graft_scratch/fc_$n"
      LakeTable.drop(s, p); p
    }
    def mor(name: String, pk: Seq[String], stats: Seq[String]) =
      TableProps(name, pk, Some("ts"), Seq.empty, tableType = "mor",
        statsColumns = stats)

    def noiseImg(seed: Long): Array[Byte] =
      MediaDecoder.encodeBmp24With(16, 16) { (x, y) =>
        def c(k: Int): Int = {
          val v = (((seed * (131 + k)) + x) * (seed % 97 + 31 + 2 * k) +
            ((seed * (137 + k)) + y) * (seed % 89 + 23 + 3 * k) +
            x.toLong * y * (seed % 83 + 11 + k)) % 256
          ((v + 256) % 256).toInt
        }
        (c(0) << 16) | (c(1) << 8) | c(2)
      }

    // fixed churn shape at every rung: ids 1..500 update (re-keyed
    // content seed), N+1..N+300 insert, 501..700 delete
    case class Row2(fam: String, n: Int, boot: Double, cluster: Double,
        churn: Double, micro: Double, skipLine: String)

    def imageRow(n: Int): Row2 = {
      val sigs = LakeTable.create(s, scratch(s"img${n}_sigs"),
        mor("fcsigs", Seq("doc_id"), Seq("hash_hi", "hash_lo", "ts")))
      val pairs = LakeTable.create(s, scratch(s"img${n}_pairs"),
        mor("fcpairs", Seq("a", "b"), Seq.empty))
      val post = LakeTable.create(s, scratch(s"img${n}_post"),
        mor("fcpost", Seq("blk", "doc_id"), Seq("blk", "ts")))
      def pay(ids: org.apache.spark.sql.DataFrame, salt: Long) = ids
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(d => (d, noiseImg(d * 7 + salt))))
        .toDF("doc_id", "payload")
      val none = Seq.empty[Long].toDF("doc_id")
      val t0 = System.nanoTime()
      graft.queries.MultimodalOps.phashReconcile(
        pay(s.range(1, n + 1).select(col("id").as("doc_id")), 0L),
        none, sigs, pairs, 1L, postings = Some(post))
      val boot = (System.nanoTime() - t0) / 1e9
      // production table service: restore key locality after bulk
      // ingest so churn batches file-prune (lake13's CALL
      // run_clustering, timed separately — amortized over every later
      // batch)
      val tc = System.nanoTime()
      // bounded ROWS PER FILE, not bounded file count: K scattered
      // churn keys hit ~min(K, files) files, so skipping requires
      // files >> K and the read cost is O(K x fileRows) - constant in
      // corpus once files exceed the churn key count
      sigs.cluster(Seq("hash_hi", "hash_lo"),
        targetFiles = math.max(16, n / fileRows))
      post.cluster(Seq("blk"),
        targetFiles = math.max(16, n * 64 / postFileRows))
      val clus = (System.nanoTime() - tc) / 1e9
      val churnIds = s.range(1, 501).select(col("id").as("doc_id"))
        .unionByName(
          s.range(n + 1, n + 301).select(col("id").as("doc_id")))
      val t1 = System.nanoTime()
      val st = graft.queries.MultimodalOps.phashReconcile(
        pay(churnIds, 999999L),
        s.range(501, 701).select(col("id").as("doc_id")),
        sigs, pairs, 2L, postings = Some(post))
      val churn = (System.nanoTime() - t1) / 1e9
      // micro-batch leg (st7's regime): 40-doc churn - the posting
      // probe engages (40 reps x 64 keys < cutoff) and must file-prune
      val t2 = System.nanoTime()
      val st2 = graft.queries.MultimodalOps.phashReconcile(
        pay(s.range(701, 741).select(col("id").as("doc_id")), 555L),
        Seq.empty[Long].toDF("doc_id"), sigs, pairs, 3L,
        postings = Some(post))
      val micro = (System.nanoTime() - t2) / 1e9
      val skip = s"churn: ${st.storeFilesSkipped} skip/" +
        s"${st.storeFilesKept} keep; micro: ${st2.storeFilesSkipped} " +
        s"skip/${st2.storeFilesKept} keep"
      println(f"[fc] image n=$n%-8d boot=$boot%7.2fs cluster=$clus%7.2fs " +
        f"churn=$churn%7.2fs micro=$micro%7.2fs  ($skip)")
      Row2("image", n, boot, clus, churn, micro, skip)
    }

    def textRow(n: Int): Row2 = {
      val sigs = LakeTable.create(s, scratch(s"txt${n}_sigs"),
        mor("fctsigs", Seq("doc_id"), Seq("fp", "ts")))
      val pairs = LakeTable.create(s, scratch(s"txt${n}_pairs"),
        mor("fctpairs", Seq("a", "b"), Seq.empty))
      val post = LakeTable.create(s, scratch(s"txt${n}_post"),
        mor("fctpost", Seq("bk", "doc_id"), Seq("bk", "ts")))
      val docs = LakeTable.create(s, scratch(s"txt${n}_docs"),
        TableProps("fcdocs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      def docsOf(ids: org.apache.spark.sql.DataFrame, v: String) = ids
        .withColumn("text", concat_ws(" ", (0 until 12).map(j =>
          concat(lit(v), col("doc_id"), lit(s"x$j"))): _*))
      val none = Seq.empty[Long].toDF("doc_id")
      val lookup = (ids: Seq[Long]) => docs
        .snapshotForKeys(ids.map(_.toString).toSet)
        .select("doc_id", "text")
      val all = docsOf(s.range(1, n + 1).select(col("id").as("doc_id")), "w")
      // corpus ingest (not part of the reconcile legs): the docs lake
      // the service's keyed verification lookups read
      docs.upsert(all.withColumn("ts", lit(1L)))
      val t0 = System.nanoTime()
      graft.queries.NearDupIndex.reconcile(all, none,
        docs.snapshot().select("doc_id", "text"), sigs, pairs, 1L,
        postings = Some(post), docsLookup = Some(lookup))
      val boot = (System.nanoTime() - t0) / 1e9
      val tc = System.nanoTime()
      sigs.cluster(Seq("fp"), targetFiles = math.max(16, n / fileRows))
      post.cluster(Seq("bk"),
        targetFiles = math.max(16, n * 16 / postFileRows))
      val clus = (System.nanoTime() - tc) / 1e9
      val churnIds = s.range(1, 501).select(col("id").as("doc_id"))
        .unionByName(
          s.range(n + 1, n + 301).select(col("id").as("doc_id")))
      val churn2 = docsOf(churnIds, "u")
      val deleted = s.range(501, 701).select(col("id").as("doc_id"))
      // docs DML first (the service's upstream ingest), then the
      // timed reconcile reads post-churn docs state key-pruned
      docs.upsertWithDeletes(churn2.withColumn("ts", lit(2L)), deleted)
      val t1 = System.nanoTime()
      val st = graft.queries.NearDupIndex.reconcile(
        churn2, deleted, docs.snapshot().select("doc_id", "text"),
        sigs, pairs, 2L, postings = Some(post),
        docsLookup = Some(lookup))
      val churn = (System.nanoTime() - t1) / 1e9
      // micro-batch leg: 40-doc churn through the posting probe
      val micro2 = docsOf(s.range(701, 741)
        .select(col("id").as("doc_id")), "m")
      docs.upsert(micro2.withColumn("ts", lit(3L)))
      val t2 = System.nanoTime()
      val st2 = graft.queries.NearDupIndex.reconcile(
        micro2, none, docs.snapshot().select("doc_id", "text"),
        sigs, pairs, 3L, postings = Some(post),
        docsLookup = Some(lookup))
      val micro = (System.nanoTime() - t2) / 1e9
      val skip = s"churn: ${st.skipped} skip/${st.kept} keep; " +
        s"micro: ${st2.skipped} skip/${st2.kept} keep"
      println(f"[fc] text  n=$n%-8d boot=$boot%7.2fs cluster=$clus%7.2fs " +
        f"churn=$churn%7.2fs micro=$micro%7.2fs  ($skip)")
      Row2("text", n, boot, clus, churn, micro, skip)
    }

    // SPARK_FC_FAMILY=image|text runs one family alone (profiling aid)
    val fams = sys.env.get("SPARK_FC_FAMILY")
    val rows = ns.flatMap { n =>
      Seq("image" -> (() => imageRow(n)), "text" -> (() => textRow(n)))
        .collect { case (f, mk) if fams.forall(_ == f) => mk() }
    }
    val sb = new StringBuilder
    sb.append("| family | corpus N | bootstrap (s) | cluster (s) | " +
      "fixed-churn batch (s) | micro-batch (s) | file skipping |\n" +
      "|---|---|---|---|---|---|---|\n")
    rows.foreach { r =>
      sb.append(f"| ${r.fam} | ${r.n} | ${r.boot}%.2f | ${r.cluster}%.2f " +
        f"| ${r.churn}%.2f | ${r.micro}%.2f | ${r.skipLine} |\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/fixed_churn_rows.md"),
      sb.toString.getBytes("UTF-8"))
    println("[fc] wrote target/fixed_churn_rows.md")
    s.stop()
  }
}
