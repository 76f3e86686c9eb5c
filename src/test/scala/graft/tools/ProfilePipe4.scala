package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{LakeTable, TableProps}
import graft.queries.{DedupOps, NearDupIndex}


/** Throwaway phase timer for the pipe4 gate scenario: drives the REAL
  * [[NearDupIndex.reconcile]] (so timings track the shipped code);
  * set GRAFT_PROFILE=1 for per-write-phase breakdowns. Two rounds in
  * one JVM: round 1 pays JIT/codegen, round 2 shows the steady-state
  * cost the bench's min-of-2-passes reports. */
object ProfilePipe4 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp4] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    s.read.parquet(s"$dir/documents.parquet").count() // warm

    for (round <- 1 to 2) {
      println(s"[pp4] === round $round ===")
      val t0 = System.nanoTime()
      val base = DedupOps.corpus(s, dir)
      val updMask = col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0
      val seed = base.filter(col("doc_id") % 3 =!= 0).withColumn("ts", lit(1L))
      val churn = base.filter(col("doc_id") % 3 === 0)
        .unionByName(base.filter(updMask)
          .withColumn("text", concat(col("text"), lit(" v2"))))
        .withColumn("ts", lit(2L))

      def scratch(n: String): String = {
        val p = s"target/graft_scratch/profile_$n"
        LakeTable.drop(s, p); p
      }
      val docs = LakeTable.create(s, scratch("pipe4docs"),
        TableProps("pipe4docs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val sigStore = LakeTable.create(s, scratch("pipe4sigs"),
        TableProps("pipe4sigs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val pairsTab = LakeTable.create(s, scratch("pipe4pairs"),
        TableProps("pipe4pairs", Seq("a", "b"), Some("ts"), Seq.empty,
          tableType = "mor"))

      val noDeletes = seed.select("doc_id").limit(0)
      val c1 = time("docs.upsert(seed)")(docs.upsert(seed))
      time("reconcile(seed)")(
        NearDupIndex.reconcile(seed.select("doc_id", "text"), noDeletes,
          seed.select("doc_id", "text"), sigStore, pairsTab, 1L))
      time("docs.upsert(churn)")(docs.upsert(churn))
      val inc = docs.incremental(c1).select("doc_id", "text")
      time("reconcile(churn)")(
        NearDupIndex.reconcile(inc, noDeletes,
          docs.snapshot().select("doc_id", "text"), sigStore, pairsTab, 2L))
      time("final snapshot")(
        println("  rows=" + pairsTab.snapshot()
          .select("a", "b", "jaccard").orderBy("a", "b").count()))
      println(f"[pp4] TOTAL                        ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      s.catalog.clearCache()
    }

    // round 3: step-replicated reconcile(churn) against fresh
    // post-seed state — serial timings expose the chain's split
    {
      println(s"[pp4] === round 3 (steps) ===")
      val base = DedupOps.corpus(s, dir)
      val updMask = col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0
      val seed = base.filter(col("doc_id") % 3 =!= 0).withColumn("ts", lit(1L))
      val churn = base.filter(col("doc_id") % 3 === 0)
        .unionByName(base.filter(updMask)
          .withColumn("text", concat(col("text"), lit(" v2"))))
        .withColumn("ts", lit(2L))
      def scratch(n: String): String = {
        val p = s"target/graft_scratch/profile_$n"
        LakeTable.drop(s, p); p
      }
      val docs = LakeTable.create(s, scratch("p4docs3"),
        TableProps("p4docs3", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val sigStore = LakeTable.create(s, scratch("p4sigs3"),
        TableProps("p4sigs3", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val pairsTab = LakeTable.create(s, scratch("p4pairs3"),
        TableProps("p4pairs3", Seq("a", "b"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val noDeletes = seed.select("doc_id").limit(0)
      val c1 = docs.upsert(seed)
      NearDupIndex.reconcile(seed.select("doc_id", "text"), noDeletes,
        seed.select("doc_id", "text"), sigStore, pairsTab, 1L)
      docs.upsert(churn)
      val inc = docs.incremental(c1).select("doc_id", "text")
      val docsSnap = docs.snapshot().select("doc_id", "text")

      val churnC = inc.persist()
      time("s3 churn-count")(churnC.count())
      val preStore = sigStore.snapshot()
      val newSigs = DedupOps.minhashBands(churnC).persist()
      time("s3 minhashBands-mat")(newSigs.count())
      time("s3 sigs-upsertWithDeletes")(
        sigStore.upsertWithDeletes(newSigs.withColumn("ts", lit(2L)),
          noDeletes, combine = false))
      val lb = newSigs.select(col("doc_id"), explode(col("bands")).as("bk"))
      val store = newSigs.select("doc_id", "bands").unionByName(
        preStore.select("doc_id", "bands")
          .join(newSigs.select("doc_id"), Seq("doc_id"), "left_anti"))
      val rb = store.select(col("doc_id"), explode(col("bands")).as("bk"))
      val cand = lb.as("l").join(rb.as("r"),
          col("l.bk") === col("r.bk") && col("l.doc_id") =!= col("r.doc_id"))
        .select(least(col("l.doc_id"), col("r.doc_id")).as("a"),
          greatest(col("l.doc_id"), col("r.doc_id")).as("b")).distinct()
        .persist()
      time("s3 cand-mat")(println("  cand=" + cand.count()))
      val candIds = cand.select(col("a").as("doc_id"))
        .unionByName(cand.select(col("b").as("doc_id"))).distinct()
      val newPairs = DedupOps.verifyJaccard(
        cand, docsSnap.join(candIds, "doc_id"), Some(_.persist())).persist()
      time("s3 verify-mat")(println("  pairs=" + newPairs.count()))
      val churnIds = churnC.select("doc_id").persist()
      val cur = pairsTab.snapshot().select("a", "b")
      val touched = cur.join(churnIds.withColumnRenamed("doc_id", "a"),
          Seq("a"), "leftsemi")
        .unionByName(cur.join(churnIds.withColumnRenamed("doc_id", "b"),
          Seq("b"), "leftsemi"))
        .distinct()
      time("s3 pairs-upsertWithDeletes")(
        pairsTab.upsertWithDeletes(newPairs.withColumn("ts", lit(2L)),
          touched, combine = false))
    }
    s.stop()
  }
}
