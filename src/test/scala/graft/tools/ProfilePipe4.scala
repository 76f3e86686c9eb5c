package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{LakeTable, TableProps}
import graft.queries.{DedupOps, NearDupIndex}


/** Throwaway phase timer for the pipe4 gate scenario. */
object ProfilePipe4 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp4] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    s.read.parquet(s"$dir/documents.parquet").count() // warm

    // two rounds in one JVM: round 1 pays JIT/codegen, round 2 shows
    // the steady-state cost the bench's min-of-2-passes reports
    for (round <- 1 to 2) {
    println(s"[pp4] === round $round ===")
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
      TableProps("pipe4docs", Seq("doc_id"), Some("ts"), Seq.empty))
    val sigStore = LakeTable.create(s, scratch("pipe4sigs"),
      TableProps("pipe4sigs", Seq("doc_id"), Some("ts"), Seq.empty))
    val pairsTab = LakeTable.create(s, scratch("pipe4pairs"),
      TableProps("pipe4pairs", Seq("a", "b"), Some("ts"), Seq.empty))

    val noDeletes = seed.select("doc_id").limit(0)
    val c1 = time("docs.upsert(seed)")(docs.upsert(seed))
    // unbundled replica of NearDupIndex.reconcile(seed) with timers
    locally {
      val churnC = seed.select("doc_id", "text").persist()
      val newSigs = DedupOps.minhashBands(churnC).persist()
      time("  minhashBands(seed) mat")(println("  rows=" + newSigs.count()))
      time("  sigs.upsert(seed)")(
        sigStore.upsert(newSigs.withColumn("ts", lit(1L))))
      val lb = newSigs.select(col("doc_id"), explode(col("bands")).as("bk"))
      // mirror reconcile's bootstrap fast path: empty store before the
      // upsert → the store content IS newSigs
      val rb = newSigs.select(col("doc_id"), explode(col("bands")).as("bk"))
      val cand = lb.as("l").join(rb.as("r"),
          col("l.bk") === col("r.bk") && col("l.doc_id") =!= col("r.doc_id"))
        .select(least(col("l.doc_id"), col("r.doc_id")).as("a"),
          greatest(col("l.doc_id"), col("r.doc_id")).as("b")).distinct()
        .persist()
      time("  cand mat")(println("  rows=" + cand.count()))
      val candIds = cand.select(col("a").as("doc_id"))
        .unionByName(cand.select(col("b").as("doc_id"))).distinct()
      val newPairs = DedupOps.verifyJaccard(
        cand, seed.select("doc_id", "text").join(candIds, "doc_id")).persist()
      time("  verifyJaccard mat")(println("  rows=" + newPairs.count()))
      time("  pairs.upsert")(
        pairsTab.upsert(newPairs.withColumn("ts", lit(1L))))
      churnC.unpersist(); newSigs.unpersist(); cand.unpersist(); newPairs.unpersist()
    }
    time("docs.upsert(churn)")(docs.upsert(churn))
    val inc = time("incremental read")(
      docs.incremental(c1).select("doc_id", "text"))
    // unbundled replica of reconcile(churn) with timers
    locally {
      val docsSnap = docs.snapshot().select("doc_id", "text")
      val churnC = inc.persist()
      time("  deletes isEmpty check")(noDeletes.isEmpty)
      val newSigs = DedupOps.minhashBands(churnC).persist()
      time("  minhashBands(churn)")(newSigs.count())
      time("  sigs.upsert(churn)")(
        sigStore.upsert(newSigs.withColumn("ts", lit(2L))))
      val lb = newSigs.select(col("doc_id"), explode(col("bands")).as("bk"))
      val rb = sigStore.snapshot()
        .select(col("doc_id"), explode(col("bands")).as("bk"))
      val cand = lb.as("l").join(rb.as("r"),
          col("l.bk") === col("r.bk") && col("l.doc_id") =!= col("r.doc_id"))
        .select(least(col("l.doc_id"), col("r.doc_id")).as("a"),
          greatest(col("l.doc_id"), col("r.doc_id")).as("b")).distinct()
        .persist()
      time("  cand mat")(cand.count())
      val candIds = cand.select(col("a").as("doc_id"))
        .unionByName(cand.select(col("b").as("doc_id"))).distinct()
      val newPairs = DedupOps.verifyJaccard(
        cand, docsSnap.join(candIds, "doc_id")).persist()
      time("  verifyJaccard mat")(newPairs.count())
      val churnIds = churnC.select("doc_id").persist()
      val cur = pairsTab.snapshot().select("a", "b")
      val touched = cur.join(churnIds.withColumnRenamed("doc_id", "a"),
          Seq("a"), "leftsemi")
        .unionByName(cur.join(churnIds.withColumnRenamed("doc_id", "b"),
          Seq("b"), "leftsemi"))
        .distinct()
      val src2 = touched.join(newPairs, Seq("a", "b"), "left_anti")
        .withColumn("jaccard", lit(null).cast("double"))
        .withColumn("__op", lit("d"))
        .unionByName(newPairs.withColumn("__op", lit("u")))
        .withColumn("ts", lit(2L))
        .persist()
      time("  src2 mat")(src2.count())
      time("  pairs.merge")(pairsTab.merge(src2,
        matchedUpdate = Some(col("__op") === "u"),
        matchedDelete = Some(col("__op") === "d"),
        notMatchedInsert = Some(col("__op") === "u")))
      src2.unpersist()
      churnC.unpersist(); newSigs.unpersist(); cand.unpersist()
      newPairs.unpersist(); churnIds.unpersist()
    }
    time("final snapshot")(
      println("  rows=" + pairsTab.snapshot().count()))
    }
    s.stop()
  }
}
