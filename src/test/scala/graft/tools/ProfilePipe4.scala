// lives in graft.queries (not .tools) for private[queries] helper access
package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for pipe4_incremental_neardup (test scope
  * only, mirrors the gate body stage by stage). Run with
  * `sbt "Test/runMain graft.queries.ProfilePipe4"`. */
object ProfilePipe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"    $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    import graft.core.{LakeTable, TableProps}
    
    val s = spark
    val dir = sfDir
    def scr(name: String) = {
      val p = s"target/graft_scratch/${name}_prof"
      LakeTable.drop(s, p)
      p
    }
    // warm up the lake write paths once so stage timings aren't JIT
    time("warmup full gate run") {
      graft.SparkEntry.queries("pipe4_incremental_neardup")(s, dir).count()
    }

    val base = DedupOps.corpus(s, dir)
    val updMask = col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0
    val seed = base.filter(col("doc_id") % 3 =!= 0).withColumn("ts", lit(1L))
    val churn = base.filter(col("doc_id") % 3 === 0)
      .unionByName(base.filter(updMask)
        .withColumn("text", concat(col("text"), lit(" v2"))))
      .withColumn("ts", lit(2L))

    val docs = LakeTable.create(s, scr("p4docs"),
      TableProps("p4docs", Seq("doc_id"), Some("ts"), Seq.empty))
    val sigStore = LakeTable.create(s, scr("p4sigs"),
      TableProps("p4sigs", Seq("doc_id"), Some("ts"), Seq.empty))
    val pairsTab = LakeTable.create(s, scr("p4pairs"),
      TableProps("p4pairs", Seq("a", "b"), Some("ts"), Seq.empty))

    val c1 = time("docs.upsert(seed)")(docs.upsert(seed))
    val seedSigs = DedupOps.minhashBands(seed.select("doc_id", "text")).persist()
    time("seedSigs materialize")(seedSigs.count())
    time("sigStore.upsert(seed)")(
      sigStore.upsert(seedSigs.withColumn("ts", lit(1L))))
    val sb = seedSigs.select(col("doc_id"), explode(col("bands")).as("bk"))
    val seedCand = sb.as("l").join(sb.as("r"),
        col("l.bk") === col("r.bk") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    val seedPairs =
      DedupOps.verifyJaccard(seedCand, seed.select("doc_id", "text")).persist()
    time("seed cand+verify")(seedPairs.count())
    time("pairsTab.upsert(seed)")(
      pairsTab.upsert(seedPairs.withColumn("ts", lit(1L))))

    time("docs.upsert(churn)")(docs.upsert(churn))
    val inc = docs.incremental(c1).select("doc_id", "text")
    val newSigs = DedupOps.minhashBands(inc).persist()
    time("inc read + newSigs")(newSigs.count())
    time("sigStore.upsert(new)")(
      sigStore.upsert(newSigs.withColumn("ts", lit(2L))))
    val churnIds = inc.select("doc_id")
    val lb = newSigs.select(col("doc_id"), explode(col("bands")).as("bk"))
    val rb = sigStore.snapshot()
      .select(col("doc_id"), explode(col("bands")).as("bk"))
    val cand = lb.as("l").join(rb.as("r"),
        col("l.bk") === col("r.bk") && col("l.doc_id") =!= col("r.doc_id"))
      .select(least(col("l.doc_id"), col("r.doc_id")).as("a"),
        greatest(col("l.doc_id"), col("r.doc_id")).as("b")).distinct()
    val snap2 = docs.snapshot().select("doc_id", "text")
    val candIds = cand.select(col("a").as("doc_id"))
      .unionByName(cand.select(col("b").as("doc_id"))).distinct()
    val newPairs =
      DedupOps.verifyJaccard(cand, snap2.join(candIds, "doc_id")).persist()
    time("inc cand+verify")(newPairs.count())
    val cur = pairsTab.snapshot().select("a", "b")
    val touched = cur.join(churnIds.withColumnRenamed("doc_id", "a"),
        Seq("a"), "leftsemi")
      .unionByName(cur.join(churnIds.withColumnRenamed("doc_id", "b"),
        Seq("b"), "leftsemi"))
      .distinct()
    val src = touched.join(newPairs, Seq("a", "b"), "left_anti")
      .withColumn("jaccard", lit(null).cast("double"))
      .withColumn("__op", lit("d"))
      .unionByName(newPairs.withColumn("__op", lit("u")))
      .withColumn("ts", lit(2L))
    time("pairsTab.merge")(pairsTab.merge(src,
      matchedUpdate = Some(col("__op") === "u"),
      matchedDelete = Some(col("__op") === "d"),
      notMatchedInsert = Some(col("__op") === "u")))
    time("final snapshot count")(
      pairsTab.snapshot().select("a", "b", "jaccard").count())
    spark.stop()
  }
}
