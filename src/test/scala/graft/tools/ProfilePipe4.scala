// lives in graft.queries (not .tools) for private[queries] helper access
package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for pipe4_incremental_neardup (test scope
  * only). The reconciliation itself is the SHARED [[NearDupIndex]]
  * code the gate and the streaming service run, so this cannot drift
  * from the shipping algorithm; only the scenario construction
  * (seed/churn splits) mirrors the gate. Run with
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
    // warm up the lake write paths once so stage timings aren't JIT
    time("warmup full gate run") {
      graft.SparkEntry.queries("pipe4_incremental_neardup")(s, sfDir).count()
    }

    val base = DedupOps.corpus(s, sfDir)
    val updMask = col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0
    val seed = base.filter(col("doc_id") % 3 =!= 0).withColumn("ts", lit(1L))
    val churn = base.filter(col("doc_id") % 3 === 0)
      .unionByName(base.filter(updMask)
        .withColumn("text", concat(col("text"), lit(" v2"))))
      .withColumn("ts", lit(2L))
    def scr(name: String) = QueryPack.scratchDir(s, sfDir + "_prof", name)
    val docs = LakeTable.create(s, scr("p4docs"),
      TableProps("p4docs", Seq("doc_id"), Some("ts"), Seq.empty))
    val sigs = LakeTable.create(s, scr("p4sigs"),
      TableProps("p4sigs", Seq("doc_id"), Some("ts"), Seq.empty))
    val pairs = LakeTable.create(s, scr("p4pairs"),
      TableProps("p4pairs", Seq("a", "b"), Some("ts"), Seq.empty))
    val noDeletes = seed.select("doc_id").limit(0)

    val c1 = time("docs.upsert(seed)")(docs.upsert(seed))
    time("reconcile(seed bootstrap)") {
      NearDupIndex.reconcile(seed.select("doc_id", "text"), noDeletes,
        seed.select("doc_id", "text"), sigs, pairs, 1L)
    }
    time("docs.upsert(churn)")(docs.upsert(churn))
    time("reconcile(increment)") {
      val inc = docs.incremental(c1).select("doc_id", "text")
      NearDupIndex.reconcile(inc, noDeletes,
        docs.snapshot().select("doc_id", "text"), sigs, pairs, 2L)
    }
    time("final snapshot count")(
      pairs.snapshot().select("a", "b", "jaccard").count())
    spark.stop()
  }
}
