package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{LakeTable, TableProps}

/** Wall-clock phase decomposition of the st5/st6 gate shape (VERDICT
  * r15 task 6: attribute the ~9 s floor — commit cadence vs re-derived
  * lineage). Mirrors the gate's phases with timers around each;
  * test-scope only. `sbt "Test/runMain graft.tools.ProfSt5"` */
object ProfSt5 {
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
      println(f"[st5p] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    s.read.parquet(s"$dir/documents.parquet").count()

    for (round <- 1 to 2) {
      println(s"[st5p] === round $round ===")
      val t0 = System.nanoTime()
      // the bm25Scenario frames (replicated: corpus + churn + deletes)
      val docsT = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val seed = docsT.withColumn("ts", lit(1L))
      val updMask = col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0
      val delMask = col("doc_id") % 3 =!= 0 && col("doc_id") % 7 === 1
      val churn = docsT.filter(updMask)
        .withColumn("text",
          concat(lit("replaced content block "), col("doc_id").cast("string")))
        .withColumn("ts", lit(2L))
      val delKeys = docsT.filter(delMask).select("doc_id")

      def scratch(n: String): String = {
        val p = s"target/graft_scratch/profst5_$n"
        LakeTable.drop(s, p); p
      }
      val docsDir = scratch("docs")
      val docs = time("create tables") {
        val d = LakeTable.create(s, docsDir,
          TableProps("st5docs", Seq("doc_id"), Some("ts"), Seq.empty))
        d
      }
      val postDir = scratch("post")
      val post = LakeTable.create(s, postDir,
        TableProps("st5post", Seq("doc_id", "term"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val statsDir = scratch("stats")
      val stats = LakeTable.create(s, statsDir,
        TableProps("st5stats", Seq("term"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val totDir = scratch("tot")
      val totals = LakeTable.create(s, totDir,
        TableProps("st5tot", Seq("id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val ckpt = scratch("ckpt")

      time("docs.upsert(seed)")(docs.upsert(seed))
      def run() = graft.streaming.SearchIndexMaintenance.start(
        s, docsDir, postDir, statsDir, totDir, ckpt)
      val q1 = time("stream start 1")(run())
      time("processAllAvailable 1")(q1.processAllAvailable())
      time("stop 1")(q1.stop())
      time("churn commit")(docs.upsertWithDeletes(
        churn.join(delKeys, Seq("doc_id"), "left_anti"), delKeys))
      val q2 = time("stream start 2")(run())
      time("processAllAvailable 2")(q2.processAllAvailable())
      time("stop 2")(q2.stop())
      time("scoreTop10 + count")(
        println("  rows=" + graft.queries.SearchIndex
          .scoreTop10(post, stats, totals).count()))
      println(f"[st5p] TOTAL                          ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      s.catalog.clearCache()
    }
    s.stop()
  }
}
