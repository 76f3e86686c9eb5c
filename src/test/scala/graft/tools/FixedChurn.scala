package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-churn scaling point (round-15 task): pipe9's sf10 step was
  * linear only because that scenario's churn is a corpus FRACTION;
  * the 100 TB steady-state claim is "reconcile cost tracks churn, not
  * corpus". Measured here directly on the two reconcile primitives
  * pipe9's four maintained arms call —
  * [[graft.queries.MultimodalOps.phashReconcile]] (image/audio/video
  * arms) and [[graft.queries.NearDupIndex.reconcile]] (text arm) —
  * with a CONSTANT churn batch (500 updates + 300 inserts + 200
  * deletes) against corpora growing 10× per rung. Under the
  * persisted-rep contract the only corpus-order term left in a churn
  * batch is the store SCAN (columnar read, no shuffle/sort/window),
  * so the churn leg must grow far sub-linearly in corpus size; any
  * corpus-tracking shuffle would show as a ~10× step.
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
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    import graft.core.{LakeTable, TableProps}
    import graft.multimodal.MediaDecoder

    val ns = args.headOption.map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(10000, 100000, 1000000))

    def scratch(n: String): String = {
      val p = s"target/graft_scratch/fc_$n"
      LakeTable.drop(s, p); p
    }

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
    case class Row2(fam: String, n: Int, boot: Double, churn: Double)

    def imageRow(n: Int): Row2 = {
      val sigs = LakeTable.create(s, scratch(s"img${n}_sigs"),
        TableProps("fcsigs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val pairs = LakeTable.create(s, scratch(s"img${n}_pairs"),
        TableProps("fcpairs", Seq("a", "b"), Some("ts"), Seq.empty,
          tableType = "mor"))
      def pay(ids: org.apache.spark.sql.DataFrame, salt: Long) = ids
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(d => (d, noiseImg(d * 7 + salt))))
        .toDF("doc_id", "payload")
      val none = Seq.empty[Long].toDF("doc_id")
      val t0 = System.nanoTime()
      graft.queries.MultimodalOps.phashReconcile(
        pay(s.range(1, n + 1).select(col("id").as("doc_id")), 0L),
        none, sigs, pairs, 1L)
      val boot = (System.nanoTime() - t0) / 1e9
      val churnIds = s.range(1, 501).select(col("id").as("doc_id"))
        .unionByName(
          s.range(n + 1, n + 301).select(col("id").as("doc_id")))
      val t1 = System.nanoTime()
      graft.queries.MultimodalOps.phashReconcile(
        pay(churnIds, 999999L),
        s.range(501, 701).select(col("id").as("doc_id")),
        sigs, pairs, 2L)
      val churn = (System.nanoTime() - t1) / 1e9
      println(f"[fc] image n=$n%-8d boot=$boot%7.2fs churn=$churn%7.2fs")
      Row2("image", n, boot, churn)
    }

    def textRow(n: Int): Row2 = {
      val sigs = LakeTable.create(s, scratch(s"txt${n}_sigs"),
        TableProps("fctsigs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val pairs = LakeTable.create(s, scratch(s"txt${n}_pairs"),
        TableProps("fctpairs", Seq("a", "b"), Some("ts"), Seq.empty,
          tableType = "mor"))
      def docsOf(ids: org.apache.spark.sql.DataFrame, v: String) = ids
        .withColumn("text", concat_ws(" ", (0 until 12).map(j =>
          concat(lit(v), col("doc_id"), lit(s"x$j"))): _*))
      val none = Seq.empty[Long].toDF("doc_id")
      val all = docsOf(s.range(1, n + 1).select(col("id").as("doc_id")), "w")
      val t0 = System.nanoTime()
      graft.queries.NearDupIndex.reconcile(all, none, all, sigs, pairs, 1L)
      val boot = (System.nanoTime() - t0) / 1e9
      val churnIds = s.range(1, 501).select(col("id").as("doc_id"))
        .unionByName(
          s.range(n + 1, n + 301).select(col("id").as("doc_id")))
      val churn2 = docsOf(churnIds, "u")
      val deleted = s.range(501, 701).select(col("id").as("doc_id"))
      // post-churn corpus for candidate verification: untouched docs
      // (701..n, original vocab) plus the churn's current texts
      val snap = docsOf(
        s.range(701, n + 1).select(col("id").as("doc_id")), "w")
        .unionByName(churn2)
      val t1 = System.nanoTime()
      graft.queries.NearDupIndex.reconcile(
        churn2, deleted, snap, sigs, pairs, 2L)
      val churn = (System.nanoTime() - t1) / 1e9
      println(f"[fc] text  n=$n%-8d boot=$boot%7.2fs churn=$churn%7.2fs")
      Row2("text", n, boot, churn)
    }

    val rows = ns.flatMap(n => Seq(imageRow(n), textRow(n)))
    val sb = new StringBuilder
    sb.append("| family | corpus N | bootstrap (s) | fixed-churn " +
      "batch (s) |\n|---|---|---|---|\n")
    rows.foreach { r =>
      sb.append(f"| ${r.fam} | ${r.n} | ${r.boot}%.2f | ${r.churn}%.2f |\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/fixed_churn_rows.md"),
      sb.toString.getBytes("UTF-8"))
    println("[fc] wrote target/fixed_churn_rows.md")
    s.stop()
  }
}
