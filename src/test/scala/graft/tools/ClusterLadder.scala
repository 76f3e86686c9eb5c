package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Duplicate-cluster skew ladder (round-14 task): inject ONE cluster
  * of k identical payloads (k = 10 / 100 / 1k / 10k) into a
  * fixed-size distinct background corpus, bootstrap the maintained
  * index through the production reconcile, and measure the persisted
  * pairs-table cardinality and wall time. Under the skew-collapsed
  * contract both must be O(k) — k-1 star edges on top of the
  * background pairs — where the pre-collapse pair set was
  * k(k-1)/2 (5·10⁷ rows at k = 10⁴ from one cluster alone). Run for
  * the image (perceptual-hash) and text (MinHash/LSH) index families;
  * the audio/video hashes share the image path's generator.
  *
  * Output: target/ladder_rows.md (SCALING.md table fragment). */
object ClusterLadder {

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

    val bg = 2000 // distinct background docs at every rung
    val ks = args.headOption.map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(10, 100, 1000, 10000))

    def scratch(n: String): String = {
      val p = s"target/graft_scratch/ladder_$n"
      LakeTable.drop(s, p); p
    }

    // distinct noise image per background id; ONE fixed image for the
    // whole injected cluster (byte-identical payloads)
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

    // distinct text per background id (doc-specific vocabulary); ONE
    // fixed 12-word text for the whole injected cluster
    def bgText(id: Long): String =
      (0 until 12).map(j => s"w${id}x$j").mkString(" ")
    val clusterText = (0 until 12).map(j => s"dupword$j").mkString(" ")

    case class Rung(fam: String, k: Int, pairs: Long, expected: Long,
        secs: Double)

    def imageRung(k: Int): Rung = {
      val sigs = LakeTable.create(s, scratch(s"img${k}_sigs"),
        TableProps("ldsigs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val pairs = LakeTable.create(s, scratch(s"img${k}_pairs"),
        TableProps("ldpairs", Seq("a", "b"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val clusterImg = noiseImg(424242L)
      val payloads = s.range(1, bg + k + 1).select(col("id").as("doc_id"))
        .as[Long]
        .mapPartitions(_.map(d =>
          (d, if (d <= bg) noiseImg(d) else clusterImg)))
        .toDF("doc_id", "payload")
      val t0 = System.nanoTime()
      graft.queries.MultimodalOps.phashReconcile(payloads,
        Seq.empty[Long].toDF("doc_id"), sigs, pairs, 1L)
      val dt = (System.nanoTime() - t0) / 1e9
      val n = pairs.snapshot().count()
      // background noise images can collide into incidental pairs —
      // measure the background's own pair count at k-independent cost
      // by subtracting the k-1 star edges the cluster must add
      Rung("image", k, n, n - (k - 1), dt)
    }

    def textRung(k: Int): Rung = {
      val sigs = LakeTable.create(s, scratch(s"txt${k}_sigs"),
        TableProps("lt_sigs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val pairs = LakeTable.create(s, scratch(s"txt${k}_pairs"),
        TableProps("lt_pairs", Seq("a", "b"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val docs = s.range(1, bg + k + 1).select(col("id").as("doc_id"))
        .withColumn("text",
          when(col("doc_id") <= bg,
            concat_ws(" ", (0 until 12).map(j =>
              concat(lit("w"), col("doc_id"), lit(s"x$j"))): _*))
            .otherwise(lit(clusterText)))
      val t0 = System.nanoTime()
      graft.queries.NearDupIndex.reconcile(docs,
        Seq.empty[Long].toDF("doc_id"), docs, sigs, pairs, 1L)
      val dt = (System.nanoTime() - t0) / 1e9
      val n = pairs.snapshot().count()
      Rung("text", k, n, n - (k - 1), dt)
    }

    val rungs = ks.flatMap { k =>
      val r1 = imageRung(k); val r2 = textRung(k)
      println(f"[ladder] image k=$k%-6d pairs=${r1.pairs}%-8d " +
        f"(bg ${r1.expected}) ${r1.secs}%6.2fs | text k=$k%-6d " +
        f"pairs=${r2.pairs}%-8d (bg ${r2.expected}) ${r2.secs}%6.2fs")
      Seq(r1, r2)
    }
    val sb = new StringBuilder
    sb.append("| family | cluster k | pairs rows | of which background " +
      "| pre-collapse k(k-1)/2 | secs |\n|---|---|---|---|---|---|\n")
    rungs.foreach { r =>
      sb.append(f"| ${r.fam} | ${r.k} | ${r.pairs} | ${r.expected} " +
        f"| ${r.k.toLong * (r.k - 1) / 2} | ${r.secs}%.2f |\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/ladder_rows.md"),
      sb.toString.getBytes("UTF-8"))
    println("[ladder] wrote target/ladder_rows.md")
    s.stop()
  }
}
