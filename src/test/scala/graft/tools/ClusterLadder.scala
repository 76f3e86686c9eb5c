package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Duplicate-cluster skew ladder: inject ONE cluster of k identical
  * payloads (k = 10 … 10⁵) into a fixed-size distinct background
  * corpus and measure, through the PRODUCTION code paths:
  *
  *  1. BOOTSTRAP — the maintained image and text indexes
  *     ([[graft.queries.MultimodalOps.phashReconcile]] /
  *     [[graft.queries.NearDupIndex.reconcile]]): persisted pairs
  *     cardinality and wall time. Skew-collapsed contract ⇒ both
  *     O(k) — k-1 star edges over the background pairs — where the
  *     pre-collapse pair set was k(k-1)/2 (5·10⁹ rows at k = 10⁵).
  *  2. INCREMENTAL CHURN through the same reconciles (the round-15
  *     task — the bootstrap ladder never exercised the churn leg):
  *     (a) DELETE the cluster's representative — a new rep is
  *         promoted and the group's star edges re-home: O(k) pairs
  *         delta, never O(k²) candidates;
  *     (b) INSERT a smaller-id member — the rep is demoted and every
  *         star edge re-homes to the new rep: the worst-case O(k)
  *         delta. Wall time and the pairs commit's written-row count
  *         are reported per rung.
  *  3. The dedup4 BLOCKED generator (round-15: the last collapsed
  *     family): k byte-identical docs land in one (source, blk)
  *     block; the collapsed gate must emit k-1 star edges, not
  *     k(k-1)/2 block-local pairs.
  *
  * Cluster/background ids are ≡ 1/2 (mod 77) in the dedup4 rung so
  * the gate corpus's %7/%11 duplicate injection never touches them.
  * Audio/video share the image path's generator; dedup5/6 share
  * dedup4's collapse frame.
  *
  * Output: target/ladder_rows.md (SCALING.md table fragments). */
object ClusterLadder {

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
    import s.implicits._
    import graft.core.{LakeTable, TableProps}
    import graft.multimodal.MediaDecoder

    val bg = 2000 // distinct background docs at every rung
    val ks = args.headOption.map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(10, 100, 1000, 10000, 100000))

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

    val clusterText = (0 until 12).map(j => s"dupword$j").mkString(" ")

    // one bootstrap + two churn legs, any family: `boot` builds the
    // index over ids [1, bg+k] (cluster = ids > bg, rep = bg+1);
    // `recon(churnIds, deletedIds)` applies one churn batch. Returns
    // the table rows.
    case class Leg(name: String, pairs: Long, written: Long, secs: Double)
    case class Rung(fam: String, k: Int, legs: Seq[Leg])

    def runLegs(fam: String, k: Int, pairs: LakeTable,
        boot: () => Unit, deleteRep: () => Unit, insertZero: () => Unit)
        : Rung = {
      def leg(name: String)(f: () => Unit): Leg = {
        val t0 = System.nanoTime()
        f()
        val dt = (System.nanoTime() - t0) / 1e9
        val commits = pairs.timeline.commits()
        Leg(name, pairs.snapshot().count(),
          if (commits.isEmpty) 0L else commits.last.totalRecords, dt)
      }
      val legs = Seq(
        leg("bootstrap")(boot),
        leg("delete-rep")(deleteRep),
        leg("insert-smaller-id")(insertZero))
      legs.foreach(l => println(
        f"[ladder] $fam%-6s k=$k%-7d ${l.name}%-17s pairs=${l.pairs}%-9d " +
          f"written=${l.written}%-9d ${l.secs}%7.2fs"))
      Rung(fam, k, legs)
    }

    def imageRung(k: Int): Rung = {
      val sigs = LakeTable.create(s, scratch(s"img${k}_sigs"),
        TableProps("ldsigs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val pairs = LakeTable.create(s, scratch(s"img${k}_pairs"),
        TableProps("ldpairs", Seq("a", "b"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val clusterImg = noiseImg(424242L)
      def payloads(ids: org.apache.spark.sql.DataFrame) = ids
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(d =>
          (d, if (d >= 1 && d <= bg) noiseImg(d) else clusterImg)))
        .toDF("doc_id", "payload")
      val none = Seq.empty[Long].toDF("doc_id")
      runLegs("image", k, pairs,
        () => graft.queries.MultimodalOps.phashReconcile(
          payloads(s.range(1, bg + k + 1).select(col("id").as("doc_id"))),
          none, sigs, pairs, 1L),
        // delete the cluster rep (bg+1): promotion, O(k) star re-home
        () => graft.queries.MultimodalOps.phashReconcile(
          payloads(s.range(0, 0).select(col("id").as("doc_id"))),
          Seq(bg + 1L).toDF("doc_id"), sigs, pairs, 2L),
        // insert doc 0 (smaller than every id): demotion, O(k) re-home
        () => graft.queries.MultimodalOps.phashReconcile(
          payloads(Seq(0L).toDF("doc_id")), none, sigs, pairs, 3L))
    }

    def textRung(k: Int): Rung = {
      val sigs = LakeTable.create(s, scratch(s"txt${k}_sigs"),
        TableProps("lt_sigs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val pairs = LakeTable.create(s, scratch(s"txt${k}_pairs"),
        TableProps("lt_pairs", Seq("a", "b"), Some("ts"), Seq.empty,
          tableType = "mor"))
      def docsOf(ids: org.apache.spark.sql.DataFrame) = ids
        .withColumn("text",
          when(col("doc_id").between(1, bg),
            concat_ws(" ", (0 until 12).map(j =>
              concat(lit("w"), col("doc_id"), lit(s"x$j"))): _*))
            .otherwise(lit(clusterText)))
      val all = docsOf(s.range(1, bg + k + 1).select(col("id").as("doc_id")))
      val none = Seq.empty[Long].toDF("doc_id")
      runLegs("text", k, pairs,
        () => graft.queries.NearDupIndex.reconcile(
          all, none, all, sigs, pairs, 1L),
        () => graft.queries.NearDupIndex.reconcile(
          docsOf(s.range(0, 0).select(col("id").as("doc_id"))),
          Seq(bg + 1L).toDF("doc_id"),
          all.filter(col("doc_id") =!= (bg + 1L)), sigs, pairs, 2L),
        () => graft.queries.NearDupIndex.reconcile(
          docsOf(Seq(0L).toDF("doc_id")), none,
          docsOf(s.range(0, bg + k + 1).select(col("id").as("doc_id"))
            .filter(col("doc_id") =!= (bg + 1L))), sigs, pairs, 3L))
    }

    // dedup4's BLOCKED batch generator over a crafted documents dir:
    // ids ≡ 1 (mod 77) for the cluster, ≡ 2 (mod 77) for background,
    // so the gate corpus's %7/%11 injection adds nothing
    def dedup4Rung(k: Int): (Int, Long, Double) = {
      val dir = scratch(s"d4_$k") // plain dir, not a lake table
      s.range(0, bg + k).select(
        when(col("id") < bg, col("id") * 77 + 2)
          .otherwise(col("id") * 77 + 1).as("doc_id"),
        when(col("id") < bg,
          concat_ws(" ", (0 until 12).map(j =>
            concat(lit("w"), col("id"), lit(s"x$j"))): _*))
          .otherwise(lit(clusterText)).as("text"),
        lit("s").as("source"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("dedup4_ngram_jaccard")(s, dir)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ladder] dedup4 k=$k%-7d pairs=$n%-9d " +
        f"(expect ${k - 1}) $dt%7.2fs")
      (k, n, dt)
    }

    val rungs = ks.flatMap(k => Seq(imageRung(k), textRung(k)))
    val d4 = ks.map(dedup4Rung)

    val sb = new StringBuilder
    sb.append("| family | cluster k | leg | pairs rows | commit rows " +
      "| secs |\n|---|---|---|---|---|---|\n")
    rungs.foreach { r =>
      r.legs.foreach { l =>
        sb.append(f"| ${r.fam} | ${r.k} | ${l.name} | ${l.pairs} " +
          f"| ${l.written} | ${l.secs}%.2f |\n")
      }
    }
    sb.append("\n| dedup4 cluster k | pairs rows | pre-collapse " +
      "k(k-1)/2 | secs |\n|---|---|---|---|\n")
    d4.foreach { case (k, n, dt) =>
      sb.append(f"| $k | $n | ${k.toLong * (k - 1) / 2} | $dt%.2f |\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/ladder_rows.md"),
      sb.toString.getBytes("UTF-8"))
    println("[ladder] wrote target/ladder_rows.md")
    s.stop()
  }
}
