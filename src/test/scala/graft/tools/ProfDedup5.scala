package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage attribution for dedup5_prefix_jaccard (test scope): replicates
  * the gate's chain with a noop sink after each stage so the marginal
  * cost of every phase is visible (the cached shingle relation is
  * materialized first, like the gate's first consumer does).
  * `sbt "Test/runMain graft.tools.ProfDedup5"` */
object ProfDedup5 {
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
      println(f"[d5p] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    s.read.parquet(s"$dir/documents.parquet").count()

    val ngramBlock = 64
    val Threshold = 3
    for (round <- 1 to 2) {
      println(s"[d5p] === round $round ===")
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"))
      val c0 = d.unionByName(d.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" extra token appended"))))
        .unionByName(d.filter(col("doc_id") % 11 === 0)
          .withColumn("doc_id", col("doc_id") + 2000000L))
      val c = c0.withColumn("blk", floor(length(col("text")) / ngramBlock))
      val shArr = "case when size(w) >= 2 then transform(sequence(1, size(w) - 1), " +
        "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1))) else array() end"
      val sh = c.withColumn("w", expr("split(lower(trim(text)), '\\\\s+')"))
        .withColumn("sh", explode(expr(s"array_distinct($shArr)")))
        .select(col("doc_id"), col("sh"))
        .join(c.select(col("doc_id"), col("source"), col("blk")), Seq("doc_id"))
        .withColumn("h", xxhash64(col("sh")))
        .persist()
      time("1 sh materialize (count)")(println("  sh=" + sh.count()))
      val docs = sh.groupBy("doc_id", "source", "blk")
        .agg(count(lit(1)).as("sz"),
          md5(array_join(array_sort(collect_list(md5(col("sh")))), ",")).as("fp"))
        .withColumn("rep", min("doc_id").over(
          Window.partitionBy("source", "blk", "fp")))
        .persist()
      time("2 doc frame (fp+rep)")(docs.count())
      val star = docs.filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("a"), col("doc_id").as("b"), lit(1.0).as("jaccard"))
      val repIds = docs.filter(col("doc_id") === col("rep")).select("doc_id")
      val lean = sh.select("doc_id", "h", "source", "blk")
        .join(repIds, Seq("doc_id"), "leftsemi")
      val dfreq = lean.groupBy("h").agg(count(lit(1)).as("df"))
      time("3 dfreq")(noop(dfreq))
      val wDoc = Window.partitionBy(col("doc_id"))
      val ranked = lean.join(dfreq, Seq("h"))
        .withColumn("sz", count(lit(1)).over(wDoc))
        .withColumn("rn", row_number().over(wDoc.orderBy(col("df"), col("h"))))
        .filter(col("rn") <= col("sz") - expr(s"(sz * $Threshold + 9) div 10") + 1)
      time("4 ranked")(noop(ranked))
      val probes = ranked.withColumn("probe", explode(array(col("blk"), col("blk") + 1)))
      val cand = probes.as("sa").join(ranked.as("sb"),
          col("sa.h") === col("sb.h") && col("sa.source") === col("sb.source") &&
            col("sa.probe") === col("sb.blk") &&
            (col("sa.blk") < col("sb.blk") ||
              (col("sa.blk") === col("sb.blk") && col("sa.doc_id") < col("sb.doc_id"))))
        .select(least(col("sa.doc_id"), col("sb.doc_id")).as("a"),
          greatest(col("sa.doc_id"), col("sb.doc_id")).as("b"))
        .distinct()
      time("5 cand")(noop(cand))
      val docSets = sh.join(repIds, Seq("doc_id"), "leftsemi")
        .groupBy("doc_id").agg(
          collect_list(col("sh")).as("shs"), count(lit(1)).as("sz"))
      time("6 docSets")(noop(docSets))
      val candP = cand.persist()
      time("5b cand persist")(println("  cand=" + candP.count()))
      val docSetsP = docSets.persist()
      time("6b docSets persist")(docSetsP.count())
      val cross0 = candP
        .join(docSetsP.as("za"), col("a") === col("za.doc_id"))
        .join(docSetsP.as("zb"), col("b") === col("zb.doc_id"))
      val cross = cross0
        .withColumn("inter",
          size(array_intersect(col("za.shs"), col("zb.shs"))).cast("long"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.3)
        .select("a", "b", "jaccard")
      time("7a attach-only (no intersect)")(noop(cross0.select("a", "b")))
      time("7b verify from caches")(noop(cross))
      val out = star.unionByName(cross).orderBy("a", "b")
      time("7c full from caches")(noop(out))
      val outFresh = star.unionByName(
        cand.join(docSets.as("za"), col("a") === col("za.doc_id"))
          .join(docSets.as("zb"), col("b") === col("zb.doc_id"))
          .withColumn("inter",
            size(array_intersect(col("za.shs"), col("zb.shs"))).cast("long"))
          .withColumn("jaccard", col("inter").cast("double") /
            (col("za.sz") + col("zb.sz") - col("inter")).cast("double"))
          .filter(col("jaccard") >= 0.3)
          .select("a", "b", "jaccard")).orderBy("a", "b")
      time("7d full no-extra-cache")(noop(outFresh))
      s.catalog.clearCache()
    }
    s.stop()
  }
}
