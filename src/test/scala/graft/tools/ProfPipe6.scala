package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the pipe6 bootstrap (not part of the
  * driver contract; delete freely). */
object ProfPipe6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      Console.err.println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }

    import graft.core.{LakeTable, TableProps}
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val seed = base.filter(col("doc_id") % 3 =!= 0).withColumn("ts", lit(1L))

    // warmup: a small lake write + the tokenize path
    val scratch = "target/graft_scratch/prof_pipe6"
    def mk(n: String, pk: Seq[String]) = {
      LakeTable.drop(spark, s"$scratch/$n")
      LakeTable.create(spark, s"$scratch/$n",
        TableProps(n, pk, Some("ts"), Seq.empty, tableType = "mor"))
    }
    time("warmup-tokenize") {
      base.withColumn("toks", expr("split(lower(trim(text)), '\\\\s+')"))
        .select(explode(col("toks"))).count()
    }
    val wt = mk("wu", Seq("doc_id"))
    time("warmup-write")(wt.upsert(seed.limit(100)))

    val post = mk("post", Seq("doc_id", "term"))
    val stats = mk("stats", Seq("term"))
    val totals = mk("tot", Seq("id"))

    val after = seed.select("doc_id", "text")
    val emptyDocs = {
      import spark.implicits._
      Seq.empty[(Long, String)].toDF("doc_id", "text")
    }

    // replicate SearchIndex.maintain(seed) with timing per step
    val newPost = time("postingsOf-plan")(
      graft.queries.SearchIndex.postingsOf(after)).persist()
    time("newPost-materialize")(newPost.count())
    val oldPost = graft.queries.SearchIndex.postingsOf(emptyDocs).persist()
    time("oldPost-materialize")(oldPost.count())

    val dfDelta = newPost.select(col("term"), lit(1L).as("s"))
      .unionByName(oldPost.select(col("term"), lit(-1L).as("s")))
      .groupBy("term").agg(sum("s").as("ddf"))
      .filter(col("ddf") =!= 0).persist()
    time("dfDelta-materialize")(dfDelta.count())

    time("post-upsertWithDeletes")(
      post.upsertWithDeletes(newPost.withColumn("ts", lit(1L)),
        oldPost.select("doc_id", "term")))
    time("stats-upsert")(
      stats.upsert(dfDelta.select(col("term"), col("ddf").as("df"))
        .withColumn("ts", lit(1L))))
    val lenDelta = newPost.groupBy("doc_id").agg(first("len").as("len"))
      .select(lit(1L).as("s"), col("len"))
      .agg(coalesce(sum(col("s")), lit(0L)).as("dnd"),
        coalesce(sum(col("len")), lit(0L)).as("dtl"))
    time("totals-upsert")(
      totals.upsert(lenDelta.select(lit(0L).as("id"),
        col("dnd").as("n_docs"), col("dtl").as("tot_len"),
        lit(1L).as("ts"))))

    // second shape: the REAL maintain call end-to-end on fresh tables
    val post2 = mk("post2", Seq("doc_id", "term"))
    val stats2 = mk("stats2", Seq("term"))
    val totals2 = mk("tot2", Seq("id"))
    time("maintain-full")(
      graft.queries.SearchIndex.maintain(after, emptyDocs,
        post2, stats2, totals2, 1L))

    // full pipe6 flow on fresh tables, step-timed
    val updMask = col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0
    val delMask = col("doc_id") % 3 =!= 0 && col("doc_id") % 7 === 1
    val churn = base.filter(col("doc_id") % 3 === 0)
      .unionByName(base.filter(updMask)
        .withColumn("text", concat(lit("replaced content block "),
          col("doc_id").cast("string"))))
      .withColumn("ts", lit(2L))
    val delKeys = base.filter(delMask).select("doc_id")

    LakeTable.drop(spark, s"$scratch/docs3")
    val docs3 = LakeTable.create(spark, s"$scratch/docs3",
      TableProps("docs3", Seq("doc_id"), Some("ts"), Seq.empty))
    val post3 = mk("post3", Seq("doc_id", "term"))
    val stats3 = mk("stats3", Seq("term"))
    val totals3 = mk("tot3", Seq("id"))
    val c1 = time("docs-upsert-seed")(docs3.upsert(seed))
    time("docs-mixed-churn")(docs3.upsertWithDeletes(
      churn.join(delKeys, Seq("doc_id"), "left_anti"), delKeys))
    time("maintain-seed")(
      graft.queries.SearchIndex.maintain(after, emptyDocs,
        post3, stats3, totals3, 1L))
    val ch = time("cdc-read")(docs3.cdc(c1).persist())
    time("cdc-materialize")(ch.count())
    val op = col(LakeTable.ChangeOpCol)
    val bef = col(LakeTable.BeforeImageCol)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("maintain-churn-noAQE")(
      graft.queries.SearchIndex.maintain(
        ch.filter(op =!= "d").select("doc_id", "text"),
        ch.filter(op.isin("u", "d"))
          .select(bef.getField("doc_id").as("doc_id"),
            bef.getField("text").as("text")),
        post3, stats3, totals3, 2L))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // churn-maintain REPLAY, step-timed, against a fresh copy of the
    // post-seed state (post4/stats4/tot4 = seed fold only)
    val post4 = mk("post4", Seq("doc_id", "term"))
    val stats4 = mk("stats4", Seq("term"))
    val totals4 = mk("tot4", Seq("id"))
    graft.queries.SearchIndex.maintain(after, emptyDocs,
      post4, stats4, totals4, 1L)
    val chAfter = ch.filter(op =!= "d").select("doc_id", "text")
    val chBefore = ch.filter(op.isin("u", "d"))
      .select(bef.getField("doc_id").as("doc_id"),
        bef.getField("text").as("text"))
    val np2 = graft.queries.SearchIndex.postingsOf(chAfter).persist()
    time("churn-newPost-mat")(np2.count())
    val op2 = graft.queries.SearchIndex.postingsOf(chBefore).persist()
    time("churn-oldPost-mat")(op2.count())
    val dfd2 = np2.select(col("term"), lit(1L).as("s"))
      .unionByName(op2.select(col("term"), lit(-1L).as("s")))
      .groupBy("term").agg(sum("s").as("ddf"))
      .filter(col("ddf") =!= 0).persist()
    time("churn-dfDelta-mat")(dfd2.count())
    time("churn-post-upsertWithDeletes")(
      post4.upsertWithDeletes(np2.withColumn("ts", lit(2L)),
        op2.select("doc_id", "term")))
    time("churn-stats-fold")(  {
      val statsSnap = stats4.snapshot()
      val folded = dfd2.join(statsSnap.select(col("term"), col("df")),
        Seq("term"), "left")
        .select(col("term"),
          (coalesce(col("df"), lit(0L)) + col("ddf")).as("df"))
      stats4.upsert(folded.withColumn("ts", lit(2L)))
    })
    time("churn-totals-fold") {
      val cur = totals4.snapshot().select("n_docs", "tot_len").collect()
      val (n0, l0) = cur.headOption
        .map(r => (r.getLong(0), r.getLong(1))).getOrElse((0L, 0L))
      val ld2 = np2.groupBy("doc_id").agg(first("len").as("len"))
        .select(lit(1L).as("s"), col("len"))
        .unionByName(op2.groupBy("doc_id").agg(first("len").as("len"))
          .select(lit(-1L).as("s"), (-col("len")).as("len")))
        .agg(coalesce(sum(col("s")), lit(0L)).as("dnd"),
          coalesce(sum(col("len")), lit(0L)).as("dtl"))
      totals4.upsert(ld2.select(lit(0L).as("id"),
        (lit(n0) + col("dnd")).as("n_docs"),
        (lit(l0) + col("dtl")).as("tot_len"), lit(2L).as("ts")))
    }
    // scoreTop10 decomposition on the churned state
    val postSnap = time("score-post-snapshot-plan")(post4.snapshot())
    time("score-post-snapshot-count")(postSnap.count())
    val scored4 = graft.queries.SearchIndex.scoreTop10(post4, stats4, totals4)
    time("score-full")(scored4.count())
    val plan = scored4.queryExecution.executedPlan.toString
    Console.err.println("[prof] score plan: reusedExchange=" +
      "ReusedExchange".r.findAllIn(plan).size +
      " exchanges=" + "Exchange".r.findAllIn(plan).size +
      " smj=" + "SortMergeJoin".r.findAllIn(plan).size +
      " bhj=" + "BroadcastHashJoin".r.findAllIn(plan).size +
      " scans=" + "Scan parquet".r.findAllIn(plan).size +
      " windows=" + "Window".r.findAllIn(plan).size)
    val scored = time("scoreTop10-plan")(
      graft.queries.SearchIndex.scoreTop10(post3, stats3, totals3))
    time("scoreTop10-count")(scored.count())
    spark.stop()
  }
}
