package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A short warmup first
  * (table reads + one tiny aggregate per input table) so measurements
  * reflect steady-state plans, not first-query JIT/codegen compile. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch each table + exercise codegen/shuffle machinery and
    // the lake write path once (parquet committer + writer JIT)
    try {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      Seq("lineitem", "orders", "customer", "documents", "embeddings")
        .foreach { t =>
          val df = spark.read.parquet(s"$sfDir/$t.parquet")
          df.limit(1000).groupBy(spark_partition_id()).count().count()
        }
      val wp = "target/graft_scratch/bench_warmup"
      graft.core.LakeTable.drop(spark, wp)
      val wt = graft.core.LakeTable.create(spark, wp, graft.core.TableProps(
        "warmup", Seq("id"), Some("ts"), Seq("dt")))
      wt.upsert(Seq((1, 1L, "d1"), (2, 1L, "d2")).toDF("id", "ts", "dt"))
      wt.upsert(Seq((1, 2L, "d1")).toDF("id", "ts", "dt"))
      wt.snapshot().count()
      graft.core.LakeTable.drop(spark, wp)
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
