package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer (test scope; not part of the driver
  * contract): times the named gate queries in isolation, two passes,
  * min reported. `sbt "Test/runMain graft.tools.ProfileQueries <names...>"` */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else all.keys.toSeq.sorted
    // warmup: touch the involved tables once
    Seq("documents", "embeddings", "customer").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val times = names.map { n =>
      val fn = all(n)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      n -> ts.min
    }
    times.foreach { case (n, t) => println(f"[pq] $n%-34s $t%7.2fs") }
    spark.stop()
  }
}
