package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{LakeTable, TableProps}

/** Micro-profiler for the small-commit floor (test scope; not part of
  * the driver contract): separates the Spark parquet-write job cost
  * from the engine's commit bookkeeping, and measures the marginal
  * cost of the write options (bloom filter) and of the committer, on
  * a cached tiny frame — the exact shape every maintained-index
  * micro-batch commits. `sbt "Test/runMain graft.tools.CommitFloor"` */
object CommitFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String, n: Int = 1)(f: => A): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"    $label%-44s min ${ts.min}%6.3fs  med ${ts.sorted.apply(n / 2)}%6.3fs")
    }

    // a maintained-fold-sized batch: 2k rows, string key + payload
    val batch = spark.range(2000).select(
      col("id").as("doc_id"),
      md5(col("id").cast("string")).as("fp"),
      array(md5(concat(lit("b"), col("id").cast("string")))).as("bands"),
      col("id").as("rep"), lit(1L).as("ts")).persist()
    batch.count()

    // raw parquet write of the cached frame, 1 file
    time("raw write coalesce(1)", 5)(
      batch.coalesce(1).write.mode("overwrite")
        .parquet("target/graft_scratch/cf_raw"))
    time("raw write + bloom opts", 5)(
      batch.coalesce(1).write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#_record_key", "true")
        .option("parquet.bloom.filter.adaptive.enabled", "true")
        .option("parquet.bloom.filter.max.bytes", 128 * 1024)
        .parquet("target/graft_scratch/cf_raw_bloom"))
    time("raw write 32 parts (no coalesce)", 5)(
      batch.write.mode("overwrite")
        .parquet("target/graft_scratch/cf_raw32"))

    // engine MOR upserts (deltacommit path): the maintained-store shape
    val p = "target/graft_scratch/cf_mor"
    LakeTable.drop(spark, p)
    val tb = LakeTable.create(spark, p,
      TableProps("cf_mor", Seq("doc_id"), Some("ts"), Seq.empty,
        tableType = "mor"))
    time("mor upsert (bootstrap)")(tb.upsert(batch))
    time("mor upsert again", 5)(tb.upsert(batch))
    time("mor upsert combine=false", 5)(tb.upsert(batch, combine = false))
    time("mor upsertWithDeletes", 5)(
      tb.upsertWithDeletes(batch, batch.select("doc_id").limit(50)))
    time("mor upsertWithDeletes combine=false", 5)(
      tb.upsertWithDeletes(batch, batch.select("doc_id").limit(50),
        combine = false))

    // engine COW upsert
    val pc = "target/graft_scratch/cf_cow"
    LakeTable.drop(spark, pc)
    val tc = LakeTable.create(spark, pc,
      TableProps("cf_cow", Seq("doc_id"), Some("ts"), Seq.empty))
    time("cow upsert (bootstrap)")(tc.upsert(batch))
    time("cow upsert again", 5)(tc.upsert(batch))

    spark.stop()
  }
}
