package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{LakeTable, TableProps}
import graft.util.Tables._

/** Ad-hoc phase profiler for the lake gate queries (not part of the
  * driver contract; test scope only). Run with
  * `sbt "Test/runMain graft.tools.ProfileLake"`. */
object ProfileLake {
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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"    $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val base = t(spark, sfDir, "customer").withColumn("ts", lit(1L))
    time("warm: base count")(base.count())

    val props = TableProps("p", Seq("c_custkey"), Some("ts"), Seq("c_mktsegment"))

    // raw-Spark equivalents of the write-path pieces, to separate Spark
    // job cost from driver bookkeeping
    println("== raw spark equivalents ==")
    import org.apache.spark.sql.expressions.Window
    val keyed = base
      .withColumn("_record_key", col("c_custkey").cast("string"))
      .withColumn("_pp", concat(lit("c_mktsegment="), col("c_mktsegment")))
    val w = Window.partitionBy(col("_record_key"), col("_pp"))
      .orderBy(col("ts").desc)
    val deduped = keyed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    time("dedup window + count")(deduped.count())
    time("write repartitioned parquet")(
      deduped.repartition(col("_pp")).write.mode("overwrite")
        .partitionBy("_pp").parquet("target/graft_scratch/profile_raw"))
    time("write again (warm)")(
      deduped.repartition(col("_pp")).write.mode("overwrite")
        .partitionBy("_pp").parquet("target/graft_scratch/profile_raw"))

    println("== lake3_incremental phases ==")
    val p3 = "target/graft_scratch/profile_lake3"
    LakeTable.drop(spark, p3)
    val t3 = time("create")(LakeTable.create(spark, p3, props))
    val c1 = time("upsert 1 (empty table)")(
      t3.upsert(base.filter(col("c_custkey") % 3 === 0)))
    time("upsert 2")(t3.upsert(base.filter(col("c_custkey") % 3 === 1)))
    time("upsert 3")(t3.upsert(base.filter(col("c_custkey") % 3 === 2)))
    time("incremental read + count")(t3.incremental(c1).count())

    println("== lake16_cdc-ish phases ==")
    val p16 = "target/graft_scratch/profile_lake16"
    LakeTable.drop(spark, p16)
    val t16 = time("create")(LakeTable.create(spark, p16, props))
    val c0 = time("upsert full")(t16.upsert(base))
    time("upsert %5 update")(t16.upsert(base.filter(col("c_custkey") % 5 === 0)
      .withColumn("ts", lit(2L))
      .withColumn("c_acctbal", col("c_acctbal") * 2)))
    time("delete %8")(t16.delete(base.filter(col("c_custkey") % 8 === 0)
      .select("c_custkey", "c_mktsegment")))
    time("insert %17")(t16.insert(base.filter(col("c_custkey") % 17 === 0)
      .withColumn("c_custkey", col("c_custkey") + 1000000L)))
    time("cdc read + count")(t16.cdc(c0).count())
    time("cdc read again (warm)")(t16.cdc(c0).count())

    println("== lake4_merge phases ==")
    val p4 = "target/graft_scratch/profile_lake4"
    LakeTable.drop(spark, p4)
    val t4 = time("create")(LakeTable.create(spark, p4, props))
    time("upsert full")(t4.upsert(base))
    val matchedPart = base.filter(col("c_custkey") % 2 === 0)
      .withColumn("ts", lit(2L))
      .withColumn("opt_type",
        when(col("c_custkey") % 10 === 0, lit("DELETE")).otherwise(lit("UPDATE")))
    val insertPart = base.filter(col("c_custkey") % 2 === 1)
      .withColumn("ts", lit(2L))
      .withColumn("c_custkey", col("c_custkey") + 1000000)
      .withColumn("opt_type", lit("INSERT"))
    time("merge")(t4.merge(matchedPart.unionByName(insertPart),
      matchedUpdate = Some(col("opt_type") === "UPDATE"),
      matchedDelete = Some(col("opt_type") === "DELETE"),
      notMatchedInsert = Some(col("opt_type") === "INSERT")))
    time("snapshot count")(t4.snapshot().count())

    spark.stop()
  }
}
