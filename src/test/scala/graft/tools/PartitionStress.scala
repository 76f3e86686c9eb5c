package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{LakeTable, TableProps}

/** Partition-count scale stress (round 11): the third metadata axis —
  * a production table partitioned by day across years carries
  * THOUSANDS of partitions, and the driver-side planning paths must
  * stay bounded there: per-partition file fan-out at write time, the
  * O(live files) driver-side partition prune, and the pruned scan
  * actually touching only the asked-for partition's files.
  *
  * Usage: Test/runMain graft.tools.PartitionStress [nPartitions]
  * [rowsPerPart]. Writes one seed commit spanning every partition,
  * one churn commit over a 1% partition slice, then measures and
  * ASSERTS: full-snapshot count, single-partition prune time + its
  * planned-file count (must be the partition's files only), and that
  * the churn commit rewrote files ONLY in touched partitions.
  */
object PartitionStress {

  private def timeMs[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val nPart = args.headOption.map(_.toInt).getOrElse(2000)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"target/graft_scratch/partstress_$nPart"
    LakeTable.drop(spark, path)
    val t = LakeTable.create(spark, path, TableProps(
      "partstress", Seq("id"), Some("ts"), Seq("dt")))
    val n = nPart * rowsPer
    def batch(ts: Long) = spark.range(n).select(
      col("id").cast("int").as("id"),
      concat(lit("d"), (col("id") % nPart).cast("string")).as("dt"),
      lit(ts).as("ts"),
      md5(col("id").cast("string")).as("v"))

    val (_, seedMs) = timeMs(t.upsert(batch(1L)))
    val c1 = t.timeline.commits().last
    println(f"seed commit: $nPart%d partitions, ${c1.added.size}%d files, " +
      f"${seedMs / 1000}%.1f s")
    require(c1.added.size >= nPart,
      s"expected >= $nPart files (1+/partition), got ${c1.added.size}")

    // churn: touch 1% of partitions (same keys → rewrites)
    val touched = (0 until nPart by 100).map(i => s"dt=d$i").toSet
    val (_, churnMs) = timeMs(t.upsert(
      batch(2L).filter(col("id") % nPart % 100 === 0)))
    val c2 = t.timeline.commits().last
    val churnParts = c2.added.map(f => c2.partitions.getOrElse(f, "")).toSet
    println(f"churn commit: ${c2.added.size}%d files over " +
      f"${churnParts.size}%d partitions, ${churnMs / 1000}%.1f s")
    require(churnParts.subsetOf(touched),
      s"churn escaped its partitions: ${churnParts -- touched}")
    require(c2.removed.nonEmpty, "churn rewrote nothing (probe broken?)")

    val (cnt, fullMs) = timeMs(t.snapshot().count())
    require(cnt == n, s"snapshot $cnt != $n")
    // driver-side partition prune: planning must resolve from the
    // timeline alone, and the scan must reference only that
    // partition's file(s)
    val (pruned, planMs) = timeMs(t.snapshotWhere(_ == "dt=d7"))
    val (pcnt, scanMs) = timeMs(pruned.count())
    require(pcnt == rowsPer, s"partition d7: $pcnt rows != $rowsPer")
    val planned = pruned.inputFiles.length
    require(planned <= 2, s"prune planned $planned files for one partition")
    println(f"full snapshot: $cnt%d rows ${fullMs / 1000}%.1f s; " +
      f"1-partition prune: plan $planMs%.0f ms, scan $scanMs%.0f ms, " +
      f"$planned%d file(s)")
    println("OK: fan-out bounded, churn partition-scoped, prune exact")
    spark.stop()
  }
}
