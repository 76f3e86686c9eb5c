package graft.tools

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-measurement of the LOCAL-FS metadata floor under the tiny
  * commits every maintained-index micro-batch pays (test scope; not
  * part of the driver contract): is the per-op cost Hadoop FS
  * bookkeeping (checksums), process spawning (chmod shell-outs — no
  * native hadoop lib ships here), or Spark job scheduling?
  * `sbt "Test/runMain graft.tools.FsFloor"` */
object FsFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String, n: Int)(f: Int => A): Unit = {
      f(-1) // warm
      val t0 = System.nanoTime()
      (0 until n).foreach(f)
      val dt = (System.nanoTime() - t0) / 1e6
      println(f"    $label%-44s total ${dt}%8.1f ms   per-op ${dt / n}%8.2f ms")
    }

    val conf = spark.sessionState.newHadoopConf()
    val base = new Path("target/graft_scratch/fsfloor")
    val fs = base.getFileSystem(conf)
    fs.mkdirs(base)
    println("  fs class: " + fs.getClass.getName)

    time("exec /bin/true", 50) { i =>
      new ProcessBuilder("/bin/true").start().waitFor()
    }
    time("fs.create+close (LocalFileSystem)", 50) { i =>
      val out = fs.create(new Path(base, s"f$i"), true)
      out.write(42); out.close()
    }
    time("fs.mkdirs fresh dir", 50) { i =>
      fs.mkdirs(new Path(base, s"d$i"))
    }
    time("fs.rename", 50) { i =>
      if (i >= 0) fs.rename(new Path(base, s"f$i"), new Path(base, s"r$i"))
    }
    time("fs.exists", 50) { i => fs.exists(new Path(base, s"r$i")) }
    time("fs.listStatus", 50) { i => fs.listStatus(base) }
    time("java.io create+close", 50) { i =>
      val f = new java.io.FileOutputStream(s"target/graft_scratch/fsfloor/j$i")
      f.write(42); f.close()
    }

    // tiny spark jobs: scheduling floor vs write floor
    val one = spark.range(2000).select(col("id"),
      md5(col("id").cast("string")).as("v")).persist()
    one.count()
    time("count() on cached 2k frame (job floor)", 10) { _ => one.count() }
    time("noop write cached 2k frame coalesce(1)", 5) { _ =>
      one.coalesce(1).write.format("noop").mode("overwrite").save()
    }
    time("parquet write cached 2k frame coalesce(1)", 5) { i =>
      one.coalesce(1).write.mode("overwrite")
        .parquet(s"target/graft_scratch/fsfloor_pq")
    }
    spark.stop()
  }
}
