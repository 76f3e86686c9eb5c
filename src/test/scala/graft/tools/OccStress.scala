package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{LakeTable, TableProps}

/** Writer-count axis for OCC (round 12): lake19 and the spec tests
  * race 2–8 writers for CORRECTNESS; this measures the COST curve —
  * retry amplification (attempts / commits) and wall time as
  * concurrent writers scale on one table, every writer a separate
  * handle (cross-process shape) hammering the same partition's file
  * groups with disjoint keys. The filesystem-lock OCC design retries
  * the whole write on a lost race, so amplification growing ~linearly
  * in writer count means total work grows ~quadratically: the
  * documented ceiling past which writers should be batched upstream
  * or funneled through a table-service-style single committer.
  *
  * Usage: Test/runMain graft.tools.OccStress [maxWriters] [rowsPer]
  */
object OccStress {

  def main(args: Array[String]): Unit = {
    val maxW = args.headOption.map(_.toInt).getOrElse(8)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(25)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global

    def run(w: Int, disjointParts: Boolean): (Int, Double) = {
      val path = s"target/graft_scratch/occstress_$w"
      LakeTable.drop(spark, path)
      val n = w * rowsPer
      // hot-spot mode: every writer in ONE partition (shared file
      // groups — conflicts guaranteed). Backfill mode: one partition
      // PER writer (the fleet shape) — file groups disjoint, so the
      // OCC check should find nothing to conflict on.
      def dt(k: Int) = if (disjointParts) s"d$k" else "d1"
      LakeTable.create(spark, path,
          TableProps("occstress", Seq("id"), Some("ts"), Seq("dt")))
        .upsert((0 until w).flatMap(k => (1 to rowsPer)
            .map(i => (k * rowsPer + i, "v0", 1L, dt(k))))
          .toDF("id", "v", "ts", "dt"))
      val attempts = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val verbose = sys.env.contains("OCC_STRESS_VERBOSE")
      val writers = (0 until w).map { k =>
        Future {
          val own = LakeTable.load(spark, path)
          var done = false
          var tries = 0
          while (!done) {
            try {
              tries += 1
              attempts.incrementAndGet()
              own.upsert((1 to rowsPer)
                .map(i => (k * rowsPer + i, s"w$k", 2L, dt(k)))
                .toDF("id", "v", "ts", "dt"))
              done = true
            } catch {
              case e: graft.core.CommitConflictException =>
                if (verbose) println(s"[occ] retry w=$k: ${e.getMessage}")
                // generous cap: fail FAST with the real conflict
                // message on a non-resolving-conflict regression
                // instead of spinning into the Await timeout
                if (tries > 200) throw new IllegalStateException(
                  s"w=$k: conflict not resolving after $tries tries", e)
            }
          }
        }
      }
      Await.result(Future.sequence(writers), 600.seconds)
      val secs = (System.nanoTime() - t0) / 1e9
      val snap = LakeTable.load(spark, path).snapshot()
      require(snap.count() == n, s"w=$w: lost rows")
      val bad = snap.filter(col("ts") =!= 2).count()
      require(bad == 0, s"w=$w: $bad rows missed their update (lost race)")
      LakeTable.drop(spark, path)
      (attempts.get, secs)
    }

    run(2, disjointParts = false) // warm the write paths first
    Seq(false, true).foreach { disjoint =>
      println(if (disjoint)
        "DISJOINT partitions (backfill-fleet shape):"
      else "SHARED partition hot spot:")
      println("writers  commits  attempts  amplification  wall_s")
      Seq(2, 4, 6, 8).filter(_ <= maxW).foreach { w =>
        val (att, secs) = run(w, disjoint)
        println(f"$w%7d  $w%7d  $att%8d  ${att.toDouble / w}%13.2f  $secs%6.1f")
      }
    }
    spark.stop()
  }
}
