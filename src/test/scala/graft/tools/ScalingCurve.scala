package graft.tools

import org.apache.spark.sql.SparkSession

/** Third scaling point (round-14 task): every SCALING.md ratio is one
  * 10× step (sf0.1 → sf1). For the two highest-ratio maintained
  * gates (pipe9 3.7×, mm12 3.3× at 10×) this runs the SAME scenario
  * at sf0.1, sf1 (10×), and sf10 (100× — [[ScalingAudit.generateN]]
  * with 100 disjoint-key copies) to show the ratio CURVE: a
  * churn-dominated maintained fold should flatten toward linear-in-
  * churn as the fixed lake-commit floor amortizes, while a hidden
  * corpus-tracking stage would COMPOUND (10× step ratio growing with
  * scale). Output: target/curve_rows.md. */
object ScalingCurve {

  def main(args: Array[String]): Unit = {
    val sf01 = "/root/testdata/sf0.1"
    val out100 = "target/sfscale100"
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    println("[curve] generating 10x + 100x data (skipped if present)")
    ScalingAudit.generate(s, sf01)
    ScalingAudit.generateN(s, sf01, out100, 100)

    val gates = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("mm12_video_incremental", "pipe9_maintained_canonical"))
    val dirs = Seq("sf0.1" -> sf01, "sf1" -> "target/sfscale10",
      "sf10" -> out100)
    def timeOne(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      s.catalog.clearCache()
      dt
    }
    val sb = new StringBuilder
    sb.append("| query | sf0.1 (s) | sf1 (s) | sf10 (s) " +
      "| 10× step | 100×→ step |\n|---|---|---|---|---|---|\n")
    gates.foreach { g =>
      // one warm pass at the smallest scale to absorb JIT, then one
      // timed pass per scale, small → large (the large runs dominate
      // total cost; a second pass per scale would double a long run
      // for little signal)
      timeOne(g, sf01)
      val ts = dirs.map { case (lbl, d) =>
        val t = timeOne(g, d)
        println(f"[curve] $g%-28s $lbl%-6s $t%7.2fs")
        t
      }
      sb.append(f"| $g | ${ts(0)}%.2f | ${ts(1)}%.2f | ${ts(2)}%.2f " +
        f"| ${ts(1) / ts(0)}%.1f× | ${ts(2) / ts(1)}%.1f× |\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/curve_rows.md"),
      sb.toString.getBytes("UTF-8"))
    println("[curve] wrote target/curve_rows.md")
    s.stop()
  }
}
