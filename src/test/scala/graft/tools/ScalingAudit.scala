package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scaling audit (round-8 task): generate a 10× derivative of the
  * sf0.1 testdata (the driver ships no sf1), run the scan-bound gate
  * families at both scales, and emit the SCALING.md table flagging
  * anything super-linear.
  *
  * The 10× data is TPC-H-faithful: fact/entity tables (customer,
  * orders, lineitem, part, supplier, events, documents, embeddings)
  * are replicated 10 times with DISJOINT shifted keys — foreign keys
  * shift together, so join selectivities are preserved — while the
  * fixed dimensions (nation, region) keep their size, exactly as
  * TPC-H scaling does. Event timestamps keep their span (more users
  * over the same period), so session/window state scales with users,
  * not time.
  *
  * Copies must be DISTINCT content, or the dedup/similarity families
  * degenerate: replicating identical texts/vectors would make every
  * doc a 10-member duplicate family and grow the TRUE pair count
  * quadratically — not what a real 10× corpus looks like. Each copy
  * therefore gets a copy-specific alphabet rotation of its text
  * (intra-copy shingle similarity is EXACTLY preserved — both members
  * of a pair rotate identically — while cross-copy shingles are
  * disjoint) and a copy-specific cyclic rotation of its embedding
  * dimensions (intra-copy cosines exactly preserved, cross-copy
  * vectors decorrelated).
  *
  * Timing protocol: per query, two passes per scale, min taken (the
  * Bench convention), sf0.1 and sf1 interleaved per query so a
  * machine-load window inflates both sides, not one. */
object ScalingAudit {

  private val OutDir = "target/sfscale10"

  def generate(s: SparkSession, src: String): Unit =
    generateN(s, src, OutDir, 10)

  /** The same TPC-H-faithful disjoint-key replication at an arbitrary
    * factor — `copies` = 100 gives the sf10 third scaling point
    * ([[ScalingCurve]]). */
  def generateN(
      s: SparkSession, src: String, outDir: String, copies: Int): Unit = {
    val done = new java.io.File(s"$outDir/_DONE")
    if (done.exists()) return
    // key spacing comfortably above every sf0.1 max key
    val C = 10000000L   // custkey
    val O = 100000000L  // orderkey
    val P = 10000000L   // partkey
    val SU = 1000000L   // suppkey
    val D = 10000000L   // doc_id
    val V = 10000000L   // vec_id
    val E = 1000000000L // event_id
    val U = 10000000L   // user_id
    def rep(t: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = s.read.parquet(s"$src/$t.parquet")
      (0 until copies).map(i => shift(base, i)).reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    rep("customer")((df, i) => df
      .withColumn("c_custkey", col("c_custkey") + lit(i * C)))
    rep("orders")((df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * O))
      .withColumn("o_custkey", col("o_custkey") + lit(i * C)))
    rep("lineitem")((df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * O))
      .withColumn("l_partkey", col("l_partkey") + lit(i * P))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * SU)))
    rep("part")((df, i) => df
      .withColumn("p_partkey", col("p_partkey") + lit(i * P)))
    rep("supplier")((df, i) => df
      .withColumn("s_suppkey", col("s_suppkey") + lit(i * SU)))
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def rot(a: String, n: Int): String = a.drop(n) + a.take(n)
    rep("documents") { (df, i) =>
      val sh = (i * 7) % 26
      df.withColumn("doc_id", col("doc_id") + lit(i * D))
        .withColumn("text",
          if (i == 0) col("text")
          else translate(col("text"),
            lower + lower.toUpperCase,
            rot(lower, sh) + rot(lower.toUpperCase, sh)))
    }
    rep("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * V))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else {
            // rotation mod the vector size: copies beyond dim/5 wrap
            // instead of producing empty slices (intra-copy cosines
            // still exactly preserved; identical to the old arithmetic
            // for i*5 < dim)
            val r = s"(${i * 5} % size(embedding))"
            expr(s"concat(slice(embedding, $r + 1, " +
              s"size(embedding) - $r), slice(embedding, 1, $r))")
          })
    }
    rep("events")((df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * E))
      .withColumn("user_id", col("user_id") + lit(i * U)))
    // fixed dims: single copy, like TPC-H
    Seq("nation", "region").foreach { t =>
      s.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    done.createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sf01 = "/root/testdata/sf0.1"
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    println("[scale] generating 10x data (skipped if present)")
    generate(s, sf01)

    // round-10 extension: the incremental-service (pipe*, decon*) and
    // churn-heavy lake gates (lake16 CDC, lake18 predicate DML, lake21
    // CDC+archive) are in scope too — their scenarios scale churn WITH
    // corpus (modulo-mask batches), so a fold whose cost tracked the
    // CORPUS instead of the churn would show super-linear here
    // round-11 extension: the streaming-service gates (st1-st6) run
    // their full scenarios against the given dir too — churn scales
    // with corpus via the same modulo masks, so a service fold whose
    // cost tracked the corpus would show super-linear here, while the
    // per-scenario fixed floor (checkpoint + commit count) should
    // keep the ratio under-linear
    val fams = Seq("q", "dedup", "sim", "text", "sketch", "graph",
      "pack", "pipe", "samp", "decon", "lake16", "lake18", "lake21",
      "mm")
    // optional arg: comma-separated name substrings to re-audit a
    // subset (appending rows for newly added gates)
    val only = args.headOption.map(_.split(",").toSeq)
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (n, _) =>
        // streaming family matched by regex, not a "st" prefix — a
        // prefix would also catch stats1_data_card (Bench uses the
        // same ^st[0-9] pattern for this family)
        (fams.exists(n.startsWith) || n.matches("^st[0-9].*")) &&
          only.forall(_.exists(n.contains))
    }
    def timeOne(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      fn(s, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      s.catalog.clearCache()
      dt
    }
    // warm both inputs + JIT once
    s.read.parquet(s"$sf01/lineitem.parquet").count()
    s.read.parquet(s"$OutDir/lineitem.parquet").count()

    val rows = selected.map { case (name, fn) =>
      val a1 = timeOne(fn, sf01); val b1 = timeOne(fn, OutDir)
      val a2 = timeOne(fn, sf01); val b2 = timeOne(fn, OutDir)
      val a = math.min(a1, a2); val b = math.min(b1, b2)
      println(f"[scale] $name%-32s sf0.1 $a%6.2fs  sf1 $b%6.2fs  x${b / a}%5.1f")
      (name, a, b, b / a)
    }
    val sb = new StringBuilder
    sb.append("| query | sf0.1 (s) | sf1 (s) | ratio |\n")
    sb.append("|---|---|---|---|\n")
    rows.foreach { case (n, a, b, r) =>
      sb.append(f"| $n | $a%.2f | $b%.2f | $r%.1f× |\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/scaling_rows.md"),
      sb.toString.getBytes("UTF-8"))
    println("[scale] wrote target/scaling_rows.md")
    s.stop()
  }
}
