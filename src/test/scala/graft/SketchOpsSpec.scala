package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch

/** Sketch primitives — algebraic pins beyond the DuckDB hash gate:
  * the KMV accumulator must be an exact k-min-set algebra (that is
  * what makes it deterministic and mergeable), and the gate queries'
  * estimator/error properties must hold. */
class SketchOpsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("KmvSketch reduce/merge is the exact k-min-set algebra") {
    val k = 16
    val agg = new KmvSketch(k)
    val rnd = new scala.util.Random(7)
    // values with duplicates, inserted in random order
    val vals = Vector.fill(400)(rnd.nextLong(1L << 40))
    val expected = vals.distinct.sorted.take(k).toArray

    // sequential reduce (boxed input: nulls are skippable rows)
    def red(b: Array[Long], v: Long) = agg.reduce(b, v)
    val seq = vals.foldLeft(agg.zero)(red)
    assert(seq.sameElements(expected))
    assert(agg.reduce(seq, null).sameElements(seq)) // null rows skipped

    // arbitrary partition + merge (associativity/commutativity)
    val parts = vals.grouped(37).toSeq
      .map(p => p.foldLeft(agg.zero)(red))
    val mergedL = parts.foldLeft(agg.zero)(agg.merge)
    val mergedR = parts.reverse.foldLeft(agg.zero)(agg.merge)
    assert(mergedL.sameElements(expected))
    assert(mergedR.sameElements(expected))

    // partial sketch (fewer distinct than k) keeps everything
    val few = Vector(5L, 3L, 5L, 9L, 3L)
    assert(few.foldLeft(agg.zero)(red).sameElements(Array(3L, 5L, 9L)))
  }

  test("sketch1 estimates land within KMV error bounds of the true counts") {
    val out = SparkEntry.queries("sketch1_kmv_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // true distinct-shingle counts per source, straight from the
    // corpus via the SAME shingle constructor the gate uses
    val truth = {
      import org.apache.spark.sql.functions._
      import graft.queries.SketchOps
      graft.util.Tables.t(spark, sf, "documents")
        .withColumn("w", expr(SketchOps.toksExpr))
        .select(col("source"), explode(expr(SketchOps.shExpr)).as("sh"))
        .groupBy("source").agg(countDistinct(col("sh")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(truth.keySet.subsetOf(out.keySet - "__all__") &&
      (out.keySet - "__all__") == truth.keySet)
    // k=64 → relative std error ~1/sqrt(62) ≈ 12.7%; allow 4 sigma
    truth.foreach { case (src, n) =>
      val est = out(src)
      assert(math.abs(est - n) <= 0.51 * n,
        s"$src: est $est vs true $n out of bounds")
    }
    val globalTruth = truth.values.sum // sources are disjoint vocabularies?
    // the global row merges per-source sketches; only sanity-bound it
    // against the max single source and the sum (overlap shrinks it)
    assert(out("__all__") >= truth.values.max * 0.49 &&
      out("__all__") <= globalTruth * 1.51)
  }

  test("TopKAgg matches the sorted-take-k reference under any partitioning") {
    import graft.functions.TopKAgg
    val k = 7
    val agg = new TopKAgg(k)
    val rnd = new scala.util.Random(13)
    // scores with ties (forcing the id ASC tie-break), unique ids
    val xs = Vector.tabulate(300)(i => (rnd.nextInt(40).toDouble, i.toLong))
    val expected = xs.sortBy { case (sc, id) => (-sc, id) }.take(k)

    def red(b: Seq[(Double, Long)], x: (Double, Long)) =
      agg.reduce(b, (x._1: java.lang.Double, x._2: java.lang.Long))
    assert(xs.foldLeft(agg.zero)(red) == expected)
    val parts = rnd.shuffle(xs).grouped(23).toSeq
      .map(p => p.foldLeft(agg.zero)(red))
    assert(parts.foldLeft(agg.zero)(agg.merge) == expected)
    assert(parts.reverse.foldLeft(agg.zero)(agg.merge) == expected)
    // groups smaller than k keep everything, ordered
    assert(Vector((1.0, 9L), (3.0, 2L)).foldLeft(agg.zero)(red) ==
      Vector((3.0, 2L), (1.0, 9L)))
    // null score or id rows are skipped; NaN ranks GREATEST (total
    // order via Double.compare — matches Spark/DuckDB DESC semantics)
    assert(agg.reduce(agg.zero, (null, 1L: java.lang.Long)).isEmpty)
    assert(agg.reduce(agg.zero, (0.5: java.lang.Double, null)).isEmpty)
    val withNaN = red(red(red(agg.zero, (0.9, 2L)), (Double.NaN, 1L)), (0.5, 3L))
    assert(withNaN.head._1.isNaN && withNaN.tail == Seq((0.9, 2L), (0.5, 3L)))
  }

  test("sketch4 sample quantiles are ordered and drawn from real values") {
    val rows = SparkEntry.queries("sketch4_quantile_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getInt(1)
      assert(n > 0 && n <= 16, s"sample size $n out of range")
      val Seq(p50, p90, p99, e50, e90, e99) =
        (2 to 7).map(r.getLong(_))
      assert(p50 <= p90 && p90 <= p99, s"sample quantiles unordered: $r")
      assert(e50 <= e90 && e90 <= e99, s"exact quantiles unordered: $r")
      assert(p50 > 0 && e50 > 0)
    }
  }

  test("sketch5 set-algebra estimates agree with the exact overlap pins") {
    val K = 64
    val rows = SparkEntry.queries("sketch5_kmv_set_algebra")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nKept, inBoth) = (r.getInt(2), r.getInt(3))
      val (estU, estI, estJ) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val (exU, exI, exJ) = (r.getLong(7), r.getLong(8), r.getDouble(9))
      assert(inBoth <= nKept && nKept <= K)
      assert(estJ >= 0.0 && estJ <= 1.0 && exJ >= 0.0 && exJ <= 1.0)
      assert(estI == estJ * estU, "intersect estimator identity")
      if (nKept < K) {
        // a partial union sketch holds EVERY distinct hash of both
        // sides — the "estimates" must be exact
        assert(estU == exU.toDouble, s"partial sketch union drift: $r")
        assert(inBoth.toLong == exI, s"partial sketch intersect drift: $r")
      } else {
        // k=64 → relative std error ~1/sqrt(62) ≈ 12.7%; allow 4 sigma
        assert(math.abs(estU - exU) <= 0.51 * exU,
          s"union estimate out of bounds: $r")
        assert(math.abs(estJ - exJ) <= 0.5,
          s"jaccard estimate out of bounds: $r")
      }
    }
  }

  test("sketch2 count-min error is one-sided and exact for unique buckets") {
    val rows = SparkEntry.queries("sketch2_countmin_topk")(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val (est, exact, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(over == est - exact)
      assert(over >= 0, s"CM undercounted ${r.getString(0)}")
    }
    // ordered by estimate desc then token asc
    val ests = rows.map(_.getLong(1)).toSeq
    assert(ests == ests.sorted.reverse)
  }
}
