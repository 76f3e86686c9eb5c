package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation operators (decontamination, PII redaction, repetition
  * quality, domain mixing) — semantic pins beyond the DuckDB hash
  * gate. */
class CurationOpsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("decon1 flags all injected contamination (plus any natural overlap)") {
    val rows = SparkEntry.queries("decon1_benchmark_overlap")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "no contaminated docs flagged")
    val flagged = rows.map(r => r.getLong(0)).toSet
    // every injection target must be caught: the appended 20-word
    // benchmark fragment contributes up to 8 shared 13-grams
    val nDocs = graft.util.Tables.t(spark, sf, "documents").count()
    val targets = (0L until nDocs).filter(id => id % 23 == 0 && id % 37 != 0)
    targets.foreach { id =>
      assert(flagged.contains(id), s"injected doc $id not flagged")
    }
    // the corpus generator reuses phrase blocks, so NATURAL shared
    // 13-grams exist too (e.g. doc 82 vs benchmark doc 0 at sf0.001) —
    // those flags are correct detections, not errors; we only pin that
    // injected docs carry the is_injected marker and plausible counts
    rows.foreach { r =>
      val (id, nShared, injected) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert((injected == 1) == (id % 23 == 0), s"doc $id marker wrong")
      assert(nShared >= 1, s"doc $id flagged with zero overlap")
    }
  }

  test("pii1 counts follow the injection rule and redaction changes the text") {
    val out = SparkEntry.queries("pii1_redaction")(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      val (e, ip, ph, has) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert((e >= 1) == (id % 7 == 0), s"doc $id email count $e")
      assert((ip >= 1) == (id % 11 == 0), s"doc $id ip count $ip")
      assert((ph >= 1) == (id % 13 == 0), s"doc $id phone count $ph")
      assert((has == 1) == (e + ip + ph > 0))
    }
    // redacted fingerprint differs from the raw-text fingerprint
    // exactly when something was redacted
    val raw = graft.util.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val changed = r.getString(5) != raw(id)
      assert(changed == (r.getInt(4) == 1), s"doc $id redaction mismatch")
    }
  }

  test("qual2 ratios are well-formed") {
    val out = SparkEntry.queries("qual2_repetition")(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val (nTok, nUniq, topN) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (topR, dupR, topBgR) = (r.getDouble(4), r.getDouble(5), r.getDouble(7))
      assert(nUniq <= nTok)
      assert(topR > 0 && topR <= 1.0)
      assert(math.abs(topR - topN.toDouble / nTok) < 1e-15)
      assert(dupR >= 0 && dupR <= 1.0)
      // most-frequent word must cover at least the uniform share
      assert(topR >= 1.0 / nUniq - 1e-15)
      assert(topBgR > 0 && topBgR <= 1.0)
    }
  }

  test("pipe6: maintained BM25 index scores equal an in-engine batch rebuild") {
    val got = SparkEntry.queries("pipe6_incremental_bm25")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got.nonEmpty)
    // batch reference: the same BM25 arithmetic straight over the
    // FINAL corpus (no lake tables, window rank instead of TopKAgg) —
    // exact equality proves the df/totals/postings folds composed,
    // including df decrements from the text updates
    import graft.util.Tables
    import org.apache.spark.sql.expressions.Window
    val fin = Tables.t(spark, sf, "documents")
      .filter(!(col("doc_id") % 3 =!= 0 && col("doc_id") % 7 === 1))
      .withColumn("text",
        when(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0,
          concat(lit("replaced content block "), col("doc_id").cast("string")))
          .otherwise(col("text")))
    val dt = fin
      .select(col("doc_id"),
        explode(expr("split(lower(trim(text)), '\\\\s+')")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
    val dlen = dt.groupBy("doc_id").agg(sum("n").as("len"))
    val dfreq = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val totals = dlen.agg(count(lit(1)).as("n_docs"), sum("len").as("tot_len"))
      .withColumn("avgdl",
        col("tot_len").cast("double") / col("n_docs").cast("double"))
    val qt = dt.filter(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"), col("term"))
    val idf6 = round(log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6)
    val tfpart = (col("n").cast("double") * lit(2.2)) /
      (col("n").cast("double") + lit(1.2) *
        (lit(0.25) + lit(0.75) * col("len").cast("double") / col("avgdl")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    val want = dt.join(qt, Seq("term")).filter(col("doc_id") =!= col("q_id"))
      .join(dlen, "doc_id").join(dfreq, "term").crossJoin(totals)
      .select(col("q_id"), col("doc_id"),
        round(idf6 * tfpart * lit(1e6)).cast("bigint").as("micro"))
      .groupBy("q_id", "doc_id").agg(sum("micro").as("sm"))
      .withColumn("score", col("sm").cast("double") / lit(1000000.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(3), r.getInt(4))).toSeq
    assert(got.sorted == want.sorted,
      s"maintained index diverged from batch: ${got.sorted.diff(want.sorted).take(3)}")
  }

  test("samp2: weighted reservoir equals the window-sort reference") {
    val got = SparkEntry.queries("samp2_weighted_reservoir")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
    assert(got.nonEmpty)
    // per source: <= 8 rows, consecutive ranks, keys non-increasing
    // with doc_id tie-break — i.e. the bounded aggregator reproduces
    // exactly what a per-group sort would pick
    got.groupBy(_._1).foreach { case (src, g) =>
      assert(g.length <= 8)
      val byRank = g.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to g.length), s"$src ranks")
      byRank.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi._3 > lo._3 || (hi._3 == lo._3 && hi._2 < lo._2),
          s"$src order violated at rank ${hi._4}")
      case _ => }
    }
    // weighting sanity: the sampled docs' mean token count should not
    // sit BELOW the corpus mean (length-weighting favors long docs;
    // generous one-sided bound at sample size 8/source)
    val sampledW = SparkEntry.queries("samp2_weighted_reservoir")(spark, sf)
      .agg(avg("w")).collect()(0).getDouble(0)
    val corpusW = graft.util.Tables.t(spark, sf, "documents")
      .select(size(expr("split(lower(trim(text)), '\\\\s+')")).cast("long").as("w"))
      .agg(avg("w")).collect()(0).getDouble(0)
    assert(sampledW > corpusW * 0.8,
      s"weighted sample mean $sampledW far below corpus mean $corpusW")
  }

  test("mix1 achieves rates near the per-source target") {
    val out = SparkEntry.queries("mix1_domain_mix")(spark, sf).collect()
    assert(out.length == 20) // 20 sources
    out.foreach { r =>
      val (nDocs, nKept) = (r.getLong(1), r.getLong(2))
      val rate = r.getInt(4)
      assert(rate >= 200 && rate <= 600)
      assert(nKept <= nDocs)
      val achieved = r.getDouble(5)
      // ~25 docs/source at sf0.001: generous tolerance, the pin is
      // that sampling tracks the target rather than ignoring it
      assert(math.abs(achieved - rate / 1000.0) < 0.35,
        s"source ${r.getString(0)} achieved $achieved vs ${rate / 1000.0}")
    }
  }
}
