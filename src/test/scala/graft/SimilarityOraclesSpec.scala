package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sim4/sim6/sim8 oracle SQL BYTE-IDENTICAL across the
  * round-11 LloydScaffold dedupe: the three builders emitted
  * near-copies of the assignCte/updateCte Lloyd scaffolding, now one
  * shared generator. The driver hashes DuckDB results of the oracle
  * TEXT, so a refactor that drifts the emitted string in any way —
  * whitespace included — must fail here, not as a gate mismatch. The
  * hashes were taken from the last pre-refactor Verify dump
  * (oracle_sql.json, commit 170f24e). */
class SimilarityOraclesSpec extends AnyFunSuite {
  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("Lloyd-scaffold oracles match their pre-refactor bytes") {
    val o = SparkEntry.oracleSql
    assert(md5(o("sim4_ann_ivf_topk")) ==
      "f522d89b4fd2adf9d74bbf2e585a37f1")
    assert(md5(o("sim6_pq_adc_topk")) ==
      "e2016870b12eaa898b8a592668daa766")
    assert(md5(o("sim8_incremental_ivf")) ==
      "164ab22dd3fbbe835c038d24c641346b")
  }
}
