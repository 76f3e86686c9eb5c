package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch as a typed [[Aggregator]]
  * (scale extension; the approximate-analytics layer a 100 TB corpus
  * needs — exact `COUNT(DISTINCT token)` per group shuffles every
  * distinct value, a KMV sketch shuffles at most `k` longs per
  * partition per group).
  *
  * The accumulator is the sorted array of the `k` smallest DISTINCT
  * hash values seen; `merge` is a sorted-merge-dedup-truncate, so the
  * sketch is associative/commutative and Spark's partial aggregation
  * (map-side combine) applies. With values hashed uniformly into
  * [0, 2^60) the estimator is the classic KMV `(k-1) * 2^60 / h_k`
  * (Bar-Yossef et al., "Counting distinct elements in a data
  * stream"); when a group holds fewer than `k` distinct hashes the
  * sketch degenerates to the exact distinct list.
  *
  * Determinism: the sketch is a pure function of the input's distinct
  * hash SET (order-independent), so the gate's DuckDB oracle can
  * replay it exactly with a window over the same md5-derived hashes.
  */
final class KmvSketch(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert `h` keeping the buffer sorted, distinct, and ≤ k long.
    * Null inputs are SKIPPED (SQL-aggregate convention — a primitive
    * `Long` input would silently decode a null row as hash 0, the
    * domain minimum, permanently occupying the sketch's first slot). */
  override def reduce(buf: Array[Long], hIn: java.lang.Long): Array[Long] = {
    if (hIn == null) return buf
    val h = hIn.longValue()
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present
    else {
      val ins = -i - 1
      if (buf.length >= k && ins >= k) buf // larger than current k-th min
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
