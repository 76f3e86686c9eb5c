package graft

/** The skew-collapsed pair contract of
  * [[graft.queries.MultimodalOps.pairsFromSigs]] as an in-memory
  * model for the property tests: docs with byte-equal 64-bit
  * signatures group to a min-doc_id representative; the pair set is
  * the within-group STAR edges (rep → member, hamming 0) plus one
  * cross pair per representative pair at hamming ≤ 7 — never the
  * O(k²) full expansion of an equal-signature cluster. */
object TestPairModel {

  /** hs: (doc_id, hash_hi, hash_lo) per signed doc. */
  def collapsedPairs(hs: Seq[(Long, Long, Long)]): Set[(Long, Long, Int)] = {
    val groups = hs.groupBy { case (_, hi, lo) => (hi, lo) }
    val star = groups.valuesIterator.flatMap { g =>
      val rep = g.iterator.map(_._1).min
      g.iterator.map(_._1).filter(_ != rep).map(m => (rep, m, 0))
    }
    val reps = groups.iterator.map { case ((hi, lo), g) =>
      (g.iterator.map(_._1).min, hi, lo)
    }.toSeq
    val cross = for {
      (a, ahi, alo) <- reps; (b, bhi, blo) <- reps if a < b
      h = java.lang.Long.bitCount(ahi ^ bhi) +
        java.lang.Long.bitCount(alo ^ blo)
      if h <= 7
    } yield (a, b, h)
    (star ++ cross).toSet
  }
}
