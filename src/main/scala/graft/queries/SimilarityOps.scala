package graft.queries

object SimilarityOps {
  def qs: Seq[GQ] = Seq()
}
