package graft.queries

object DedupOps {
  def qs: Seq[GQ] = Seq()
}
