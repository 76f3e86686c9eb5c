package graft.queries

object MultimodalOps {
  def qs: Seq[GQ] = Seq()
}
