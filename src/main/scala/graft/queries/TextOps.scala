package graft.queries

object TextOps {
  def qs: Seq[GQ] = Seq()
}
