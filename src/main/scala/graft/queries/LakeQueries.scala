package graft.queries

object LakeQueries {
  def qs: Seq[GQ] = Seq()
}
