package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract:
  * a named DataFrame query over the testdata tables plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle that must
  * hash-match it row-for-row.
  */
final case class GQ(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryPack {
  /** Full registry; SparkEntry derives `queries`/`oracleSql` from this. */
  def all: Seq[GQ] =
    Relational.qs ++ LakeQueries.qs ++ TextOps.qs ++ CurationOps.qs ++
      DedupOps.qs ++ SimilarityOps.qs ++ SketchOps.qs ++ GraphOps.qs ++
      MultimodalOps.qs

  /** Per-(gate, sfDir) scratch table path, dropped clean — the one
    * definition every lake-backed gate query uses. */
  private[queries] def scratchDir(
      s: SparkSession, sfDir: String, name: String): String = {
    val p = s"target/graft_scratch/${name}_${math.abs(sfDir.hashCode)}"
    graft.core.LakeTable.drop(s, p)
    p
  }
}
