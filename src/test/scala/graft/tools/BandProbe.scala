package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc decomposition of the perceptual pair pipeline's cost at a
  * given SF dir (test scope; diagnostic for the round-14 band work):
  * times the signature pass, the group collapse, the banded candidate
  * join (with candidate cardinality), and the full gate. */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sfscale10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.core.BareLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    import graft.multimodal.MediaDecoder
    val modality = if (args.length > 1) args(1) else "image"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id")
    docs.count()
    val sig = (modality match {
      case "image" => MediaDecoder.aHash(
        graft.queries.MultimodalOps.mm6Frame(docs), "doc_id", "payload")
      case "audio" => MediaDecoder.envHash(
        graft.queries.MultimodalOps.mm9Frame(docs), "doc_id", "payload", 50)
    }).persist()
    time("sig (encode+hash)")(sig.count())
    val groups = sig.groupBy("hash_hi", "hash_lo")
      .agg(min("doc_id").as("doc_id"),
        collect_list("doc_id").as("members")).persist()
    val ng = time("groups agg")(groups.count())
    println(s"[probe] distinct signatures: $ng")
    val blocks = graft.queries.MultimodalOps.bandedProbe(
      groups.select("doc_id", "hash_hi", "hash_lo")).persist()
    time("banded explode")(blocks.count())
    val joined = blocks.as("l").join(blocks.as("r"),
      col("l.blk") === col("r.blk") && col("l.doc_id") < col("r.doc_id"))
    val nj = time("band join (raw rows)")(joined.count())
    println(s"[probe] raw candidate rows: $nj")
    val top = blocks.groupBy("blk").count().orderBy(desc("count"))
      .limit(5).collect().map(r => s"${r.get(0)}=${r.getLong(1)}")
    println(s"[probe] hottest buckets: ${top.mkString(", ")}")
    time("full mm6 gate")(
      graft.SparkEntry.queries("mm6_phash_neardup")(spark, sfDir).count())
    spark.stop()
  }
}
