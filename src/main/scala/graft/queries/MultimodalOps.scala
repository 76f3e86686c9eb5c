package graft.queries

import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Multimodal-column plumbing: media treated as opaque `binary`
  * payloads with typed metadata. [[graft.multimodal.MediaDecoder]]
  * holds the mapPartitions batch pipeline: uncompressed BMP and PCM
  * WAV decode FOR REAL via pure-JVM header/pixel parsing (spec-
  * fixtured); other formats fall back to a clearly-marked
  * deterministic stub (the container ships no codec libraries). What
  * this gate checks is the Spark-side shape — binary column handling,
  * metadata extraction as codegen'd expressions, and the
  * DuckDB-checkable byte-level arithmetic. */
object MultimodalOps {

  /** mm1 — binary payload + metadata extraction: treat each document's
    * UTF-8 bytes as an opaque media blob; extract size, a fake
    * width/height (deterministic arithmetic on the byte length), and a
    * content fingerprint. */
  private val binaryMetaQ = GQ(
    "mm1_binary_metadata",
    (s, dir) => {
      t(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("n_bytes", octet_length(col("payload")))
        .withColumn("fake_width", (col("n_bytes") % 640).cast("int"))
        // multiply in LONG: a >306 MB payload would wrap 32-bit here
        // while the DuckDB side (BIGINT octet_length) would not
        .withColumn("fake_height",
          ((col("n_bytes").cast("long") * 7) % 480).cast("int"))
        .withColumn("fingerprint", md5(col("payload")))
        .select("doc_id", "n_bytes", "fake_width", "fake_height", "fingerprint")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
        CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS fake_height,
        md5(text) AS fingerprint
      FROM documents ORDER BY doc_id"""))

  def qs: Seq[GQ] = Seq(binaryMetaQ)
}
