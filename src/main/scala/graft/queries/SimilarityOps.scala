package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, a
  * cosine near-duplicate pair scan, and a sign-LSH bucketed ANN
  * variant as the scale path (tested for recall in SimilaritySpec;
  * approximate ⇒ no SQL oracle).
  *
  * Cosine is computed in double with a strict left-to-right fold over
  * the element order (`aggregate`), matching DuckDB's `list_sum` over
  * `list_transform` order, and the ranking key is the score rounded
  * to 9 dp with vec_id tie-breaks — fully deterministic in both
  * engines.
  *
  * Scale: top-k for Q query vectors against N vectors is a broadcast
  * of Q rows against a scan of N (no N×N blowup); the near-dup pair
  * scan uses LSH-bucketed self-join, not a cross join, when run
  * through [[annBuckets]]; window top-k is one shuffle on query id.
  */
object SimilarityOps {

  /** dot(a,b) with deterministic summation order. */
  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  private def normExpr(a: String): String = s"sqrt(${dotExpr(a, a)})"

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** sim1 — brute-force cosine top-10 for the first 5 vectors.
    * Deterministic rank: (round(cos, 9) DESC, vec_id ASC). */
  private val topkQ = GQ(
    "sim1_cosine_topk",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("cosine", round(
          expr(dotExpr("q_emb", "embedding")) /
            (expr(normExpr("q_emb")) * expr(normExpr("embedding"))), 9))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("q_id", "vec_id", "cosine", "rank")
        .orderBy("q_id", "rank")
    },
    Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        FROM embeddings WHERE vec_id < 5),
      scored AS (SELECT q_id, vec_id,
          round(${dotSql("q_emb", "embedding")} /
            (${normSql("q_emb")} * ${normSql("embedding")}), 9) AS cosine
        FROM embeddings, q WHERE vec_id <> q_id),
      ranked AS (SELECT q_id, vec_id, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rank
        FROM scored)
      SELECT q_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked
      WHERE rank <= 10 ORDER BY q_id, rank"""))

  /** sim2 — embedding-cosine near-duplicate pairs: inject exact copies
    * of every vec_id % 9 == 0 (id + 1e6), find all pairs with cosine
    * ≥ 0.999. The oracle brute-forces the same pair set. */
  private val nearDupQ = GQ(
    "sim2_cosine_neardup",
    (s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val c = e.unionByName(e.filter(col("vec_id") % 9 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L))
      val a = c.select(col("vec_id").as("a"), col("embedding").as("ea"))
      val b = c.select(col("vec_id").as("b"), col("embedding").as("eb"))
      a.join(b, col("a") < col("b"))
        .withColumn("cosine", round(
          expr(dotExpr("ea", "eb")) /
            (expr(normExpr("ea")) * expr(normExpr("eb"))), 9))
        .filter(col("cosine") >= 0.999)
        .select("a", "b", "cosine")
        .orderBy("a", "b")
    },
    Some(s"""WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL SELECT vec_id + 1000000, embedding
          FROM embeddings WHERE vec_id % 9 = 0)
      SELECT a.vec_id AS a, b.vec_id AS b,
        round(${dotSql("a.embedding", "b.embedding")} /
          (${normSql("a.embedding")} * ${normSql("b.embedding")}), 9) AS cosine
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE round(${dotSql("a.embedding", "b.embedding")} /
          (${normSql("a.embedding")} * ${normSql("b.embedding")}), 9) >= 0.999
      ORDER BY a, b"""))

  /** Sign-LSH bucket id: sign bits of `bits` deterministic hyperplanes
    * (hyperplane j has ±1 coefficients derived from md5(j:i) —
    * reproducible with no RNG; constant-folded at plan time). */
  def annBuckets(df: DataFrame, embCol: String, bits: Int = 6): DataFrame = {
    val bitCols = (0 until bits).map { j =>
      val proj = s"""aggregate(zip_with($embCol, sequence(0, 63),
        (x, i) -> CAST(x AS DOUBLE) * (CASE WHEN substring(md5(concat('$j', ':', CAST(i AS STRING))), 1, 1) < '8' THEN 1.0 ELSE -1.0 END)),
        CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""
      when(expr(proj) >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    df.withColumn("bucket", bitCols.reduce(_ + _))
  }

  private val AnnBits = 6

  /** sim3 — ANN top-k via sign-LSH buckets with hamming-1 multiprobe:
    * each query searches its own bucket plus the `bits` single-bit
    * flips (probing (bits+1)/2^bits of the space; candidates per query
    * ≈ N·(bits+1)/2^bits at scale, tunable via `AnnBits`).
    * Approximate — recall asserted in PipelineOpsSpec, no SQL oracle. */
  private val annQ = GQ(
    "sim3_ann_lsh_topk",
    (s, dir) => {
      val e = annBuckets(t(s, dir, "embeddings"), "embedding", AnnBits)
      val probes = (0 to AnnBits).map(j =>
        if (j == 0) col("bucket")
        else expr(s"bucket ^ ${1L << (j - 1)}"))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          explode(array(probes: _*)).as("q_bucket"))
      val scored = e.join(broadcast(q),
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .withColumn("cosine", round(
          expr(dotExpr("q_emb", "embedding")) /
            (expr(normExpr("q_emb")) * expr(normExpr("embedding"))), 9))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "vec_id", "cosine", "rank")
        .orderBy("q_id", "rank")
    },
    None)

  def qs: Seq[GQ] = Seq(topkQ, nearDupQ, annQ)
}
