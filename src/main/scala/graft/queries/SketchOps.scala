package graft.queries

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.util.Tables._

/** Sketch-based approximate analytics (builder-prompt scale
  * extensions): the summaries a 100 TB corpus is actually monitored
  * with — distinct-counts and heavy hitters — computed with BOUNDED
  * state instead of exact shuffles of every distinct value.
  *
  * Both sketches here are built from md5-derived hashes, so they are
  * deterministic pure functions of the input SET/multiset — no RNG,
  * no merge-order dependence — which is what lets the DuckDB oracle
  * replay the whole construction exactly (the gate checks the sketch
  * algebra, not a tolerance band).
  */
object SketchOps {

  private val K = 64
  /** 2^60 as an exactly-representable double literal (the h60 hash
    * domain: 15 md5 hex chars = 60 bits); both engines parse the
    * decimal string to the same bit pattern, so the estimator
    * arithmetic is bit-equal. */
  private val HashDomainLit = "1152921504606846976.0"

  private[graft] val toksExpr = TextOps.ToksExprFmt.format("text")
  private val toksSql = TextOps.ToksSqlFmt.format("text")

  /** Word 3-gram shingles — the SAME constructor as the dedup family
    * ([[DedupOps.shingleArrExpr]], single source of truth). The
    * distinct-shingle count per source is a real curation metric
    * (vocabulary/novelty monitoring) AND has enough cardinality
    * (~1k+/source at sf0.01) to exercise the estimator path; plain
    * distinct tokens would leave every sketch partial (the synthetic
    * corpus draws from a ~30-word vocabulary). */
  private[graft] val shExpr = DedupOps.shingleArrExpr(3)
  private val shSql = DedupOps.shingleArrSql(3)

  /** 60-bit md5-prefix hash of a string column — exact in both
    * engines (15 hex chars < 2^63). */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** KMV estimate columns from a sketch array column: exact count
    * while the sketch is partial, `(k-1) * 2^60 / h_k` once full. */
  private def kmvStats(sketch: Column): Seq[Column] = {
    val nKept = size(sketch)
    val kth = when(nKept >= K, element_at(sketch, K)).cast("long")
    Seq(
      nKept.cast("int").as("n_kept"),
      kth.as("kth_min"),
      when(nKept < K, nKept.cast("double"))
        .otherwise(lit((K - 1).toDouble) * expr(HashDomainLit) /
          kth.cast("double"))
        .as("est_distinct"))
  }

  /** sketch1 — KMV distinct-shingle sketch per source plus a merged
    * global row ("__all__"): per-source sketches are built by the
    * bounded [[KmvSketch]] aggregator (≤ k longs of state per group
    * per partition, map-side combinable), and the global row is
    * derived by MERGING the per-source sketches — never by re-reading
    * the corpus — which is the property that makes KMV usable as a
    * maintained summary at 100 TB. */
  private val kmvQ = GQ(
    "sketch1_kmv_distinct",
    (s, dir) => {
      val kmv = graft.functions.GraftFunctions.kmvUdaf(K)
      val hashes = t(s, dir, "documents")
        .withColumn("w", expr(toksExpr))
        .select(col("source"), explode(expr(shExpr)).as("sh"))
        .select(col("source"), h60(col("sh")).as("h"))
      // persist: the per-source sketches feed BOTH the output rows and
      // the global merge — O(sources × k) longs cached vs re-running
      // the corpus shingle/hash/aggregate per consumer (the harness
      // clears caches between queries)
      val perSource = hashes.groupBy("source").agg(kmv(col("h")).as("sketch"))
        .persist()
      // the global sketch is the k-min of the UNION of per-source
      // sketches: any hash in the global top-k is in its source's
      // top-k, so merging loses nothing (the standard KMV union)
      val global = perSource
        .select(explode(col("sketch")).as("h"))
        .agg(kmv(col("h")).as("sketch"))
        .select(lit("__all__").as("source") +: kmvStats(col("sketch")): _*)
      perSource
        .select(col("source") +: kmvStats(col("sketch")): _*)
        .unionByName(global)
        .orderBy("source")
    },
    Some(s"""WITH tk AS (
        SELECT source, unnest($shSql) AS sh
        FROM (SELECT source, $toksSql AS w FROM documents)),
      h AS (
        SELECT DISTINCT source, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
        FROM tk),
      r AS (
        SELECT source, h,
          row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM h),
      g AS (
        SELECT '__all__' AS source, h,
          row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM r WHERE rn <= $K)),
      u AS (
        SELECT * FROM r UNION ALL SELECT * FROM g),
      stats AS (
        SELECT source,
          CAST(count(*) AS INT) AS n_kept,
          CAST(max(CASE WHEN rn = $K THEN h END) AS BIGINT) AS kth_min
        FROM u WHERE rn <= $K GROUP BY source)
      SELECT source, n_kept, kth_min,
        CASE WHEN n_kept < $K THEN CAST(n_kept AS DOUBLE)
          ELSE ${K - 1}.0 * $HashDomainLit / CAST(kth_min AS DOUBLE) END
          AS est_distinct
      FROM stats ORDER BY source"""))

  /** sketch2 — Count-Min heavy hitters: a 4-row × 4096-bucket CM
    * sketch over the token stream (bucket = 3-hex-char md5 prefix
    * under a per-row salt), then the top 25 tokens by estimated
    * frequency. The sketch itself is O(16k) rows regardless of corpus
    * size and the estimate lookup joins candidates against the
    * BROADCAST sketch — the serving shape of frequency monitoring at
    * 100 TB. Exact counts ride along to pin CM's one-sided error
    * (est >= exact always). */
  private val cmQ = GQ(
    "sketch2_countmin_topk",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(expr(toksExpr)).as("tok"))
      val salted = toks.select(col("tok"),
        explode(array((0 until 4).map(i => lit(s"r$i")): _*)).as("salt"))
        .withColumn("bucket",
          substring(md5(concat(col("salt"), lit(":"), col("tok"))), 1, 3))
      val sketch = salted.groupBy("salt", "bucket")
        .agg(count(lit(1)).as("bn"))
      // persist: exact feeds the estimate lookup AND the final join
      // (O(vocabulary) rows; the harness clears caches between queries)
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
        .persist()
      val est = exact.select(col("tok"),
        explode(array((0 until 4).map(i => lit(s"r$i")): _*)).as("salt"))
        .withColumn("bucket",
          substring(md5(concat(col("salt"), lit(":"), col("tok"))), 1, 3))
        .join(broadcast(sketch), Seq("salt", "bucket"))
        .groupBy("tok").agg(min(col("bn")).as("est_n"))
      exact.join(est, Seq("tok"))
        .select(col("tok"), col("est_n"), col("exact_n"),
          (col("est_n") - col("exact_n")).as("overcount"))
        .orderBy(col("est_n").desc, col("tok").asc)
        .limit(25)
    },
    Some(s"""WITH tk AS (
        SELECT unnest($toksSql) AS tok FROM documents),
      salted AS (
        SELECT tok, 'r' || CAST(r AS VARCHAR) AS salt,
          substr(md5('r' || CAST(r AS VARCHAR) || ':' || tok), 1, 3) AS bucket
        FROM tk, range(4) t(r)),
      sketch AS (
        SELECT salt, bucket, count(*) AS bn FROM salted GROUP BY 1, 2),
      exact AS (
        SELECT tok, count(*) AS exact_n FROM tk GROUP BY 1),
      est AS (
        SELECT e.tok, min(s.bn) AS est_n
        FROM (SELECT tok, 'r' || CAST(r AS VARCHAR) AS salt,
            substr(md5('r' || CAST(r AS VARCHAR) || ':' || tok), 1, 3) AS bucket
          FROM exact, range(4) t(r)) e
        JOIN sketch s ON e.salt = s.salt AND e.bucket = s.bucket
        GROUP BY 1)
      SELECT x.tok, e.est_n, x.exact_n, e.est_n - x.exact_n AS overcount
      FROM exact x JOIN est e ON x.tok = e.tok
      ORDER BY e.est_n DESC, x.tok ASC LIMIT 25"""))

  /** sketch3 — INCREMENTALLY MAINTAINED KMV sketches: the per-source
    * distinct-shingle sketch lives in a lake table keyed by source and
    * each ingest batch folds its own batch-local sketch into the
    * stored one — the metrics-maintenance service shape (pipe3's MV
    * pattern applied to a sketch). The fold is the exact k-min-set
    * union (`array_sort(array_distinct(concat(...)))[1..k]`, pure
    * codegen — no UDF in the fold), so stored ∪ batch ≡ sketch of the
    * full corpus and the DuckDB oracle can check the increments by a
    * BATCH REBUILD over the final corpus. O(churn) per increment:
    * only the new docs are shingled/hashed; the stored side is
    * O(sources × k) longs.
    *
    * KMV is monotone — sound for the append-only corpus modeled here
    * (seed + two insert batches). Updates/deletes would need a
    * rebuild of the affected sources (documented limitation, same as
    * every mergeable-sketch store). */
  private val kmvIncQ = GQ(
    "sketch3_incremental_kmv",
    (s, dir) => {
      import graft.core.{LakeTable, TableProps}
      import QueryPack.scratchDir
      val kmv = graft.functions.GraftFunctions.kmvUdaf(K)
      val base = t(s, dir, "documents").select("doc_id", "source", "text")
      val seed = base.filter(col("doc_id") % 3 =!= 0).withColumn("ts", lit(1L))
      val inc1 = base.filter(col("doc_id") % 3 === 0).withColumn("ts", lit(2L))
      val inc2 = base.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", concat(col("text"), lit(" novel trailing shingle")))
        .withColumn("ts", lit(3L))

      val docs = LakeTable.create(s, scratchDir(s, dir, "sketch3docs"),
        TableProps("sketch3docs", Seq("doc_id"), Some("ts"), Seq.empty))
      val skt = LakeTable.create(s, scratchDir(s, dir, "sketch3state"),
        TableProps("sketch3state", Seq("source"), Some("ts"), Seq.empty))

      def batchSketch(batch: org.apache.spark.sql.DataFrame) = batch
        .withColumn("w", expr(toksExpr))
        .select(col("source"), explode(expr(shExpr)).as("sh"))
        .select(col("source"), h60(col("sh")).as("h"))
        .groupBy("source").agg(kmv(col("h")).as("bsk"))
      /** Fold one ingest batch into the sketch store: exact k-min
        * union of the stored and batch arrays, in-row. */
      def fold(batch: org.apache.spark.sql.DataFrame, ts: Long): Unit = {
        val stored = skt.snapshot()
        val st = if (stored.columns.contains("source"))
          stored.select(col("source"), col("sketch").as("ssk"))
        else s.emptyDataFrame
          .withColumn("source", lit(null).cast("string"))
          .withColumn("ssk", lit(null).cast("array<bigint>"))
          .limit(0)
        val merged = batchSketch(batch)
          .join(st, Seq("source"), "full_outer")
          .select(col("source"),
            slice(array_sort(array_distinct(concat(
              coalesce(col("ssk"), expr("array()").cast("array<bigint>")),
              coalesce(col("bsk"), expr("array()").cast("array<bigint>"))))),
              1, K).as("sketch"))
          .withColumn("ts", lit(ts))
          .persist()
        try skt.upsert(merged) finally { merged.unpersist(); () }
      }

      // the docs-table loads and the seed sketch fold write DISJOINT
      // tables, and the fold reads the `seed` relation directly —
      // overlap the two commit chains (QueryPack.overlapping)
      val ((c1, c2), _) = QueryPack.overlapping(
          Seq(docs.basePath), Seq(skt.basePath)) {
        val c1 = docs.upsert(seed)
        docs.upsert(inc1)
        val c2 = docs.upsert(inc2)
        (c1, c2)
      } {
        fold(seed, 1L)
      }
      // each maintenance pass reads ONLY the churn since its last
      // commit (here both insert batches via one incremental read)
      fold(docs.incremental(c1, Some(c2)).select("source", "text"), 2L)

      val perSource = skt.snapshot().select(col("source"), col("sketch"))
      // "allRow", not "global": a local named `global` would shadow
      // the imported implicit ExecutionContext for the whole block
      val allRow = perSource
        .select(explode(col("sketch")).as("h"))
        .agg(kmv(col("h")).as("sketch"))
        .select(lit("__all__").as("source") +: kmvStats(col("sketch")): _*)
      perSource
        .select(col("source") +: kmvStats(col("sketch")): _*)
        .unionByName(allRow)
        .orderBy("source")
    },
    // batch rebuild over the FINAL corpus — equality with the folded
    // increments IS the mergeability check
    Some(s"""WITH corpus AS (
        SELECT source, text FROM documents
        UNION ALL
        SELECT source, text || ' novel trailing shingle' AS text
        FROM documents WHERE doc_id % 7 = 0),
      tk AS (
        SELECT source, unnest($shSql) AS sh
        FROM (SELECT source, $toksSql AS w FROM corpus)),
      h AS (
        SELECT DISTINCT source, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
        FROM tk),
      r AS (
        SELECT source, h,
          row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM h),
      g AS (
        SELECT '__all__' AS source, h,
          row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM r WHERE rn <= $K)),
      u AS (
        SELECT * FROM r UNION ALL SELECT * FROM g),
      stats AS (
        SELECT source,
          CAST(count(*) AS INT) AS n_kept,
          CAST(max(CASE WHEN rn = $K THEN h END) AS BIGINT) AS kth_min
        FROM u WHERE rn <= $K GROUP BY source)
      SELECT source, n_kept, kth_min,
        CASE WHEN n_kept < $K THEN CAST(n_kept AS DOUBLE)
          ELSE ${K - 1}.0 * $HashDomainLit / CAST(kth_min AS DOUBLE) END
          AS est_distinct
      FROM stats ORDER BY source"""))

  /** sketch5 — KMV SET ALGEBRA between source pairs: estimated
    * union / intersection / Jaccard of the distinct-shingle sets of
    * every pair of sources, computed ONLY from the per-source k-min
    * sketches — the corpus-overlap question ("how much does crawl A
    * duplicate crawl B?") answered from O(sources × k) longs instead
    * of a full distinct-set join, which is how it must be answered at
    * 100 TB (the exact sides here are the gate's error pin, like
    * sketch2's exact counts — at corpus scale only the sketch side
    * runs). The estimator is the standard KMV algebra: the pair's
    * union sketch is the k-min of the two sketch arrays' union (loses
    * nothing — any hash in the union's top-k is in its own source's
    * top-k); est_jaccard ρ = |{h ∈ union sketch : h in BOTH
    * sketches}| / |union sketch|; est_intersect = ρ × est_union. All
    * arithmetic is single divisions/products of exact integers in
    * mirrored order, so both engines produce bit-identical doubles. */
  private val setAlgQ = GQ(
    "sketch5_kmv_set_algebra",
    (s, dir) => {
      val kmv = graft.functions.GraftFunctions.kmvUdaf(K)
      // persist: feeds the sketch side AND the exact pin (the harness
      // clears caches between queries)
      val hashes = t(s, dir, "documents")
        .withColumn("w", expr(toksExpr))
        .select(col("source"), explode(expr(shExpr)).as("sh"))
        .select(col("source"), h60(col("sh")).as("h"))
        .persist()
      val perSource = hashes.groupBy("source").agg(kmv(col("h")).as("sketch"))
      // sources × sources is metadata-sized (a handful of rows) — the
      // crossJoin never touches corpus-scale data
      val pairs = perSource
        .select(col("source").as("src_a"), col("sketch").as("ska"))
        .crossJoin(perSource
          .select(col("source").as("src_b"), col("sketch").as("skb")))
        .filter(col("src_a") < col("src_b"))
      val est = pairs
        .withColumn("u",
          expr(s"slice(array_sort(array_distinct(concat(ska, skb))), 1, $K)"))
        .withColumn("n_union_kept", size(col("u")).cast("int"))
        .withColumn("in_both", size(expr(
          "filter(u, x -> array_contains(ska, x) AND array_contains(skb, x))"))
          .cast("int"))
        .withColumn("est_union",
          when(col("n_union_kept") < K, col("n_union_kept").cast("double"))
            .otherwise(lit((K - 1).toDouble) * expr(HashDomainLit) /
              element_at(col("u"), K).cast("double")))
        .withColumn("est_jaccard",
          col("in_both").cast("double") / col("n_union_kept").cast("double"))
        .withColumn("est_intersect", col("est_jaccard") * col("est_union"))
      val dist = hashes.distinct()
      val sizes = dist.groupBy("source").agg(count(lit(1)).as("nd"))
      val inter = dist.select(col("source").as("src_a"), col("h"))
        .join(dist.select(col("source").as("src_b"), col("h")), Seq("h"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("exact_inter"))
      est
        .join(sizes.select(col("source").as("src_a"), col("nd").as("na")), "src_a")
        .join(sizes.select(col("source").as("src_b"), col("nd").as("nb")), "src_b")
        .join(inter, Seq("src_a", "src_b"), "left")
        .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
        .withColumn("exact_union", col("na") + col("nb") - col("exact_inter"))
        .withColumn("exact_jaccard", col("exact_inter").cast("double") /
          col("exact_union").cast("double"))
        .select("src_a", "src_b", "n_union_kept", "in_both", "est_union",
          "est_intersect", "est_jaccard", "exact_union", "exact_inter",
          "exact_jaccard")
        .orderBy("src_a", "src_b")
    },
    Some(s"""WITH tk AS (
        SELECT source, unnest($shSql) AS sh
        FROM (SELECT source, $toksSql AS w FROM documents)),
      h AS (
        SELECT DISTINCT source, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
        FROM tk),
      r AS (
        SELECT source, h,
          row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM h),
      sk AS (
        SELECT source, list(h ORDER BY h) AS sketch
        FROM r WHERE rn <= $K GROUP BY source),
      pr AS (
        SELECT a.source AS src_a, a.sketch AS ska,
          b.source AS src_b, b.sketch AS skb
        FROM sk a JOIN sk b ON a.source < b.source),
      uu AS (
        SELECT src_a, src_b, ska, skb,
          list_slice(list_sort(list_distinct(list_concat(ska, skb))), 1, $K) AS u
        FROM pr),
      e AS (
        SELECT src_a, src_b,
          CAST(len(u) AS INT) AS n_union_kept,
          CAST(len(list_filter(u,
            x -> list_contains(ska, x) AND list_contains(skb, x))) AS INT) AS in_both,
          CASE WHEN len(u) < $K THEN CAST(len(u) AS DOUBLE)
            ELSE ${K - 1}.0 * $HashDomainLit / CAST(u[$K] AS DOUBLE) END AS est_union
        FROM uu),
      sizes AS (SELECT source, count(*) AS nd FROM h GROUP BY source),
      inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS exact_inter
        FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2)
      SELECT e.src_a, e.src_b, n_union_kept, in_both, est_union,
        (CAST(in_both AS DOUBLE) / CAST(n_union_kept AS DOUBLE)) * est_union
          AS est_intersect,
        CAST(in_both AS DOUBLE) / CAST(n_union_kept AS DOUBLE) AS est_jaccard,
        CAST(sa.nd + sb.nd - coalesce(exact_inter, 0) AS BIGINT) AS exact_union,
        CAST(coalesce(exact_inter, 0) AS BIGINT) AS exact_inter,
        CAST(coalesce(exact_inter, 0) AS DOUBLE) /
          CAST(sa.nd + sb.nd - coalesce(exact_inter, 0) AS DOUBLE) AS exact_jaccard
      FROM e JOIN sizes sa ON sa.source = e.src_a
        JOIN sizes sb ON sb.source = e.src_b
        LEFT JOIN inter ON inter.src_a = e.src_a AND inter.src_b = e.src_b
      ORDER BY e.src_a, e.src_b"""))

  /** sketch4 — QUANTILES from a deterministic bounded sample: token-
    * count p50/p90/p99 per source estimated from the 16 docs with
    * the smallest salted 48-bit md5 hash (16 keeps the sample a
    * strict subset at every test SF, so the sampled path is actually
    * exercised against the exact pin) (a uniform, content-stable
    * sample — samp1's selection rule carried by the bounded
    * [[graft.functions.TopKAgg]] aggregator, so the per-source
    * "sample" ships ≤ k pairs per partition instead of window-
    * sorting every doc into one reducer). Exact corpus quantiles ride
    * along as the error pin, like sketch2's exact counts — at corpus
    * scale only the sampled side would run. The 48-bit hash is exact
    * in a double, and BOTH engines tie-break equal hashes by n_tok
    * (TopKAgg's second tuple element; `ORDER BY h, n_tok` in the
    * oracle) — equal (hash, n_tok) ties leave the selected n_tok
    * MULTISET identical regardless of which row wins, so the
    * quantiles are exactly engine-independent. Discrete quantiles
    * index into the sorted sample (no interpolation — integers stay
    * exact). */
  /** sketch4 sample size — 16 keeps the sample a strict subset of
    * every source at every test SF; interpolated into the oracle so
    * the two sides can never drift. */
  private val SampleKLit = 16

  private val quantQ = GQ(
    "sketch4_quantile_sample",
    (s, dir) => {
      val SampleK = SampleKLit
      val topk = graft.functions.GraftFunctions.topkUdaf(SampleK)
      // negate the 48-bit hash: TopKAgg keeps the LARGEST scores, we
      // want the SMALLEST hashes (both exact in double below 2^53)
      val d = t(s, dir, "documents")
        .withColumn("n_tok", size(expr(toksExpr)).cast("long"))
        .withColumn("nh",
          -conv(substring(md5(concat(lit("sketch4:"),
            col("doc_id").cast("string"))), 1, 12), 16, 10)
            .cast("double"))
        .persist() // feeds the sampled AND the exact side
      def quantiles(counts: Column, prefix: String): Seq[Column] =
        Seq(0.50 -> "p50", 0.90 -> "p90", 0.99 -> "p99").map { case (q, nm) =>
          element_at(counts,
            ceil(lit(q) * size(counts)).cast("int")).as(prefix + nm)
        }
      val sampled = d.groupBy("source")
        .agg(topk(col("nh"), col("n_tok")).as("top"))
        // the sample pairs arrive (hash-score, n_tok); sort the token
        // counts for discrete quantile indexing
        .withColumn("counts", sort_array(expr("transform(top, x -> x._2)")))
        .select(col("source") +: (size(col("counts")).as("n_sampled") +:
          quantiles(col("counts"), "")): _*)
      val exact = d.groupBy("source")
        .agg(sort_array(collect_list(col("n_tok"))).as("counts"))
        .select(col("source") +: quantiles(col("counts"), "exact_"): _*)
      sampled.join(exact, "source").orderBy("source")
    },
    Some(s"""WITH d AS (
        SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_tok,
          CAST('0x' || substr(md5('sketch4:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
        FROM documents),
      r AS (
        SELECT source, n_tok,
          row_number() OVER (PARTITION BY source ORDER BY h ASC, n_tok ASC) AS rn
        FROM d),
      smp AS (
        SELECT source, list_sort(list(n_tok)) AS counts
        FROM r WHERE rn <= $SampleKLit GROUP BY source),
      ex AS (
        SELECT source, list_sort(list(n_tok)) AS counts
        FROM d GROUP BY source)
      SELECT s.source,
        CAST(len(s.counts) AS INT) AS n_sampled,
        -- CAST(q AS DOUBLE): a DECIMAL literal would make q*len exact
        -- where Spark's double product rounds up (e.g. 0.9*200 ->
        -- 180.00000000000003 -> ceil 181 on the exact side) — force the SAME double path
        s.counts[CAST(ceil(CAST(0.50 AS DOUBLE) * len(s.counts)) AS INT)] AS p50,
        s.counts[CAST(ceil(CAST(0.90 AS DOUBLE) * len(s.counts)) AS INT)] AS p90,
        s.counts[CAST(ceil(CAST(0.99 AS DOUBLE) * len(s.counts)) AS INT)] AS p99,
        e.counts[CAST(ceil(CAST(0.50 AS DOUBLE) * len(e.counts)) AS INT)] AS exact_p50,
        e.counts[CAST(ceil(CAST(0.90 AS DOUBLE) * len(e.counts)) AS INT)] AS exact_p90,
        e.counts[CAST(ceil(CAST(0.99 AS DOUBLE) * len(e.counts)) AS INT)] AS exact_p99
      FROM smp s JOIN ex e ON e.source = s.source
      ORDER BY s.source"""))

  def qs: Seq[GQ] = Seq(kmvQ, cmQ, kmvIncQ, quantQ, setAlgQ)
}
