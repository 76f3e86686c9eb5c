package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, an
  * LSH-pruned cosine near-duplicate pair scan, and a multiprobe
  * sign-LSH bucketed ANN top-k as the scale path.
  *
  * Cosine is computed in double with a strict left-to-right fold over
  * the element order (`aggregate`), matching DuckDB's `list_sum` over
  * `list_transform` order, and every ranking/threshold key uses the
  * score rounded to 9 dp with vec_id tie-breaks — deterministic in
  * both engines. Norms are computed once per vector, not per pair.
  *
  * Scale design:
  * - top-k for Q query vectors broadcasts Q rows against one scan of
  *   N (no N×N);
  * - the near-dup scan self-joins on LSH bucket ∪ hamming-1 probes —
  *   candidate pairs ≈ N²(bits+1)/2^bits instead of N², and the
  *   exact-cosine post-filter keeps precision exact. Identical
  *   vectors always share a bucket, so exact-duplicate recall is 1.0
  *   by construction (near-1.0 for near-dups; the 0.999-cosine pairs
  *   this query targets split a hyperplane with p ≈ 1.4% per bit);
  * - hyperplane coefficients are md5-derived constants materialized
  *   driver-side into array literals — no per-row hashing.
  */
object SimilarityOps {

  private val Dims = 64
  private val AnnBits = 6

  /** dot(a,b) with deterministic summation order — the codegen'd
    * [[graft.functions.VecFloatDot]], bit-identical to the interpreted
    * `aggregate(zip_with(...))` fold it replaced (same IEEE op order)
    * but ~10x faster per candidate pair. */
  private def dotExpr(a: String, b: String): String =
    s"${graft.functions.GraftFunctions.VecDotName}($a, $b)"

  private def normExpr(a: String): String = s"sqrt(${dotExpr(a, a)})"

  /** Truncated-prefix (first `d` dims) dot product — the ONE DuckDB
    * mirror of the graft_vec_dot fold (strict left-to-right element
    * order); every oracle dot in the repo must route through it so
    * the IEEE op order can never drift between copies. */
  private[queries] def dotPrefixSql(a: String, b: String, d: Int): String =
    s"list_sum(list_transform(range(1, ${d + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private[queries] def dotSql(a: String, b: String): String =
    dotPrefixSql(a, b, Dims)

  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** ±1 hyperplane coefficients for plane j — md5-derived, computed
    * once on the driver (deterministic, no RNG). */
  private def planeCoefs(j: Int): Seq[Double] = (0 until Dims).map { i =>
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    if ((h(0) & 0x80) == 0) 1.0 else -1.0
  }

  /** Sign-LSH bucket id over `bits` fixed hyperplanes. */
  def annBuckets(df: DataFrame, embCol: String, bits: Int = AnnBits): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val bitCols = (0 until bits).map { j =>
      // D suffix: plain `1.0` parses as DECIMAL in some sessions and
      // graft_vec_dot takes float/double arrays only
      val coefs = planeCoefs(j).map(c => s"${c}D").mkString("array(", ", ", ")")
      val proj = dotExpr(embCol, coefs)
      when(expr(proj) >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    df.withColumn("bucket", bitCols.reduce(_ + _))
  }

  /** Embeddings with bucket + precomputed norm. */
  private def prepared(s: SparkSession, dir: String): DataFrame =
    annBuckets(t(s, dir, "embeddings"), "embedding")
      .withColumn("nrm", expr(normExpr("embedding")))

  private def cosineCol: Column = round(
    expr(dotExpr("q_emb", "embedding")) / (col("q_nrm") * col("nrm")), 9)

  /** sim1 — brute-force cosine top-10 for the first 5 vectors.
    * Deterministic rank: (round(cos, 9) DESC, vec_id ASC). */
  private val topkQ = GQ(
    "sim1_cosine_topk",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings").withColumn("nrm", expr(normExpr("embedding")))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("cosine", cosineCol)
      // bounded-state top-k, NOT row_number over a per-query window:
      // the window form shuffles every scored row into #queries tasks
      // (a full-corpus shuffle at 100 TB); the mergeable aggregator
      // ships at most k pairs per partition per query and yields the
      // identical (cosine DESC, vec_id ASC) ranking
      val topk = graft.functions.GraftFunctions.topkUdaf(10)
      scored.groupBy("q_id")
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col._2").as("vec_id"),
          col("col._1").as("cosine"),
          (col("pos") + 1).cast("int").as("rank"))
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

  /** sim2 — embedding-cosine near-duplicate pairs at cosine ≥ 0.999
    * over the corpus with injected exact copies (vec_id % 9 == 0,
    * +1e6 id). Spark prunes candidates through LSH buckets +
    * hamming-1 multiprobe before the exact check; the oracle
    * brute-forces all pairs — equality of the two is itself the
    * recall check (identical vectors cannot split buckets). */
  /** Near-duplicate pairs (cosine ≥ 0.999) over the corpus with
    * injected exact copies, LSH-pruned — shared by sim2 and sim5.
    *
    * `spark.graft.ann.bits` (default 6) is the bucket-occupancy knob
    * the SCALING.md audit flags: candidate count grows with occupancy
    * SQUARED and bucket count is 2^bits, so a deployment scales bits
    * with log2(corpus) to hold occupancy constant. Raising bits
    * trades recall only for non-identical near-dups (a 0.999-cosine
    * pair splits a hyperplane with p ≈ 1.4% per bit; hamming-1
    * multiprobe absorbs single splits) — exact copies share every
    * bucket at ANY bit count, so the gate's oracle parity is
    * bits-invariant. */
  /** Resolve `spark.graft.ann.bits`: an explicit integer, or `auto`,
    * which sizes the hyperplane count from the corpus so bucket
    * occupancy stays ~[[AutoOccupancy]] as the corpus grows —
    * bits = ⌈log2(n / occupancy)⌉. This is the self-setting form of
    * the 100× knob SCALING.md documents: candidate count grows with
    * occupancy SQUARED, so a deployment must raise bits with
    * log2(corpus); `auto` pays one COUNT(*) of the given relation
    * instead of relying on an operator remembering to retune. Callers
    * should pass the CHEAPEST relation whose count approximates the
    * corpus (a raw parquet relation counts from footer metadata;
    * a derived union would rescan) — bits only moves with log2, so a
    * ~10% undercount never shifts the result by a full bit. Clamped
    * to [AnnBits, 48]: never fewer buckets than the hand-tuned
    * default, never more bits than the multiprobe loop can afford. */
  private val AutoOccupancy = 32L
  private[graft] def resolveAnnBits(corpus: DataFrame): Int = {
    val s = corpus.sparkSession
    s.conf.get("spark.graft.ann.bits", AnnBits.toString) match {
      case "auto" =>
        val n = math.max(corpus.count(), 1L)
        val bits = math.ceil(
          math.log(n.toDouble / AutoOccupancy) / math.log(2.0)).toInt
        math.min(48, math.max(AnnBits, bits))
      case v =>
        // validate explicit settings: bits >= 63 silently corrupts the
        // probe set via Long shift wraparound (1L << 64 == 1L), and a
        // typo'd value should name the conf it came from
        val b = try v.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"spark.graft.ann.bits must be an int in [1, 48] or 'auto', got '$v'")
        }
        require(b >= 1 && b <= 48,
          s"spark.graft.ann.bits must be in [1, 48], got $b")
        b
    }
  }

  private def nearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val e0 = t(s, dir, "embeddings").select("vec_id", "embedding")
    val c = e0.unionByName(e0.filter(col("vec_id") % 9 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L))
    // auto-bits from the RAW relation (footer-metadata count), not
    // the derived union — the +n/9 injected copies move log2 by 0.15,
    // never a full bit
    val bits = resolveAnnBits(e0)
    val prep = annBuckets(c, "embedding", bits)
      .withColumn("nrm", expr(normExpr("embedding")))
    val probes = (0 to bits).map(j =>
      if (j == 0) col("bucket") else expr(s"bucket ^ ${1L << (j - 1)}"))
    val left = prep.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("nrm").as("q_nrm"), explode(array(probes: _*)).as("q_bucket"))
    left.join(prep, col("bucket") === col("q_bucket") && col("q_id") < col("vec_id"))
      .withColumn("cosine", cosineCol)
      .filter(col("cosine") >= 0.999)
      // no distinct: the bits+1 probe values are pairwise distinct and a
      // candidate has ONE bucket, so each (a, b) joins through at most
      // one probe, in one orientation (q_id < vec_id) — a dedup here
      // would re-shuffle the whole pair relation for nothing
      .select(col("q_id").as("a"), col("vec_id").as("b"), col("cosine"))
  }

  /** The sim2/sim5 corpus + pair graph, DuckDB side. */
  private def pairsSql: String =
    s"""corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL SELECT vec_id + 1000000, embedding
          FROM embeddings WHERE vec_id % 9 = 0),
      pairs AS (
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        WHERE round(${dotSql("a.embedding", "b.embedding")} /
            (${normSql("a.embedding")} * ${normSql("b.embedding")}), 9) >= 0.999)"""

  private val nearDupQ = GQ(
    "sim2_cosine_neardup",
    (s, dir) => nearDupPairs(s, dir).orderBy("a", "b"),
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

  /** Connected components over an undirected pair list (cols `a`,
    * `b`) — shared by sim5 and pipe2's canonical selection. Returns
    * (id, lbl = min reachable id) for EVERY node.
    *
    * Size-gated like the write-probe broadcast: a near-dup edge set is
    * tiny relative to the corpus (it IS the duplication), so below the
    * threshold a driver-side union-find resolves it in one collect —
    * no per-iteration Spark jobs at all. Above it, min-id label
    * propagation to fixpoint: each iteration is one shuffle join +
    * aggregate on the edge set, converging in a handful of rounds for
    * small-diameter duplicate clusters. */
  private[graft] def components(
      p0: DataFrame, driverMaxEdges: Int = -1): DataFrame = {
    val spark = p0.sparkSession
    import spark.implicits._
    // -1 = resolve the size gate from the session conf, so a deployment
    // (or the gate itself) can force the distributed label-propagation
    // branch at any scale — the 100 TB code path stays oracle-checkable
    // without a 100 TB edge set
    val maxEdges =
      if (driverMaxEdges >= 0) driverMaxEdges
      else spark.conf.get("spark.graft.components.driverMaxEdges", "500000")
        .toInt
    // normalize BOTH paths to long ids up front so the output schema
    // is identical whichever side of the size gate a dataset lands on
    val p = p0.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
    // one job: fetch up to threshold+1 edges; over-threshold falls
    // through to the distributed loop (which re-derives p — the rare
    // path pays, the common path runs the pair pipeline exactly once)
    val es = p.as[(Long, Long)].take(maxEdges + 1)
    if (es.length <= maxEdges) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // link larger root under smaller: every set's root is its min id
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      return parent.keys.toSeq.sorted.map(id => (id, find(id)))
        .toDF("id", "lbl")
    }
    val edges = p.unionByName(p.select(col("b").as("a"), col("a").as("b")))
        .persist()
      var labels = edges.select(col("a").as("id")).distinct()
        .withColumn("lbl", col("id")).persist()
      // labels only ever decrease, so sum(lbl) is strictly decreasing
      // until the fixpoint — one cheap agg per iteration instead of a
      // join-based change count. coalesce guards the empty graph
      // (sum over zero rows is NULL).
      def labelSum(): Long =
        labels.agg(coalesce(sum("lbl"), lit(0L))).head().getLong(0)
      var prevSum = labelSum()
      var converged = labels.isEmpty // no near-dup edges: nothing to do
      var iter = 0
      val maxIters = 64
      while (!converged && iter < maxIters) {
        val next = labels.join(edges, col("id") === col("a"))
          .select(col("b").as("id"), col("lbl"))
          .unionByName(labels.select("id", "lbl"))
          .groupBy("id").agg(min("lbl").as("lbl"))
        // truncate the per-iteration lineage every few rounds: persist
        // caches data but the logical plan still grows one join layer
        // per iteration, so a deep component would otherwise pay
        // ever-taller analysis/planning (and risk stack overflow)
        val parent = labels
        val mat =
          if ((iter + 1) % 5 == 0) next.localCheckpoint() else next.persist()
        labels = mat
        val s = labelSum() // materializes mat (reads the parent cache)
        // only NOW drop the parent: unpersisting before mat was
        // computed would force the join chain to re-derive it from
        // lineage, defeating the per-iteration cache entirely
        parent.unpersist()
        converged = s == prevSum
        prevSum = s
        iter += 1
      }
      // a cap exit with the sum still decreasing would silently emit
      // wrong canonical labels (components with diameter > maxIters) —
      // fail loudly instead of diverging from the exact oracle
      if (!converged)
        throw new IllegalStateException(
          s"label propagation not converged after $maxIters iterations")
      edges.unpersist()
      // min() marked lbl nullable though it never is (every id seeds
      // its own label); coalesce against the non-nullable id restores
      // the exact schema the driver union-find branch produces, so a
      // dataset crossing the size gate cannot change consumer schemas
      labels.select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
  }

  /** sim5 — embedding graph dedup: connected components over the
    * near-duplicate pair graph; every non-canonical member maps to its
    * component representative — the "drop these duplicates, keep one
    * per cluster" output of a training-data pipeline. Oracle: DuckDB
    * recursive CTE computing min reachable id per node. */
  /** The ONE recursive-components oracle shared by sim5 and sim5b —
    * the two gates must agree exactly (same pair graph, same labels),
    * so their oracle text is a single definition by construction. */
  private val componentsOracleSql: String =
    s"""WITH RECURSIVE $pairsSql,
      edges AS (SELECT a AS src, b AS dst FROM pairs
        UNION ALL SELECT b, a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      r(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, r.lbl FROM r JOIN edges e ON e.src = r.id)
      SELECT id AS vec_id, min(lbl) AS canonical FROM r
      GROUP BY id HAVING min(lbl) <> id ORDER BY vec_id"""

  private val graphDedupQ = GQ(
    "sim5_graph_dedup",
    (s, dir) =>
      components(nearDupPairs(s, dir).select("a", "b"))
        .filter(col("id") =!= col("lbl"))
        .select(col("id").as("vec_id"), col("lbl").as("canonical"))
        .orderBy("vec_id"),
    Some(componentsOracleSql))

  /** sim5b — the SAME graph dedup forced through the distributed
    * min-id label-propagation branch (the 100 TB path): the conf knob
    * zeroes the driver union-find size gate, so the gate's oracle
    * checks the branch that actually runs when the edge set no longer
    * fits one collect — not just the small-scale fast path. Oracle is
    * identical to sim5 (both branches must agree exactly). */
  private val graphDedupDistQ = GQ(
    "sim5b_graph_dedup_distributed",
    (s, dir) => {
      val k = "spark.graft.components.driverMaxEdges"
      val prev = s.conf.getOption(k)
      s.conf.set(k, "0")
      try
        components(nearDupPairs(s, dir).select("a", "b"))
          .filter(col("id") =!= col("lbl"))
          .select(col("id").as("vec_id"), col("lbl").as("canonical"))
          .orderBy("vec_id")
          // label propagation runs lazily at action time; materialize
          // inside the conf window so the branch choice is the forced
          // one, then return the (cached) result
          .localCheckpoint()
      finally prev match {
        case Some(v) => s.conf.set(k, v)
        case None => s.conf.unset(k)
      }
    },
    Some(componentsOracleSql))

  /** sim3's DuckDB oracle: the hyperplanes are fixed md5-derived ±1
    * constants, so bucket membership is fully SQL-expressible — the
    * oracle materializes the same coefficient arrays as SQL literals,
    * recomputes bucket + hamming-1 probes relationally, and exact-
    * scores the identical candidate set. The projection fold is the
    * same left-to-right double summation on both engines (see
    * [[graft.functions.VecFloatDot]]), so bucket signs agree bit-for-
    * bit and the ANN result stops being a "no oracle" hole. */
  private def annOracleSql: String = {
    val planes = (0 until AnnBits).map(j =>
      planeCoefs(j).map(c => if (c > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]"))
    val bucket = (0 until AnnBits).map { j =>
      s"""(CASE WHEN list_sum(list_transform(range(1, ${Dims + 1}),
         i -> CAST(embedding[i] AS DOUBLE) * (${planes(j)})[i])) >= 0
         THEN ${1L << j} ELSE 0 END)"""
    }.mkString(" + ")
    val probes = (Seq("bucket") ++
      (0 until AnnBits).map(j => s"xor(bucket, ${1L << j})"))
      .mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, embedding, $bucket AS bucket,
        ${normSql("embedding")} AS nrm FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
          unnest($probes) AS q_bucket FROM e WHERE vec_id < 20),
      scored AS (SELECT q_id, e.vec_id,
          round(${dotSql("q_emb", "embedding")} / (q_nrm * e.nrm), 9) AS cosine
        FROM q JOIN e ON e.bucket = q.q_bucket AND e.vec_id <> q.q_id),
      ranked AS (SELECT q_id, vec_id, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rank
        FROM scored)
      SELECT q_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked
      WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  /** sim3 — ANN top-5 via sign-LSH buckets with hamming-1 multiprobe.
    * Deterministic (fixed hyperplanes): the DuckDB oracle replicates
    * bucket + probe + exact rerank — see [[annOracleSql]]. */
  private val annQ = GQ(
    "sim3_ann_lsh_topk",
    (s, dir) => {
      val e = prepared(s, dir)
      val probes = (0 to AnnBits).map(j =>
        if (j == 0) col("bucket") else expr(s"bucket ^ ${1L << (j - 1)}"))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), explode(array(probes: _*)).as("q_bucket"))
      val scored = e.join(broadcast(q),
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .withColumn("cosine", cosineCol)
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "vec_id", "cosine", "rank")
        .orderBy("q_id", "rank")
    },
    Some(annOracleSql))

  /** sim4 — IVF ANN: Lloyd's k-means coarse quantizer, fully
    * deterministic and SQL-expressible so the result carries a real
    * DuckDB oracle (previously MLlib KMeans — seeded but not
    * replayable outside Spark, leaving a `no_oracle` hole):
    * - initial centroids = the embeddings of vec_id 0..k-1 (no RNG);
    * - a FIXED 3 Lloyd iterations; each assignment argmin uses
    *   squared distance via the dot identity d² = ⟨e,e⟩ − 2⟨e,c⟩ +
    *   ⟨c,c⟩, every dot the same strict left-to-right double fold on
    *   both engines ([[graft.functions.VecFloatDot]]), ties broken by
    *   centroid id — bit-identical argmin in Spark and DuckDB;
    * - new centroids are per-dimension means ROUNDED to 5 dp, so the
    *   one non-deterministic float op (summation order inside avg)
    *   is quantized away before it can influence the next iteration;
    * - empty clusters keep their previous centroid (coalesce).
    * Queries (vec_id < 20) probe their 2 nearest centroids
    * (nprobe=2) and exact-rerank candidates. The classic
    * inverted-file index: candidates per query ≈ 2N/k at scale, and
    * the partition-by-centroid layout is exactly how a 100 TB vector
    * corpus would be stored. Centroid sync per iteration is O(k)
    * driver-side — the same driver barrier every distributed k-means
    * (including MLlib's) pays; the data-plane work is k broadcast
    * rows against one scan of N per iteration, no N² anywhere. */
  private val ivfK = 16
  private val ivfIters = 3
  private val ivfCentRound = 5

  // --- IVF machinery shared by sim4 (batch build) and sim8
  // (incremental maintenance). Centroids live on the DRIVER (k = 16
  // doubles×64 — the O(k) sync every distributed k-means pays) and
  // are folded into the assignment as literal arrays: one codegen'd
  // projection per row computes all k distances and picks argmin via
  // array_sort on (d2, cid) structs — same (d2 ASC, cid ASC) total
  // order a crossJoin+window would produce, WITHOUT materializing k×N
  // rows or shuffling them through a window. cc (centroid self-dot)
  // is folded left-to-right on the driver — the exact IEEE op order
  // of graft_vec_dot and the oracle's list_sum, so distances stay
  // bit-identical to the relational replay.

  private def ivfSelfDot(c: Seq[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    acc
  }

  /** All-centroid (d2, cid) structs sorted ascending; expects `ee`
    * (self-dot) and `embedding` columns on the input row.
    *
    * The centroid table is ONE complex literal (`typedLit` of the
    * packed (cid, centroid, self-dot) array), not k×64 scalar
    * literals: the optimizer folds the scalar getFields (cid,
    * self-dot) back to inline literals, but the k centroid VECTORS
    * stay `references[n]` array objects — generated-code size is
    * k·O(1) instead of k·O(dims), which is what keeps the projection
    * compilable at production k (the old form emitted 64 literal
    * doubles per centroid: k=1024 would be a 65k-constant method).
    * The arithmetic ((ee - 2·dot) + cc, same fold order) is
    * unchanged, so distances stay bit-identical to the oracle
    * replay. */
  private def ivfSortedAssign(cents: Seq[(Int, Seq[Double])]): Column = {
    val dotFn = graft.functions.GraftFunctions.VecDotName
    val packed = typedLit(cents.map { case (cid, c) => (cid, c, ivfSelfDot(c)) })
    array_sort(array(cents.indices.map { i =>
      val x = element_at(packed, i + 1)
      struct(
        (col("ee") - lit(2.0) *
          call_function(dotFn, col("embedding"), x.getField("_2")) +
          x.getField("_3")).as("d2"),
        x.getField("_1").as("cid"))
    }: _*))
  }

  /** Fixed-iteration deterministic Lloyd's over `e` (needs `ee` and
    * `embedding`): each iteration is ONE aggregation job (groupBy
    * cid); means are rounded to [[ivfCentRound]] decimals so both
    * engines fold identically; empty clusters carry the previous
    * centroid (the oracle's coalesce). */
  private def ivfLloyds(
      e: DataFrame,
      init: Seq[(Int, Seq[Double])]): Seq[(Int, Seq[Double])] = {
    val meanCols = (1 to Dims).map(i =>
      round(avg(element_at(col("embedding"), i).cast("double")), ivfCentRound))
    var cents = init
    for (_ <- 1 to ivfIters) {
      val means: Map[Int, Seq[Double]] = e
        .withColumn("cid", element_at(ivfSortedAssign(cents), 1).getField("cid"))
        .groupBy("cid").agg(array(meanCols: _*).as("cent2"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cents = cents.map { case (cid, c) => cid -> means.getOrElse(cid, c) }
    }
    cents
  }

  private val ivfQ = GQ(
    "sim4_ann_ivf_topk",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .withColumn("nrm", expr(normExpr("embedding")))
        .withColumn("ee", expr(dotExpr("embedding", "embedding")))
        .persist()
      val init: Seq[(Int, Seq[Double])] =
        e.filter(col("vec_id") < ivfK)
          .select(col("vec_id").cast("int").as("cid"),
            expr(s"transform(embedding, x -> round(cast(x AS double), $ivfCentRound))")
              .as("cent"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
          .sortBy(_._1).toSeq
      val cents = ivfLloyds(e, init)
      val fin = e.withColumn("top2", slice(ivfSortedAssign(cents), 1, 2))
        .withColumn("cid", element_at(col("top2"), 1).getField("cid"))
      val assigned = fin.select("vec_id", "embedding", "nrm", "cid")
      val probes = fin.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"),
          explode(expr("transform(top2, t -> t.cid)")).as("q_cid"))
      val scored = assigned.join(broadcast(probes),
          col("cid") === col("q_cid") && col("vec_id") =!= col("q_id"))
        .withColumn("cosine", cosineCol)
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
      // e stays cached for the final (lazy) action — the harness
      // clears caches between queries; an eager unpersist here would
      // force the output job to recompute nrm/ee from parquet
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "vec_id", "cosine", "rank")
        .orderBy("q_id", "rank")
    },
    Some(ivfOracleSql))

  /** Shared Lloyd's-iteration CTE scaffolding for the sim4/sim6/sim8
    * DuckDB oracles — one aN (argmin assignment) + mN/cN (rounded
    * means with empty-cluster carry-over) chain per iteration,
    * parameterized by source relation, carried columns, vector
    * geometry, and the PQ per-subspace grouping key. The three
    * oracles previously carried near-copies of this scaffolding
    * (round-10 review); the emitted SQL is byte-identical to the
    * pre-refactor strings — pinned by md5 in SimilarityOraclesSpec,
    * since the driver hashes DuckDB results of the oracle TEXT. */
  private final class LloydScaffold(
      from: String, carry: String, vec: String, sq: String, dims: Int,
      dot: (String, String) => String, subspaced: Boolean = false) {
    // d² against centroid table alias c, embedding table alias e
    val d2: String =
      s"e.$sq - 2*${dot(s"e.$vec", "c.cent")} + ${dot("c.cent", "c.cent")}"
    private val meanList = (1 to dims)
      .map(i => s"round(avg(CAST($vec[$i] AS DOUBLE)), $ivfCentRound)")
      .mkString("[", ", ", "]")
    def assignCte(n: Int, cents: String): String =
      if (subspaced)
        s"""a$n AS (SELECT $carry, c.cid, $d2 AS d2,
          row_number() OVER (PARTITION BY e.vec_id, e.m
            ORDER BY $d2 ASC, c.cid ASC) AS rn
        FROM $from JOIN $cents c ON c.m = e.m)"""
      else
        s"""a$n AS (SELECT $carry, c.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY $d2 ASC, c.cid ASC) AS rn
        FROM $from, $cents c)"""
    private def updateCte(n: Int, prev: String): String =
      if (subspaced)
        s"""m$n AS (SELECT m, cid, $meanList AS cent2
          FROM a$n WHERE rn = 1 GROUP BY m, cid),
        c$n AS (SELECT p.m, p.cid, coalesce(m$n.cent2, p.cent) AS cent
          FROM $prev p LEFT JOIN m$n ON m$n.m = p.m AND m$n.cid = p.cid)"""
      else
        s"""m$n AS (SELECT cid, $meanList AS cent2
          FROM a$n WHERE rn = 1 GROUP BY cid),
        c$n AS (SELECT p.cid, coalesce(m$n.cent2, p.cent) AS cent
          FROM $prev p LEFT JOIN m$n USING (cid))"""
    def iters(count: Int): String = (1 to count).map { n =>
      val prev = if (n == 1) "c0" else s"c${n - 1}"
      assignCte(n, prev) + ",\n" + updateCte(n, prev)
    }.mkString(",\n")
  }

  /** sim4's DuckDB oracle: replays the identical fixed-seed Lloyd's
    * iterations relationally — every CTE pair (aN = argmin assignment,
    * cN = rounded means with empty-cluster carry-over) mirrors one
    * Spark iteration value-for-value (see [[ivfQ]] for why each step
    * is bit-reproducible across engines). */
  private def ivfOracleSql: String = {
    val dot = dotSql _
    val sc = new LloydScaffold("e", "e.vec_id, e.embedding, e.nrm",
      "embedding", "ee", Dims, dotSql)
    val iters = sc.iters(ivfIters)
    def assignCte(n: Int, cents: String) = sc.assignCte(n, cents)
    s"""WITH e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
          ${dot("embedding", "embedding")} AS ee FROM embeddings),
      c0 AS (SELECT CAST(vec_id AS INT) AS cid,
          list_transform(embedding, x -> round(CAST(x AS DOUBLE), $ivfCentRound)) AS cent
        FROM embeddings WHERE vec_id < $ivfK),
      $iters,
      ${assignCte(ivfIters + 1, s"c$ivfIters")},
      assigned AS (SELECT vec_id, embedding, nrm, cid
        FROM a${ivfIters + 1} WHERE rn = 1),
      probes AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, cid AS q_cid
        FROM a${ivfIters + 1} WHERE rn <= 2 AND vec_id < 20),
      scored AS (SELECT q_id, a.vec_id,
          round(${dot("q_emb", "a.embedding")} / (q_nrm * a.nrm), 9) AS cosine
        FROM probes q JOIN assigned a
          ON a.cid = q.q_cid AND a.vec_id <> q.q_id),
      ranked AS (SELECT q_id, vec_id, cosine,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rank
        FROM scored)
      SELECT q_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked
      WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  /** sim8 — incremental IVF maintenance: sim4's inverted-file index
    * as a MAINTAINED assignment table instead of a per-query rebuild,
    * the embedding-side analog of pipe4. Production vector indexes
    * train centroids ONCE on a bootstrap corpus and keep them fixed
    * while the corpus ingests; each increment assigns only the churn
    * (O(churn × k) codegen'd projections — never a corpus rescan, no
    * retrain barrier). The gate: seed vectors land in a lake table,
    * [[ivfLloyds]] trains on the seed, assignments upsert; a churn
    * commit (new vectors AND updated ones — elementwise negation, so
    * reassignment provably moves rows) is read INCREMENTALLY and only
    * those rows are re-assigned. The oracle replays seed-only
    * training relationally (same unrolled CTEs as sim4) and assigns
    * the FINAL corpus — so the maintained table must equal the batch
    * rebuild. */
  private val ivfIncQ = GQ(
    "sim8_incremental_ivf",
    (s, dir) => {
      import graft.core.{LakeTable, TableProps}
      graft.functions.GraftFunctions.register(s)
      def scr(name: String) = QueryPack.scratchDir(s, dir, name)
      def withEe(df: DataFrame): DataFrame =
        df.withColumn("ee", expr(dotExpr("embedding", "embedding")))
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val updMask = col("vec_id") % 3 =!= 0 && col("vec_id") % 5 === 0
      val seed = emb.filter(col("vec_id") % 3 =!= 0).withColumn("ts", lit(1L))
      val churn = emb.filter(col("vec_id") % 3 === 0)
        .unionByName(emb.filter(updMask)
          .withColumn("embedding", expr("transform(embedding, x -> -x)")))
        .withColumn("ts", lit(2L))
      val vecs = LakeTable.create(s, scr("sim8vecs"),
        TableProps("sim8vecs", Seq("vec_id"), Some("ts"), Seq.empty))
      val asgn = LakeTable.create(s, scr("sim8asgn"),
        TableProps("sim8asgn", Seq("vec_id"), Some("ts"), Seq.empty))

      // bootstrap: one-time centroid train on the seed + full assign.
      // The vecs-table loads and the train/assign chain write DISJOINT
      // tables and the training reads the `seed` relation directly —
      // overlap the two commit chains (QueryPack.overlapping); the
      // incremental read below joins on both
      val se = withEe(seed.select("vec_id", "embedding")).persist()
      try {
        val (c1, cents) = QueryPack.overlapping(
            Seq(vecs.basePath), Seq(asgn.basePath)) {
          val c1 = vecs.upsert(seed)
          vecs.upsert(churn)
          c1
        } {
          val init: Seq[(Int, Seq[Double])] =
            se.filter(col("vec_id") < ivfK * 3 / 2) // 16 seed ids under 24
              .select(col("vec_id").cast("int").as("cid"),
                expr(s"transform(embedding, x -> round(cast(x AS double), $ivfCentRound))")
                  .as("cent"))
              .collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
              .sortBy(_._1).toSeq
          val cents = ivfLloyds(se, init)
          asgn.upsert(se
            .withColumn("cid",
              element_at(ivfSortedAssign(cents), 1).getField("cid"))
            .select(col("vec_id"), col("cid"), lit(1L).as("ts")))
          cents
        }

        // increment: ONLY the churn is read and re-assigned; the
        // centroids are the fixed bootstrap ones
        val inc = withEe(vecs.incremental(c1).select("vec_id", "embedding"))
        asgn.upsert(inc
          .withColumn("cid",
            element_at(ivfSortedAssign(cents), 1).getField("cid"))
          .select(col("vec_id"), col("cid"), lit(2L).as("ts")))

        asgn.snapshot().select("vec_id", "cid").orderBy("vec_id")
      } finally se.unpersist()
    },
    Some(ivfIncOracleSql))

  /** sim8's DuckDB oracle: seed-only Lloyd's replay (identical CTE
    * shapes to [[ivfOracleSql]], sourced from the seed subset), then
    * one assignment pass over the FINAL corpus (churn inserts + the
    * negated updates applied). */
  private def ivfIncOracleSql: String = {
    val dot = dotSql _
    val sc = new LloydScaffold("es e", "e.vec_id, e.embedding",
      "embedding", "ee", Dims, dotSql)
    val iters = sc.iters(ivfIters)
    def d2 = sc.d2
    s"""WITH seedsrc AS (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id % 3 <> 0),
      es AS (SELECT vec_id, embedding,
          ${dot("embedding", "embedding")} AS ee FROM seedsrc),
      c0 AS (SELECT CAST(vec_id AS INT) AS cid,
          list_transform(embedding, x -> round(CAST(x AS DOUBLE), $ivfCentRound)) AS cent
        FROM seedsrc WHERE vec_id < ${ivfK * 3 / 2}),
      $iters,
      corpusf AS (SELECT vec_id,
          CASE WHEN vec_id % 3 <> 0 AND vec_id % 5 = 0
            THEN list_transform(embedding, x -> -x) ELSE embedding END AS embedding
        FROM embeddings),
      ef AS (SELECT vec_id, embedding,
          ${dot("embedding", "embedding")} AS ee FROM corpusf),
      fin AS (SELECT e.vec_id, c.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY $d2 ASC, c.cid ASC) AS rn
        FROM ef e, c$ivfIters c)
      SELECT vec_id, cid FROM fin WHERE rn = 1 ORDER BY vec_id"""
  }

  /** sim6 — product-quantization ANN (ADC): the compressed-index scale
    * path. 64 dims split into [[pqM]]=8 subspaces of 8; each subspace
    * gets its own [[pqK]]=16-code codebook (the same deterministic
    * rounded-mean Lloyd's as sim4, run per subspace in ONE grouped
    * plan — the subspace id is just a grouping key, not a loop). Every
    * vector is then 8 small codes — at 100 TB this is the difference
    * between storing/scanning 256 B of floats and 8 B of codes per
    * vector. Queries (vec_id < [[pqQn]]) score by asymmetric distance:
    * per-subspace query→centroid distance tables (broadcast — K×M
    * rows) joined to the codes, summed EXACTLY as DECIMAL(20,9) so the
    * 8-way sum is order-independent and bit-identical in DuckDB; top-5
    * by (approx d², vec_id). The oracle replays codebook training,
    * encoding, and ADC relationally — same unrolled-CTE technique as
    * sim4. */
  private val pqM = 8
  private val pqSubDims = Dims / pqM
  private val pqK = 16
  private val pqIters = 2
  private val pqQn = 20

  private val pqQ = GQ(
    "sim6_pq_adc_topk",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val subs = t(s, dir, "embeddings")
        .select(col("vec_id"), explode(expr(s"sequence(0, ${pqM - 1})")).as("m"),
          col("embedding"))
        .withColumn("sub", expr(s"slice(embedding, m * $pqSubDims + 1, $pqSubDims)"))
        .drop("embedding")
        .withColumn("ss", expr(dotExpr("sub", "sub")))
        .persist()
      var cents = subs.filter(col("vec_id") < pqK)
        .select(col("m"), col("vec_id").cast("int").as("cid"),
          expr(s"transform(sub, x -> round(cast(x AS double), $ivfCentRound))")
            .as("cent"))
      // all (vector-subspace) × (same-subspace centroid) distances with
      // the argmin rank; one broadcast join + window, every subspace at
      // once
      def assign(c: DataFrame): DataFrame =
        subs.join(broadcast(c.withColumn("cc", expr(dotExpr("cent", "cent")))),
            Seq("m"))
          .withColumn("d2",
            col("ss") - lit(2.0) * expr(dotExpr("sub", "cent")) + col("cc"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("vec_id"), col("m"))
              .orderBy(col("d2").asc, col("cid").asc)))
      for (_ <- 1 to pqIters) {
        val pts = assign(cents).filter(col("rn") === 1)
        val meanCols = (1 to pqSubDims).map(i =>
          round(avg(element_at(col("sub"), i).cast("double")), ivfCentRound))
        val means = pts.groupBy("m", "cid").agg(array(meanCols: _*).as("cent2"))
        cents = cents.join(means, Seq("m", "cid"), "left")
          .select(col("m"), col("cid"),
            coalesce(col("cent2"), col("cent")).as("cent"))
          .localCheckpoint()
      }
      val fin = assign(cents)
      val codes = fin.filter(col("rn") === 1).select("vec_id", "m", "cid")
      // asymmetric distance tables: EVERY (query, subspace, code)
      // distance, quantized to exact decimal before the 8-way sum
      val qd = fin.filter(col("vec_id") < pqQn)
        .select(col("vec_id").as("q_id"), col("m"), col("cid"),
          round(col("d2"), 9).cast("decimal(20,9)").as("qdist"))
      val adc = codes.join(broadcast(qd), Seq("m", "cid"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(sum("qdist").as("ad2x"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("ad2x").asc, col("vec_id").asc)
      val out = adc.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"),
          col("ad2x").cast("double").as("adc_d2"), col("rank"))
        .orderBy("q_id", "rank")
      subs.unpersist()
      out
    },
    Some(pqOracleSql))

  /** sim6's DuckDB oracle: identical subspace slicing, codebook
    * training (aN/cN CTE pairs = one Lloyd iteration, like sim4's
    * oracle but grouped by subspace), encoding, and decimal-exact ADC. */
  private def pqOracleSql: String = {
    def dot8(a: String, b: String) =
      s"list_sum(list_transform(range(1, ${pqSubDims + 1}), " +
        s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    val sc = new LloydScaffold("e", "e.vec_id, e.m, e.sub, e.ss",
      "sub", "ss", pqSubDims, dot8, subspaced = true)
    val iters = sc.iters(pqIters)
    def assignCte(n: Int, cents: String) = sc.assignCte(n, cents)
    val last = pqIters + 1
    s"""WITH es AS (SELECT vec_id, CAST(ms.m AS INT) AS m,
          list_slice(embedding, CAST(ms.m * $pqSubDims + 1 AS INT),
            CAST((ms.m + 1) * $pqSubDims AS INT)) AS sub
        FROM embeddings, (SELECT unnest(range(0, $pqM)) AS m) ms),
      e AS (SELECT vec_id, m, sub, ${dot8("sub", "sub")} AS ss FROM es),
      c0 AS (SELECT m, CAST(vec_id AS INT) AS cid,
          list_transform(sub, x -> round(CAST(x AS DOUBLE), $ivfCentRound)) AS cent
        FROM es WHERE vec_id < $pqK),
      $iters,
      ${assignCte(last, s"c$pqIters")},
      codes AS (SELECT vec_id, m, cid FROM a$last WHERE rn = 1),
      qd AS (SELECT vec_id AS q_id, m, cid,
          CAST(round(d2, 9) AS DECIMAL(20,9)) AS qdist
        FROM a$last WHERE vec_id < $pqQn),
      adc AS (SELECT q.q_id, codes.vec_id, sum(q.qdist) AS ad2x
        FROM codes JOIN qd q ON q.m = codes.m AND q.cid = codes.cid
          AND codes.vec_id <> q.q_id
        GROUP BY q.q_id, codes.vec_id),
      ranked AS (SELECT q_id, vec_id, CAST(ad2x AS DOUBLE) AS adc_d2,
          row_number() OVER (PARTITION BY q_id
            ORDER BY ad2x ASC, vec_id ASC) AS rank
        FROM adc)
      SELECT q_id, vec_id, adc_d2, CAST(rank AS INT) AS rank FROM ranked
      WHERE rank <= 5 ORDER BY q_id, rank"""
  }

  /** sim7 — matryoshka two-stage retrieval: a coarse pass scores
    * every vector with only its FIRST 16 dims (4× less arithmetic and
    * — with prefix-truncated storage — 4× less I/O per candidate, the
    * matryoshka-embedding property), keeps the top 50 per query, and
    * an exact 64-dim re-rank of those 50 yields the final top 10.
    * This is the production ANN shape that needs no index build at
    * all: one scan of N against broadcast queries, a per-query top-k,
    * then exact scoring of a constant-size candidate set. The oracle
    * replays both stages, so the gate checks the two-stage semantics
    * exactly (tcos ties at the 50-boundary break by vec_id in both
    * engines). Determinism: both scores rounded to 9 dp, vec_id
    * tie-breaks everywhere. */
  /** sim7's coarse-stage prefix width (shared by query and oracle). */
  private val MrTd = 16

  private val mrQ = GQ(
    "sim7_matryoshka_rerank",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val Td = MrTd
      val e = t(s, dir, "embeddings")
        .withColumn("e16", expr(s"slice(embedding, 1, $Td)"))
        .withColumn("nrm", expr(normExpr("embedding")))
        .withColumn("nrm16", expr(normExpr("e16")))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("e16").as("q_e16"), col("nrm").as("q_nrm"),
          col("nrm16").as("q_nrm16"))
      val coarse = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("tcos", round(
          expr(dotExpr("q_e16", "e16")) / (col("q_nrm16") * col("nrm16")), 9))
      val wc = Window.partitionBy(col("q_id"))
        .orderBy(col("tcos").desc, col("vec_id").asc)
      val cand = coarse.withColumn("crank", row_number().over(wc))
        .filter(col("crank") <= 50)
      val wf = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
      cand.withColumn("cosine", cosineCol)
        .withColumn("rank", row_number().over(wf))
        .filter(col("rank") <= 10)
        .select("q_id", "vec_id", "tcos", "cosine", "rank")
        .orderBy("q_id", "rank")
    },
    Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        FROM embeddings WHERE vec_id < 5),
      coarse AS (SELECT q_id, vec_id, q_emb, embedding,
          round(${dotPrefixSql("q_emb", "embedding", MrTd)} /
            (sqrt(${dotPrefixSql("q_emb", "q_emb", MrTd)}) *
             sqrt(${dotPrefixSql("embedding", "embedding", MrTd)})), 9) AS tcos
        FROM embeddings, q WHERE vec_id <> q_id),
      cand AS (SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY tcos DESC, vec_id ASC) AS crank
        FROM coarse),
      fine AS (SELECT q_id, vec_id, tcos,
          round(${dotSql("q_emb", "embedding")} /
            (${normSql("q_emb")} * ${normSql("embedding")}), 9) AS cosine
        FROM cand WHERE crank <= 50),
      r AS (SELECT q_id, vec_id, tcos, cosine,
          row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS rank
        FROM fine)
      SELECT q_id, vec_id, tcos, cosine, CAST(rank AS INT) AS rank FROM r
      WHERE rank <= 10 ORDER BY q_id, rank"""))

  /** pipe5 — SEMANTIC dedup (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the SAME
    * deterministic fixed-seed Lloyd's as sim4, compute cosine
    * near-duplicate pairs ONLY within each cluster (the clusters ARE
    * the blocking structure — no corpus × corpus join anywhere), close
    * the pairs into components, and from each component keep the
    * member FARTHEST from its cluster centroid (the paper's keep-rule:
    * low centroid-similarity examples are the least redundant), ties
    * by vec_id. Scale shape: assignment is the O(N·k) codegen'd
    * packed-literal projection; the pairwise stage shuffles by cid and
    * is bounded by cluster occupancy — a deployment scales k with
    * corpus size exactly as the paper does (50k clusters for LAION) to
    * hold per-cluster cost constant; components are the size-gated
    * [[components]]. The oracle replays Lloyd's relationally (sim4's
    * unrolled CTEs over the injected-copy corpus), so cluster-scoped
    * recall is checked EXACTLY, not against brute force. */
  private val semDedupQ = GQ(
    "pipe5_semantic_dedup",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e0 = t(s, dir, "embeddings").select("vec_id", "embedding")
      val corpus = e0.unionByName(e0.filter(col("vec_id") % 9 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L))
      val e = corpus
        .withColumn("nrm", expr(normExpr("embedding")))
        .withColumn("ee", expr(dotExpr("embedding", "embedding")))
        .persist()
      val init: Seq[(Int, Seq[Double])] =
        e.filter(col("vec_id") < ivfK)
          .select(col("vec_id").cast("int").as("cid"),
            expr(s"transform(embedding, x -> round(cast(x AS double), $ivfCentRound))")
              .as("cent"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
          .sortBy(_._1).toSeq
      val cents = ivfLloyds(e, init)
      // d2r rides along: the keep-rule ranks on distance-to-centroid,
      // so the assignment projection is the ONLY pass that touches
      // centroids (rounded to 9 dp — both engines rank identically)
      val assigned = e.withColumn("a1", element_at(ivfSortedAssign(cents), 1))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("a1").getField("cid").as("cid"),
          round(col("a1").getField("d2"), 9).as("d2r"))
        .persist()
      val pairs = assigned.as("x").join(assigned.as("y"),
          col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
        .filter(round(expr(dotExpr("x.embedding", "y.embedding")) /
          (col("x.nrm") * col("y.nrm")), 9) >= 0.999)
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      val comp = components(pairs)
      val members = comp.join(assigned, col("id") === col("vec_id"))
      val w = Window.partitionBy(col("lbl"))
        .orderBy(col("d2r").desc, col("vec_id").asc)
      val ranked = members.withColumn("rn", row_number().over(w))
      val kept = ranked.filter(col("rn") === 1)
        .select(col("lbl"), col("vec_id").as("kept_id"))
      ranked.filter(col("rn") > 1)
        .select(col("lbl"), col("vec_id").as("dropped_id"))
        .join(kept, "lbl")
        .select("dropped_id", "kept_id")
        .orderBy("dropped_id")
    },
    Some(semDedupOracleSql))

  /** pipe5's oracle: sim4's unrolled Lloyd's CTEs over the
    * injected-copy corpus, then within-cluster pairs, recursive
    * components, and the farthest-from-centroid keep-rule. */
  private def semDedupOracleSql: String = {
    val dot = dotSql _
    def d2 = s"e.ee - 2*${dot("e.embedding", "c.cent")} + ${dot("c.cent", "c.cent")}"
    def assignCte(n: Int, cents: String) =
      s"""a$n AS (SELECT e.vec_id, e.embedding, e.nrm, c.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY $d2 ASC, c.cid ASC) AS rn
        FROM e, $cents c)"""
    val meanList = (1 to Dims)
      .map(i => s"round(avg(CAST(embedding[$i] AS DOUBLE)), $ivfCentRound)")
      .mkString("[", ", ", "]")
    def updateCte(n: Int, prev: String) =
      s"""m$n AS (SELECT cid, $meanList AS cent2
          FROM a$n WHERE rn = 1 GROUP BY cid),
        c$n AS (SELECT p.cid, coalesce(m$n.cent2, p.cent) AS cent
          FROM $prev p LEFT JOIN m$n USING (cid))"""
    val iters = (1 to ivfIters).map { n =>
      val prev = if (n == 1) "c0" else s"c${n - 1}"
      assignCte(n, prev) + ",\n" + updateCte(n, prev)
    }.mkString(",\n")
    s"""WITH RECURSIVE corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL SELECT vec_id + 1000000, embedding
          FROM embeddings WHERE vec_id % 9 = 0),
      e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
          ${dot("embedding", "embedding")} AS ee FROM corpus),
      c0 AS (SELECT CAST(vec_id AS INT) AS cid,
          list_transform(embedding, x -> round(CAST(x AS DOUBLE), $ivfCentRound)) AS cent
        FROM corpus WHERE vec_id < $ivfK),
      $iters,
      af AS (SELECT vec_id, embedding, nrm, cid, d2r FROM (
          SELECT e.vec_id, e.embedding, e.nrm, c.cid, round($d2, 9) AS d2r,
            row_number() OVER (PARTITION BY e.vec_id ORDER BY $d2 ASC, c.cid ASC) AS rn
          FROM e, c$ivfIters c) WHERE rn = 1),
      p AS (SELECT x.vec_id AS a, y.vec_id AS b
        FROM af x JOIN af y ON x.cid = y.cid AND x.vec_id < y.vec_id
        WHERE round(${dot("x.embedding", "y.embedding")} /
          (x.nrm * y.nrm), 9) >= 0.999),
      edges AS (SELECT a AS src, b AS dst FROM p
        UNION ALL SELECT b, a FROM p),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      r(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e2.dst, r.lbl FROM r JOIN edges e2 ON e2.src = r.id),
      comp AS (SELECT id, min(lbl) AS lbl FROM r GROUP BY id),
      ranked AS (SELECT comp.lbl, af.vec_id, af.d2r,
          row_number() OVER (PARTITION BY comp.lbl
            ORDER BY af.d2r DESC, af.vec_id ASC) AS rn
        FROM comp JOIN af ON af.vec_id = comp.id),
      keep AS (SELECT lbl, vec_id AS kept_id FROM ranked WHERE rn = 1)
      SELECT d.vec_id AS dropped_id, keep.kept_id
      FROM ranked d JOIN keep USING (lbl) WHERE d.rn > 1
      ORDER BY dropped_id"""
  }

  def qs: Seq[GQ] =
    Seq(topkQ, nearDupQ, annQ, ivfQ, ivfIncQ, graphDedupQ, graphDedupDistQ,
      pqQ, mrQ, semDedupQ)
}
