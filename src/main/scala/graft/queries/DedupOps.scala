package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Deduplication operators for LLM-data pipelines over `documents`:
  * exact (hash-groupBy), MinHash+LSH banded near-dup, SimHash
  * near-dup, and exact n-gram Jaccard with source blocking.
  *
  * The synthetic corpus has no duplicates, so each query first injects
  * deterministic ones derivable in SQL: every doc_id % 11 == 0 gets an
  * exact copy (+2e6 id), every doc_id % 7 == 0 a near-copy with three
  * appended tokens (+1e6 id). Oracles rebuild the same corpus and,
  * for the approximate operators, brute-force the same similarity —
  * so the gate also checks that LSH/SimHash blocking reaches full
  * recall on this data (verified; the exact-similarity post-filter
  * makes precision exact by construction).
  *
  * Portability: shingle/word hashes are 48/32-bit integers parsed from
  * an md5 prefix — identical in Spark (`conv(hex,16,10)`) and DuckDB
  * (`CAST('0x'||hex AS BIGINT)`). No engine-specific hash functions.
  *
  * Scale: everything is join/groupBy shaped — shingle explode, 32 min()
  * partial aggregations, band-key self-join (bucket sizes bounded by
  * the banding scheme), intersection counted only for candidate pairs.
  * No driver-side loops; no cross join anywhere in the Spark plans.
  */
object DedupOps {

  private val P = 1000000007L
  private val NumHashes = 32
  private val Bands = 16 // × 2 rows per band
  private def hashA(i: Int): Long = (1103515245L * (i + 1)) % P
  private def hashB(i: Int): Long = (12345L + 999331L * i) % P

  // ------------------------------------------------------------- corpus

  private[graft] def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"), col("source"))
    d.unionByName(d.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", concat(col("text"), lit(" extra token appended"))))
      .unionByName(d.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 2000000L))
  }

  private[queries] val corpusSql =
    """corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL SELECT doc_id + 1000000, text || ' extra token appended', source
        FROM documents WHERE doc_id % 7 = 0
      UNION ALL SELECT doc_id + 2000000, text, source
        FROM documents WHERE doc_id % 11 = 0)"""

  /** Word n-gram shingles (Spark side), distinct per doc. Dedup runs
    * INSIDE the row via array_distinct before the explode — set
    * semantics per doc without a relation-wide distinct() shuffle
    * (the exploded relation is the largest intermediate in every
    * shingle query; shuffling it once cost more than the rest of
    * dedup4 combined). */
  /** In-row word n-gram array over a tokens array column `w` (WITH
    * duplicates — wrap in array_distinct for set semantics). The ONE
    * Spark-side shingle constructor; [[shingles]] and the sketch
    * queries both build on it so tokenization can never drift. */
  private[graft] def shingleArrExpr(n: Int): String = {
    val grams = (0 until n).map(k => s"element_at(w, i + $k)").mkString(", ")
    s"case when size(w) >= $n then transform(sequence(1, size(w) - ${n - 1}), " +
      s"i -> concat_ws(' ', $grams)) else array() end"
  }

  /** DuckDB mirror of [[shingleArrExpr]] (same guard semantics:
    * `range` is end-exclusive and empty when len(w) < n). */
  private[graft] def shingleArrSql(n: Int): String = {
    val grams = (0 until n).map(k => s"w[i + $k]").mkString(" || ' ' || ")
    s"list_transform(range(1, len(w) - ${n - 2}), i -> $grams)"
  }

  private[graft] def shingles(
      df: DataFrame, n: Int, outer: Boolean = false): DataFrame = {
    val arr = expr(s"array_distinct(${shingleArrExpr(n)})")
    df.withColumn("w", expr("split(lower(trim(text)), '\\\\s+')"))
      // outer keeps a doc too short to shingle as one null-sh row —
      // signature builds need it so a shrunken doc still OVERWRITES
      // its stored signature
      .withColumn("sh", if (outer) explode_outer(arr) else explode(arr))
      .select(col("doc_id"), col("sh"))
  }

  /** Same shingling in DuckDB (a `${name}` relation over `$rel` —
    * defaults give the historical "sh over corpus"). */
  private[queries] def shinglesSql(
      n: Int, rel: String = "corpus", name: String = "sh"): String =
    s"""$name AS (
      SELECT doc_id, unnest(list_distinct(${shingleArrSql(n)})) AS sh
      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
            FROM $rel))"""

  /** Exact Jaccard over the distinct-shingle relation for given pairs.
    * jaccard = |∩| / (|A| + |B| - |∩|): one double division of exact
    * integers — bit-identical in both engines. */

  // ------------------------------------------------------------ queries

  /** dedup1 — exact duplicate groups by content hash. */
  private val exactQ = GQ(
    "dedup1_exact",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = corpus(s, dir)
        .withColumn("fp", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      val w = Window.partitionBy(col("fp"))
      c.withColumn("group_size", count(lit(1)).over(w))
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .filter(col("group_size") > 1)
        .select("doc_id", "canonical_id", "group_size")
        .orderBy("doc_id")
    },
    Some(s"""WITH $corpusSql,
      g AS (SELECT doc_id,
          count(*) OVER (PARTITION BY fp) AS group_size,
          min(doc_id) OVER (PARTITION BY fp) AS canonical_id
        FROM (SELECT doc_id,
            md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
          FROM corpus))
      SELECT doc_id, canonical_id, group_size FROM g
      WHERE group_size > 1 ORDER BY doc_id"""))

  /** MinHash signatures of a (doc_id, text) relation, PACKED as one
    * row per doc with the 16 LSH band keys in an array column plus
    * the shingle-set fingerprint `fp` (the skew-collapse group key) —
    * the storable shape: a signature store keyed by doc_id makes doc
    * updates plain upserts (no stale-band bookkeeping), and candidate
    * generation is just an explode + band-key equi-join over group
    * representatives. One scan→split→explode→groupBy per call; no
    * shuffle before the signature aggregation.
    *
    * EVERY input doc gets an output row: a text too short to shingle
    * yields an EMPTY band array (explode_outer keeps the doc through
    * the aggregation; its all-null min-hashes mark the degenerate
    * case) — so a signature store fed from this can never hold a
    * STALE signature for a doc whose text shrank below one shingle. */
  private[graft] def minhashBands(docs: DataFrame): DataFrame = {
    // explode → 32-min hash aggregate, NOT an in-row
    // array_min(transform(...)) per permutation: the in-row form's 32
    // references to the shingle-array expression substitute through
    // downstream projections into a plan-size blowup (measured: OOM at
    // optimization time once `bands` is re-referenced by the candidate
    // join), while the aggregate keeps every expression tree O(1) and
    // the map-side partial aggregation keeps the shuffle at one row
    // per (doc, 32 mins). Tokenization is the SAME shingles() the
    // exact-Jaccard verifier uses — candidate recall depends on the
    // two staying bit-identical.
    val sh = shingles(docs, 3, outer = true)
    val hashed = sh.withColumn("x",
      conv(substring(md5(col("sh")), 1, 12), 16, 10).cast("long") % P)
    // fp: order-independent fingerprint of the doc's distinct shingle
    // HASH set (sorted, comma-joined, md5) — the exact-duplicate
    // group key the skew collapse groups on: equal shingle sets ⟹
    // equal fp ⟹ jaccard exactly 1 against each other and equal
    // jaccard against any third doc, so one representative can stand
    // for the whole group in every band join. Computed on the hashes
    // (LONGs) rather than the shingle strings so the sort order is
    // engine-portable (integer sort, no collation).
    val fpAgg = md5(array_join(
      transform(array_sort(collect_set(col("x"))), _.cast("string")),
      ",")).as("fp0")
    val sigs = hashed.groupBy("doc_id")
      .agg(sigAggs(0), sigAggs.drop(1) :+ fpAgg: _*)
    val bandKeys = (0 until Bands).map(b =>
      concat_ws(":", lit(b), col(s"h${2 * b}"), col(s"h${2 * b + 1}")))
    sigs.select(col("doc_id"),
      when(col("h0").isNotNull, array(bandKeys: _*))
        .otherwise(array().cast("array<string>")).as("bands"),
      // a doc too short to shingle fingerprints NULL: it can never
      // star-group (two shingle-less docs are NOT jaccard-1 pairs)
      when(col("h0").isNotNull, col("fp0"))
        .otherwise(lit(null).cast("string")).as("fp"))
  }

  private def sigAggs: Seq[Column] = (0 until NumHashes).map(i =>
    min((lit(hashA(i)) * col("x") + lit(hashB(i))) % P).as(s"h$i"))

  /** Exact-Jaccard (word 3-gram, ≥ 0.5) verification of candidate
    * (a, b) pairs against the doc texts in `docs` — the caller decides
    * how much of the corpus to re-shingle (the full relation for a
    * batch build; a candidate-pruned slice for incremental passes).
    * Per-doc shingle SET as one array row (same pattern as dedup5):
    * candidate pairs attach two arrays and intersect in-line instead
    * of re-joining the exploded relation — AQE broadcasts the small
    * doc-array side; at corpus scale it degrades to a doc_id-keyed
    * shuffle join, still O(candidates). */
  private[graft] def verifyJaccard(
      cand: DataFrame, docs: DataFrame,
      cache: Option[DataFrame => DataFrame] = None): DataFrame = {
    // Two doc-set builds, chosen by whether the caller MATERIALIZES:
    // - incremental callers (Some(registrar)): candidate-pruned docs,
    //   persisted once by the registrar and unpersisted by that
    //   caller's cleanup — build the per-doc shingle SET IN-ROW
    //   (array_distinct over the n-gram transform), a narrow
    //   projection with no explode+groupBy shuffle. Same elements as
    //   the exploded+collected form (shingleArrExpr is the ONE
    //   tokenizer), only array order differs — array_intersect and
    //   size() are order-blind. A doc too short to shingle keeps an
    //   EMPTY set row: its pairs compute 0/0 = NaN and fail the
    //   threshold, same outcome as the exploded form's inner-join drop.
    // - batch callers (None): the full corpus, NOT materialized — the
    //   exploded groupBy form, whose aggregation exchange Spark
    //   computes once and REUSES for both join sides below. The in-row
    //   form here would re-run the heavy split/concat string work per
    //   join side with no exchange to reuse: measured 2.3 s → 9.4 s on
    //   dedup2/pipe2/split2 at sf0.1.
    val docSets = cache match {
      case Some(reg) =>
        reg(docs
          .withColumn("w", expr("split(lower(trim(text)), '\\\\s+')"))
          .withColumn("shs", expr(s"array_distinct(${shingleArrExpr(3)})"))
          .select(col("doc_id"), col("shs"),
            size(col("shs")).cast("long").as("sz")))
      case None =>
        shingles(docs, 3).groupBy("doc_id").agg(
          collect_list(col("sh")).as("shs"), count(lit(1)).as("sz"))
    }
    cand
      .join(docSets.as("za"), col("a") === col("za.doc_id"))
      .join(docSets.as("zb"), col("b") === col("zb.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("za.shs"), col("zb.shs"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("za.sz") + col("zb.sz") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select("a", "b", "jaccard")
  }

  /** MinHash (32 perms) + LSH (16 bands × 2 rows) candidate
    * generation, exact-Jaccard (word 3-gram) post-filter at 0.5 —
    * the body of dedup2, shared with pipe2's canonical selection.
    * SKEW-COLLAPSED like [[graft.queries.MultimodalOps.pairsFromSigs]]:
    * docs with byte-equal shingle sets (fp) group to a min-doc_id
    * representative; a cluster of k exact copies — the boilerplate
    * shape a 100 TB corpus carries at k = 10⁵⁺ — emits k-1 STAR
    * edges (rep, member, jaccard 1.0) instead of O(k²) band-join
    * candidates, verify joins, and output rows. Cross-group
    * candidates band-join representatives only and verify once per
    * group pair; equal-set members share every jaccard, so component
    * structure and canonical selection downstream are provably
    * unchanged. Returns (a, b, jaccard) pairs, unordered; jaccard =
    * 1.0 rows are exactly the star edges (jaccard 1 ⟺ equal sets). */
  private[queries] def minhashPairs(s: SparkSession, dir: String): DataFrame = {
      // the shingle relation feeds both the signature and verification
      // branches; it is a narrow scan→split→explode pipeline (per-doc
      // array_distinct, no shuffle), so re-deriving it per consumer is
      // cheaper than a cache round-trip. The collapse attaches each
      // doc's group rep with ONE window shuffle on fp; star edges and
      // the rep frame derive from it FILTER-ONLY, so both consumers
      // share the identical exchange subtree and the heavy
      // shingle+minhash lineage under it runs once (ReusedExchange).
      // No collect_list member array: a k-member cluster is k window
      // rows — sorted, spillable — never one k-element aggregation
      // buffer cell (the k = 10⁶⁺ boilerplate ceiling).
      val c = corpus(s, dir)
      val byFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      val withRep = minhashBands(c).filter(col("fp").isNotNull)
        .withColumn("rep", min("doc_id").over(byFp))
      val star = withRep.filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("a"), col("doc_id").as("b"),
          lit(1.0).as("jaccard"))
      val bands = withRep.filter(col("doc_id") === col("rep"))
        .select(col("doc_id"), explode(col("bands")).as("bk"))
      val cand = bands.as("l").join(bands.as("r"),
          col("l.bk") === col("r.bk") && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
      star.unionByName(verifyJaccard(cand, c))
  }

  /** Skew-collapsed verified-pair CTEs (`pairs` = (a, b, jaccard)) —
    * the ONE definition dedup2's, pipe4's, and the canonical gates'
    * oracles build on, so a threshold, shingle-width, or collapse
    * change cannot split them. The DuckDB replay of
    * [[minhashPairs]]'s contract: group byte-equal shingle sets (fp
    * over the portable 48-bit shingle hashes — integer sort, no
    * collation dependence) to a min-doc_id representative, emit star
    * edges (rep, member, 1.0) inside each group, and brute-force
    * exact Jaccard ≥ 0.5 over REPRESENTATIVES for the cross pairs —
    * a banding recall loss on the Spark side still hash-mismatches.
    * Callers prepend `corpusSql`. */
  private[queries] def pairsCteSql: String = collapsedTextPairCtes()

  /** The same collapsed text-pair chain over an arbitrary
    * (doc_id, text) CTE `$rel`, CTE names prefixed with `$p` — so a
    * joint gate (pipe9's maintained text arm) can replay the contract
    * over its own masked corpus in the same WITH as the media chains.
    * The verified pair set lands in `${p}pairs`. */
  private[queries] def collapsedTextPairCtes(
      rel: String = "corpus", p: String = ""): String =
    s"""${shinglesSql(3, rel, s"${p}sh")},
      ${p}sz AS (SELECT doc_id, count(*) AS sz FROM ${p}sh
        GROUP BY doc_id),
      ${p}pfp AS (SELECT doc_id,
          md5(array_to_string(list_sort(list(DISTINCT
            CAST('0x' || substr(md5(sh), 1, 12) AS BIGINT) % $P)), ','))
            AS fp
        FROM ${p}sh GROUP BY doc_id),
      ${p}prep AS (SELECT fp, MIN(doc_id) AS rep FROM ${p}pfp
        GROUP BY fp),
      ${p}shr AS (SELECT s.doc_id, s.sh
        FROM ${p}sh s JOIN ${p}prep pr ON s.doc_id = pr.rep),
      ${p}inter AS (SELECT a.doc_id AS a, b.doc_id AS b,
          count(*) AS inter
        FROM ${p}shr a JOIN ${p}shr b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      ${p}pairs AS (
        SELECT pr.rep AS a, f.doc_id AS b, CAST(1 AS DOUBLE) AS jaccard
        FROM ${p}pfp f JOIN ${p}prep pr USING (fp)
        WHERE f.doc_id <> pr.rep
        UNION ALL
        SELECT a, b,
          CAST(inter AS DOUBLE) / CAST(za.sz + zb.sz - inter AS DOUBLE)
            AS jaccard
        FROM ${p}inter
        JOIN ${p}sz za ON a = za.doc_id
        JOIN ${p}sz zb ON b = zb.doc_id
        WHERE CAST(inter AS DOUBLE) / CAST(za.sz + zb.sz - inter AS DOUBLE)
          >= 0.5)"""

  /** dedup2 — MinHash (32 perms) + LSH (16 bands × 2 rows) candidate
    * generation, exact-Jaccard (word 3-gram) post-filter at 0.5. */
  private val minhashQ = GQ(
    "dedup2_minhash_lsh",
    (s, dir) => minhashPairs(s, dir).orderBy("a", "b"),
    Some(s"""WITH $corpusSql,
      $pairsCteSql
      SELECT a, b, jaccard FROM pairs ORDER BY a, b"""))

  /** dedup3 — 32-bit SimHash over word bigrams, SKEW-COLLAPSED like
    * every other near-dup generator (equal simhash values — exactly
    * the hamming-0 pairs — group to a min-id rep with k-1 star
    * edges); cross candidates come from TWO-LEVEL block keys over
    * representatives: an equal 8-bit block (pigeonhole: hamming ≤ 3 ⇒
    * ≥ 1 of 4 equal) implies the complement 24 bits still carry all
    * ≤ 3 errors, so ≥ 1 of their four 6-bit sub-blocks is also equal
    * — 4·256·4·64 ≈ 262k distinct keys instead of 1,024, the same
    * bucket-density fix the 64-bit perceptual banding got when the
    * sf10 scaling curve exposed quadratic candidate growth. Verified
    * by exact hamming distance; the brute-force oracle replays the
    * collapsed contract. */
  private val simhashBits = 32
  private val simhashQ = {
    val bitSumsSpark = (0 until simhashBits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j"))
    val simhashSpark = (0 until simhashBits).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val bitSumsSql = (0 until simhashBits).map(j =>
      s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n          ")
    val simhashSql = (0 until simhashBits).map(j =>
      s"CASE WHEN b$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    GQ(
      "dedup3_simhash",
      (s, dir) => {
        val sh = shingles(corpus(s, dir), 2)
          .withColumn("h", conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long"))
        val sums = sh.groupBy("doc_id").agg(bitSumsSpark.head, bitSumsSpark.tail: _*)
        val sig = sums.select(col("doc_id"), simhashSpark.as("simhash"))
        // ONE window shuffle attaches each doc's group rep; star and
        // the rep frame are filter-only consumers of the identical
        // exchange subtree (see pairsFromSigs), so the shingle+simhash
        // lineage runs once and no aggregation buffer ever holds a
        // whole group's member array
        val withRep = sig.withColumn("rep", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("simhash")))
        val star = withRep.filter(col("doc_id") =!= col("rep"))
          .select(col("rep").as("a"), col("doc_id").as("b"),
            lit(0).as("hamming"))
        val reps = withRep.filter(col("doc_id") === col("rep"))
          .select("doc_id", "simhash")
        val keys = for (k <- 0 until 4; j <- 0 until 4) yield {
          val block = shiftright(col("simhash"), 8 * k)
            .bitwiseAND(lit(255L))
          val low =
            if (k == 0) lit(0L)
            else col("simhash").bitwiseAND(lit((1L << (8 * k)) - 1))
          val high =
            if (k == 3) lit(0L)
            else shiftleft(shiftright(col("simhash"), 8 * (k + 1)), 8 * k)
          val sub = shiftright(low.bitwiseOR(high), 6 * j)
            .bitwiseAND(lit(63L))
          // one packed long per key (see MultimodalOps.banded): no
          // per-key string allocation in the explode or the shuffle
          (lit((k * 4 + j).toLong * 256L) + block) * lit(64L) + sub
        }
        val blocks = reps.select(col("doc_id"), col("simhash"),
          explode(array(keys: _*)).as("blk"))
        val cross = blocks.as("l").join(blocks.as("r"),
            col("l.blk") === col("r.blk") && col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
            expr("bit_count(l.simhash ^ r.simhash)").cast("int")
              .as("hamming"))
          .filter(col("hamming") <= 3) // before distinct: multi-key dups
          .distinct()
        star.unionByName(cross).orderBy("a", "b")
      },
      Some(s"""WITH $corpusSql,
        ${shinglesSql(2)},
        hh AS (SELECT doc_id, CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h FROM sh),
        sums AS (SELECT doc_id,
          $bitSumsSql
          FROM hh GROUP BY doc_id),
        sig AS (SELECT doc_id, $simhashSql AS simhash FROM sums),
        dgrp AS (SELECT doc_id, simhash,
            MIN(doc_id) OVER (PARTITION BY simhash) AS rep FROM sig),
        dreps AS (SELECT simhash, MIN(doc_id) AS rep FROM sig
          GROUP BY simhash)
        SELECT a, b, hamming FROM (
          SELECT rep AS a, doc_id AS b, CAST(0 AS INT) AS hamming
          FROM dgrp WHERE doc_id <> rep
          UNION ALL
          SELECT x.rep AS a, y.rep AS b,
            CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
          FROM dreps x JOIN dreps y ON x.rep < y.rep
          WHERE bit_count(xor(x.simhash, y.simhash)) <= 3)
        ORDER BY a, b"""))
  }

  /** Per-doc frame of a blocked shingle relation `(doc_id, sh,
    * source, blk)`: size, the byte-equal-set fingerprint `fp` (md5 of
    * the SORTED md5-per-shingle list — per-element hashing keeps the
    * join unambiguous under any separator; hex sorts identically
    * everywhere), and the group representative `rep` = min doc_id
    * over (source, blk, fp). The window runs on the per-doc frame —
    * one row per doc, never a per-group member array, so a k = 10⁶⁺
    * boilerplate cluster costs k window rows instead of one k-element
    * aggregation buffer. Shared by dedup4 and dedup5 so their
    * collapse groups cannot drift (they share one oracle). */
  private def blockedDocFrame(sh: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sh.groupBy("doc_id", "source", "blk")
      .agg(count(lit(1)).as("sz"),
        md5(array_join(array_sort(collect_list(md5(col("sh")))), ","))
          .as("fp"))
      .withColumn("rep", min("doc_id").over(
        Window.partitionBy("source", "blk", "fp")))
  }

  /** The collapsed blocked-pair oracle dedup4 AND dedup5 share: the
    * DuckDB replay of the (source, blk, fp) group contract — star
    * edges (rep, member, 1.0) inside byte-equal shingle-set groups,
    * the |Δblk| ≤ 1 probe join over REPRESENTATIVES only, exact
    * Jaccard ≥ 0.3 on the cross pairs. */
  private def blockedPairSql: String =
    s"""WITH $corpusSql,
      ${shinglesSql(2)},
      shs AS (SELECT sh.doc_id, sh.sh, c.source,
          CAST(floor(length(c.text) / $ngramBlock) AS BIGINT) AS blk
        FROM sh JOIN corpus c ON sh.doc_id = c.doc_id),
      dfp AS (SELECT doc_id, source, blk, count(*) AS sz,
          md5(array_to_string(list_sort(list(md5(sh))), ',')) AS fp
        FROM shs GROUP BY doc_id, source, blk),
      grp AS (SELECT doc_id, source, blk, sz, fp,
          MIN(doc_id) OVER (PARTITION BY source, blk, fp) AS rep
        FROM dfp),
      shr AS (SELECT s.doc_id, s.sh, s.source, s.blk
        FROM shs s JOIN grp g ON s.doc_id = g.doc_id AND g.doc_id = g.rep),
      probes AS (SELECT doc_id, sh, source, blk,
          unnest([blk, blk + 1]) AS probe FROM shr),
      inter AS (SELECT least(a.doc_id, b.doc_id) AS a,
          greatest(a.doc_id, b.doc_id) AS b, count(*) AS inter
        FROM probes a JOIN shr b
          ON a.sh = b.sh AND a.source = b.source AND a.probe = b.blk
          AND (a.blk < b.blk OR (a.blk = b.blk AND a.doc_id < b.doc_id))
        GROUP BY a.doc_id, b.doc_id)
      SELECT a, b, jaccard FROM (
        SELECT rep AS a, doc_id AS b, CAST(1 AS DOUBLE) AS jaccard
        FROM grp WHERE doc_id <> rep
        UNION ALL
        SELECT a, b,
          CAST(inter AS DOUBLE) / CAST(za.sz + zb.sz - inter AS DOUBLE)
            AS jaccard
        FROM inter
        JOIN grp za ON a = za.doc_id
        JOIN grp zb ON b = zb.doc_id
        WHERE CAST(inter AS DOUBLE) / CAST(za.sz + zb.sz - inter AS DOUBLE)
          >= 0.3)
      ORDER BY a, b"""

  /** dedup4 — exact word-bigram Jaccard with blocking (the "compare
    * only within a blocking key" pattern of entity resolution): block
    * key = (source, ⌊n_chars/64⌋), with pairs in adjacent length
    * buckets also compared via an asymmetric upward probe — the
    * lower-bucket doc probes its own and the next bucket, so every
    * |Δbucket| ≤ 1 pair is generated exactly once and the shingle
    * join never crosses block boundaries. At scale this bounds the
    * self-join to block-local work instead of all same-source pairs.
    * SKEW-COLLAPSED like every other pair generator: docs with
    * byte-equal shingle sets WITHIN a (source, blk) block group to a
    * min-id representative — k literal copies of a boilerplate page
    * land in ONE block by construction, so the block-local self-join
    * was the last O(k²) shape in the repo — emitting k-1 star edges
    * (rep, member, jaccard 1.0); the probe join and verification run
    * over representatives only. Recall is preserved: members share
    * their rep's (source, blk), so every |Δblk| ≤ 1 member pair is
    * represented by the same-key rep pair, and equal sets share every
    * jaccard. */
  private val ngramBlock = 64
  private val ngramQ = GQ(
    "dedup4_ngram_jaccard",
    (s, dir) => {
      val c = corpus(s, dir)
        .withColumn("blk", floor(length(col("text")) / ngramBlock))
      val sh = shingles(c, 2)
        .join(c.select(col("doc_id"), col("source"), col("blk")), Seq("doc_id"))
      val docs = blockedDocFrame(sh)
      val star = docs.filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("a"), col("doc_id").as("b"),
          lit(1.0).as("jaccard"))
      val reps = docs.filter(col("doc_id") === col("rep"))
      // the shingle relation re-restricted to representatives: the
      // probe self-join and the verify sizes never see a duplicate
      // member's shingles
      val shr = sh.join(reps.select("doc_id"), Seq("doc_id"), "leftsemi")
      val probes = shr.withColumn("probe",
        explode(array(col("blk"), col("blk") + 1)))
      val inter = probes.as("sa").join(shr.as("sb"),
          col("sa.sh") === col("sb.sh") && col("sa.source") === col("sb.source") &&
            col("sa.probe") === col("sb.blk") &&
            (col("sa.blk") < col("sb.blk") ||
              (col("sa.blk") === col("sb.blk") && col("sa.doc_id") < col("sb.doc_id"))))
        .groupBy(col("sa.doc_id").as("x"), col("sb.doc_id").as("y"))
        .agg(count(lit(1)).as("inter"))
        .select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"), col("inter"))
      val cross = inter
        .join(reps.select(col("doc_id"), col("sz")).as("za"),
          col("a") === col("za.doc_id"))
        .join(reps.select(col("doc_id"), col("sz")).as("zb"),
          col("b") === col("zb.doc_id"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.3)
        .select("a", "b", "jaccard")
      star.unionByName(cross).orderBy("a", "b")
    },
    Some(blockedPairSql))

  /** dedup5 — the same blocked exact-Jaccard as dedup4, but candidate
    * pairs are generated with PPJoin-style PREFIX FILTERING: order every
    * doc's shingles by global rarity (doc-frequency asc, shingle asc —
    * one total order for the whole corpus) and index only the first
    * `|d| - ⌈t·|d|⌉ + 1` of them. Any pair with Jaccard ≥ t must
    * collide within those prefixes (Bayardo et al.'s All-Pairs lemma),
    * so recall is exact by construction while the candidate join only
    * touches each doc's rarest shingles — at corpus scale this bounds
    * candidate generation by the prefix index size instead of the full
    * inverted index. Exact verification then runs on full shingle sets
    * for candidates only. Same oracle as dedup4: the filter is
    * lossless, so the result set is identical — including the skew
    * collapse, which both run over the SAME [[blockedDocFrame]]
    * groups (star edges inside byte-equal sets; prefix indexing,
    * candidate generation, and verification over representatives
    * only — df over reps is still one consistent total order, so the
    * All-Pairs lemma holds unchanged). */
  private val Threshold = 3 // t = 0.3 as the fraction 3/10, kept integral
  private val prefixQ = GQ(
    "dedup5_prefix_jaccard",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = corpus(s, dir)
        .withColumn("blk", floor(length(col("text")) / ngramBlock))
      // The exploded shingle relation is narrow (scan → split →
      // per-doc array_distinct → explode, no shuffle) but CPU-heavy —
      // regex split + per-position concat over every document — and
      // FOUR plan subtrees consume it (doc frequency, ranking, the
      // candidate self-join's two sides via ranked, and the
      // verification docSets). Measured at sf0.1: each re-derivation
      // costs 1-6 s of codegen'd string work for a ~300k-row result,
      // so one cache round-trip beats re-deriving — the opposite
      // trade from dedup4, whose single consumer re-derives. At
      // corpus scale the cache spills to disk per-executor and stays
      // strictly smaller than the text it derives from (distinct
      // bigrams ≤ words), so the trade survives 100×.
      //
      // Frequency/order/candidate keys use the 64-bit shingle hash, not
      // the string: a collision only merges two doc-frequency counts
      // and can only ADD candidates (verified exactly below), and
      // (df(h), h) is still one consistent total order — both keep
      // the prefix lemma lossless while the shuffles move 8-byte keys.
      val sh = shingles(c, 2)
        .join(c.select(col("doc_id"), col("source"), col("blk")), Seq("doc_id"))
        .withColumn("h", xxhash64(col("sh")))
        .persist()
      // the ranking/candidate pipeline never touches the shingle STRING:
      // every shuffle below moves 8-byte keys only. Doc frequency is a
      // hash aggregate + shuffle join (NOT count-over-window on h: a
      // window with millions of 1-2 row frames sorts the whole
      // relation and measures ~2× slower than the partial-aggregated
      // groupBy); size and rank share one doc-partitioned shuffle
      // (two window functions over the same partitioning). ⌈t·sz⌉ in
      // exact integer arithmetic — a float ceil at the boundary could
      // shorten the prefix and break losslessness. No tiebreak beyond
      // (df, h) is needed: rows tied on (df, h) carry the SAME h, so
      // the set of h's in any prefix is invariant under tie order, and
      // candidates key on h — losslessness does not depend on tie order.
      val docs = blockedDocFrame(sh)
      val star = docs.filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("a"), col("doc_id").as("b"),
          lit(1.0).as("jaccard"))
      val repIds = docs.filter(col("doc_id") === col("rep"))
        .select("doc_id")
      // everything below — df, ranking, candidates, verification —
      // runs over REPRESENTATIVES only (the cached sh restricted by
      // one semi-join): duplicate members never enter the prefix
      // index, so a k-identical cluster costs k-1 star rows here
      // instead of O(k²) candidate and verify pairs
      val lean = sh.select("doc_id", "h", "source", "blk")
        .join(repIds, Seq("doc_id"), "leftsemi")
      val dfreq = lean.groupBy("h").agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy(col("doc_id"))
      val ranked = lean.join(dfreq, Seq("h"))
        .withColumn("sz", count(lit(1)).over(wDoc))
        .withColumn("rn", row_number().over(wDoc.orderBy(col("df"), col("h"))))
        .filter(col("rn") <=
          col("sz") - expr(s"(sz * $Threshold + 9) div 10") + 1)
      // (measured: additionally persisting `ranked` is a net LOSS —
      // the self-join's repeated window subtrees resolve as
      // ReusedExchange off the cached sh, so a second cache only adds
      // a materialization barrier)
      val probes = ranked
        .withColumn("probe", explode(array(col("blk"), col("blk") + 1)))
      val cand = probes.as("sa").join(ranked.as("sb"),
          col("sa.h") === col("sb.h") && col("sa.source") === col("sb.source") &&
            col("sa.probe") === col("sb.blk") &&
            (col("sa.blk") < col("sb.blk") ||
              (col("sa.blk") === col("sb.blk") &&
                col("sa.doc_id") < col("sb.doc_id"))))
        .select(least(col("sa.doc_id"), col("sb.doc_id")).as("a"),
          greatest(col("sa.doc_id"), col("sb.doc_id")).as("b"))
        .distinct()
        // persisted: at t = 0.3 the prefix keeps ~70% of each doc's
        // shingles, so the candidate set is large (209k pairs at
        // sf0.1) and BOTH verify joins consume it; un-materialized,
        // the broadcast build of each join side re-derives the whole
        // ranked self-join chain — stage attribution
        // (tools/ProfDedup5) measured the final assembly at 17.6 s
        // unpersisted vs 1.5 s with cand+docSets materialized
        .persist()
      // per-doc shingle SET as one array row (from the cached sh):
      // verification joins attach two arrays per candidate pair and
      // intersect in-line — the exploded relation is never shuffled
      // for verification, and the doc-array relation is small enough
      // for AQE to broadcast (at corpus scale it degrades to a
      // doc_id-keyed shuffle join, still O(candidates), never
      // O(corpus²)). Persisted: it feeds TWO join sides (za/zb) and
      // each broadcast build would otherwise recompute it.
      val docSets = sh.join(repIds, Seq("doc_id"), "leftsemi")
        .groupBy("doc_id").agg(
          collect_list(col("sh")).as("shs"), count(lit(1)).as("sz"))
        .persist()
      // exact verification on the STRING shingle sets: both arrays are
      // per-doc distinct, so |∩| = size(array_intersect) exactly
      val cross = cand
        .join(docSets.as("za"), col("a") === col("za.doc_id"))
        .join(docSets.as("zb"), col("b") === col("zb.doc_id"))
        .withColumn("inter",
          size(array_intersect(col("za.shs"), col("zb.shs"))).cast("long"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.3)
        .select("a", "b", "jaccard")
      star.unionByName(cross).orderBy("a", "b")
    },
    ngramQ.oracle) // identical result set: prefix filtering is lossless

  /** dedup6 — exact substring-overlap dedup (the Lee et al.
    * "Deduplicating Training Data" shape): two documents are flagged
    * when they share ANY 13-word contiguous span, regardless of
    * whole-document similarity — catches boilerplate and quotation
    * reuse that Jaccard misses on otherwise-different docs. The plan
    * is the inverted-index shape that scales: explode each doc to
    * md5'd 13-grams (fixed-width join keys), self-join on the gram,
    * count distinct shared grams per pair. Gram buckets are bounded
    * by real duplication, never O(corpus²). Injection: every
    * doc_id % 17 == 0 doc gets the first 16 words of doc_id + 1
    * appended, so (d, d+1) pairs with ≥ 4 shared spans are expected
    * (plus any natural repeats, which both engines count
    * identically).
    *
    * SKEW-COLLAPSED like every other pair generator: docs with
    * byte-equal 13-gram SETS group to a min-id representative (fp =
    * md5 of the sorted gram list — grams are md5 hex, so the
    * comma-join is unambiguous) with k-1 star edges carrying
    * shared_spans = the set size (equal sets share every gram);
    * the inverted-index self-join runs over representatives only.
    * Cross counts are group-invariant (|A ∩ B| depends only on the
    * sets), so connectivity is provably unchanged. */
  private val SpanN = 13
  private def spanGramsExpr(toks: String) =
    s"case when size($toks) >= $SpanN then array_distinct(transform(" +
      s"sequence(1, size($toks) - ${SpanN - 1}), " +
      s"i -> md5(concat_ws(' ', slice($toks, i, $SpanN))))) else array() end"
  private def spanGramsSql(toks: String) =
    s"CASE WHEN len($toks) >= $SpanN THEN list_distinct(list_transform(" +
      s"range(1, len($toks) - ${SpanN - 2}), " +
      s"i -> md5(array_to_string($toks[CAST(i AS INT):CAST(i + ${SpanN - 1} AS INT)], ' ')))) ELSE [] END"

  private val substringQ = GQ(
    "dedup6_substring_overlap",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      // LEFT join: a %17 doc with no doc_id+1 successor keeps its
      // original text instead of silently dropping out of the corpus
      val injected = d.as("l")
        .join(d.as("r"), col("l.doc_id") + 1 === col("r.doc_id"), "left")
        .filter(col("l.doc_id") % 17 === 0)
        .select(col("l.doc_id").as("doc_id"),
          when(col("r.text").isNull, col("l.text")).otherwise(
            concat(col("l.text"), lit(" "),
              expr("concat_ws(' ', slice(split(lower(trim(r.text)), '\\\\s+'), 1, 16))")))
            .as("text"))
      val c = d.filter(col("doc_id") % 17 =!= 0).unionByName(injected)
      // per-doc gram ARRAY in-row (already distinct), then the
      // per-doc frame: size, set fingerprint, window-min rep — one
      // row per doc, no member array, no blocking key (dedup6 joins
      // on the gram alone)
      // cached (the dedup5 shingle-cache trade, same reasoning): the
      // gram derivation — word split + one md5 PER 13-gram position —
      // is the query's dominant CPU and THREE plan subtrees consume it
      // (the doc frame behind star/repIds, and both sides of the gram
      // self-join); one cache round-trip of ~one array row per doc
      // beats re-deriving per consumer, and at corpus scale the cache
      // stays smaller than the text it derives from
      val ga = c
        .withColumn("w", expr("split(lower(trim(text)), '\\\\s+')"))
        .select(col("doc_id"), expr(spanGramsExpr("w")).as("ga"))
        .persist()
      val docs = ga.filter(size(col("ga")) > 0)
        .select(col("doc_id"), size(col("ga")).cast("long").as("sz"),
          md5(array_join(array_sort(col("ga")), ",")).as("fp"))
        .withColumn("rep", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      val star = docs.filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("a"), col("doc_id").as("b"),
          col("sz").as("shared_spans"))
      val grams = ga
        .join(docs.filter(col("doc_id") === col("rep")).select("doc_id"),
          Seq("doc_id"), "leftsemi")
        .select(col("doc_id"), explode(col("ga")).as("g"))
      val cross = grams.as("a").join(grams.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
        .agg(count(lit(1)).as("shared_spans"))
      star.unionByName(cross).orderBy("a", "b")
    },
    Some(s"""WITH inj AS (
        SELECT l.doc_id,
          CASE WHEN r.text IS NULL THEN l.text
            ELSE l.text || ' ' || array_to_string(
              string_split_regex(lower(trim(r.text)), '\\s+')[1:16], ' ')
          END AS text
        FROM documents l LEFT JOIN documents r ON l.doc_id + 1 = r.doc_id
        WHERE l.doc_id % 17 = 0),
      corpus6 AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
        UNION ALL SELECT doc_id, text FROM inj),
      gar AS (SELECT doc_id, ${spanGramsSql("w")} AS ga FROM (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM corpus6)),
      grp AS (SELECT doc_id, CAST(len(ga) AS BIGINT) AS sz,
          MIN(doc_id) OVER (PARTITION BY
            md5(array_to_string(list_sort(ga), ','))) AS rep
        FROM gar WHERE len(ga) > 0),
      g AS (SELECT gar.doc_id, unnest(ga) AS g
        FROM gar JOIN grp ON gar.doc_id = grp.doc_id
        WHERE grp.doc_id = grp.rep)
      SELECT a, b, shared_spans FROM (
        SELECT rep AS a, doc_id AS b, sz AS shared_spans
        FROM grp WHERE doc_id <> rep
        UNION ALL
        SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS shared_spans
        FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      ORDER BY a, b"""))

  def qs: Seq[GQ] = Seq(exactQ, minhashQ, simhashQ, ngramQ, prefixQ,
    substringQ)
}
