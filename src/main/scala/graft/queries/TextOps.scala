package graft.queries

import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Text-analysis operators for LLM-data pipelines over `documents`
  * (builder-prompt scale extensions): quality scoring, language ID,
  * token statistics, fingerprinting. All pure codegen'd column
  * expressions — no UDFs — so they run at full scan speed at 100 TB
  * and every one is DuckDB-oracle-checkable.
  *
  * Float determinism: every ratio is a single double division of
  * integer counts and the quality score is one fixed-order weighted
  * sum, so Spark and DuckDB produce bit-identical doubles.
  */
object TextOps {

  private val Stopwords =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")
  private def sqlList(xs: Seq[String]) = xs.map(w => s"'$w'").mkString(", ")
  /** The ONE stopword list, as a SQL IN-list — text1's signals and
    * CurationOps.qualityCol/qualitySql (the pipeline classifier) must
    * score with the same words or the reported quality desyncs from
    * what the curation gates filter on. */
  private[queries] def stopwordSqlList: String = sqlList(Stopwords)

  /** Canonical corpus tokenization — THE single definition (both
    * engines split lowercased trimmed text on \s+); format-style so
    * oracles can tokenize computed columns. Every operator family
    * (text*, sketch*, the search index, curation) formats these — the
    * maintained-index folds and their batch oracles MUST tokenize
    * byte-identically, so keep exactly one copy. */
  private[graft] val ToksExprFmt = "split(lower(trim(%s)), '\\\\s+')"
  private[graft] val ToksSqlFmt = "string_split_regex(lower(trim(%s)), '\\s+')"

  /** Tokens of the lowercased text (both engines split on \s+). */
  private val toksExpr = ToksExprFmt.format("text")
  private val toksSql = ToksSqlFmt.format("text")

  /** text1 — quality scoring: length/stopword/alpha ratios combined
    * into one score (the heuristic-filter stage of a data pipeline). */
  private val quality = GQ(
    "text1_quality_score",
    (s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", expr(toksExpr))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_stop", size(expr(
          s"filter(toks, w -> w in (${sqlList(Stopwords)}))")))
        .withColumn("n_alpha", size(expr(
          "filter(toks, w -> w rlike '^[a-z]+$')")))
        .withColumn("stop_ratio",
          col("n_stop").cast("double") / col("n_tokens").cast("double"))
        .withColumn("alpha_ratio",
          col("n_alpha").cast("double") / col("n_tokens").cast("double"))
        .withColumn("len_score",
          least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)))
        .withColumn("quality",
          lit(0.4) * col("stop_ratio") + lit(0.3) * col("alpha_ratio") +
            lit(0.3) * col("len_score"))
        .select("doc_id", "n_tokens", "n_stop", "n_alpha",
          "stop_ratio", "alpha_ratio", "len_score", "quality")
        .orderBy("doc_id")
    },
    Some(s"""WITH tk AS (
        SELECT doc_id, $toksSql AS toks FROM documents)
      SELECT doc_id, n_tokens, n_stop, n_alpha,
        CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
        CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS alpha_ratio,
        least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) AS len_score,
        0.4 * (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE))
          + 0.3 * (CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE))
          + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) AS quality
      FROM (SELECT doc_id,
          CAST(len(toks) AS INT) AS n_tokens,
          CAST(len(list_filter(toks, w -> w IN (${sqlList(Stopwords)}))) AS INT) AS n_stop,
          CAST(len(list_filter(toks, w -> regexp_full_match(w, '[a-z]+'))) AS INT) AS n_alpha
        FROM tk)
      ORDER BY doc_id"""))

  /** text2 — language ID: fixed per-language stopword lexicons + a CJK
    * character test; argmax with a fixed tie order. (On the synthetic
    * corpus every text is English-like, so the interesting property is
    * that the scorer is deterministic and oracle-checked.) */
  private val langLex: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "and", "is", "of", "to", "in"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une", "dans"))

  private val langId = GQ(
    "text2_lang_id",
    (s, dir) => {
      var df = t(s, dir, "documents").withColumn("toks", expr(toksExpr))
      for ((l, lex) <- langLex)
        df = df.withColumn(s"c_$l",
          size(expr(s"filter(toks, w -> w in (${sqlList(lex)}))")))
      df = df.withColumn("c_zh",
        when(col("text").rlike("[\\u4e00-\\u9fff]"), lit(1000)).otherwise(lit(0)))
      val langs = langLex.map(_._1) :+ "zh"
      // argmax, ties resolved by the fixed order of `langs`
      val best = langs.tail.foldLeft(
        (col(s"c_${langs.head}"), lit(langs.head))) { case ((bc, bl), l) =>
        (when(col(s"c_$l") > bc, col(s"c_$l")).otherwise(bc),
          when(col(s"c_$l") > bc, lit(l)).otherwise(bl))
      }._2
      df.withColumn("predicted_lang", best)
        .withColumn("agrees", (col("predicted_lang") === col("lang")).cast("int"))
        .select(Seq("doc_id").map(col) ++ langs.map(l => col(s"c_$l")) ++
          Seq(col("predicted_lang"), col("agrees")): _*)
        .orderBy("doc_id")
    },
    Some {
      val counts = langLex.map { case (l, lex) =>
        s"CAST(len(list_filter(toks, w -> w IN (${sqlList(lex)}))) AS INT) AS c_$l"
      }.mkString(",\n          ")
      // same left-fold argmax as the Spark side: strictly-greater wins
      val langs = langLex.map(_._1) :+ "zh"
      val foldExpr = langs.tail.foldLeft((s"c_${langs.head}", s"'${langs.head}'")) {
        case ((bc, bl), l) =>
          (s"CASE WHEN c_$l > ($bc) THEN c_$l ELSE ($bc) END",
            s"CASE WHEN c_$l > ($bc) THEN '$l' ELSE ($bl) END")
      }._2
      s"""WITH tk AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents),
        sc AS (SELECT doc_id, lang,
          $counts,
          CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 1000 ELSE 0 END AS c_zh
        FROM tk)
      SELECT doc_id, ${langs.map(l => s"c_$l").mkString(", ")},
        $foldExpr AS predicted_lang,
        CAST(($foldExpr) = lang AS INT) AS agrees
      FROM sc ORDER BY doc_id"""
    })

  /** text3 — token statistics: whitespace tokens, word-regex tokens,
    * a BPE-ish subword estimate (chars/4 ceiling), chars per token. */
  private val tokenStats = GQ(
    "text3_token_stats",
    (s, dir) => {
      t(s, dir, "documents")
        .withColumn("n_ws_tokens", size(expr(toksExpr)))
        .withColumn("n_word_tokens",
          size(expr("regexp_extract_all(text, '[A-Za-z0-9]+', 0)")))
        .withColumn("bpe_estimate", ceil(col("n_chars").cast("double") / lit(4.0)).cast("long"))
        .withColumn("chars_per_token",
          col("n_chars").cast("double") / col("n_ws_tokens").cast("double"))
        .select("doc_id", "n_chars", "n_ws_tokens", "n_word_tokens",
          "bpe_estimate", "chars_per_token")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, n_chars,
        CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT) AS n_ws_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS n_word_tokens,
        CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS bpe_estimate,
        CAST(n_chars AS DOUBLE) /
          CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) AS chars_per_token
      FROM documents ORDER BY doc_id"""))

  /** text4 — document fingerprinting: md5 of the whitespace-normalized
    * text plus a 48-bit integer prefix (the join-friendly form used by
    * the dedup operators). */
  private val fingerprint = GQ(
    "text4_fingerprint",
    (s, dir) => {
      t(s, dir, "documents")
        .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
        .withColumn("fp", md5(col("norm")))
        .withColumn("fp48", conv(substring(col("fp"), 1, 12), 16, 10).cast("long"))
        .select("doc_id", "fp", "fp48")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        CAST('0x' || substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 12) AS BIGINT) AS fp48
      FROM documents ORDER BY doc_id"""))

  /** text5 — per-language character-bigram profile: top 5 bigrams per
    * lang label by frequency (deterministic tie-break on the bigram).
    * The n-gram-statistics building block behind real language ID. */
  private val ngramProfile = GQ(
    "text5_ngram_profile",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val grams = t(s, dir, "documents")
        .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
        .withColumn("bg", explode(expr(
          // short-text guard: sequence(1, 0) DESCENDS in Spark,
          // emitting phantom rows DuckDB's end-exclusive range never
          // produces — same guard shape as DedupOps.shingles
          "case when length(norm) >= 2 then transform(sequence(1, length(norm) - 1), i -> substring(norm, i, 2)) else array() end")))
        .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("bg").asc)
      grams.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("lang", "bg", "n", "rank")
        .orderBy("lang", "rank")
    },
    Some("""WITH g AS (
        SELECT lang,
          unnest(list_transform(range(1, length(norm)),
            i -> substr(norm, CAST(i AS INT), 2))) AS bg
        FROM (SELECT lang,
            regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
          FROM documents)),
      counts AS (SELECT lang, bg, count(*) AS n FROM g GROUP BY 1, 2),
      ranked AS (SELECT lang, bg, n,
          row_number() OVER (PARTITION BY lang ORDER BY n DESC, bg ASC) AS rank
        FROM counts)
      SELECT lang, bg, n, CAST(rank AS INT) AS rank FROM ranked
      WHERE rank <= 5 ORDER BY lang, rank"""))


  /** split1 — deterministic hash-stratified train/val/test split: the
    * canonical "assign every document to a split by content-stable
    * hash" op of a training-data pipeline. The split is a pure
    * function of doc_id (48-bit md5 prefix mod 100 → 90/5/5), so it
    * is reproducible across runs, engines, and repartitions — no RNG,
    * no global coordination, embarrassingly parallel at 100 TB. The
    * gate aggregates per (source, split) to verify stratification. */
  private val hashSplit = GQ(
    "split1_hash_stratified",
    (s, dir) => {
      val h = expr(
        "conv(substring(md5(cast(doc_id as string)), 1, 12), 16, 10)")
        .cast("long") % 100
      t(s, dir, "documents")
        .withColumn("split",
          when(h < 90, "train").when(h < 95, "validation").otherwise("test"))
        .withColumn("tok", ceil(col("n_chars").cast("double") / 4.0).cast("long"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tokens"))
        .orderBy("source", "split")
    },
    Some("""WITH d AS (SELECT source,
        CASE
          WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 90 THEN 'train'
          WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 95 THEN 'validation'
          ELSE 'test' END AS split,
        CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS tok
      FROM documents)
      SELECT source, split, count(*) AS n_docs,
        CAST(sum(tok) AS BIGINT) AS sum_tokens
      FROM d GROUP BY source, split ORDER BY source, split"""))

  /** pack1 — sequence packing: assign documents, in deterministic
    * order, to contiguous bins of ≤4096 estimated tokens (the
    * pretraining "pack short documents into fixed-length sequences"
    * op). bin = ⌊preceding-cumulative / 4096⌋ over a per-source
    * running sum — one window per source partition, so packing
    * parallelizes across sources at scale instead of forcing a global
    * single-partition sort. */
  private val packBins = GQ(
    "pack1_sequence_bins",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "documents")
        .withColumn("tok", ceil(col("n_chars").cast("double") / 4.0).cast("long"))
        .withColumn("cum", sum(col("tok")).over(w))
        .withColumn("bin", expr("(cum - tok) div 4096"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("bin_tokens"))
        .orderBy("source", "bin")
    },
    Some("""WITH d AS (SELECT source, doc_id,
        CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS tok
      FROM documents),
      c AS (SELECT source, tok,
        sum(tok) OVER (PARTITION BY source ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) AS cum FROM d)
      SELECT source, CAST((cum - tok) // 4096 AS BIGINT) AS bin,
        count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS bin_tokens
      FROM c GROUP BY source, bin ORDER BY source, bin"""))

  /** pack2 — sliding-window chunking: split each document into
    * overlapping token windows (64-token chunks, stride 48 → 16-token
    * overlap) — the RAG-indexing / context-window-preparation
    * counterpart of pack1's bin packing. Pure per-row generate+slice
    * (`sequence` → `explode` → `slice`), fully codegen'd, ZERO
    * shuffles besides the output sort — at 100 TB this runs at scan
    * speed and chunk rows never leave their input partition. Each
    * chunk carries its md5 fingerprint (chunk-level exact dedup key)
    * so downstream dedup can run on chunks without re-tokenizing. */
  private val chunkWin = GQ(
    "pack2_chunk_overlap",
    (s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", expr(toksExpr))
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(1, greatest(size(toks), 1), 48)")).as("start"))
        .withColumn("chunk", expr("slice(toks, start, 64)"))
        .select(col("doc_id"),
          expr("(start - 1) div 48").cast("long").as("chunk_id"),
          size(col("chunk")).cast("long").as("n_toks"),
          md5(concat_ws(" ", col("chunk"))).as("fp"))
        .orderBy("doc_id", "chunk_id")
    },
    Some(s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
      st AS (SELECT doc_id, toks, unnest(
          generate_series(1, greatest(CAST(len(toks) AS BIGINT), 1), 48)) AS start
        FROM tk),
      ch AS (SELECT doc_id, start,
          list_slice(toks, start, start + 63) AS chunk FROM st)
      SELECT doc_id, CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
        CAST(len(chunk) AS BIGINT) AS n_toks,
        md5(array_to_string(chunk, ' ')) AS fp
      FROM ch ORDER BY doc_id, chunk_id"""))

  /** text6 — TF-IDF top terms per document: the classic sparse
    * retrieval / keyword-extraction score. tf = termcount/doclen,
    * idf = ln(N/df); score rounded to 6 dp (the one transcendental —
    * ln — may differ by an ulp across engines, and 6 dp quantizes
    * that away while term-ascending tie-break keeps ranking
    * deterministic). Shape at scale: one shuffle keyed by (doc, term),
    * one vocabulary-sized aggregate, a vocabulary join AQE can
    * broadcast — never anything O(corpus²). */
  private val tfidf = GQ(
    "text6_tfidf_topterms",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").withColumn("toks", expr(toksExpr))
      val dt = docs.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
      val dlen = dt.groupBy("doc_id").agg(sum("n").as("len"))
      val dfreq = dt.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = dt.join(dlen, "doc_id").join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", round(
          (col("n").cast("double") / col("len").cast("double")) *
            log(col("n_docs").cast("double") / col("df").cast("double")), 6))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("doc_id", "term", "score", "rank")
        .orderBy("doc_id", "rank")
    },
    Some(s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
      dt AS (SELECT doc_id, term, count(*) AS n FROM (
          SELECT doc_id, unnest(toks) AS term FROM tk) GROUP BY doc_id, term),
      dl AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS len FROM dt GROUP BY doc_id),
      dfq AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT dt.doc_id, dt.term,
          round((CAST(n AS DOUBLE) / CAST(len AS DOUBLE)) *
            ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
        FROM dt JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN nd),
      r AS (SELECT doc_id, term, score,
          row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
        FROM sc)
      SELECT doc_id, term, score, CAST(rank AS INT) AS rank FROM r
      WHERE rank <= 3 ORDER BY doc_id, rank"""))

  /** text8 — BM25 top-10 retrieval: the sparse-retrieval baseline every
    * dense index (sim1-8) is measured against, and the retrieval stage
    * of decontamination / quality-by-retrieval pipelines. Queries are
    * the distinct terms of docs 0-4; candidates come from an
    * INVERTED-INDEX equi-join on term (never a corpus × queries score
    * loop), per-term contributions accumulate as integer micro-units
    * (round(idf·tf, 6)·1e6 as BIGINT) so the per-doc score SUM is
    * exact integer arithmetic — no float-accumulation-order drift
    * between engines; the one transcendental (ln) is quantized to 6 dp
    * like text6's idf. Top-k per query is the bounded [[TopKAgg]]
    * aggregator (map-side k rows per partition), not a window rank —
    * at 100 TB the window form would shuffle every scored row into
    * #queries reducers. k1 = 1.2, b = 0.75 (the Robertson defaults);
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene form — always
    * positive). */
  private val bm25 = GQ(
    "text8_bm25",
    (s, dir) => {
      val dt = t(s, dir, "documents").withColumn("toks", expr(toksExpr))
        .select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
      val dlen = dt.groupBy("doc_id").agg(sum("n").as("len"))
      val dfreq = dt.groupBy("term").agg(count(lit(1)).as("df"))
      // one tiny totals row: N docs and the exact-integer-derived avgdl
      val totals = dlen.agg(count(lit(1)).as("n_docs"), sum("len").as("tot_len"))
        .withColumn("avgdl",
          col("tot_len").cast("double") / col("n_docs").cast("double"))
      val qt = dt.filter(col("doc_id") < 5)
        .select(col("doc_id").as("q_id"), col("term"))
      val contrib = dt.join(broadcast(qt), Seq("term"))
        .filter(col("doc_id") =!= col("q_id"))
        .join(dlen, "doc_id").join(dfreq, "term")
        .crossJoin(broadcast(totals))
        .select(col("q_id"), col("doc_id"), Bm25.microCol.as("micro"))
      Bm25.rankTopK(contrib)
    },
    Some(Bm25.oracleSql(
      s"tk AS (SELECT doc_id, $toksSql AS toks FROM documents)")))

  /** The ONE BM25 exact-arithmetic contract, shared by text8 (batch)
    * and pipe6 (maintained index) so both sides — Spark scorer AND
    * DuckDB oracle — can never drift: Robertson k1 = 1.2, b = 0.75,
    * Lucene idf ln((N − df + 0.5)/(df + 0.5) + 1) quantized to 6 dp
    * (the one transcendental), per-term contributions as integer
    * micro-units (round(idf·tf · 1e6) as BIGINT) so the per-doc score
    * SUM is exact integer arithmetic with no accumulation-order
    * drift. */
  private[queries] object Bm25 {
    /** Per-term micro-unit contribution; expects columns
      * n, len, df, n_docs, avgdl. */
    def microCol: org.apache.spark.sql.Column = {
      val idf6 = round(log(
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6)
      val tfpart = (col("n").cast("double") * lit(2.2)) /
        (col("n").cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * col("len").cast("double") / col("avgdl")))
      round(idf6 * tfpart * lit(1e6)).cast("bigint")
    }

    /** (q_id, doc_id, micro) → top-10 per query via the bounded
      * [[graft.functions.TopKAgg]] (map-side k rows per partition —
      * never a per-query window sort of every scored row). */
    def rankTopK(contrib: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val topk = graft.functions.GraftFunctions.topkUdaf(10)
      contrib.groupBy("q_id", "doc_id")
        .agg(sum("micro").as("sm"))
        .withColumn("score", col("sm").cast("double") / lit(1000000.0))
        .groupBy("q_id").agg(topk(col("score"), col("doc_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col._2").as("doc_id"),
          col("col._1").as("score"), (col("pos") + 1).cast("int").as("rank"))
        .orderBy("q_id", "rank")
    }

    /** Full oracle given a prelude of CTEs ending in
      * tk(doc_id, toks); the dt/dl/dfq/tot/qt/scoring tail is shared
      * verbatim across callers. */
    def oracleSql(tkPrelude: String): String =
      s"""WITH $tkPrelude,
      dt AS (SELECT doc_id, term, count(*) AS n FROM (
          SELECT doc_id, unnest(toks) AS term FROM tk) GROUP BY doc_id, term),
      dl AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS len FROM dt GROUP BY doc_id),
      dfq AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
      tot AS (SELECT count(*) AS n_docs,
          CAST(CAST(sum(len) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dl),
      qt AS (SELECT doc_id AS q_id, term FROM dt WHERE doc_id < 5),
      contrib AS (SELECT qt.q_id, dt.doc_id,
          CAST(round(
            round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                (CAST(df AS DOUBLE) + 0.5) + 1.0), 6)
            * ((CAST(n AS DOUBLE) * 2.2) /
               (CAST(n AS DOUBLE) + 1.2 *
                 (0.25 + 0.75 * CAST(len AS DOUBLE) / avgdl)))
            * 1000000.0) AS BIGINT) AS micro
        FROM dt JOIN qt USING (term) JOIN dl USING (doc_id)
          JOIN dfq USING (term) CROSS JOIN tot
        WHERE dt.doc_id <> qt.q_id),
      sc AS (SELECT q_id, doc_id,
          CAST(CAST(sum(micro) AS BIGINT) AS DOUBLE) / 1000000.0 AS score
        FROM contrib GROUP BY q_id, doc_id),
      r AS (SELECT q_id, doc_id, score,
          row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS rank
        FROM sc)
      SELECT q_id, doc_id, score, CAST(rank AS INT) AS rank FROM r
      WHERE rank <= 10 ORDER BY q_id, rank"""
  }

  /** text7 — PMI collocations: corpus-level word-pair association,
    * pmi = ln(p(ab) / (p(a)·p(b))) over adjacent bigrams — the
    * phrase-mining / tokenizer-merge-candidate signal. All
    * probabilities come from exact integer counts, and the only float
    * op is one per-row ln of their ratio (rounded to 6 dp like
    * text6's idf), so there is no float aggregation to drift. Shape
    * at scale: one bigram-keyed and one unigram-keyed aggregate, two
    * vocabulary joins AQE can broadcast, a scalar totals row — never
    * O(corpus²). */
  private val pmi = GQ(
    "text7_pmi_bigrams",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").withColumn("w", expr(toksExpr))
      val uni = docs.select(explode(col("w")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c1"))
      val bi = docs.select(explode(expr(
          "case when size(w) >= 2 then transform(sequence(1, size(w) - 1), " +
            "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2)) " +
            "else array() end")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val totals = docs.agg(
        sum(size(col("w"))).as("n1"),
        sum(greatest(size(col("w")) - 1, lit(0))).as("n2"))
      val scored = bi.filter(col("c2") >= 5)
        .join(uni.select(col("term").as("w1"), col("c1").as("ca")), "w1")
        .join(uni.select(col("term").as("w2"), col("c1").as("cb")), "w2")
        .crossJoin(broadcast(totals))
        .withColumn("pmi", round(log(
          (col("c2").cast("double") * col("n1").cast("double") *
            col("n1").cast("double")) /
            (col("n2").cast("double") * col("ca").cast("double") *
              col("cb").cast("double"))), 6))
      // Distributed top-k: orderBy+limit plans as TakeOrderedAndProject
      // (per-partition partial top-25, single merge of 25-row heads) —
      // never a global sort of the bigram vocabulary into one
      // partition. Rank over the 25 survivors needs no window either:
      // pack them into one sorted array (negated pmi makes the struct
      // sort descending-first, ties ascending on w1/w2) and posexplode
      // — position IS the rank, and the only single-task work is a
      // 25-element aggregate.
      scored
        .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
        .limit(25)
        .agg(sort_array(collect_list(struct(
          negate(col("pmi")).as("np"), col("w1"), col("w2"),
          col("c2"), col("pmi")))).as("a"))
        .select(posexplode(col("a")).as(Seq("pos", "r")))
        .select(col("r.w1").as("w1"), col("r.w2").as("w2"),
          col("r.c2").as("c2"), col("r.pmi").as("pmi"),
          (col("pos") + 1).cast("int").as("rank"))
        .orderBy("rank")
    },
    Some(s"""WITH tk AS (SELECT doc_id, $toksSql AS w FROM documents),
      uni AS (SELECT term, count(*) AS c1 FROM (
          SELECT unnest(w) AS term FROM tk) GROUP BY term),
      bi AS (SELECT w1, w2, count(*) AS c2 FROM (
          SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
                 unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
          FROM tk WHERE len(w) >= 2) GROUP BY w1, w2),
      tot AS (SELECT CAST(sum(len(w)) AS BIGINT) AS n1,
          CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS n2 FROM tk),
      sc AS (SELECT w1, w2, c2,
          round(ln((CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) /
            (CAST(n2 AS DOUBLE) * CAST(ca.c1 AS DOUBLE) * CAST(cb.c1 AS DOUBLE))), 6) AS pmi
        FROM bi
        JOIN uni ca ON ca.term = bi.w1
        JOIN uni cb ON cb.term = bi.w2
        CROSS JOIN tot WHERE c2 >= 5),
      r AS (SELECT w1, w2, c2, pmi,
          row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS rank
        FROM sc)
      SELECT w1, w2, c2, CAST(rank AS INT) AS rank, pmi FROM r
      WHERE rank <= 25 ORDER BY rank"""))

  /** qual4 — bigram-LM surprisal: per-document total negative log
    * likelihood under the corpus's own bigram model,
    * NLL(w1→w2) = ln c(w1) − ln c(w1,w2) — the model-based quality
    * signal (a perplexity proxy: repetitive/templated docs score low,
    * incoherent token soup scores high). Every doc bigram exists in
    * the model by construction (it came from this corpus), so there
    * is no OOV smoothing to pick. Determinism: each per-bigram ln
    * term is computed from exact integer counts and rounded to 6 dp
    * BEFORE the per-doc sum, which runs in DECIMAL — associative and
    * fold-order-proof. Shape at scale: two corpus-level vocab
    * aggregates, then bigram-keyed model joins (a dimension join —
    * the model is not broadcastable at web scale and does not need to
    * be) and one per-doc aggregate; no windows, no all-pairs. */
  private val surprisal = GQ(
    "qual4_bigram_surprisal",
    (s, dir) => {
      val docs = t(s, dir, "documents").withColumn("w", expr(toksExpr))
      val db = docs.select(col("doc_id"), explode(expr(
          "case when size(w) >= 2 then transform(sequence(1, size(w) - 1), " +
            "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2)) " +
            "else array() end")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val uni = docs.select(explode(col("w")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c1"))
      val bi = db.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      db.join(bi, Seq("w1", "w2"))
        .join(uni.select(col("term").as("w1"), col("c1")), "w1")
        .withColumn("nll", round(
          log(col("c1").cast("double")) - log(col("c2").cast("double")), 6)
          .cast("decimal(18,6)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("nll")).cast("double").as("sum_nll"))
        .orderBy("doc_id")
    },
    Some(s"""WITH tk AS (SELECT doc_id, $toksSql AS w FROM documents),
      db AS (SELECT doc_id,
          unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
          unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
        FROM tk WHERE len(w) >= 2),
      uni AS (SELECT term, count(*) AS c1 FROM (
          SELECT unnest(w) AS term FROM tk) GROUP BY term),
      bi AS (SELECT w1, w2, count(*) AS c2 FROM db GROUP BY w1, w2),
      terms AS (SELECT d.doc_id,
          CAST(round(ln(CAST(uni.c1 AS DOUBLE)) - ln(CAST(bi.c2 AS DOUBLE)), 6)
            AS DECIMAL(18,6)) AS nll
        FROM db d
        JOIN bi ON bi.w1 = d.w1 AND bi.w2 = d.w2
        JOIN uni ON uni.term = d.w1)
      SELECT doc_id, count(*) AS n_bigrams,
        CAST(sum(nll) AS DOUBLE) AS sum_nll
      FROM terms GROUP BY doc_id ORDER BY doc_id"""))

  /** Number of BPE merge rules tok2 learns (and the oracle unrolls). */
  private val BpeMerges = 8

  /** tok2 — BPE tokenizer training: learn the first [[BpeMerges]]
    * byte-pair-encoding merge rules from the corpus. Each iteration
    * counts adjacent symbol pairs over the (distinct word, frequency)
    * vocabulary, picks the most frequent pair (ties: lexicographic),
    * and merges every non-overlapping occurrence left-to-right —
    * textbook BPE (Sennrich et al. 2016), the `hudi-demo`-era
    * pipelines' missing "train the tokenizer ON the data" step.
    *
    * Identical merge application in both engines without loops or
    * UDFs: a word's symbol sequence is encoded as a string with
    * TWO-space separators and single-space sentinels
    * (`" h  e  l  l  o "`), so the literal `replace(s, " a  b ",
    * " ab ")` — which both Spark and DuckDB scan left-to-right,
    * non-overlapping — IS greedy BPE application, and separators
    * around the merged symbol stay intact (each match consumes one
    * space from each neighboring separator and the replacement puts
    * both back). Symbols never contain spaces, so every match aligns
    * to symbol boundaries.
    *
    * Scale shape: ONE corpus scan builds the (word, f) vocabulary;
    * every later step is over the vocab relation (millions of rows at
    * web scale, distributed): per-iteration pair counting is a
    * groupBy, merge application a projection. Only the single argmax
    * row syncs to the driver per iteration — the model (like sim4's
    * centroids) is O(merges), the data never collects. */
  /** Trains the BPE model: returns the [[BpeMerges]] merge rules
    * (rank, lhs, rhs, merged, pair_count) and the final vocabulary
    * (word, f, syms) with all merges applied. Shared by tok2 (emits
    * the rules) and tok3 (applies the vocabulary to the corpus). */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, dir: String)
      : (Seq[(Int, String, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    val chars =
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    val vocab = t(s, dir, "documents")
      .select(explode(expr(toksExpr)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("f"))
      .withColumn("syms",
        concat(lit(" "), array_join(expr(chars), "  "), lit(" ")))
      .cache()
    var cur = vocab
    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    var exhausted = false
    for (k <- 1 to BpeMerges if !exhausted) {
      val top = cur
        .select(col("f"), expr("split(trim(syms), '  ')").as("arr"))
        .select(col("f"), explode(expr(
          // guard: Spark's sequence(1, 0) steps DOWN, not empty
          "case when size(arr) >= 2 then transform(sequence(1, size(arr) - 1), " +
            "i -> struct(element_at(arr, i) AS a, element_at(arr, i + 1) AS b)) " +
            "else array() end"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect().headOption
      top match {
        case None =>
          // every word is fully merged — no pairs left to count
          exhausted = true
        case Some(row) =>
          val (a, b) = (row.getString(0), row.getString(1))
          rules += ((k, a, b, a + b, row.getLong(2)))
          cur = cur.withColumn("syms", call_function("replace",
            col("syms"), lit(s" $a  $b "), lit(s" $a$b ")))
      }
    }
    // materialize the final vocabulary (small: one row per distinct
    // word) so the cached base can be released NOW — unpersisting the
    // derived `cur` would miss the cache entry, and leaving it pinned
    // holds the corpus-wide vocab in executor memory for the rest of
    // the session
    val fin = cur.localCheckpoint()
    vocab.unpersist()
    (rules.result(), fin)
  }

  /** The oracle's replay of [[bpeTrain]]: v0 (char-split vocabulary)
    * through v[[BpeMerges]], each step deriving rule r{k} by argmax
    * pair count and applying it with the same literal replace. All
    * stages MATERIALIZED — the chain re-references each CTE several
    * times and DuckDB would otherwise inline it exponentially. */
  private def bpeStepsSql: String = {
    val steps = (1 to BpeMerges).map { k =>
      s"""p$k AS (SELECT p.a AS a, p.b AS b, CAST(sum(f) AS BIGINT) AS cnt
        FROM (SELECT f, unnest(list_transform(range(1, len(arr)),
            i -> {'a': arr[i], 'b': arr[i + 1]})) AS p
          FROM (SELECT f, string_split(trim(syms), '  ') AS arr
            FROM v${k - 1}))
        GROUP BY 1, 2),
      r$k AS MATERIALIZED (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
      v$k AS MATERIALIZED (SELECT w0, f,
          -- coalesce: when r$k is empty (pairs exhausted before
          -- $BpeMerges merges) the scalar subqueries are NULL and
          -- replace() would NULL the whole column; keep syms unchanged
          -- instead, mirroring the Spark side's graceful stop
          coalesce(replace(syms,
            ' ' || (SELECT a FROM r$k) || '  ' || (SELECT b FROM r$k) || ' ',
            ' ' || (SELECT a FROM r$k) || (SELECT b FROM r$k) || ' '), syms) AS syms
        FROM v${k - 1})"""
    }.mkString(",\n")
    s"""tk AS (SELECT unnest($toksSql) AS word FROM documents),
      v0 AS MATERIALIZED (SELECT word AS w0, count(*) AS f,
          ' ' || array_to_string(list_transform(range(1, len(word) + 1),
            i -> word[i]), '  ') || ' ' AS syms
        FROM tk WHERE word <> '' GROUP BY word),
      $steps"""
  }

  private val bpe = GQ(
    "tok2_bpe_merges",
    (s, dir) => {
      val (rules, _) = bpeTrain(s, dir)
      import s.implicits._
      rules.toDF("rank", "lhs", "rhs", "merged", "pair_count")
        .orderBy("rank")
    },
    Some {
      val union = (1 to BpeMerges)
        .map(k => s"SELECT $k AS rank, a, b, cnt FROM r$k")
        .mkString(" UNION ALL ")
      s"""WITH $bpeStepsSql
        SELECT CAST(rank AS INT) AS rank, a AS lhs, b AS rhs,
          a || b AS merged, cnt AS pair_count
        FROM ($union) ORDER BY rank"""
    })

  /** tok3 — the learned tokenizer APPLIED: segment every document
    * with tok2's trained model and report per-document subword
    * counts against whitespace-word and character baselines — the
    * train-on-the-corpus → tokenize-the-corpus loop, and the number
    * a sequence-packing stage (pack1) actually needs. The per-word
    * subword count is computed ONCE on the vocabulary relation (the
    * merges already applied there) and joined back to the exploded
    * corpus by word — at 100 TB the segmentation cost is
    * O(vocab) + one hash join, never a per-occurrence re-merge. */
  private val bpeApply = GQ(
    "tok3_bpe_tokenize",
    (s, dir) => {
      val (_, vocab) = bpeTrain(s, dir)
      val perWord = vocab.select(col("word"),
        size(expr("split(trim(syms), '  ')")).cast("long").as("n_sub"),
        length(col("word")).cast("long").as("n_chr"))
      val out = t(s, dir, "documents")
        .select(col("doc_id"), explode(expr(toksExpr)).as("word"))
        .filter(col("word") =!= "")
        .join(perWord, "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_bpe_tokens"),
          sum("n_chr").as("n_word_chars"))
        .withColumn("chars_per_token", round(
          col("n_word_chars").cast("double") / col("n_bpe_tokens").cast("double"), 6))
        .orderBy("doc_id")
      out
    },
    Some(s"""WITH $bpeStepsSql,
      per_word AS (SELECT w0, CAST(len(string_split(trim(syms), '  ')) AS BIGINT) AS n_sub,
          CAST(len(w0) AS BIGINT) AS n_chr
        FROM v$BpeMerges),
      dw AS (SELECT doc_id, unnest($toksSql) AS word FROM documents)
      SELECT doc_id, count(*) AS n_words,
        CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens,
        CAST(sum(n_chr) AS BIGINT) AS n_word_chars,
        round(CAST(sum(n_chr) AS DOUBLE) / CAST(sum(n_sub) AS DOUBLE), 6)
          AS chars_per_token
      FROM dw JOIN per_word ON per_word.w0 = dw.word
      WHERE word <> '' GROUP BY doc_id ORDER BY doc_id"""))

  def qs: Seq[GQ] = Seq(quality, langId, tokenStats, fingerprint, ngramProfile,
    hashSplit, packBins, chunkWin, tfidf, bm25, pmi, surprisal, bpe, bpeApply)
}
