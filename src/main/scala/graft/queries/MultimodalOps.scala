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

  /** mm2 — REAL image decode end-to-end behind the oracle: every doc
    * gets a deterministic solid-color fixture — even doc_ids a
    * hand-built 24-bit BMP ([[graft.multimodal.MediaDecoder.encodeBmp24]]),
    * odd doc_ids a JDK-codec PNG — routed through the production
    * [[graft.multimodal.MediaDecoder.decode]] mapPartitions pipeline
    * (magic sniff → real BMP pixel parse / real `javax.imageio`
    * decode; shuffle-free, one task per input partition). The oracle
    * side never decodes anything: dimensions and per-channel means of
    * a solid-color image are pure arithmetic on the fixture
    * definition — (color/255) cast to float — so a decoder channel
    * swap, padding mistake, or raster offset hash-mismatches. Channel
    * order is format-true: BMP features report B,G,R; PNG features
    * report R,G,B. */
  private val realDecodeQ = GQ(
    "mm2_real_decode",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.MediaDecoder
      val payloads = t(s, dir, "documents").select("doc_id")
        .as[Long]
        .mapPartitions { it =>
          it.map { d =>
            val w = (d % 5 + 2).toInt; val h = (d % 3 + 2).toInt
            val r = (d % 256).toInt
            val g = (d * 3 % 256).toInt
            val b = (d * 7 % 256).toInt
            val bytes =
              if (d % 2 == 0) MediaDecoder.encodeBmp24(w, h, r, g, b)
              else MediaDecoder.encodePngSolid(w, h, r, g, b)
            (d, bytes)
          }
        }
        .toDF("doc_id", "payload")
      MediaDecoder.decode(payloads, "doc_id", "payload")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          element_at(col("features"), 1).as("c0"),
          element_at(col("features"), 2).as("c1"),
          element_at(col("features"), 3).as("c2"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
        CAST(doc_id % 5 + 2 AS INT) AS width,
        CAST(doc_id % 3 + 2 AS INT) AS height,
        3 AS channels,
        CAST((CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7) % 256
                   ELSE doc_id % 256 END) / 255.0 AS REAL) AS c0,
        CAST(((doc_id * 3) % 256) / 255.0 AS REAL) AS c1,
        CAST((CASE WHEN doc_id % 2 = 0 THEN doc_id % 256
                   ELSE (doc_id * 7) % 256 END) / 255.0 AS REAL) AS c2
      FROM documents ORDER BY doc_id"""))

  /** mm3 — REAL image RESIZE end-to-end behind the oracle: every doc
    * gets a deterministic GRADIENT fixture (pixel (x, y) = (base_r+x,
    * base_g+y, base_b+x+y); even doc_ids a hand-built BMP, odd a
    * JDK-codec PNG) routed through
    * [[graft.multimodal.MediaDecoder.resizeBox]] — the streaming
    * box-binned area resize (O(outW·outH) memory, one task per
    * partition, no shuffle). Output is one row per 2×2 target cell
    * with INTEGER pixel counts and channel sums, so the DuckDB oracle
    * replays the binning arithmetic exactly from the fixture
    * definition (an unrolled VALUES grid — no image library): a
    * row-order flip (BMP bottom-up handling), a channel swap, or an
    * off-by-one in the ⌊x·outW/inW⌋ binning hash-mismatches. Gradients
    * (not solid colors) make the check resize-SENSITIVE: cell sums
    * differ per cell, so collapsing cells or misassigning pixels can't
    * cancel out. */
  private val resizeQ = GQ(
    "mm3_resize_box",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.MediaDecoder
      val payloads = t(s, dir, "documents").select("doc_id")
        .as[Long]
        .mapPartitions { it =>
          it.map { d =>
            val w = (d % 5 + 2).toInt; val h = (d % 3 + 2).toInt
            val br = (d % 199).toInt
            val bg = (d * 3 % 199).toInt
            val bb = (d * 7 % 199).toInt
            def px(x: Int, y: Int): Int =
              ((br + x) << 16) | ((bg + y) << 8) | (bb + x + y)
            val bytes =
              if (d % 2 == 0) MediaDecoder.encodeBmp24With(w, h)(px)
              else MediaDecoder.encodePngWith(w, h)(px)
            (d, bytes)
          }
        }
        .toDF("doc_id", "payload")
      MediaDecoder.resizeBox(payloads, "doc_id", "payload", 2, 2)
        .orderBy("doc_id", "cell_y", "cell_x")
    },
    Some("""WITH px AS (
        SELECT doc_id,
               doc_id % 5 + 2 AS w, doc_id % 3 + 2 AS h,
               xi, yi,
               doc_id % 199 + xi AS r,
               (doc_id * 3) % 199 + yi AS g,
               (doc_id * 7) % 199 + xi + yi AS b
        FROM documents
        CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5)) AS xs(xi)
        CROSS JOIN (VALUES (0),(1),(2),(3)) AS ys(yi)
        WHERE xi < doc_id % 5 + 2 AND yi < doc_id % 3 + 2
      )
      SELECT doc_id,
        CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        CAST((xi * 2) // w AS INT) AS cell_x,
        CAST((yi * 2) // h AS INT) AS cell_y,
        count(*) AS n_pix,
        CAST(sum(r) AS BIGINT) AS r_sum,
        CAST(sum(g) AS BIGINT) AS g_sum,
        CAST(sum(b) AS BIGINT) AS b_sum
      FROM px
      GROUP BY doc_id, w, h, cell_x, cell_y
      ORDER BY doc_id, cell_y, cell_x"""))

  /** mm4 — frame sampling over video-like payloads, decode included:
    * each doc's payload is `doc_id % 4 + 2` concatenated fixed-size
    * (78-byte, 4×2) solid-color BMP frames; [[graft.multimodal
    * .MediaDecoder.sampleFrames]] strides to every 2nd frame by OFFSET
    * (skipped frames are never copied or decoded — at 100 TB of video
    * that stride is the operator), decodes the sampled frames for real
    * via the BMP parser, and emits per-frame dims + channel means. The
    * oracle replays the per-(doc, frame) color arithmetic; features
    * are format-true B,G,R like mm2. */
  private val frameSampleQ = GQ(
    "mm4_frame_sample",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.MediaDecoder
      val payloads = t(s, dir, "documents").select("doc_id")
        .as[Long]
        .mapPartitions { it =>
          it.map { d =>
            val frames = (0 until (d % 4 + 2).toInt).map { fi =>
              MediaDecoder.encodeBmp24(4, 2,
                ((d + 11 * fi) % 256).toInt,
                ((d * 3 + 7 * fi) % 256).toInt,
                ((d * 5 + 13 * fi) % 256).toInt)
            }
            (d, Array.concat(frames: _*))
          }
        }
        .toDF("doc_id", "payload")
      MediaDecoder.sampleFrames(payloads, "doc_id", "payload", 78, 2)
        .orderBy("doc_id", "frame_idx")
    },
    Some("""SELECT doc_id,
        fi AS frame_idx,
        78 AS frame_bytes,
        4 AS width, 2 AS height,
        CAST(((doc_id * 5 + 13 * fi) % 256) / 255.0 AS REAL) AS c0,
        CAST(((doc_id * 3 + 7 * fi) % 256) / 255.0 AS REAL) AS c1,
        CAST(((doc_id + 11 * fi) % 256) / 255.0 AS REAL) AS c2
      FROM documents
      CROSS JOIN (VALUES (0),(2),(4)) AS fs(fi)
      WHERE fi < doc_id % 4 + 2
      ORDER BY doc_id, fi"""))

  /** mm5 — PCM audio resample, decode included: each doc gets a
    * deterministic mono 16-bit WAV (sample j = (doc_id·31 + j·37) %
    * 201 − 100, 10–39 frames at 8 kHz) built by the byte-level WAV
    * encoder and DECIMATED ×2 through
    * [[graft.multimodal.MediaDecoder.resamplePcm]] (real RIFF chunk
    * parse; skipped frames never read). Kept-sample energy and peak
    * come back as exact integers, so the DuckDB oracle replays the
    * stride arithmetic over an unrolled even-index grid with no
    * float-summation-order hazard. */
  private val resampleQ = GQ(
    "mm5_audio_resample",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.MediaDecoder
      val payloads = t(s, dir, "documents").select("doc_id")
        .as[Long]
        .mapPartitions { it =>
          it.map { d =>
            val n = (d % 30 + 10).toInt
            val samples = Array.tabulate(n)(j =>
              ((d * 31 + j * 37) % 201 - 100).toShort)
            (d, MediaDecoder.encodeWavPcm16(8000, 1, samples))
          }
        }
        .toDF("doc_id", "payload")
      MediaDecoder.resamplePcm(payloads, "doc_id", "payload", 2)
        .orderBy("doc_id")
    },
    Some("""WITH s AS (
        SELECT doc_id, doc_id % 30 + 10 AS n, j,
               (doc_id * 31 + j * 37) % 201 - 100 AS x
        FROM documents
        CROSS JOIN (VALUES (0),(2),(4),(6),(8),(10),(12),(14),(16),(18),
                           (20),(22),(24),(26),(28),(30),(32),(34),(36),(38))
                   AS js(j)
        WHERE j < doc_id % 30 + 10
      )
      SELECT doc_id,
        CAST(n AS INT) AS frames_in,
        8000 AS rate_in,
        1 AS channels,
        CAST(count(*) AS INT) AS frames_out,
        4000 AS rate_out,
        CAST(sum(x * x) AS BIGINT) AS sumsq_out,
        CAST(max(abs(x)) AS BIGINT) AS peak_out
      FROM s GROUP BY doc_id, n ORDER BY doc_id"""))

  /** Fixture image side (16×16 → exact 2×2 cells under the 8×8 hash
    * grid), shared by mm6/mm7. */
  private val PhSide = 16

  /** The noise fixture's per-channel coefficient rows
    * (mulX, modX, addX, mulY, modY, addY, modXY, addXY): channel k =
    * ((sd·mulX + x)·(sd % modX + addX) + (sd·mulY + y)·(sd % modY +
    * addY) + x·y·(sd % modXY + addXY)) % 256. Named ONCE — both
    * [[phashFixture]] and the oracle SQL built by [[phashOracle]]
    * derive from it, so a drive-by edit cannot desync the two
    * replays. (The hash PIPELINE arithmetic — binning, threshold,
    * packing, banding — stays independently written on each side;
    * these are fixture INPUTS, where a desync would be a false
    * failure, never a false pass.) */
  private val PhCoef: Seq[(Int, Int, Int, Int, Int, Int, Int, Int)] = Seq(
    (131, 97, 31, 137, 89, 29, 83, 11),
    (139, 101, 37, 149, 79, 23, 71, 13),
    (151, 103, 41, 157, 73, 19, 61, 17))

  /** Channel k of the noise arithmetic at seed `sv` — the Scala twin
    * of [[chanSql]]; both read the SAME [[PhCoef]] row. */
  private def chVal(sv: Long, x: Int, y: Int, k: Int): Int = {
    val (mx, nx, ax, my, ny, ay, nxy, axy) = PhCoef(k)
    (((sv * mx + x) * (sv % nx + ax) +
      (sv * my + y) * (sv % ny + ay) +
      x.toLong * y * (sv % nxy + axy)) % 256).toInt
  }

  /** Shared deterministic noise-image fixture for the perceptual-hash
    * gates (mm6/mm7): channel value = integer arithmetic on (source
    * doc, x, y) with doc-dependent multiplicative coefficients
    * ([[chVal]]), so distinct docs get uncorrelated spatial patterns.
    * Injection masks: doc d is a PERTURBED COPY of d-1 iff
    * d % pairMod == rem — a global +1 brightness shift when
    * d % (2·pairMod) == rem, a single-pixel +60 pop when it's
    * rem + pairMod (a negative `rem` disables injection entirely).
    * mm6 uses masks (8, 1); mm7 seeds with (13, 5) and churns with
    * (7, 2). Even docs encode as BMP, odd as PNG, so every injected
    * pair spans the two codecs. */
  private def phashFixture(d: Long, pairMod: Int, rem: Int): Array[Byte] = {
    import graft.multimodal.MediaDecoder
    val inject = rem >= 0 && d % pairMod == rem
    val sd = if (inject) d - 1 else d
    val m2 = (d % (2 * pairMod)).toInt
    val bright = inject && m2 == rem
    val pop = inject && m2 == rem + pairMod
    def ch(x: Int, y: Int, k: Int): Int = {
      val v = chVal(sd, x, y, k)
      if (bright) math.min(v + 1, 255)
      else if (pop && x == 0 && y == 0 && k == 0) math.min(v + 60, 255)
      else v
    }
    def px(x: Int, y: Int): Int =
      (ch(x, y, 0) << 16) | (ch(x, y, 1) << 8) | ch(x, y, 2)
    if (d % 2 == 0) MediaDecoder.encodeBmp24With(PhSide, PhSide)(px)
    else MediaDecoder.encodePngWith(PhSide, PhSide)(px)
  }

  /** (doc_id) frame → (doc_id, payload) fixture frame — the ONE
    * encode-side mapPartitions shape, parameterized by the modality's
    * deterministic fixture. */
  private def payloadFrame(fixture: (Long, Int, Int) => Array[Byte])(
      df: org.apache.spark.sql.DataFrame, pairMod: Int, rem: Int)
      : org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(d => (d, fixture(d, pairMod, rem))))
      .toDF("doc_id", "payload")
  }

  private val imgFrame = payloadFrame(phashFixture) _

  /** Diagnostic hooks for graft.tools.BandProbe (test scope). */
  private[graft] def mm6Frame(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = imgFrame(df, 8, 1)
  private[graft] def bandedProbe(sig: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = banded(sig)
  private[graft] def mm9Frame(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = audioFrame(df, 9, 2)

  /** Explode a signature frame into its TWO-LEVEL hamming band keys.
    * Level 1: 8 bands of 8 bits — pigeonhole gives hamming ≤ 7 ⇒ ≥ 1
    * equal band. But 8 bands × 256 values is only 2,048 distinct
    * keys: at N = 5·10⁵ signatures an average bucket holds ~2k docs
    * and the band equi-join degenerates toward per-bucket all-pairs —
    * measured as a 22× step for 10× data on the round-14 scaling
    * curve. Level 2 restores sub-quadratic candidates WITH full
    * recall: given an equal band k, the complement 56 bits still
    * carry all ≤ 7 errors, so of their 8 sub-bands of 7 bits ≥ 1 is
    * also equal (pigeonhole again). Keying on (k, band, j, sub-band)
    * multiplies the key space to 8·256·8·128 ≈ 2·10⁶ — bucket
    * density (and the join's quadratic term) drops ~1000× while any
    * true pair still shares ≥ 1 key. 64 key rows per doc instead of
    * 8 — a constant-factor explode the join savings dwarf beyond
    * ~10⁴ signatures. A third level (6-bit sub-sub-bands of the
    * remaining 49 bits) composes the same way if 10⁹⁺-signature
    * buckets ever need it. */
  /** The 64 two-level keys of one signature as packed longs —
    * ((k·8+j)·256 + band)·128 + sub, max 2²¹. Sub-band j gathers the
    * STRIDED complement bits {j, j+8, …, j+48} (any partition into 8
    * disjoint 7-bit groups keeps the pigeonhole exact): adjacent
    * signature bits correlate — neighboring envelope windows,
    * neighboring image cells — so contiguous 7-bit slices produced
    * hot buckets (measured 115 docs/bucket on audio at sf1 vs 24
    * strided). Plain JVM bit ops: the same arithmetic as a Catalyst
    * expression tree was 64 keys × 7 gathered bits of codegen —
    * multi-MiB task binaries and a 6× slowdown. */
  private[graft] def bandKeys(hi: Long, lo: Long): Array[Long] = {
    val v = (hi << 32) | lo
    val out = new Array[Long](64)
    var k = 0
    while (k < 8) {
      val band = (v >>> (8 * k)) & 255L
      val low = if (k == 0) 0L else v & ((1L << (8 * k)) - 1)
      val high = if (k == 7) 0L else (v >>> (8 * (k + 1))) << (8 * k)
      val compl = low | high
      var j = 0
      while (j < 8) {
        var sub = 0L
        var i = 0
        while (i < 7) {
          sub |= ((compl >>> (j + 8 * i)) & 1L) << i
          i += 1
        }
        out(k * 8 + j) = ((k * 8 + j).toLong * 256L + band) * 128L + sub
        j += 1
      }
      k += 1
    }
    out
  }

  private def banded(sig: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = sig.sparkSession
    import s.implicits._
    sig.select(col("doc_id"), col("hash_hi"), col("hash_lo"))
      .as[(Long, Long, Long)]
      .flatMap { case (d, hi, lo) =>
        bandKeys(hi, lo).map(b => (d, hi, lo, b))
      }
      .toDF("doc_id", "hash_hi", "hash_lo", "blk")
  }

  private def hammingCol: org.apache.spark.sql.Column =
    (expr("bit_count(l.hash_hi ^ r.hash_hi)") +
      expr("bit_count(l.hash_lo ^ r.hash_lo)")).cast("int")

  /** Band-blocked near-dup pairs over a 64-bit signature frame
    * (doc_id, hash_hi, hash_lo) — the ONE hamming pair generator
    * every hash-bearing modality shares (image aHash mm6, audio
    * envelope mm9, video majority-fold mm11, and pipe7/pipe8's
    * unions), SKEW-COLLAPSED: docs with byte-equal signatures group
    * to a representative (min doc_id) first, so a cluster of k
    * exact-signature duplicates — boilerplate frames, re-uploaded
    * clips, the k = 10⁵⁺ shape real pretraining corpora carry —
    * costs k-1 STAR edges (rep → member, hamming 0) instead of
    * O(k²) pairs in the band join, the distinct, and every persisted
    * pairs table downstream. Cross-group candidates band-join
    * REPRESENTATIVES only (8 hamming bands; pigeonhole gives full
    * recall at hamming ≤ 7, never all-pairs) and each group pair is
    * emitted once: byte-equal members share every hamming distance,
    * so connectivity — and therefore component structure and
    * canonical selection — is provably identical to the full pair
    * set (any full pair (x, y) is implied by x–rep_x star 0,
    * rep_x–rep_y cross at hamming(x, y), rep_y–y star 0). Output
    * (a, b, hamming), a < b, unordered; hamming = 0 rows are exactly
    * the star edges (hamming 0 ⟺ byte-equal signatures). Defining
    * the threshold, banding, and collapse HERE moves every modality
    * together instead of desyncing them. */
  private[queries] def pairsFromSigs(sig: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // ONE window shuffle over the signature frame attaches each row's
    // group rep; star edges and the rep frame derive from it
    // FILTER-ONLY, so both consumers share the identical
    // Exchange(hash_hi, hash_lo) subtree and the expensive decode+hash
    // lineage below it runs once (ReusedExchange — the same shape
    // NearDupIndex/phashReconcile pinned; the round-14 regression was
    // a formulation whose consumers had DIFFERENT exchange subtrees).
    // Unlike the previous groupBy + collect_list(members) pass, no
    // aggregation buffer ever holds a whole group: a k = 10⁶–10⁸
    // boilerplate cluster — the shape the docs themselves cite — is k
    // window ROWS (sorted, spillable), not one 8 MB–800 MB array cell
    // exploded in a single task.
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy("hash_hi", "hash_lo")
    val withRep = sig.select(col("doc_id"), col("hash_hi"), col("hash_lo"))
      .withColumn("rep", min("doc_id").over(byGroup))
    val star = withRep.filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a"), col("doc_id").as("b"),
        lit(0).as("hamming"))
    val blocks = banded(withRep.filter(col("doc_id") === col("rep"))
      .select("doc_id", "hash_hi", "hash_lo"))
    val cross = blocks.as("l").join(blocks.as("r"),
        col("l.blk") === col("r.blk") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        hammingCol.as("hamming"))
      // threshold BEFORE distinct: hamming is functionally determined
      // by (a, b), and a true near pair matches ~dozens of the 64
      // two-level keys — filtering first shrinks the distinct's
      // shuffle by the same factor
      .filter(col("hamming") <= 7)
      .distinct()
    star.unionByName(cross)
  }

  /** The collapsed-pair oracle tail every signature oracle shares:
    * given a signature CTE `(doc_id, hi, lo)`, group byte-equal
    * signatures to a min-doc_id representative, emit star edges
    * inside each group (hamming 0) plus BRUTE-FORCE cross pairs over
    * representatives at hamming ≤ 7 — the DuckDB replay of
    * [[pairsFromSigs]]'s contract (cross hamming is ≥ 1 by
    * construction: distinct groups have distinct signatures). `p`
    * prefixes the helper CTE names so a joint gate composing several
    * modality chains stays name-disjoint; the pair set lands in
    * `${p}cpairs`. */
  private[queries] def collapsedPairCtes(sig: String, p: String): String =
    s"""${p}grp AS (SELECT doc_id, hi, lo,
          MIN(doc_id) OVER (PARTITION BY hi, lo) AS rep FROM $sig),
      ${p}reps AS (SELECT hi, lo, MIN(doc_id) AS rep FROM $sig
        GROUP BY hi, lo),
      ${p}cpairs AS (
        SELECT rep AS a, doc_id AS b, CAST(0 AS INT) AS hamming
        FROM ${p}grp WHERE doc_id <> rep
        UNION ALL
        SELECT x.rep AS a, y.rep AS b,
          CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
            AS INT) AS hamming
        FROM ${p}reps x JOIN ${p}reps y ON x.rep < y.rep
        WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
          <= 7)"""

  /** Shared DuckDB oracle body for the perceptual-hash gates: replay
    * the fixture arithmetic, 16×16 → 8×8 binning, mean threshold, bit
    * packing, then verify pairs BRUTE-FORCE (all-pairs over the
    * 64-bit signatures) — a banding recall loss on the Spark side
    * hash-mismatches. Parameterized by SQL EXPRESSIONS over the
    * documents alias `d` — `sdSql` (source doc for the noise
    * pattern), `brightSql`/`popSql` (perturbation booleans) — so mm7
    * can replay a final corpus whose image rule depends on churn
    * membership; `alive` filters to the docs the Spark side ends up
    * with (mm7's deletes). */
  /** Channel k's fixture arithmetic as DuckDB SQL over alias columns
    * (sd, xi, yi) — generated from the same [[PhCoef]] row the Scala
    * fixture consumes. */
  private def chanSql(k: Int): String = {
    val (mx, nx, ax, my, ny, ay, nxy, axy) = PhCoef(k)
    s"((sd*$mx + xi) * (sd % $nx + $ax) + (sd*$my + yi) * (sd % $ny + $ay)" +
      s" + xi*yi*(sd % $nxy + $axy)) % 256"
  }

  private def phashOracle(
      sdSql: String, brightSql: String, popSql: String,
      alive: String): String =
    s"""WITH ${phashSigCtesFor(sdSql, brightSql, popSql, alive)},
      ${collapsedPairCtes("sig", "c")}
      SELECT a, b, hamming FROM ccpairs ORDER BY a, b"""

  private def phashSigCtesFor(
      sdSql: String, brightSql: String, popSql: String,
      alive: String): String =
    s"""g(i) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
          (8),(9),(10),(11),(12),(13),(14),(15)),
      px AS (SELECT d.doc_id, xs.i AS xi, ys.i AS yi,
          $sdSql AS sd,
          $brightSql AS bright,
          $popSql AS pop
        FROM documents d CROSS JOIN g xs CROSS JOIN g ys$alive),
      pv AS (SELECT doc_id, xi, yi, bright, pop,
          ${chanSql(0)} AS r0,
          ${chanSql(1)} AS g0,
          ${chanSql(2)} AS b0
        FROM px),
      pp AS (SELECT doc_id, xi, yi,
          CASE WHEN bright THEN LEAST(r0 + 1, 255)
               WHEN pop AND xi = 0 AND yi = 0
                 THEN LEAST(r0 + 60, 255)
               ELSE r0 END
          + CASE WHEN bright THEN LEAST(g0 + 1, 255) ELSE g0 END
          + CASE WHEN bright THEN LEAST(b0 + 1, 255) ELSE b0 END AS gray
        FROM pv),
      cells AS (SELECT doc_id, xi // 2 AS cx, yi // 2 AS cy,
          CAST(sum(gray) AS BIGINT) AS cg
        FROM pp GROUP BY doc_id, xi // 2, yi // 2),
      tot AS (SELECT doc_id, CAST(sum(cg) AS BIGINT) AS tg
        FROM cells GROUP BY doc_id),
      bits AS (SELECT c.doc_id, cy * 8 + cx AS i,
          CASE WHEN cg * 64 >= tg THEN 1 ELSE 0 END AS bit
        FROM cells c JOIN tot USING (doc_id)),
      sig AS (SELECT doc_id,
          CAST(sum(CASE WHEN i < 32
            THEN bit * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS lo,
          CAST(sum(CASE WHEN i >= 32
            THEN bit * (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS hi
        FROM bits GROUP BY doc_id)"""

  /** mm6's Spark pipeline as a reusable pair source — every doc gets
    * a deterministic 16×16 noise image ([[phashFixture]] — a plain
    * gradient would aHash identically for every doc); every 8th doc
    * is a perturbed cross-codec copy of its predecessor; encode →
    * [[graft.multimodal.MediaDecoder.aHash]] (8×8 box-resize → 64-bit
    * mean-threshold hash, one shuffle-free pass) → hamming-band
    * blocking ([[banded]]) → exact hamming ≤ 7, returning
    * (a, b, hamming) unordered. mm6 — the PERCEPTUAL image near-dup
    * gate, the intersection of dedup and multimodal — wraps it;
    * pipe7 unions it with dedup2's text pairs. */
  private[queries] def phashPairs(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    pairsFromSigs(graft.multimodal.MediaDecoder.aHash(
      imgFrame(t(s, dir, "documents"), 8, 1), "doc_id", "payload"))

  /** mm6's oracle signature-CTE chain (fixture replay → 8×8 binning →
    * mean threshold → bit packing) with mm6's default masks, ending
    * in `sig` (doc_id, hi, lo) — exposed so pipe7's oracle can
    * brute-force image pairs in the same WITH as dedup2's text
    * pairs. CTE names are mm6-local (g/px/pv/pp/cells/tot/bits/sig);
    * composing queries must not reuse them. */
  private[queries] def phashSigCtes: String = phashSigCtesFor(
    "CASE WHEN d.doc_id % 8 = 1 THEN d.doc_id - 1 ELSE d.doc_id END",
    "d.doc_id % 16 = 1", "d.doc_id % 16 = 9", "")

  private val phashQ = GQ(
    "mm6_phash_neardup",
    (s, dir) => phashPairs(s, dir).orderBy("a", "b"),
    Some(phashOracle(
      "CASE WHEN d.doc_id % 8 = 1 THEN d.doc_id - 1 ELSE d.doc_id END",
      "d.doc_id % 16 = 1", "d.doc_id % 16 = 9", "")))

  /** mm7's churn masks, shared by the query and its oracle filter:
    * inserts = doc_id % 3 == 0, updates = the % 7 == 2 injection docs
    * already in the seed, deletes = a seed slice disjoint from both. */
  private val mm7DelSql =
    "doc_id % 11 = 3 AND doc_id % 3 <> 0 AND doc_id % 7 <> 2"

  /** A doc keeps its SEED image iff it is never churned: in the seed
    * (% 3 ≠ 0) and not an update target (% 7 ≠ 2). */
  private val mm7SeedKept = "d.doc_id % 3 <> 0 AND d.doc_id % 7 <> 2"

  /** The mm7 mask-composition oracle expressions, shared verbatim by
    * every gate that replays the [[incDedupScenario]] final corpus
    * (mm7, mm10, mm12, st7): source doc, the two perturbation
    * booleans, and the alive filter. ONE definition, so a mask tweak
    * moves all four gates together instead of desyncing them. */
  private val Mm7OracleSd =
    s"CASE WHEN d.doc_id % 7 = 2 THEN d.doc_id - 1 " +
      s"WHEN $mm7SeedKept AND d.doc_id % 13 = 5 THEN d.doc_id - 1 " +
      "ELSE d.doc_id END"
  private val Mm7OraclePerturbA =
    s"(d.doc_id % 14 = 2) OR ($mm7SeedKept AND d.doc_id % 26 = 5)"
  private val Mm7OraclePerturbB =
    s"(d.doc_id % 14 = 9) OR ($mm7SeedKept AND d.doc_id % 26 = 18)"
  private val Mm7OracleAlive =
    "\n        WHERE NOT (" + mm7DelSql.replace("doc_id", "d.doc_id") + ")"

  /** Apply one churn batch of images to the maintained perceptual-hash
    * index — the ingest-time image-dedup shape of a 100 TB multimodal
    * corpus (the mm analog of [[NearDupIndex.reconcile]], simpler
    * because the 16-byte signature IS the verification artifact: no
    * re-decode of candidates, exact hamming comes straight off the
    * stored halves).
    *
    * State = a SIGNATURE STORE keyed by doc_id (hash halves; updates
    * are plain upserts, preCombine keeps the newest) and a PAIRS
    * table keyed (a, b) holding the SKEW-COLLAPSED pair set — the
    * [[pairsFromSigs]] contract (star edges inside byte-equal
    * signature groups, one cross pair per group pair), so a cluster
    * of k identical payloads persists k-1 rows, never O(k²). Cost is
    * O(churn + affected-group size) per call: only churn payloads are
    * decoded/hashed; candidates come from affected-group reps
    * band-probed against the store's group reps; the pairs
    * reconciliation is ONE mixed upsert+tombstone commit. No
    * full-corpus decode stage after bootstrap. */
  private[graft] def phashReconcile(
      churnImgs: org.apache.spark.sql.DataFrame,
      deletedIds: org.apache.spark.sql.DataFrame,
      sigs: graft.core.LakeTable,
      pairs: graft.core.LakeTable,
      ts: Long,
      // the ONE modality-specific step: payload frame → (doc_id,
      // hash_hi, hash_lo). Default = image aHash (mm7); mm10 passes
      // the audio envelope hash — everything downstream (banding,
      // store probe, mixed reconcile commit) is signature-generic.
      hashFn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        graft.multimodal.MediaDecoder.aHash(_, "doc_id", "payload"),
      // commit tag for the PAIRS reconciliation — the LAST write, so
      // "tag present ⇒ whole batch (sigs included) committed" holds
      // for a streaming ExactlyOnce guard (the NearDupIndex ordering
      // invariant); None for the batch gates
      tag: Option[String] = None,
      // optional band-posting index (blk, doc_id, hash_hi, hash_lo,
      // ts) keyed (blk, doc_id) with statsColumns (blk, ts) — the
      // [[NearDupIndex.reconcile]] postings contract: maintained in
      // lockstep, it replaces the per-batch store-wide rep scan +
      // 64-key explode with a file-pruned posting read. Attach from
      // the store's bootstrap batch or drop/recreate all three.
      postings: Option[graft.core.LakeTable] = None): ReconcileStats = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val cached = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.sql.DataFrame]
    def cache(df: org.apache.spark.sql.DataFrame) = {
      cached += df.persist(); df
    }
    // cache + TRUNCATE THE LOGICAL PLAN (lazy localCheckpoint) at the
    // frames every later relation embeds — the [[NearDupIndex]] fix,
    // same reasoning: self-referencing relations duplicate subtrees
    // per reference, and by the pairs write the plan tree is in the
    // 10⁵-node range, putting seconds of pure Catalyst/AQE driver
    // work inside one tiny commit (guide §3.3). Checkpoint blocks are
    // freed by the ContextCleaner; every truncated frame is O(churn).
    def pin(df: org.apache.spark.sql.DataFrame) = df.localCheckpoint(false)
    var sigWrite: Future[Any] = Future.successful(())
    var postWrite: Future[Any] = Future.successful(())
    // env-gated (GRAFT_PROFILE=1) stage timing, the write-path
    // profiler's read-side sibling — a no-op otherwise
    val profT0 = System.nanoTime()
    def prof(stage: String): Unit =
      if (sys.env.get("GRAFT_PROFILE").contains("1"))
        Console.err.println(f"[graft-profile] phashReconcile:$stage%-24s " +
          f"${(System.nanoTime() - profT0) / 1e9}%7.3fs")
    try {
      // plans pinned BEFORE the writes below (snapshot() resolves its
      // file list eagerly); a never-written store/pairs table has a
      // schema-only snapshot — the bootstrap branches
      val preStore = sigs.snapshot()
      val storeWasEmpty = !preStore.columns.contains("hash_lo")
      // the store PERSISTS each row's group representative (rep =
      // min doc_id over byte-equal signatures, maintained by this
      // reconcile): unaffected groups' reps read back filter-only, so
      // no per-batch window pass over the whole store — the full-store
      // sort was the streaming service's dominant fixed cost. A store
      // written before the rep column cannot be reconciled
      // incrementally — drop/recreate sigs AND pairs and rebuild with
      // a bootstrap reconcile.
      require(storeWasEmpty || (preStore.columns.contains("rep") &&
          preStore.columns.contains("ts")),
        "signature store predates the persisted-rep contract (no rep/" +
          "ts column) - drop/recreate the sigs AND pairs tables and " +
          s"rebuild with a bootstrap reconcile: ${sigs.basePath}")
      val pairsSnap = pairs.snapshot()
      val pairsBootstrap = !pairsSnap.columns.contains("a")
      // NULL-hash guard: hashFn's contract is "no row for a payload
      // with no signature", but a variant that emits NULL halves
      // instead would otherwise collapse every such doc into ONE
      // group under the rep window (shared rep, bogus hamming-0 star
      // edges). Filtering here makes a NULL-hash row mean the same
      // thing as an absent row — the doc joins the undecodable
      // tombstone side below and drops out of the index.
      val newSigs = cache(pin(hashFn(churnImgs)
        .filter(col("hash_hi").isNotNull && col("hash_lo").isNotNull)))
      // ids whose stored signature this batch may retire: every churn
      // payload (hashed or not — an undecodable churn doc leaves the
      // index, see delC below) plus explicit deletes. Derivable from
      // the INPUTS alone, so the old-signature lookup — a narrow
      // 3-column store scan, never the heavy full-row read — can run
      // on a background thread WHILE the churn decode+hash
      // materializes on this one (the two dominate the pre-write
      // serial prefix; overlapped they cost ~max, not sum).
      val churnIds = cache(churnImgs.select("doc_id")
        .unionByName(deletedIds).distinct())
      val oldSigsOfTouched =
        if (storeWasEmpty) newSigs.limit(0).select("hash_hi", "hash_lo")
        else preStore.select("doc_id", "hash_hi", "hash_lo")
          .join(churnIds, Seq("doc_id"), "leftsemi")
          .select("hash_hi", "hash_lo")
      // CRASH-REPLAY widening (the [[NearDupIndex.reconcile]]
      // invariant, same reasoning): if attempt 1 at THIS batch
      // committed the signature write and died before the tagged
      // pairs commit, the store already reflects attempt 1 — a
      // departed doc has no row and a re-hashed doc carries its NEW
      // signature, so churn-derived oldSigsOfTouched misses its OLD
      // group. Attempt 1 stamped every member of every affected group
      // with THIS ts, so "store signatures written at ts" recovers
      // exactly its affected-group set; on a clean first run the
      // store holds only older stamps and this arm is empty. Read
      // through the ts-pruned snapshotSkipping path: every clustered
      // base file predates this batch and skips, only the delta tail
      // is read. Plans pinned NOW, before the background write.
      // replay detection is a DRIVER-SIDE metadata check, not a scan:
      // the signature write below carries its own commit tag —
      // '<tag>:sigs' for tagged (streaming) callers, the synthesized
      // 'rcsigs:<ts>' for untagged batch callers — so the
      // sigs-committed/pairs-uncommitted crash window is visible as
      // that tag already on the sigs timeline and a clean first run
      // pays NOTHING here (previously every untagged call paid a full
      // ts-pruned store scan for the always-on conservative widening;
      // a contract-violating ts reuse only triggers a spurious
      // widening, which re-derives already-correct edges).
      // reserved marker prefix + LEGACY-STORE transition guard — the
      // [[NearDupIndex.reconcile]] rules, same reasoning: no caller tag
      // may alias a replay marker, and a store carrying untagged sigs
      // data commits (written by pre-protocol code, whose crash window
      // the tag probe cannot see) falls back to conservative widening.
      require(tag.forall(t => !t.startsWith("rcsigs")),
        s"caller tag must not use the reserved 'rcsigs' prefix: $tag")
      val sigsTag = Some(tag.map(_ + ":sigs").getOrElse(s"rcsigs:$ts"))
      val sigsCommits = sigs.timeline.commits()
      val replayed = sigsTag.exists(t0 =>
        sigsCommits.exists(_.tag.contains(t0))) ||
        (!storeWasEmpty && sigsCommits.exists(c => c.tag.isEmpty &&
          (c.action == "deltacommit" || c.action == "upsert")))
      val replaySigs =
        if (storeWasEmpty || !replayed)
          newSigs.limit(0).select("hash_hi", "hash_lo")
        else sigs.snapshotSkipping(Seq(graft.core.ColPred(
            "ts", "eq", Seq(ts.toString), isLong = true)))._1
          .filter(col("ts") === lit(ts)).select("hash_hi", "hash_lo")
      // collect the affected-signature set DRIVER-SIDE (bounded probe,
      // overlapped with the churn decode+hash): holding it on the
      // driver lets the store read below prune FILES via col-stats
      // instead of scanning the whole store per batch; beyond
      // PruneSigLimit (a rebuild, not churn) fall back to the lazy
      // full-scan semi-join — same rows, no pruning. Only worth its
      // driver jobs when the store can actually prune (declared
      // hash col-stats on base files).
      val pruneFeasible = !storeWasEmpty &&
        sigs.skippingWorthwhile("hash_hi")
      val sigProbe: Future[Array[(Long, Long)]] =
        if (!pruneFeasible) Future.successful(Array.empty)
        else Future {
          oldSigsOfTouched.unionByName(replaySigs)
            .distinct().limit(PruneSigLimit + 1)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
        }
      // materialize before the write: small-file sizing reads Catalyst
      // stats, exact only for a computed cache
      val hashedN =
        try newSigs.count()
        finally Await.ready(sigProbe, Duration.Inf)
      // surface a store-read failure here, not inside a later consumer
      val storeSigVals = Await.result(sigProbe, Duration.Inf)
      prof("hash+old-sig-probe")
      // a churn doc whose NEW payload yields no signature (undecodable
      // media; an all-silent clip under the envelope hash) must DROP
      // OUT of the index — its old signature describes a superseded
      // payload, and a from-scratch rebuild would have no row for it —
      // so it joins the tombstone side instead of silently keeping
      // stale pairs alive. Cached + counted: the drop-rate is the
      // reconcile's RETURNED observability ([[ReconcileStats]]) — a
      // codec regression silently dropping 30% of a corpus must be a
      // monitored number, not an invisible one (the count reads only
      // the churn's id column — pruned, O(churn))
      val undecodable = cache(churnImgs.select("doc_id")
        .join(newSigs.select("doc_id"), Seq("doc_id"), "left_anti"))
      val droppedN = undecodable.count()
      prof("undecodable")
      val delC = cache(deletedIds.unionByName(undecodable).distinct())
      // SKEW-COLLAPSED incremental reconcile — maintains exactly the
      // [[pairsFromSigs]] contract (star edges inside byte-equal
      // signature groups, one cross pair per group pair): a cluster
      // of k identical signatures holds k-1 persisted pairs, not
      // O(k²), and a churned cluster member re-derives O(k) pairs,
      // not O(k²). AFFECTED groups are the signatures that gained,
      // lost, or re-hashed a member this batch: the churn's NEW
      // signatures plus the PRE-store signatures of churned/departed
      // docs (a delete can promote a new representative, an insert
      // with a smaller id can demote one — either rewrites the
      // group's star edges and cross endpoints, which is why the
      // tombstone scope below is group members, not just churn ids),
      // plus the crash-replay widening collected above.
      val spark0 = churnImgs.sparkSession
      val newSigVals =
        if (!pruneFeasible || storeSigVals.length > PruneSigLimit)
          Array.empty[(Long, Long)]
        else newSigs.select("hash_hi", "hash_lo").distinct()
          .limit(PruneSigLimit + 1)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      val sigVals = (storeSigVals ++ newSigVals).distinct
      val pruneOn = pruneFeasible && sigVals.length <= PruneSigLimit
      val affectedSigs = cache(
        if (pruneOn) {
          import spark0.implicits._
          sigVals.toSeq.toDF("hash_hi", "hash_lo")
        } else newSigs.select("hash_hi", "hash_lo")
          .unionByName(oldSigsOfTouched)
          .unionByName(replaySigs)
          .distinct())
      // pre-write store slice the reconcile works from: FILE-PRUNED by
      // the affected signatures when the set is bounded (after the
      // store has been clustered by (hash_hi, hash_lo), a churn batch
      // plans only files whose hash range intersects an affected group
      // — O(affected files), the round-16 scaling fix; the hash_lo
      // IN-list is loose across hash_hi runs, which only keeps extra
      // files), the plain full snapshot otherwise. Exact under MOR
      // pruning per snapshotSkipping's contract: every key whose
      // current signature is affected is present and current; missing
      // keys have unaffected signatures, dropped by the semi-join
      // anyway. Plan pinned NOW, before the background write.
      val (preSlice0, skipStats) =
        if (storeWasEmpty)
          (newSigs.limit(0).withColumn("rep", lit(null).cast("long")),
            graft.core.SkipStats(0, 0, 0))
        else if (pruneOn) {
          val (df, st) = sigs.snapshotSkipping(Seq(
            graft.core.ColPred("hash_hi", "eq",
              sigVals.map(_._1.toString).distinct.toSeq, isLong = true),
            graft.core.ColPred("hash_lo", "eq",
              sigVals.map(_._2.toString).distinct.toSeq, isLong = true)))
          (df.select("doc_id", "hash_hi", "hash_lo", "rep"), st)
        } else
          (preStore.select("doc_id", "hash_hi", "hash_lo", "rep"),
            graft.core.SkipStats(0, 0, 0))
      val preSlice = cache(pin(preSlice0))
      // post-churn content of the affected slice, derived WITHOUT
      // re-reading files: every churn doc has a row in newSigs, so the
      // anti-join reproduces what the read-side merge would pick
      val store =
        if (storeWasEmpty) newSigs
        else newSigs.unionByName(
          preSlice.join(churnIds, Seq("doc_id"), "left_anti")
            .select("doc_id", "hash_hi", "hash_lo"))
      // members of AFFECTED groups only (affectedSigs is O(churn
      // groups) — AQE broadcasts the semi-join, so the planned slice
      // is scanned but never shuffled); the rep window then runs over
      // this slice, not the whole store
      import org.apache.spark.sql.expressions.Window
      val byGroup = Window.partitionBy("hash_hi", "hash_lo")
      val affectedMembers = cache(pin((
        if (storeWasEmpty)
          // bootstrap: every group is affected — skip the corpus-sized
          // signature distinct + semi-join entirely (affectedSigs then
          // never evaluates: its only other consumer anti-joins an
          // empty pre-store side, which the optimizer eliminates)
          store
        else store.join(affectedSigs, Seq("hash_hi", "hash_lo"), "leftsemi"))
        .withColumn("rep", min("doc_id").over(byGroup))))
      // materialize the shared cache (and the store MOR read under
      // it) ONCE on this thread before the background write launches:
      // racing the write future and the pairs chain into a cold cache
      // duplicates the store read — measured slower than the serial
      // read + overlapped write
      affectedMembers.count()
      prof("affected-members")
      val star = affectedMembers.filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("a"), col("doc_id").as("b"),
          lit(0).as("hamming"))
      val affectedReps = affectedMembers
        .filter(col("doc_id") === col("rep"))
        .select("doc_id", "hash_hi", "hash_lo")
      // the write set is the whole (cached) affected frame: every
      // churn row plus every member of a group the churn touched,
      // each carrying its CURRENT rep — a superset of the minimal
      // rep-diff, chosen deliberately: a semi/anti/diff-join
      // derivation of "only rows whose rep changed" costs 3 extra
      // per-batch join jobs, which at streaming batch sizes outweighs
      // re-upserting the (already small) affected slice. O(churn +
      // affected-group size) per batch — the reconcile's documented
      // cost envelope.
      val writeRows = affectedMembers
        .select("doc_id", "hash_hi", "hash_lo", "rep")
      // BAND-POSTING INDEX (the [[NearDupIndex.reconcile]] postings
      // contract, media form: entries DENORMALIZE the rep's hash
      // halves so candidates verify hamming straight off the posting
      // rows, no store join-back): derive this batch's posting delta
      // and the pruned probe slice BEFORE any write launches, so
      // every plan is pinned on pre-batch state.
      val postingsPlan: Option[(org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame,
          Option[org.apache.spark.sql.DataFrame])] =
        postings.map { p =>
          val pSnap = p.snapshot()
          val pBootstrap = !pSnap.columns.contains("blk")
          require(storeWasEmpty || !pBootstrap,
            "posting index attached to an already-populated signature " +
              "store - drop/recreate the sigs, pairs AND postings " +
              s"tables and rebuild with a bootstrap reconcile: ${p.basePath}")
          val oldRepRows =
            if (storeWasEmpty) preSlice.limit(0)
            else preSlice
              .join(affectedSigs, Seq("hash_hi", "hash_lo"), "leftsemi")
              .filter(col("doc_id") === col("rep"))
          val postDeletes = banded(oldRepRows).select("blk", "doc_id")
          val postUpserts = banded(affectedReps)
            .select("blk", "doc_id", "hash_hi", "hash_lo")
          // adaptive probe ([[NearDupIndex.PostingProbeCutoff]]):
          // file pruning only bites for micro-batch-sized key sets —
          // None keeps the rep-scan probe while the index writes
          // below still run
          val rbStored: Option[org.apache.spark.sql.DataFrame] =
            if (pBootstrap) None
            else {
              val blks = banded(affectedReps).select("blk").distinct()
                .limit(NearDupIndex.PostingProbeCutoff + 1).collect()
                .map(_.getLong(0))
              // FILE-PRUNED slice when the key set is micro-batch-
              // sized and the driver-side skipping plan shows real
              // pruning; otherwise the FULL posting scan — still
              // narrow columns, and it replaces re-deriving the same
              // rows via the store scan + band-key flatMap (see
              // NearDupIndex: measured ~2× cheaper)
              val pruned: Option[org.apache.spark.sql.DataFrame] =
                if (blks.length > NearDupIndex.PostingProbeCutoff) None
                else {
                  val (df, st) = p.snapshotSkipping(Seq(graft.core.ColPred(
                    "blk", "eq", blks.map(_.toString).toSeq,
                    isLong = true)))
                  if (sys.env.get("GRAFT_PROFILE").contains("1"))
                    Console.err.println(
                      s"[graft-profile] phashReconcile:posting-probe " +
                        s"keys=${blks.length} kept=${st.kept} " +
                        s"skipped=${st.skipped} delta=${st.deltaRead}")
                  if (st.kept > st.skipped && st.kept > 64) None
                  // ROW-level filter on top of the file pruning: an
                  // InSet at the scan keeps the candidate join
                  // O(probe matches)
                  else Some(df.where(col("blk").isin(blks.toSeq: _*)))
                }
              Some(pruned.getOrElse(pSnap)
                .select("blk", "doc_id", "hash_hi", "hash_lo").join(
                  oldRepRows.select("doc_id"), Seq("doc_id"),
                  "left_anti"))
            }
          (postDeletes, postUpserts, rbStored)
        }
      // one sigs commit: churn signatures + rep updates + departed/
      // undecodable-doc tombstones, run on a BACKGROUND thread so it
      // overlaps the candidate/verify/pairs chain (the NearDupIndex
      // pattern — the writes touch different tables, every relation
      // derives post-churn content from pinned pre-write plans, the
      // pairs snapshot is already pinned, and the shared
      // affectedMembers cache is already materialized above — exact
      // Catalyst stats for the writes' small-file sizing, no cold-
      // cache race). combine=false — one row per doc (and per
      // (blk, doc_id): band keys are index-prefixed, thus distinct
      // within a rep) by construction. WRITE ORDER is load-bearing:
      // postings commit BEFORE sigs (awaited inside the sigs future) —
      // a replay after a sigs-committed/postings-uncommitted crash
      // would derive posting delete keys from NEW hashes and could
      // never retire a re-hashed rep's old-band entries; and the sigs
      // write is awaited BEFORE the tagged pairs commit ("pairs tag
      // present ⇒ whole batch committed" is the crash-safety
      // invariant the streaming service relies on).
      postWrite = postingsPlan match {
        case Some((postDeletes, postUpserts, _)) => Future {
          postings.get.upsertWithDeletes(
            postUpserts.withColumn("ts", lit(ts)), postDeletes,
            combine = false)
        }
        case None => Future.successful(())
      }
      sigWrite = Future {
        Await.result(postWrite, Duration.Inf)
        // '<tag>:sigs' marks the sig commit itself — the replay
        // detector above reads it from timeline metadata
        sigs.upsertWithDeletes(writeRows.withColumn("ts", lit(ts)), delC,
          tag = sigsTag, combine = false)
      }
      // cross candidates: affected-group reps band-probed against ALL
      // group reps = the recomputed affected reps plus the STORED reps
      // of unaffected groups — from the PRE-MATERIALIZED, file-pruned
      // posting slice when an index is attached (never the store-wide
      // rep scan + 64-key explode), else the filter + broadcast
      // anti-join off the pre-store scan (no window, no shuffle);
      // pairs wholly inside the batch are found because affected reps
      // are themselves reps
      val rbFrame = postingsPlan match {
        case Some((_, _, Some(rbStored))) => banded(affectedReps)
          .select("doc_id", "hash_hi", "hash_lo", "blk")
          .unionByName(rbStored
            .select("doc_id", "hash_hi", "hash_lo", "blk"))
        case _ =>
          val storedReps =
            if (storeWasEmpty) preSlice.limit(0)
            else preStore.select("doc_id", "hash_hi", "hash_lo", "rep")
          val allReps = affectedReps.unionByName(
            storedReps.filter(col("doc_id") === col("rep"))
              .join(affectedSigs, Seq("hash_hi", "hash_lo"), "left_anti")
              .select("doc_id", "hash_hi", "hash_lo"))
          banded(allReps)
      }
      val cross = banded(affectedReps).as("l")
        .join(rbFrame.as("r"),
          col("l.blk") === col("r.blk") &&
            col("l.doc_id") =!= col("r.doc_id"))
        .select(least(col("l.doc_id"), col("r.doc_id")).as("a"),
          greatest(col("l.doc_id"), col("r.doc_id")).as("b"),
          hammingCol.as("hamming"))
        .filter(col("hamming") <= 7) // before distinct: see pairsFromSigs
        .distinct()
      val cand = cache(pin(star.unionByName(cross)))
      cand.count()
      prof("candidates")
      // the store write must be durable before the tagged pairs commit
      // (result, not ready: a store-write failure must surface before
      // the tag is written)
      Await.result(sigWrite, Duration.Inf)
      prof("index-writes")
      if (pairsBootstrap)
        pairs.upsert(cand.withColumn("ts", lit(ts)), tag = tag,
          combine = false)
      else {
        // tombstone side: stored pairs touching any CURRENT member of
        // an affected group (their star/cross edges were re-derived
        // above — an unchanged edge is an update) or any churned/
        // departed id (their edges must die or re-home). A pair
        // between two unaffected groups touches neither — reps can't
        // have changed, so it is untouched. OR-of-keys as two hash
        // semi-joins.
        val staleIds = cache(affectedMembers.select("doc_id")
          .unionByName(churnIds).distinct())
        val cur = pairsSnap.select("a", "b")
        val touched = cur
          .join(staleIds.withColumnRenamed("doc_id", "a"), Seq("a"),
            "leftsemi")
          .unionByName(cur.join(
            staleIds.withColumnRenamed("doc_id", "b"), Seq("b"),
            "leftsemi"))
          .distinct()
        pairs.upsertWithDeletes(cand.withColumn("ts", lit(ts)), touched,
          tag = tag, combine = false)
      }
      prof("pairs-commit")
      ReconcileStats(hashedN, droppedN,
        skipStats.kept, skipStats.skipped, skipStats.deltaRead)
    } finally {
      // on a pairs-chain failure the index writes may still be in
      // flight — never unpersist their inputs from under them
      Await.ready(postWrite, Duration.Inf)
      Await.ready(sigWrite, Duration.Inf)
      cached.foreach(_.unpersist())
    }
  }

  /** Per-reconcile decode observability: `hashed` churn payloads
    * produced a signature this batch; `dropped` did not (undecodable
    * media, or a signature-less payload like an all-silent clip) and
    * were tombstoned out of the index. The drop-RATE is the number a
    * 100 TB curation run monitors: "unique doc" and "codec regression
    * silently dropped a third of the corpus" are indistinguishable
    * from the pairs table alone. */
  /** Affected-signature sets up to this size prune the store read
    * FILE-wise through the col-stats index (collected driver-side);
    * larger batches — a rebuild, not churn — fall back to the lazy
    * full-scan semi-join (the [[NearDupIndex.PruneFpLimit]] analog). */
  private[graft] val PruneSigLimit = 20000

  final case class ReconcileStats(hashed: Long, dropped: Long,
      storeFilesKept: Int = 0, storeFilesSkipped: Int = 0,
      storeFilesDelta: Int = 0)

  /** mm7 — INCREMENTAL perceptual image dedup: the maintained-index
    * version of mm6, the shape a 100 TB multimodal corpus actually
    * runs at ingest (pipe4's pattern with image signatures). Seed
    * images carry their OWN injected pairs (% 13 == 5 copies — so the
    * bootstrap stores real pairs and the churn reconcile exercises
    * the non-bootstrap tombstone branch); a churn commit brings
    * inserts (doc_id % 3 == 0), updates (the % 7 == 2 docs re-imaged
    * as perturbed copies of their predecessor — brightness or
    * single-pixel, cross-codec) and deletes — the delete slice
    * includes partners of STORED bootstrap pairs (e.g. 278 of
    * (277, 278): % 13 == 5 ∧ % 11 == 3), so a reconcile that fails to
    * tombstone a departed doc's stored pairs hash-mismatches. ONLY
    * the churn is read (incremental scan), decoded, hashed, and
    * band-probed against the store. The oracle replays the FINAL
    * corpus brute-force (image rule per churn membership: churned
    * docs follow the (7, 2) masks, never-churned seed docs keep their
    * (13, 5) image) — the maintained pairs table must equal a
    * from-scratch batch rebuild. */
  /** The ONE incremental perceptual-dedup scenario (mm7/mm10 share
    * it; only the payload fixture and the 64-bit signature fn
    * differ): a seed commit carries (13, 5)-injected payloads — the
    * bootstrap reconcile finds and STORES those pairs, so the churn
    * reconcile exercises the non-bootstrap tombstone branch — then a
    * churn commit brings inserts (doc_id % 3 == 0), updates (the
    * % 7 == 2 docs re-encoded under the (7, 2) masks) and the
    * [[mm7DelSql]] delete slice, whose victims include partners of
    * stored bootstrap pairs. ONLY the increment is read
    * (incremental scan), hashed, and band-probed against the store
    * ([[phashReconcile]]); the maintained pairs table must equal a
    * from-scratch batch rebuild of the FINAL corpus, which is what
    * the oracle replays brute-force. */
  private def incDedupScenario(
      s: org.apache.spark.sql.SparkSession, dir: String, prefix: String,
      frame: (org.apache.spark.sql.DataFrame, Int, Int) =>
        org.apache.spark.sql.DataFrame,
      hashFn: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.core.{LakeTable, TableProps}
    def scr(n: String) = QueryPack.scratchDir(s, dir, n)
    val ids = t(s, dir, "documents").select("doc_id")
    val seedIds = ids.filter(col("doc_id") % 3 =!= 0)
    val churnIds = ids.filter(
      col("doc_id") % 3 === 0 || col("doc_id") % 7 === 2)
    val delIds = ids.filter(expr(mm7DelSql))
    val payloads = LakeTable.create(s, scr(prefix + "pay"),
      TableProps(prefix + "pay", Seq("doc_id"), Some("ts"), Seq.empty))
    val sigs = LakeTable.create(s, scr(prefix + "sigs"),
      TableProps(prefix + "sigs", Seq("doc_id"), Some("ts"), Seq.empty,
        tableType = "mor"))
    val pairsT = LakeTable.create(s, scr(prefix + "pairs"),
      TableProps(prefix + "pairs", Seq("a", "b"), Some("ts"), Seq.empty,
        tableType = "mor"))
    // seed commit: (13, 5)-injected payloads — the % 7 == 2 docs get
    // their perturbed payload only at update time, so their pair must
    // come from the incremental path
    val c1 = payloads.upsert(frame(seedIds, 13, 5)
      .withColumn("ts", lit(1L)))
    // the seed snapshot plan is pinned (eager live-file list) BEFORE
    // the churn commit below, so the two legs can overlap: the churn
    // payload commit + increment read touch only the payload table,
    // the seed reconcile writes only sigs/pairs — the churn commit
    // rides the seed reconcile's shadow instead of the serial path
    // between the two reconciles (the pipe4 gate's shape)
    val seedSnap = payloads.snapshot().select("doc_id", "payload")
    // incLeak: if the foreground reconcile throws AFTER the background
    // leg persisted `inc`, overlapping's await-then-rethrow would leak
    // the cache entry until the harness clearCache — unpersist it on
    // that path too (one try/finally over the whole lifetime of `inc`)
    var incLeak: org.apache.spark.sql.DataFrame = null
    try {
      val (inc, _) = QueryPack.overlapping(
          Seq(payloads.basePath), Seq(sigs.basePath, pairsT.basePath)) {
        // churn commit: final payloads for inserts + updates, tombstones
        // for the departed slice — then ONLY the increment is read
        payloads.upsertWithDeletes(
          frame(churnIds, 7, 2).withColumn("ts", lit(2L)), delIds)
        val inc = payloads.incremental(c1).select("doc_id", "payload")
          .persist()
        incLeak = inc
        inc.count()
        inc
      } {
        phashReconcile(seedSnap, delIds.limit(0), sigs, pairsT, 1L, hashFn)
      }
      phashReconcile(inc, delIds, sigs, pairsT, 2L, hashFn)
    } finally {
      Option(incLeak).foreach(_.unpersist())
      ()
    }
    pairsT.snapshot().select("a", "b", "hamming").orderBy("a", "b")
  }

  private val phashIncQ = GQ(
    "mm7_phash_incremental",
    (s, dir) => incDedupScenario(s, dir, "mm7", imgFrame,
      df => graft.multimodal.MediaDecoder.aHash(df, "doc_id", "payload")),
    Some(phashOracle(
      Mm7OracleSd,
      Mm7OraclePerturbA,
      Mm7OraclePerturbB,
      Mm7OracleAlive)))

  /** mm8 — energy-gated audio segmentation, decode included: the
    * silence-trim / VAD-shape primitive a speech-curation pipeline
    * runs over every clip before transcription. Each doc gets a
    * deterministic mono WAV whose samples alternate between LOUD
    * 8-frame blocks (amplitude ∈ [50, 150] — two of every three
    * blocks, phase doc-dependent) and QUIET blocks (|amplitude| < 20),
    * built by the byte-level WAV encoder; [[graft.multimodal
    * .MediaDecoder.segmentPcm]] real-RIFF-parses it and emits each
    * maximal ≥-threshold run with integer start/length/energy in ONE
    * streaming pass (O(1) state — at 100 TB of audio the operator
    * never buffers a clip). The DuckDB oracle replays the sample
    * arithmetic over an unrolled frame grid and re-derives the runs
    * relationally (lag → run-start flags → running sum = run id), so
    * an off-by-one at either end of a segment, a dropped
    * tail-of-clip segment, or a sign error in the 16-bit decode
    * hash-mismatches. */
  private val segmentQ = GQ(
    "mm8_audio_segments",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.MediaDecoder
      val payloads = t(s, dir, "documents").select("doc_id")
        .as[Long]
        .mapPartitions { it =>
          it.map { d =>
            val n = (d % 40 + 20).toInt
            val samples = Array.tabulate(n) { j =>
              if ((d * 7 + j / 8) % 3 != 0)
                ((d * 31 + j * 37) % 101 + 50).toShort // loud block
              else ((d * 11 + j * 5) % 40 - 20).toShort // quiet block
            }
            (d, MediaDecoder.encodeWavPcm16(8000, 1, samples))
          }
        }
        .toDF("doc_id", "payload")
      MediaDecoder.segmentPcm(payloads, "doc_id", "payload", 50)
        .orderBy("doc_id", "seg_idx")
    },
    Some("""WITH js(j) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),
          (10),(11),(12),(13),(14),(15),(16),(17),(18),(19),
          (20),(21),(22),(23),(24),(25),(26),(27),(28),(29),
          (30),(31),(32),(33),(34),(35),(36),(37),(38),(39),
          (40),(41),(42),(43),(44),(45),(46),(47),(48),(49),
          (50),(51),(52),(53),(54),(55),(56),(57),(58),(59)),
      s AS (SELECT d.doc_id, j, d.doc_id % 40 + 20 AS n,
          CASE WHEN (d.doc_id * 7 + j // 8) % 3 <> 0
               THEN (d.doc_id * 31 + j * 37) % 101 + 50
               ELSE (d.doc_id * 11 + j * 5) % 40 - 20 END AS x
        FROM documents d CROSS JOIN js
        WHERE j < d.doc_id % 40 + 20),
      v AS (SELECT doc_id, j, n, x, abs(x) >= 50 AS voiced FROM s),
      m AS (SELECT doc_id, j, n, x, voiced,
          CASE WHEN voiced AND NOT coalesce(
              lag(voiced) OVER (PARTITION BY doc_id ORDER BY j), FALSE)
            THEN 1 ELSE 0 END AS segstart
        FROM v),
      r AS (SELECT doc_id, j, n, x, voiced,
          SUM(segstart) OVER (PARTITION BY doc_id ORDER BY j) AS run
        FROM m)
      SELECT doc_id,
        CAST(min(n) AS INT) AS frames_in,
        CAST(run AS INT) AS seg_idx,
        CAST(min(j) AS INT) AS start_frame,
        CAST(count(*) AS INT) AS n_frames,
        CAST(sum(x * x) AS BIGINT) AS sumsq
      FROM r WHERE voiced
      GROUP BY doc_id, run
      ORDER BY doc_id, seg_idx"""))

  /** Shared deterministic audio fixture for the envelope-hash gates
    * (mm9/mm10): doc d is a RE-ENCODED COPY of d-1 iff
    * d % pairMod == rem — amplitude-doubled with a deterministic ±1
    * per-sample magnitude jitter (a requantized transfer) when
    * d % (2·pairMod) == rem, or prefixed with 10–49 frames of
    * sub-threshold silence (a padded re-container) when it's
    * rem + pairMod (a negative `rem` disables injection). Base clip:
    * m = sd % 60 + 140 mono PCM frames, every magnitude ∈ [50, 250]
    * (loud throughout, so a padded copy's ACTIVE region is exactly
    * the source clip), magnitude pattern doc-dependent via
    * multiplicative coefficients (uncorrelated envelopes across
    * docs), sign a separate ±pattern the envelope must ignore.
    * mm9 uses masks (9, 2); mm10 seeds with (13, 5) and churns with
    * (7, 2) — the mm7 mask scheme. */
  private def audioNearDupFixture(
      d: Long, pairMod: Int, rem: Int): Array[Byte] = {
    import graft.multimodal.MediaDecoder
    val inject = rem >= 0 && d % pairMod == rem
    val sd = if (inject) d - 1 else d
    val m2 = (d % (2 * pairMod)).toInt
    val scaled = inject && m2 == rem
    val padded = inject && m2 == rem + pairMod
    val m = (sd % 60 + 140).toInt
    val pad = if (padded) (d % 40 + 10).toInt else 0
    val samples = Array.tabulate(pad + m) { i =>
      if (i < pad) ((i.toLong * 11) % 31 - 15).toShort // |x| < 50: silence
      else {
        val j = (i - pad).toLong
        val mag = 50 + ((sd * 31 + j) * (sd % 83 + 13) +
          j * j * (sd % 29 + 7)) % 101
        val magOut = if (scaled) 2 * mag + (j % 3 - 1) else mag
        val sign = if ((sd + j) % 4 < 2) 1 else -1
        (sign * magOut).toShort
      }
    }
    MediaDecoder.encodeWavPcm16(8000, 1, samples)
  }

  /** (doc_id) frame → (doc_id, payload) WAV fixture frame — the
    * audio instance of [[payloadFrame]]. */
  private val audioFrame = payloadFrame(audioNearDupFixture) _

  /** Envelope-oracle signature CTEs (fixture magnitude replay →
    * 65-window sums → mean-delta bits → packing), ending in `esig`
    * (doc_id, hi, lo). Names are e-prefixed and disjoint from
    * [[phashSigCtesFor]]'s, so a gate can compose both modalities in
    * one WITH. Parameterized like the phash builder: `sdSql` (source
    * doc), `sclSql` (amplitude-scaled boolean) — the padded variant
    * never appears because trim provably removes padding, which is
    * exactly the claim the padded fixtures test on the Spark side —
    * and `alive` (a WHERE filtering the doc set). The window fold
    * left-joins a full 65-window spine: a clip with fewer than 65
    * active frames leaves windows EMPTY, and [[graft.multimodal
    * .MediaDecoder.envHash64]] compares an empty window as mean 0
    * (sum 0, count clamped to 1) — an inner self-join would silently
    * DROP those bits and desync from the Scala side on short clips
    * (the fixtures' clips are 140–199 frames, but the builder must
    * not depend on that). */
  private def envSigCtes(
      sdSql: String, sclSql: String, alive: String): String =
    s"""eg AS (SELECT j FROM range(0, 200) t(j)),
      ed AS (SELECT doc_id, $sdSql AS sd, $sclSql AS scl
        FROM documents d$alive),
      edim AS (SELECT doc_id, sd, scl, sd % 60 + 140 AS m FROM ed),
      emag AS (SELECT doc_id, m, j, scl,
          50 + ((sd*31 + j) * (sd % 83 + 13) + j*j*(sd % 29 + 7)) % 101 AS b0
        FROM edim CROSS JOIN eg WHERE j < m),
      eamp AS (SELECT doc_id, m, j,
          CASE WHEN scl THEN 2*b0 + (j % 3 - 1) ELSE b0 END AS a
        FROM emag),
      ewin0 AS (SELECT doc_id, (j * 65) // m AS w,
          CAST(sum(a) AS BIGINT) AS e, CAST(count(*) AS BIGINT) AS c
        FROM eamp GROUP BY doc_id, (j * 65) // m),
      espine AS (SELECT doc_id, eg.j AS w
        FROM (SELECT DISTINCT doc_id FROM ed) eds CROSS JOIN eg
        WHERE eg.j < 65),
      ewin AS (SELECT s.doc_id, s.w,
          COALESCE(w0.e, CAST(0 AS BIGINT)) AS e,
          CASE WHEN w0.c IS NULL OR w0.c = 0
            THEN CAST(1 AS BIGINT) ELSE w0.c END AS c
        FROM espine s LEFT JOIN ewin0 w0
          ON w0.doc_id = s.doc_id AND w0.w = s.w),
      ebits AS (SELECT l.doc_id, l.w AS k,
          CASE WHEN l.e * r.c >= r.e * l.c THEN 1 ELSE 0 END AS bit
        FROM ewin l JOIN ewin r ON l.doc_id = r.doc_id AND r.w = l.w + 1
        WHERE l.w < 64),
      esig AS (SELECT doc_id,
          CAST(sum(CASE WHEN k < 32
            THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS lo,
          CAST(sum(CASE WHEN k >= 32
            THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS hi
        FROM ebits GROUP BY doc_id)"""

  /** Full envelope oracle: replay signatures ([[envSigCtes]]), then
    * verify pairs BRUTE-FORCE over the 64-bit signatures — a banding
    * recall loss, a trim off-by-one, or a windowing skew on the Spark
    * side hash-mismatches. */
  private def envOracle(
      sdSql: String, sclSql: String, alive: String): String =
    s"""WITH ${envSigCtes(sdSql, sclSql, alive)},
      ${collapsedPairCtes("esig", "ce")}
      SELECT a, b, hamming FROM cecpairs ORDER BY a, b"""

  /** mm9 — PERCEPTUAL audio near-dup, the last dedup modality (text:
    * dedup2–6, image: mm6/mm7): every doc gets a deterministic mono
    * WAV ([[audioNearDupFixture]]); every 9th is a re-encoded copy of
    * its predecessor — amplitude-rescaled or silence-padded, the
    * perturbations [[graft.multimodal.MediaDecoder.envHash64]]'s
    * trim + mean-delta envelope bits are built to survive. Pipeline:
    * encode → envelope hash (streaming RIFF parse, O(windows) state)
    * → the SAME hamming-band blocking as the image gates ([[banded]]
    * — pigeonhole full recall at d ≤ 7, candidates band-bounded,
    * never all-pairs) → exact hamming ≤ 7. */
  /** mm9's Spark pipeline as a reusable pair source (the audio twin
    * of [[phashPairs]]): encode the (9, 2)-masked WAV fixtures →
    * envelope hash → [[pairsFromSigs]]. mm9 wraps it; pipe8 unions it
    * with the text and image pair sources. */
  private[queries] def audioPairs(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    pairsFromSigs(graft.multimodal.MediaDecoder.envHash(
      audioFrame(t(s, dir, "documents"), 9, 2), "doc_id", "payload", 50))

  /** mm9's oracle signature-CTE chain with mm9's default masks,
    * ending in `esig` (doc_id, hi, lo) — exposed for pipe8's joint
    * oracle exactly like [[phashSigCtes]] is for pipe7's. CTE names
    * are e-prefixed and disjoint from the phash chain's. */
  private[queries] def envSigCtesMm9: String = envSigCtes(
    "CASE WHEN d.doc_id % 9 = 2 THEN d.doc_id - 1 ELSE d.doc_id END",
    "d.doc_id % 18 = 2", "")

  private val audioNearDupQ = GQ(
    "mm9_audio_neardup",
    (s, dir) => audioPairs(s, dir).orderBy("a", "b"),
    Some(envOracle(
      "CASE WHEN d.doc_id % 9 = 2 THEN d.doc_id - 1 ELSE d.doc_id END",
      "d.doc_id % 18 = 2", "")))

  /** mm10 — INCREMENTAL perceptual audio dedup: [[incDedupScenario]]
    * with the audio fixture and the envelope hash — the maintained
    * form of mm9, completing the modality symmetry (text pipe4,
    * image mm7, audio mm10) on the SAME signature-store machinery;
    * only the 64-bit hash differs. Oracle = brute-force envelope
    * replay of the final corpus under the mm7 mask composition
    * (churned docs follow (7, 2), never-churned seed docs keep their
    * (13, 5) clip, deletes filtered). */
  private val audioIncQ = GQ(
    "mm10_audio_incremental",
    (s, dir) => incDedupScenario(s, dir, "mm10",
      audioFrame,
      df => graft.multimodal.MediaDecoder
        .envHash(df, "doc_id", "payload", 50)),
    Some(envOracle(
      Mm7OracleSd,
      Mm7OraclePerturbA,
      Mm7OracleAlive)))

  /** Time-fraction sample slots per video signature (shared by the
    * Spark fold and its oracle replay). */
  private val VSamples = 5

  /** One 16×16 BMP24 fixture frame's byte size: 54-byte header + 16
    * rows of 48 pixel bytes (stride already 4-aligned) — the fixed
    * frame-window contract [[graft.multimodal.MediaDecoder.videoHash64]]
    * strides by. */
  private val VFrameBytes = 54 + PhSide * ((PhSide * 3 + 3) / 4 * 4)

  /** Shared deterministic video fixture for the video near-dup gate
    * (mm11): doc d's clip is `sd % 3 + 4` concatenated 16×16 BMP
    * frames, frame fi's pixels the [[chVal]] noise arithmetic at seed
    * `sd·5 + fi·3` (scene content varies per frame, uncorrelated
    * across docs). Doc d is a RE-ENCODED COPY of d-1 iff
    * d % pairMod == rem — globally brightened (+1 every channel,
    * clamped) when d % (2·pairMod) == rem, or FRAME-RATE DOUBLED
    * (every source frame emitted twice: re-encode at 2× fps) when
    * it's rem + pairMod (a negative `rem` disables injection). mm11
    * uses masks (8, 3). Frames are BMP-only: fixed byte size is the
    * frame-container contract (PNG frames vary per-frame). */
  private def videoFixture(d: Long, pairMod: Int, rem: Int): Array[Byte] = {
    import graft.multimodal.MediaDecoder
    val inject = rem >= 0 && d % pairMod == rem
    val sd = if (inject) d - 1 else d
    val m2 = (d % (2 * pairMod)).toInt
    val bright = inject && m2 == rem
    val dbl = inject && m2 == rem + pairMod
    val fsrc = (sd % 3 + 4).toInt
    val nf = if (dbl) 2 * fsrc else fsrc
    val frames = (0 until nf).map { i =>
      val fi = if (dbl) i / 2 else i
      val sv = sd * 5 + fi * 3
      def px(x: Int, y: Int): Int = {
        def c(k: Int) = {
          val v = chVal(sv, x, y, k)
          if (bright) math.min(v + 1, 255) else v
        }
        (c(0) << 16) | (c(1) << 8) | c(2)
      }
      MediaDecoder.encodeBmp24With(PhSide, PhSide)(px)
    }
    Array.concat(frames: _*)
  }

  /** (doc_id) frame → (doc_id, payload) video fixture frame — the
    * video instance of [[payloadFrame]]. */
  private val videoFrame = payloadFrame(videoFixture) _

  /** Video-oracle signature CTEs (fixture frame replay → per-sampled-
    * frame aHash bits → per-bit majority fold → packing), ending in
    * `vsig` (doc_id, hi, lo). Names are v-prefixed and disjoint from
    * both the phash and envelope chains, so a joint gate can compose
    * all three modalities in one WITH. Parameterized by `sdSql`
    * (source doc), `brightSql` (global +1 boolean), `dblSql`
    * (frame-rate-doubled boolean), `alive` (doc-set WHERE filter).
    * The rate-doubling never reaches the pixel arithmetic: slot k of
    * a doubled clip reads source frame ⌊⌊k·2m/T⌋/2⌋ = ⌊k·m/T⌋ — the
    * identity the Spark fold's time-fraction sampling relies on is
    * REPLAYED, not assumed, so a sampling off-by-one on either side
    * hash-mismatches. */
  private def videoSigCtesFor(
      sdSql: String, brightSql: String, dblSql: String,
      alive: String): String =
    s"""vg(i) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
          (8),(9),(10),(11),(12),(13),(14),(15)),
      vk(k) AS (VALUES (0),(1),(2),(3),(4)),
      vd AS (SELECT doc_id, $sdSql AS sd, $brightSql AS bright,
          $dblSql AS dbl
        FROM documents d$alive),
      vdim AS (SELECT doc_id, sd, bright, dbl,
          (sd % 3 + 4) * (CASE WHEN dbl THEN 2 ELSE 1 END) AS nf
        FROM vd),
      vfr AS (SELECT doc_id, bright, k,
          sd * 5 + (CASE WHEN dbl THEN ((k * nf) // $VSamples) // 2
                         ELSE (k * nf) // $VSamples END) * 3 AS sv
        FROM vdim CROSS JOIN vk),
      vpx AS (SELECT doc_id, k, bright, sv AS sd, xs.i AS xi, ys.i AS yi
        FROM vfr CROSS JOIN vg xs CROSS JOIN vg ys),
      vpv AS (SELECT doc_id, k, xi, yi, bright,
          ${chanSql(0)} AS r0,
          ${chanSql(1)} AS g0,
          ${chanSql(2)} AS b0
        FROM vpx),
      vpp AS (SELECT doc_id, k, xi, yi,
          CASE WHEN bright THEN LEAST(r0 + 1, 255) ELSE r0 END
          + CASE WHEN bright THEN LEAST(g0 + 1, 255) ELSE g0 END
          + CASE WHEN bright THEN LEAST(b0 + 1, 255) ELSE b0 END AS gray
        FROM vpv),
      vcells AS (SELECT doc_id, k, xi // 2 AS cx, yi // 2 AS cy,
          CAST(sum(gray) AS BIGINT) AS cg
        FROM vpp GROUP BY doc_id, k, xi // 2, yi // 2),
      vtot AS (SELECT doc_id, k, CAST(sum(cg) AS BIGINT) AS tg
        FROM vcells GROUP BY doc_id, k),
      vbits AS (SELECT c.doc_id, c.k, cy * 8 + cx AS i,
          CASE WHEN cg * 64 >= tg THEN 1 ELSE 0 END AS bit
        FROM vcells c JOIN vtot
          ON vtot.doc_id = c.doc_id AND vtot.k = c.k),
      vones AS (SELECT doc_id, i, CAST(sum(bit) AS BIGINT) AS ones,
          CAST(count(*) AS BIGINT) AS sampled
        FROM vbits GROUP BY doc_id, i),
      vmaj AS (SELECT doc_id, i,
          CASE WHEN 2 * ones >= sampled THEN 1 ELSE 0 END AS bit
        FROM vones),
      vsig AS (SELECT doc_id,
          CAST(sum(CASE WHEN i < 32
            THEN bit * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS lo,
          CAST(sum(CASE WHEN i >= 32
            THEN bit * (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)
            AS BIGINT) AS hi
        FROM vmaj GROUP BY doc_id)"""

  /** mm11's oracle signature-CTE chain with mm11's default masks —
    * exposed for a joint gate exactly like [[phashSigCtes]] /
    * [[envSigCtesMm9]]. */
  private[queries] def videoSigCtes: String = videoSigCtesFor(
    "CASE WHEN d.doc_id % 8 = 3 THEN d.doc_id - 1 ELSE d.doc_id END",
    "d.doc_id % 16 = 3", "d.doc_id % 16 = 11", "")

  /** Full video oracle: replay folded signatures ([[videoSigCtesFor]]),
    * then verify pairs BRUTE-FORCE over the 64-bit signatures — a
    * banding recall loss, a sampling off-by-one, or a majority-fold
    * tie-break skew on the Spark side hash-mismatches. */
  private def videoOracle(
      sdSql: String, brightSql: String, dblSql: String,
      alive: String): String =
    s"""WITH ${videoSigCtesFor(sdSql, brightSql, dblSql, alive)},
      ${collapsedPairCtes("vsig", "cv")}
      SELECT a, b, hamming FROM cvcpairs ORDER BY a, b"""

  /** mm11's Spark pipeline as a reusable pair source (the video twin
    * of [[phashPairs]]): encode the (8, 3)-masked multi-frame
    * fixtures → [[graft.multimodal.MediaDecoder.videoHash]]
    * (time-fraction frame sampling + per-frame aHash + per-bit
    * majority fold, one shuffle-free pass) → [[pairsFromSigs]]. */
  private[queries] def videoPairs(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    pairsFromSigs(graft.multimodal.MediaDecoder.videoHash(
      videoFrame(t(s, dir, "documents"), 8, 3), "doc_id", "payload",
      VFrameBytes, VSamples))

  /** mm11 — PERCEPTUAL video near-dup, completing the modality matrix
    * (text dedup2–6, image mm6/mm7, audio mm9/mm10): every doc gets a
    * deterministic multi-frame clip ([[videoFixture]]); every 8th is
    * a re-encoded copy of its predecessor — globally brightened or
    * frame-rate doubled, the perturbations the time-fraction-sampled
    * majority fold is built to survive (rate changes cancel exactly;
    * brightness rides aHash's per-frame mean-threshold invariance,
    * and per-bit majority never amplifies residual clamp noise).
    * Pipeline: encode → per-video 64-bit signature (O(samples) frame
    * decodes per clip — skipped frames never read) → the SAME
    * hamming-band blocking as every other modality
    * ([[pairsFromSigs]]) → exact hamming ≤ 7. */
  private val videoNearDupQ = GQ(
    "mm11_video_neardup",
    (s, dir) => videoPairs(s, dir).orderBy("a", "b"),
    Some(videoOracle(
      "CASE WHEN d.doc_id % 8 = 3 THEN d.doc_id - 1 ELSE d.doc_id END",
      "d.doc_id % 16 = 3", "d.doc_id % 16 = 11", "")))

  /** pipe9's per-modality (seedMod, seedRem, churnMod, churnRem)
    * injection masks — deliberately DISTINCT per modality so the
    * joint canonical gate's cross-modality merges are real, not an
    * artifact of every modality flagging the same pairs. The video
    * churn mask's residue is ≡ 2 (mod 7) so its injected docs are
    * churn members via the % 7 leg (a residue forcing % 3 == 0 — the
    * other membership leg — would pin every audio AND video churn
    * pair end to ≡ 0 (mod 3), making the two modalities structurally
    * un-chainable on consecutive docs); audio's (6, 0) rides the % 3
    * leg. The composition yields tri-modal clusters: d ≡ 37 (mod 42)
    * gives audio (d-2, d-1) (d-1 ≡ 0 mod 6, scaled), image (d-1, d)
    * (d ≡ 2 mod 7, pixel-pop) AND video (d-1, d) (d ≡ 16 mod 21,
    * rate-doubled) — one cluster, three modalities, every
    * perturbation variant. */
  private val P9ImgSeed = (13, 5)
  private val P9ImgChurn = (7, 2)
  private val P9AudSeed = (11, 4)
  private val P9AudChurn = (6, 0)
  private val P9VidSeed = (17, 8)
  private val P9VidChurn = (21, 16)
  /** Text (4th maintained arm, round 14): doc d's payload text is the
    * PREDECESSOR's original documents.text plus a 3-token suffix
    * (3-gram jaccard G/(G+3) ≥ 0.5 on this corpus) when masked. The
    * churn residue rides the % 3 membership leg (d % 6 == 3 ⟹
    * d % 3 == 0) and composes a TEXT×VIDEO chained cluster with the
    * video churn mask at d ≡ 15 (mod 42): text edge (d-1, d)
    * (d % 6 == 3) and video edge (d, d+1) (d+1 ≡ 16 (mod 21),
    * rate-family copy of d) — one cluster bridged across the two
    * modalities, e.g. {56, 57, 58}. */
  private val P9TxtSeed = (23, 7)
  private val P9TxtChurn = (6, 3)
  private val P9TxtSuffix = " extra token appended"

  /** A modality's pipe9 oracle mask expressions (sd, perturbationA,
    * perturbationB) from its seed and churn injection masks. Unlike
    * the mm7/mm10/mm12 oracles — whose churn residue (% 7 = 2)
    * implies churn membership, so the gate is implicit — pipe9's
    * masks are arbitrary, so the churn arm is explicitly gated by
    * membership (% 3 = 0 OR % 7 = 2) and the seed arm by its
    * complement [[mm7SeedKept]]: a doc matching a churn mask but
    * never churned keeps its seed payload. */
  private def p9MaskSql(seed: (Int, Int), churn: (Int, Int))
      : (String, String, String) = {
    val ((ps, rs), (pc, rc)) = (seed, churn)
    val cm = "(d.doc_id % 3 = 0 OR d.doc_id % 7 = 2)"
    val sd = s"CASE WHEN $cm AND d.doc_id % $pc = $rc THEN d.doc_id - 1 " +
      s"WHEN $mm7SeedKept AND d.doc_id % $ps = $rs THEN d.doc_id - 1 " +
      "ELSE d.doc_id END"
    def p(off: Int) =
      s"(($cm AND d.doc_id % ${2 * pc} = ${rc + off * pc}) OR " +
        s"($mm7SeedKept AND d.doc_id % ${2 * ps} = ${rs + off * ps}))"
    (sd, p(0), p(1))
  }

  /** The four pipe9 modality CTE chains — image `sig`, audio `esig`,
    * video `vsig` signature chains plus the text final-corpus CTE
    * `p9txt` and its collapsed verified pairs `t9pairs` — composed
    * under the pipe9 masks and the final-corpus alive filter: the
    * oracle replay of what the four maintained stores hold after the
    * churn reconcile. Name-disjoint by construction (every chain is
    * prefixed for exactly this). The text rule mirrors [[p9Frame]]:
    * a churn member (% 3 == 0 or % 7 == 2) holds its CHURN payload
    * (predecessor text + suffix iff % 6 == 3), every other alive doc
    * its SEED payload (predecessor text + suffix iff % 23 == 7). */
  private[queries] def p9SigCtes: String = {
    val alive = "\n        WHERE NOT (" +
      mm7DelSql.replace("doc_id", "d.doc_id") + ")"
    val (isd, ibr, ipop) = p9MaskSql(P9ImgSeed, P9ImgChurn)
    val (asd, ascl, _) = p9MaskSql(P9AudSeed, P9AudChurn)
    val (vsd, vbr, vdbl) = p9MaskSql(P9VidSeed, P9VidChurn)
    val txtCopy = s"p.text || '$P9TxtSuffix'"
    s"""${phashSigCtesFor(isd, ibr, ipop, alive)},
      ${envSigCtes(asd, ascl, alive)},
      ${videoSigCtesFor(vsd, vbr, vdbl, alive)},
      p9txt AS (SELECT d.doc_id,
          CASE WHEN (d.doc_id % 3 = 0 OR d.doc_id % 7 = 2) THEN
              CASE WHEN d.doc_id % ${P9TxtChurn._1} = ${P9TxtChurn._2}
                  AND p.text IS NOT NULL
                THEN $txtCopy ELSE d.text END
            WHEN d.doc_id % ${P9TxtSeed._1} = ${P9TxtSeed._2}
                AND p.text IS NOT NULL
              THEN $txtCopy
            ELSE d.text END AS text
        FROM documents d
        LEFT JOIN documents p ON p.doc_id = d.doc_id - 1$alive),
      ${DedupOps.collapsedTextPairCtes("p9txt", "t9")}"""
  }

  /** (doc_id) frame → (doc_id, img, aud, vid, txt) payload frame: ONE
    * encode pass emitting all four modality payloads per doc under
    * the pipe9 masks — the ingest-table shape of a multimodal corpus
    * (payloads land together; signatures fan out per modality). The
    * text payload derives from the REAL documents table (own text, or
    * the predecessor's text + suffix when masked), so the oracle can
    * replay it with one self-join. */
  private def p9Frame(
      docsTexts: org.apache.spark.sql.DataFrame,
      df: org.apache.spark.sql.DataFrame, seed: Boolean)
      : org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val (im, ia, iv, it) =
      if (seed) (P9ImgSeed, P9AudSeed, P9VidSeed, P9TxtSeed)
      else (P9ImgChurn, P9AudChurn, P9VidChurn, P9TxtChurn)
    val prev = docsTexts.select((col("doc_id") + 1).as("doc_id"),
      col("text").as("prev_text"))
    val withTxt = df.select(col("doc_id"))
      .join(docsTexts, Seq("doc_id"))
      .join(prev, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % it._1 === it._2 && col("prev_text").isNotNull,
          concat(col("prev_text"), lit(P9TxtSuffix)))
          .otherwise(col("text")).as("txt"))
    withTxt.as[(Long, String)]
      .mapPartitions(_.map { case (d, txt) =>
        (d, phashFixture(d, im._1, im._2),
          audioNearDupFixture(d, ia._1, ia._2),
          videoFixture(d, iv._1, iv._2), txt)
      })
      .toDF("doc_id", "img", "aud", "vid", "txt")
  }

  /** pipe9's maintained-store lifecycle: ONE tri-modal payload lake
    * table (img, aud, vid binary columns) seeded then churned with
    * the [[incDedupScenario]] churn scheme (inserts % 3 == 0, updates
    * % 7 == 2, the [[mm7DelSql]] delete slice), and THREE maintained
    * signature/pairs store pairs — image aHash, audio envelope, video
    * majority-fold — each reconciled by the SAME signature-generic
    * [[phashReconcile]], all three driven by ONE incremental
    * resolution of the payload table per round and run CONCURRENTLY
    * (disjoint stores; parquet column pruning means each store's scan
    * reads only its own modality's payload bytes — at 100 TB the
    * audio store never pays for video bytes); O(churn) decode+hash
    * each, no store ever rescans the corpus. Returns the union of
    * the three maintained pairs tables as (a, b, modality) — the edge
    * set pipe9's canonical selection resolves. */
  private[graft] def p9MaintainedPairs(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import graft.core.{LakeTable, TableProps}
    def scr(n: String) = QueryPack.scratchDir(s, dir, n)
    val docsTexts = t(s, dir, "documents").select("doc_id", "text")
    val ids = docsTexts.select("doc_id")
    val seedIds = ids.filter(col("doc_id") % 3 =!= 0)
    val churnIds = ids.filter(
      col("doc_id") % 3 === 0 || col("doc_id") % 7 === 2)
    val delIds = ids.filter(expr(mm7DelSql))
    val payloads = LakeTable.create(s, scr("p9pay"),
      TableProps("p9pay", Seq("doc_id"), Some("ts"), Seq.empty))
    val mods: Seq[(String,
        org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] =
      Seq(
        ("img", df => graft.multimodal.MediaDecoder
          .aHash(df, "doc_id", "payload")),
        ("aud", df => graft.multimodal.MediaDecoder
          .envHash(df, "doc_id", "payload", 50)),
        ("vid", df => graft.multimodal.MediaDecoder
          .videoHash(df, "doc_id", "payload", VFrameBytes, VSamples)))
    val stores = mods.map { case (m, _) =>
      m -> ((
        LakeTable.create(s, scr(s"p9${m}s"),
          TableProps(s"p9${m}s", Seq("doc_id"), Some("ts"), Seq.empty,
            tableType = "mor")),
        LakeTable.create(s, scr(s"p9${m}p"),
          TableProps(s"p9${m}p", Seq("a", "b"), Some("ts"), Seq.empty,
            tableType = "mor"))))
    }.toMap
    // the 4th arm: the text MinHash/LSH maintained store — pipe4's
    // NearDupIndex machinery over the same payload table's txt column,
    // completing the batch/maintained symmetry with pipe8 (which
    // unions all FOUR batch pair sources)
    val txtSigs = LakeTable.create(s, scr("p9txts"),
      TableProps("p9txts", Seq("doc_id"), Some("ts"), Seq.empty,
        tableType = "mor"))
    val txtPairs = LakeTable.create(s, scr("p9txtp"),
      TableProps("p9txtp", Seq("a", "b"), Some("ts"), Seq.empty,
        tableType = "mor"))
    // the four per-modality reconciles touch DISJOINT store tables
    // and only read the shared payload frame (parquet column pruning:
    // each store pays only its own modality's payload bytes) — run
    // each round concurrently (the pipe6 state-write shape): the
    // fixed lake commit latency of four maintained stores overlaps
    // instead of summing, which is also how a real ingest pipeline
    // schedules them
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    def reconcileAll(
        payload: org.apache.spark.sql.DataFrame,
        docsSnap: org.apache.spark.sql.DataFrame,
        dels: org.apache.spark.sql.DataFrame, ts: Long): Unit = {
      val media = mods.map { case (m, hf) =>
        Future {
          val (sigs, prs) = stores(m)
          phashReconcile(payload.select(col("doc_id"), col(m).as("payload")),
            dels, sigs, prs, ts, hf)
          ()
        }
      }
      val text = Future {
        graft.queries.NearDupIndex.reconcile(
          payload.select(col("doc_id"), col("txt").as("text")),
          dels,
          docsSnap.select(col("doc_id"), col("txt").as("text")),
          txtSigs, txtPairs, ts)
      }
      Await.result(Future.sequence(media :+ text), Duration.Inf)
      ()
    }
    val c1 = payloads.upsert(
      p9Frame(docsTexts, seedIds, seed = true).withColumn("ts", lit(1L)))
    // both round-1 input plans pinned (snapshot() resolves its file
    // list eagerly) BEFORE the churn commit, so the churn payload
    // commit + increment read (payload table only) ride the round-1
    // reconciles' shadow (sigs/pairs tables only) instead of the
    // serial path between the rounds — the incDedupScenario shape
    val snap1 = payloads.snapshot()
    // incLeak: unpersist `inc` even when the round-1 reconcile throws
    // after the background leg persisted it (see incDedupScenario)
    var incLeak: org.apache.spark.sql.DataFrame = null
    try {
      val (incSnap, _) = QueryPack.overlapping(
          Seq(payloads.basePath),
          (stores.values.flatMap(v => Seq(v._1.basePath, v._2.basePath))
            ++ Seq(txtSigs.basePath, txtPairs.basePath)).toSeq) {
        payloads.upsertWithDeletes(
          p9Frame(docsTexts, churnIds, seed = false).withColumn("ts", lit(2L)),
          delIds)
        val inc = payloads.incremental(c1).persist()
        incLeak = inc
        inc.count()
        val snap2 = payloads.snapshot()
        (inc, snap2)
      } {
        reconcileAll(snap1, snap1, delIds.limit(0), 1L)
      }
      val (inc, snap2) = incSnap
      reconcileAll(inc, snap2, delIds, 2L)
    } finally {
      Option(incLeak).foreach(_.unpersist())
      ()
    }
    mods.map { case (m, _) =>
      stores(m)._2.snapshot()
        .select(col("a"), col("b"), lit(m).as("modality"))
    }.reduce(_ unionByName _)
      .unionByName(txtPairs.snapshot()
        .select(col("a"), col("b"), lit("txt").as("modality")))
  }

  /** mm12 — INCREMENTAL perceptual video dedup: [[incDedupScenario]]
    * with the video fixture and the majority-fold hash — the
    * maintained form of mm11, completing the modality × lifecycle
    * matrix (batch AND maintained for text, image, audio, video) on
    * the SAME signature-store machinery; only the 64-bit hash fn
    * differs. O(churn) per increment: only churned clips are sampled
    * (O(samples) frame decodes each), hashed, and band-probed against
    * the store; the pairs reconciliation is one mixed
    * tombstone+upsert commit. Oracle = brute-force majority-fold
    * replay of the FINAL corpus under the mm7 mask composition
    * (churned docs follow the (7, 2) video masks, never-churned seed
    * docs keep their (13, 5) clip, deletes filtered) — the maintained
    * pairs table must equal a from-scratch batch rebuild. */
  private val videoIncQ = GQ(
    "mm12_video_incremental",
    (s, dir) => incDedupScenario(s, dir, "mm12", videoFrame,
      df => graft.multimodal.MediaDecoder.videoHash(
        df, "doc_id", "payload", VFrameBytes, VSamples)),
    Some(videoOracle(
      Mm7OracleSd,
      Mm7OraclePerturbA,
      Mm7OraclePerturbB,
      Mm7OracleAlive)))

  /** Deterministic multi-scene video fixture for the shot-boundary
    * gate (mm13): doc d has ns = d % 3 + 2 scenes of ls = d % 4 + 3
    * frames each; frame f's scene is f / ls, its pixels the [[chVal]]
    * noise at seed d·13 + scene·7 — constant per scene — with a +1
    * global brightness shift on ODD frames (clamped), the intra-scene
    * motion stand-in the per-frame mean-threshold hash must shrug off
    * (hamming ≈ 0 within a scene, uncorrelated ≈ 32 across a cut). */
  private def sceneFixture(d: Long): Array[Byte] = {
    import graft.multimodal.MediaDecoder
    val ns = (d % 3 + 2).toInt
    val ls = (d % 4 + 3).toInt
    val frames = (0 until ns * ls).map { f =>
      val sv = d * 13 + (f / ls) * 7
      val bright = f % 2 == 1
      def px(x: Int, y: Int): Int = {
        def c(k: Int) = {
          val v = chVal(sv, x, y, k)
          if (bright) math.min(v + 1, 255) else v
        }
        (c(0) << 16) | (c(1) << 8) | c(2)
      }
      MediaDecoder.encodeBmp24With(PhSide, PhSide)(px)
    }
    Array.concat(frames: _*)
  }

  private val sceneFrame =
    payloadFrame((d: Long, _: Int, _: Int) => sceneFixture(d)) _

  /** mm13's shot-boundary threshold (shared by the Spark pass and the
    * oracle replay): intra-scene deltas are the clamp residue of the
    * ±1 brightness jitter (a few bits at most), cross-scene deltas of
    * uncorrelated noise patterns sit near 32. */
  private val SceneCutThreshold = 10

  /** mm13 — shot-boundary video segmentation, decode included: the
    * clip-extraction primitive a video-curation pipeline runs before
    * sampling training clips, and the video member of the
    * segmentation family (audio mm8). Each doc gets a deterministic
    * multi-scene clip ([[sceneFixture]]); [[graft.multimodal
    * .MediaDecoder.sceneSegmentsRaw]] per-frame-aHashes it in ONE
    * streaming pass (O(1) state — a clip is never buffered) and cuts
    * where the consecutive-frame hamming exceeds the threshold. The
    * DuckDB oracle replays the pixel arithmetic, the per-frame
    * binning/threshold/packing, the consecutive-frame hamming, and
    * the run grouping (lag → run-start flags → running sum, the mm8
    * pattern) — an off-by-one at a scene edge, a dropped tail scene,
    * or a hamming miscount hash-mismatches. */
  private val sceneQ = GQ(
    "mm13_video_scenes",
    (s, dir) => graft.multimodal.MediaDecoder.sceneSegments(
      sceneFrame(t(s, dir, "documents"), 1, -1), "doc_id", "payload",
      VFrameBytes, SceneCutThreshold)
      .orderBy("doc_id", "scene_idx"),
    Some(s"""WITH scg(i) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
          (8),(9),(10),(11),(12),(13),(14),(15)),
      scfs AS (SELECT f FROM range(0, 24) t(f)),
      scd AS (SELECT doc_id, doc_id % 3 + 2 AS ns, doc_id % 4 + 3 AS ls
        FROM documents),
      scf AS (SELECT doc_id, ns * ls AS nf, f,
          doc_id * 13 + (f // ls) * 7 AS sv, f % 2 = 1 AS bright
        FROM scd CROSS JOIN scfs WHERE f < ns * ls),
      scpx AS (SELECT doc_id, nf, f, bright, sv AS sd,
          xs.i AS xi, ys.i AS yi
        FROM scf CROSS JOIN scg xs CROSS JOIN scg ys),
      scpv AS (SELECT doc_id, nf, f, bright, xi, yi,
          ${chanSql(0)} AS r0,
          ${chanSql(1)} AS g0,
          ${chanSql(2)} AS b0
        FROM scpx),
      scpp AS (SELECT doc_id, nf, f, xi, yi,
          CASE WHEN bright THEN LEAST(r0 + 1, 255) ELSE r0 END
          + CASE WHEN bright THEN LEAST(g0 + 1, 255) ELSE g0 END
          + CASE WHEN bright THEN LEAST(b0 + 1, 255) ELSE b0 END AS gray
        FROM scpv),
      sccells AS (SELECT doc_id, nf, f, xi // 2 AS cx, yi // 2 AS cy,
          CAST(sum(gray) AS BIGINT) AS cg
        FROM scpp GROUP BY doc_id, nf, f, xi // 2, yi // 2),
      sctot AS (SELECT doc_id, f, CAST(sum(cg) AS BIGINT) AS tg
        FROM sccells GROUP BY doc_id, f),
      scbits AS (SELECT c.doc_id, c.nf, c.f, cy * 8 + cx AS i,
          CASE WHEN cg * 64 >= tg THEN 1 ELSE 0 END AS bit
        FROM sccells c JOIN sctot
          ON sctot.doc_id = c.doc_id AND sctot.f = c.f),
      scham AS (SELECT l.doc_id, l.f,
          CAST(sum(CASE WHEN l.bit <> r.bit THEN 1 ELSE 0 END) AS INT) AS h
        FROM scbits l JOIN scbits r
          ON r.doc_id = l.doc_id AND r.f = l.f - 1 AND r.i = l.i
        GROUP BY l.doc_id, l.f),
      sccut AS (SELECT b.doc_id, b.nf, b.f,
          COALESCE(scham.h, 0) AS h,
          CASE WHEN b.f = 0 OR COALESCE(scham.h, 0) > $SceneCutThreshold
            THEN 1 ELSE 0 END AS segstart
        FROM (SELECT DISTINCT doc_id, nf, f FROM scbits) b
        LEFT JOIN scham ON scham.doc_id = b.doc_id AND scham.f = b.f),
      scrun AS (SELECT doc_id, nf, f, h, segstart,
          SUM(segstart) OVER (PARTITION BY doc_id ORDER BY f) AS run
        FROM sccut)
      SELECT doc_id,
        CAST(min(nf) AS INT) AS frames_in,
        CAST(run AS INT) AS scene_idx,
        CAST(min(f) AS INT) AS start_frame,
        CAST(count(*) AS INT) AS n_frames,
        CAST(max(CASE WHEN segstart = 1 AND f > 0 THEN h ELSE 0 END)
          AS INT) AS cut_hamming
      FROM scrun GROUP BY doc_id, run
      ORDER BY doc_id, scene_idx"""))

  /** st7 — STREAMING perceptual-signature maintenance
    * ([[graft.streaming.SignatureMaintenance]]): the mm7 maintained
    * image index run as a CONTINUOUS CDC-fed service instead of
    * explicit reconcile calls — completing the lifecycle symmetry
    * with text (batch dedup2, maintained pipe4, streaming st5) for
    * the perceptual modalities. The scenario exercises the three
    * service phases a production stream hits: bootstrap (batch 0
    * replays the seed corpus through the same reconcile path — the
    * store and its seed-injected pairs appear with no backfill job),
    * live churn (the % 7 == 2 re-image updates land while the query
    * runs), and a DOWN-WINDOW restart (inserts + the delete slice
    * commit while the service is stopped; a fresh `start` on the same
    * checkpoint catches up exactly-once). Final corpus is mm7's mask
    * composition, so the oracle is the same brute-force phash replay
    * — the streaming path must land byte-identical state to the batch
    * reconciles. */
  private val streamMediaIndexQ = GQ(
    "st7_stream_media_index",
    (s, dir) => {
      import graft.core.{LakeTable, TableProps}
      def scr(n: String) = QueryPack.scratchDir(s, dir, n)
      val ids = t(s, dir, "documents").select("doc_id")
      val seedIds = ids.filter(col("doc_id") % 3 =!= 0)
      val updIds = ids.filter(col("doc_id") % 7 === 2)
      val insIds = ids.filter(
        col("doc_id") % 3 === 0 && col("doc_id") % 7 =!= 2)
      val delIds = ids.filter(expr(mm7DelSql))
      val payloads = LakeTable.create(s, scr("st7pay"),
        TableProps("st7pay", Seq("doc_id"), Some("ts"), Seq.empty))
      val sigs = LakeTable.create(s, scr("st7sigs"),
        TableProps("st7sigs", Seq("doc_id"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val pairsT = LakeTable.create(s, scr("st7pairs"),
        TableProps("st7pairs", Seq("a", "b"), Some("ts"), Seq.empty,
          tableType = "mor"))
      val ckpt = scr("st7ckpt")
      payloads.upsert(imgFrame(seedIds, 13, 5).withColumn("ts", lit(1L)))
      val q = graft.streaming.SignatureMaintenance.start(
        s, payloads.basePath, sigs.basePath, pairsT.basePath, ckpt)
      try {
        q.processAllAvailable() // bootstrap: store + seed pairs
        payloads.upsert(imgFrame(updIds, 7, 2).withColumn("ts", lit(2L)))
        q.processAllAvailable() // live churn folded
      } finally q.stop()
      // inserts + deletes land while the service is DOWN …
      payloads.upsertWithDeletes(
        imgFrame(insIds, 7, 2).withColumn("ts", lit(3L)), delIds)
      // … and the restart catches up from the checkpoint
      val q2 = graft.streaming.SignatureMaintenance.start(
        s, payloads.basePath, sigs.basePath, pairsT.basePath, ckpt)
      try q2.processAllAvailable() finally q2.stop()
      pairsT.snapshot().select("a", "b", "hamming").orderBy("a", "b")
    },
    Some(phashOracle(
      Mm7OracleSd,
      Mm7OraclePerturbA,
      Mm7OraclePerturbB,
      Mm7OracleAlive)))

  /** mm14 — decode census: the drop-rate observability gate (round-14
    * task; VERDICT r13 "What's wrong #2"). Every signature frame
    * silently drops payloads that yield no hash — correct index
    * semantics, but at 100 TB "unique doc" and "codec regression
    * dropped a third of the corpus" are indistinguishable from the
    * pairs table alone. This gate runs each modality's PRODUCTION
    * signature frame over a corpus with deterministic bad-payload
    * masks (doc_id % 13 == 4 → corrupt bytes in every modality;
    * doc_id % 11 == 7 additionally → an all-silent clip, the
    * decodes-but-signature-less audio leg) and reports per-modality
    * (n_docs, hashable, dropped) — the number the reconciles also
    * return per batch ([[ReconcileStats]]) and the streaming service
    * journals per micro-batch. The oracle is pure mask arithmetic:
    * a decoder that starts rejecting good payloads, or accepting bad
    * ones, hash-mismatches. */
  private val decodeCensusQ = GQ(
    "mm14_decode_census",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.MediaDecoder
      import org.apache.spark.sql.DataFrame
      val docs = t(s, dir, "documents").select("doc_id")
      def corrupt(d: Long): Array[Byte] =
        s"not a media container $d".getBytes("UTF-8")
      val imgF = docs.as[Long].mapPartitions(_.map(d =>
        (d, if (d % 13 == 4) corrupt(d) else phashFixture(d, 1, -1))))
        .toDF("doc_id", "payload")
      val audF = docs.as[Long].mapPartitions(_.map { d =>
        val b =
          if (d % 13 == 4) corrupt(d)
          else if (d % 11 == 7) // decodes fine, but no voiced frame
            MediaDecoder.encodeWavPcm16(8000, 1,
              Array.fill(130)(((d % 5) + 7).toShort))
          else audioNearDupFixture(d, 1, -1)
        (d, b)
      }).toDF("doc_id", "payload")
      val vidF = docs.as[Long].mapPartitions(_.map(d =>
        (d, if (d % 13 == 4) corrupt(d) else videoFixture(d, 1, -1))))
        .toDF("doc_id", "payload")
      def census(m: String, frame: DataFrame,
          hash: DataFrame => DataFrame): DataFrame =
        docs.agg(count(lit(1)).as("n_docs")).crossJoin(
          hash(frame).agg(count(lit(1)).as("hashable")))
          .select(lit(m).as("modality"), col("n_docs"), col("hashable"),
            (col("n_docs") - col("hashable")).as("dropped"))
      census("audio", audF, MediaDecoder.envHash(_, "doc_id", "payload", 50))
        .unionByName(census("image", imgF,
          MediaDecoder.aHash(_, "doc_id", "payload")))
        .unionByName(census("video", vidF,
          MediaDecoder.videoHash(_, "doc_id", "payload", VFrameBytes,
            VSamples)))
        .orderBy("modality")
    },
    Some("""WITH c AS (SELECT
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN doc_id % 13 = 4 THEN 1 ELSE 0 END) AS BIGINT)
          AS corrupt,
        CAST(sum(CASE WHEN doc_id % 13 = 4 OR doc_id % 11 = 7
          THEN 1 ELSE 0 END) AS BIGINT) AS audio_bad
      FROM documents)
      SELECT 'audio' AS modality, n AS n_docs, n - audio_bad AS hashable,
        audio_bad AS dropped FROM c
      UNION ALL SELECT 'image', n, n - corrupt, corrupt FROM c
      UNION ALL SELECT 'video', n, n - corrupt, corrupt FROM c
      ORDER BY modality"""))

  def qs: Seq[GQ] =
    Seq(binaryMetaQ, realDecodeQ, resizeQ, frameSampleQ, resampleQ,
      phashQ, phashIncQ, segmentQ, audioNearDupQ, audioIncQ,
      videoNearDupQ, videoIncQ, sceneQ, streamMediaIndexQ, decodeCensusQ)
}
