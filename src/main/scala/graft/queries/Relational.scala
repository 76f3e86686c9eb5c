package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.Tables._

/** Relational operator coverage (SURVEY.md §2.3–§2.8) expressed over the
  * driver testdata tables, each with a DuckDB oracle.
  *
  * Scale notes (100 TB design intent):
  *  - every query is a declarative DataFrame plan: filters/projections
  *    reach the parquet scan (PushedFilters/ReadSchema), aggregates get
  *    map-side partial aggregation, joins pick broadcast-hash for the
  *    dimension sides automatically (nation/region/customer are tiny
  *    relative to fact tables at any SF);
  *  - no collect(), no driver-side loops, no UDFs — whole plans stay
  *    inside WholeStageCodegen.
  */
object Relational {

  /** q13's batch oracle — ALSO the parity oracle of the streaming
    * st4 gate (one definition so the two can never drift). */
  private[queries] val dailyWindowAggSql =
    """SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
      event_type, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q1 — TPC-H Q1-shaped scan+filter+groupBy aggregate.
    * Covers SURVEY §2.5 aggregations + §2.3 P4/P9 filter/literal.
    * Ref behavior: SparkSQLDemo.scala:65-67 (scan-project-show) widened
    * to a real aggregate; preCombine-free path.
    */
  private val q1 = GQ(
    "q1_pricing_summary",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      l.filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(netExpr(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** q2 — filter + isin + per-row computed projection.
    * Covers §2.3 P1-P6/P9 (select, cast, isin, filter, lit). */
  private val q2 = GQ(
    "q2_filter_project",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      l.filter(col("l_returnflag").isin("A", "R") && col("l_quantity") >= 30)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          netExpr(col("l_extendedprice"), col("l_discount"))
            .cast("double").as("net_price"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_returnflag,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price
      FROM lineitem
      WHERE l_returnflag IN ('A','R') AND l_quantity >= 30"""))

  /** q3 — 4-way equi-join + aggregate (fact×fact×dim×dim).
    * Covers §2.4 J1/J4. nation is fixed-size (25 rows) — broadcast
    * unconditionally. customer GROWS with scale factor: no forced hint;
    * AQE broadcasts it at small SF and falls back to a shuffle join at
    * 100 TB where a forced multi-GB broadcast would OOM. The
    * lineitem⋈orders fact join shuffles on the key. */
  private val q3 = GQ(
    "q3_join_revenue_by_nation",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(netExpr(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  /** q4 — UNION with distinct semantics (SQL UNION).
    * Covers §2.7 / W3 (SparkSQLDemo.scala:57-61 union-insert). */
  private val q4 = GQ(
    "q4_union_distinct",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F" && col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 400000
      UNION
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 300000
      ORDER BY o_custkey"""))

  /** q5 — distinct count per group (§2.5 A2/A3). */
  private val q5 = GQ(
    "q5_distinct_count",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
      count(*) AS n_orders
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** q6 — arg-max-per-key: the preCombine/latest-record primitive
    * (§2.5 A4 — the workhorse Hudi dedup semantic). Window row_number
    * with a total ordering (ts desc, event_id desc tie-break) exactly
    * like Hudi's DefaultHoodieRecordPayload largest-ordering-wins.
    * At scale: single shuffle on the key, no driver involvement. */
  private val q6 = GQ(
    "q6_latest_event_per_user",
    (s, dir) => {
      val e = events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1 ORDER BY user_id"""))

  /** q7 — anti join (§2.4 note: the idiomatic form of the reference's
    * `!isin` pattern, SyncCommentsAcrossClusters.scala:59,71). */
  private val q7 = GQ(
    "q7_customers_without_big_orders",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 350000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
      ORDER BY c_custkey"""))

  /** q8 — semi join (EXISTS). */
  private val q8 = GQ(
    "q8_orders_with_max_qty_item",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l.filter(col("l_quantity") === 50), o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_orderstatus FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity = 50)
      ORDER BY o_orderkey"""))

  /** q9 — total-order top-k (§2.6 O1-O4); tie-broken for determinism.
    * At scale this is TakeOrderedAndProject: per-partition top-k then
    * driver merge of k×partitions rows — no global sort. */
  private val q9 = GQ(
    "q9_top10_orders",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** q10 — ComplexKeyGenerator formula (§2.11; JavaClientHive2Hudi.java
    * :390-439): "field:value,field2:value2" with __null__/__empty__
    * placeholders + hive-style partition path. Pure codegen'd string
    * expressions — no UDF. */
  private val q10 = GQ(
    "q10_complex_keygen",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def part(c: String) = {
        val v = col(c).cast("string")
        concat(lit(c + ":"),
          when(col(c).isNull, lit("__null__"))
            .when(v === "", lit("__empty__"))
            .otherwise(v))
      }
      o.select(
        col("o_orderkey"),
        concat_ws(",", part("o_orderkey"), part("o_orderstatus")).as("record_key"),
        concat(lit("dt="), date_format(col("o_orderdate"), "yyyy-MM-dd")).as("partition_path"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
      'o_orderkey:' || CASE WHEN o_orderkey IS NULL THEN '__null__'
         WHEN CAST(o_orderkey AS VARCHAR) = '' THEN '__empty__'
         ELSE CAST(o_orderkey AS VARCHAR) END
      || ',o_orderstatus:' || CASE WHEN o_orderstatus IS NULL THEN '__null__'
         WHEN o_orderstatus = '' THEN '__empty__' ELSE o_orderstatus END AS record_key,
      'dt=' || strftime(o_orderdate, '%Y-%m-%d') AS partition_path
      FROM orders ORDER BY o_orderkey"""))

  /** q11 — commit-range semantics (begin-exclusive, end-inclusive) as
    * used by incremental query (§2.1 S3, IncrementalQuery.scala:48-53),
    * applied to the events timeline. */
  private val q11 = GQ(
    "q11_incremental_range",
    (s, dir) => {
      val e = events(s, dir)
      e.filter(col("ts") > lit("2024-01-10 00:00:00") &&
          col("ts") <= lit("2024-01-20 00:00:00"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      WHERE ts > TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY event_type ORDER BY event_type"""))

  /** q12 — windowed running aggregate per key (scale extension;
    * exact decimal running sum for hash stability). */
  private val q12 = GQ(
    "q12_running_total",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.filter(col("o_custkey") <= 50)
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders WHERE o_custkey <= 50
      ORDER BY o_custkey, o_orderkey"""))

  /** q13 — event-time tumbling-window aggregation (the streaming
    * windowed-agg shape, SURVEY §2.10 scale extension; batch form here
    * for the oracle, watermarked streaming form in StreamingSpec). */
  private val q13 = GQ(
    "q13_windowed_agg",
    (s, dir) => {
      val e = events(s, dir)
      e.groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    },
    Some(Relational.dailyWindowAggSql))

  /** q14 — TPC-H Q5-shaped six-table star join (region → nation →
    * supplier/customer → orders → lineitem) with a local-supplier
    * constraint. Covers the full dimension set: region/nation are
    * fixed-size and broadcast unconditionally; customer/supplier grow
    * with SF, so no forced hint — AQE broadcasts them while small and
    * shuffles at 100 TB. Only the two fact tables always shuffle. */
  private val q14 = GQ(
    "q14_regional_supplier_volume",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su,
          l("l_suppkey") === su("s_suppkey") &&
            c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r),
          n("n_regionkey") === r("r_regionkey") && r("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(netExpr(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** q15 — TPC-H Q14-shaped conditional aggregate over lineitem ⋈ part
    * (promo revenue share): CASE-gated numerator and total in one pass. */
  private val q15 = GQ(
    "q15_promo_revenue",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val net = netExpr(col("l_extendedprice"), col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"), net)
            .otherwise(dec2(lit(0)))).cast("double").as("promo_revenue"),
          sum(net).cast("double").as("total_revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT
      CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
      count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey"""))


  /** q16 — AS-OF JOIN (event attribution): each click is joined to the
    * latest purchase of the SAME user at-or-before its timestamp.
    *
    * Spark has no asof operator; the scale-right formulation here is
    * the union + sort + carry-forward window: tag both sides, union,
    * one window per user ordered by (ts, side, id), and
    * `last(..., ignoreNulls)` carries the most recent purchase forward
    * onto each click row. ONE shuffle/sort of (clicks + purchases),
    * zero join amplification — versus the candidate-join formulation
    * (every purchase at-or-before every click, then rank) the oracle
    * uses, which is quadratic per user. Ties are deterministic: at
    * equal ts a purchase sorts before a click ("at or before" is
    * inclusive) and the larger purchase id wins.
    * Scale extension — DuckDB's native ASOF JOIN semantics. */
  private val q16 = GQ(
    "q16_asof_attribution",
    (s, dir) => {
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"),
          lit(1).as("__side"),
          lit(null).cast("long").as("p_id"),
          lit(null).cast("double").as("p_value"))
      val purch = e.filter(col("event_type") === "purchase")
        .select(lit(null).cast("long").as("event_id"), col("user_id"),
          col("ts"), lit(0).as("__side"),
          col("event_id").as("p_id"), col("value").as("p_value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("__side"), col("p_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // ONE carried struct, not two scalars: independent last(...,
      // ignoreNulls) calls would desynchronize on a NULL purchase
      // value (id from the newest purchase, value from an older one)
      clicks.unionByName(purch)
        .withColumn("lp", last(
          when(col("__side") === 0, struct(col("p_id"), col("p_value"))),
          ignoreNulls = true).over(w))
        .filter(col("__side") === 1 && col("lp").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("lp.p_id").as("p_id"), col("lp.p_value").as("p_value"))
        .orderBy("event_id")
    },
    Some("""WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      purch AS (SELECT event_id AS p_id, user_id, ts AS p_ts, value AS p_value
        FROM events WHERE event_type = 'purchase'),
      cand AS (SELECT c.event_id, c.user_id, p.p_id, p.p_value,
          row_number() OVER (PARTITION BY c.event_id
            ORDER BY p.p_ts DESC, p.p_id DESC) AS rn
        FROM clicks c JOIN purch p
          ON p.user_id = c.user_id AND p.p_ts <= c.ts)
      SELECT event_id, user_id, p_id, p_value FROM cand WHERE rn = 1
      ORDER BY event_id"""))

  /** q17 — RANGE (interval) JOIN with bin bucketing: for every
    * purchase, count clicks by ANY user within ±30 minutes and sum
    * their values.
    *
    * There is no equi key, so a naive join is a full cartesian
    * product. The scale shape bins the time axis into 1-hour buckets:
    * each purchase probes the (≤2) buckets its window overlaps
    * (array_distinct'd so a window inside one bucket probes once —
    * also what keeps each (purchase, click) pair generated exactly
    * once), the join is an EQUI join on the bucket id, and the exact
    * ±30 min predicate refines. Candidates per purchase are bounded
    * by two buckets' worth of clicks instead of all clicks; the same
    * pattern scales to any interval join by picking the bin ≈ window
    * width. Timestamps compare as unix microseconds in both engines.
    * Scale extension — DuckDB's IEJoin semantics. */
  private val q17 = GQ(
    "q17_range_join",
    (s, dir) => {
      val HalfW = 1800000000L // 30 min in us
      val Bin = 3600000000L // 1 h buckets
      val e = events(s, dir)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("us").as("p_us"))
        .withColumn("bk", explode(array_distinct(array(
          expr(s"(p_us - $HalfW) div $Bin"), expr(s"(p_us + $HalfW) div $Bin")))))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("us").as("c_us"),
          col("value").as("c_value"))
        .withColumn("c_bk", expr(s"c_us div $Bin"))
      // the exact range predicate is part of the JOIN condition: a
      // post-join filter would drop a purchase whose bucket matched
      // but whose window didn't (it must surface with n_clicks = 0)
      purch.join(clicks,
          col("bk") === col("c_bk") &&
            col("c_us") >= col("p_us") - HalfW &&
            col("c_us") <= col("p_us") + HalfW,
          "left")
        .groupBy(col("p_id"))
        .agg(count(col("c_id")).as("n_clicks"),
          sum(dec2(col("c_value"))).cast("double").as("sum_value"))
        .orderBy("p_id")
    },
    Some("""WITH p AS (SELECT event_id AS p_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'),
      c AS (SELECT event_id AS c_id, epoch_us(ts) AS c_us, value AS c_value
        FROM events WHERE event_type = 'click')
      SELECT p_id, count(c_id) AS n_clicks,
        CAST(sum(CAST(c_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM p LEFT JOIN c
        ON c_us >= p_us - 1800000000 AND c_us <= p_us + 1800000000
      GROUP BY p_id ORDER BY p_id"""))


  /** q18 — PIVOT (wide aggregation): daily event counts pivoted into
    * one column per event type. Spark's pivot with an EXPLICIT value
    * list — at scale the value list must be declared (or discovered in
    * a bounded first pass): an unbounded pivot is a driver-side
    * distinct collect. coalesce(0) normalizes the empty-cell NULL so
    * both engines agree. */
  private val q18 = GQ(
    "q18_pivot",
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val e = events(s, dir)
      val piv = e.groupBy(date_trunc("DAY", col("ts")).as("day"))
        .pivot("event_type", types).count()
      piv.select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("day")
    },
    Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      count(*) FILTER (event_type = 'click') AS click,
      count(*) FILTER (event_type = 'error') AS error,
      count(*) FILTER (event_type = 'purchase') AS purchase,
      count(*) FILTER (event_type = 'signup') AS signup,
      count(*) FILTER (event_type = 'view') AS view
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** q19 — ROLLUP hierarchy totals (grand total + per-flag subtotals).
    * Catalyst expands rollup into a grouping-sets expand + one
    * aggregate — a single shuffle at any scale. DuckDB sorts NULLS
    * LAST by default vs Spark's NULLS FIRST: pinned explicitly. */
  private val q19 = GQ(
    "q19_rollup",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      l.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** q20 — exact discrete percentiles (order statistics) per group:
    * percentile_disc returns an actual stored value, so there is no
    * interpolation arithmetic to diverge between engines. Spark sorts
    * within the aggregation — one shuffle per group set. */
  private val q20 = GQ(
    "q20_percentile_disc",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
            .as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
            .as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      quantile_disc(o_totalprice, 0.5) AS p50,
      quantile_disc(o_totalprice, 0.9) AS p90,
      count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))


  /** q21 — sessionization (gaps-and-islands): split each user's event
    * stream into sessions separated by >30 min of inactivity, then
    * aggregate per session. Two windows over ONE user-partitioned
    * sort (lag → new-session flag → running sum as session index) —
    * the canonical batch formulation; the streaming analog is
    * [[graft.streaming.Sessionize]] (flatMapGroupsWithState). */
  private val q21 = GQ(
    "q21_sessionize",
    (s, dir) => {
      val Gap = 1800000000L // 30 min in us
      val e = events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val flagged = e
        .withColumn("prev", lag(col("us"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev").isNull || col("us") - col("prev") > Gap, 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      flagged.groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
          count(lit(1)).as("n_events"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .orderBy("user_id", "session_idx")
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value
        FROM events),
      flagged AS (SELECT user_id, event_id, us, value,
          CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
            THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      sessions AS (SELECT user_id, us, value,
          CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM flagged)
      SELECT user_id, session_idx, min(us) AS start_us, max(us) AS end_us,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM sessions GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""))

  /** q22 — ordered event funnel (view → click → purchase): for each
    * user, the earliest view, the earliest click strictly after that
    * view, and the earliest purchase strictly after that click — the
    * "did the user progress through the steps IN ORDER" analysis a
    * bag-of-events GROUP BY cannot answer. Expressed as chained
    * conditional aggregations: each step joins the next event type
    * against the previous step's timestamp and takes the min. All
    * three aggregates and both joins hash-partition on `user_id`, so
    * every stage is co-partitioned on the same key — no broadcast of
    * an SF-scaled side, no windows, no per-user collect. Left joins
    * keep every funnel entrant with `depth` marking how far they
    * got. */
  private val q22 = GQ(
    "q22_funnel",
    (s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t1_us"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("us") > col("t1_us"))
        .groupBy("user_id").agg(min("us").as("t2_us"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("us") > col("t2_us"))
        .groupBy("user_id").agg(min("us").as("t3_us"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .withColumn("depth",
          when(col("t3_us").isNotNull, 3)
            .when(col("t2_us").isNotNull, 2).otherwise(1))
        .select("user_id", "t1_us", "t2_us", "t3_us", "depth")
        .orderBy("user_id")
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        FROM events),
      s1 AS (SELECT user_id, min(us) AS t1_us FROM e
        WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(us) AS t2_us FROM e
        JOIN s1 ON s1.user_id = e.user_id
        WHERE event_type = 'click' AND us > t1_us GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(us) AS t3_us FROM e
        JOIN s2 ON s2.user_id = e.user_id
        WHERE event_type = 'purchase' AND us > t2_us GROUP BY e.user_id)
      SELECT s1.user_id, t1_us, t2_us, t3_us,
        CAST(CASE WHEN t3_us IS NOT NULL THEN 3
          WHEN t2_us IS NOT NULL THEN 2 ELSE 1 END AS INT) AS depth
      FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
      LEFT JOIN s3 ON s3.user_id = s1.user_id
      ORDER BY s1.user_id"""))

  /** q24 — sliding range aggregation (each error event ← how many
    * clicks and how much click value the same user produced in the
    * preceding 10 minutes). The naive form is a self-join on
    * `click.us BETWEEN err.us - 10min AND err.us` — a range-predicate
    * join Spark can only nested-loop; expressed instead as a RANGE
    * window frame over one user-partitioned sort, the aggregation is
    * a single pass whatever the window hit-rate. Frame membership is
    * a pure us-range test, so tie order inside the frame cannot
    * change the counts — deterministic in both engines. */
  private val q24 = GQ(
    "q24_range_agg",
    (s, dir) => {
      val TenMin = 600000000L
      val e = events(s, dir)
        .filter(col("event_type").isin("click", "error"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_type"), col("value"))
      val frame = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-TenMin, 0)
      e.withColumn("n_clicks",
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(frame))
        .withColumn("click_value",
          sum(when(col("event_type") === "click", dec2(col("value")))
            .otherwise(dec2(lit(0)))).over(frame).cast("double"))
        .filter(col("event_type") === "error")
        .select("user_id", "event_id", "us", "n_clicks", "click_value")
        .orderBy("user_id", "event_id")
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
          event_type, value
        FROM events WHERE event_type IN ('click', 'error')),
      c AS (SELECT user_id, event_id, us, event_type,
          CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
            AS BIGINT) AS n_clicks,
          CAST(sum(CASE WHEN event_type = 'click'
            THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)
            OVER w AS DOUBLE) AS click_value
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
          RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW))
      SELECT user_id, event_id, us, n_clicks, click_value
      FROM c WHERE event_type = 'error' ORDER BY user_id, event_id"""))

  /** q25 — time-series RESAMPLE + forward fill: every user's event
    * stream regularized onto an hourly grid (per-bucket event count,
    * last-observed value carried into empty buckets) — the gap-fill
    * op every feature/metrics pipeline needs before joining
    * irregular streams. One aggregation builds the observed buckets,
    * the grid comes from an in-row `sequence()` explode (no
    * generator join), and the fill is a single `last(ignoreNulls)`
    * running window per user — grid size is bounded by the TIME SPAN,
    * not the event count, so the window is safe at any SF. `max_by`
    * picks the bucket's last value deterministically ((user, ts) is
    * unique in the generator, pinned by the oracle hash itself). */
  private val q25 = GQ(
    "q25_resample_ffill",
    (s, dir) => {
      val HourUs = 3600000000L
      // FLOOR division, not `div`: Spark's `div` truncates toward zero
      // while the DuckDB oracle's `//` floors — for a pre-1970
      // timestamp (negative epoch micros) the two would disagree by
      // one bucket. pmod keeps the computation integer-exact for any
      // sign (no double rounding near bucket boundaries).
      val b = events(s, dir)
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
        .withColumn("bucket",
          expr(s"(us - pmod(us, $HourUs)) div $HourUs"))
      val obs = b.groupBy("user_id", "bucket")
        .agg(count(lit(1)).as("n"), max_by(col("value"), col("us")).as("v"))
      val grid = b.groupBy("user_id")
        .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
        .select(col("user_id"),
          explode(expr("sequence(b0, b1)")).as("bucket"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "bucket"), "left")
        .select(col("user_id"), (col("bucket") * HourUs).as("bucket_us"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          last(col("v"), ignoreNulls = true).over(w).as("value"))
        .orderBy("user_id", "bucket_us")
    },
    Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
      b AS (SELECT user_id, us // 3600000000 AS bucket, us, value FROM ev),
      obs AS (SELECT user_id, bucket, count(*) AS n, max_by(value, us) AS v
        FROM b GROUP BY 1, 2),
      rng AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        FROM b GROUP BY 1),
      grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM rng),
      j AS (SELECT g.user_id, g.bucket, coalesce(o.n, 0) AS n_events, o.v
        FROM grid g LEFT JOIN obs o USING (user_id, bucket))
      SELECT user_id, bucket * 3600000000 AS bucket_us, n_events,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
          ROWS UNBOUNDED PRECEDING) AS value
      FROM j ORDER BY user_id, bucket"""))

  def qs: Seq[GQ] =
    Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13, q14, q15,
      q16, q17, q18, q19, q20, q21, q22, q24, q25)
}
