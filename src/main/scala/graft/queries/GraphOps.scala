package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Distributed graph analytics (builder-prompt scale extension):
  * iterative computation expressed as per-iteration co-partitioned
  * join + aggregation — the shape that scales to web-graph-sized
  * inputs, with O(1) driver state (the node count) and no collected
  * adjacency.
  *
  * Determinism discipline (same as qual4/sim*): every per-edge term
  * is one fixed double expression ROUNDED to a fixed scale and summed
  * in DECIMAL (associative, order-independent), and each iteration's
  * rank is re-rounded at 9 dp — so Spark and the unrolled DuckDB
  * replay produce bit-identical doubles at every step.
  */
object GraphOps {

  private val Damping = 0.85
  private val Iters = 4

  /** graph1 — PageRank over the session-transition graph: consecutive
    * events of a user form a directed edge between their `props.k`
    * page ids (the classic clickstream Markov chain), and [[Iters]]
    * damped power iterations rank the pages. Each iteration is ONE
    * shuffle join of the edge list with the current ranks keyed by
    * source plus ONE aggregation keyed by destination — at web scale
    * both sides partition on the node id and nothing is broadcast or
    * collected (dangling mass is dropped, the standard simplification,
    * mirrored exactly by the oracle). */
  private val pagerankQ = GQ(
    "graph1_pagerank",
    (s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("ts"), col("event_id"),
        regexp_extract(col("props"), "\\d+", 0).cast("int").as("k"))
        .filter(col("k").isNotNull) // digitless props: drop in BOTH engines
      val wn = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val edges = ev
        .withColumn("nk", lead(col("k"), 1).over(wn))
        .filter(col("nk").isNotNull)
        .groupBy(col("k").as("src"), col("nk").as("dst"))
        .agg(count(lit(1)).as("w"))
        .persist()
      val nodes = edges.select(col("src").as("id"))
        .unionByName(edges.select(col("dst").as("id")))
        .distinct().persist()
      val n = nodes.count() // the ONLY driver-side value
      // literal 0.15, NOT (1.0 - Damping): 1.0 - double(0.85) is not
      // the double nearest "0.15", and the oracle writes the literal
      val base = 0.15 / n
      val outdeg = edges.groupBy("src").agg(sum(col("w")).as("outw")).persist()
      var pr = nodes.withColumn("pr", lit(1.0 / n))
      for (_ <- 1 to Iters) {
        val contribs = edges
          .join(outdeg, "src")
          .join(pr.withColumnRenamed("id", "src"), "src")
          .select(col("dst"),
            round(col("pr") * col("w") / col("outw"), 12)
              .cast("decimal(30,12)").as("c"))
        val inbound = contribs.groupBy("dst").agg(sum(col("c")).as("sm"))
        // no per-iteration materialization: each rank relation feeds
        // exactly ONE consumer (the next iteration's contribution
        // join), so the whole [[Iters]]-deep chain runs as a single
        // lazy job over the cached edges/nodes/outdeg — four extra
        // joins in one DAG instead of four separate job launches
        pr = nodes
          .join(inbound.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"),
            round(lit(base) + lit(Damping) *
              coalesce(col("sm").cast("double"), lit(0.0)), 9).as("pr"))
      }
      val out = pr.select(col("id"), col("pr")).orderBy("id")
      // edges/nodes stay cached for the (lazy) final action; the
      // harness clears caches between queries
      out
    },
    Some {
      def iter(i: Int): String = {
        val p = if (i == 1) "p0" else s"p${i - 1}"
        s"""c$i AS (SELECT e.dst,
            CAST(round(p.pr * e.w / o.outw, 12) AS DECIMAL(30,12)) AS c
          FROM edges e
          JOIN outdeg o ON o.src = e.src
          JOIN $p p ON p.id = e.src),
        s$i AS (SELECT dst, sum(c) AS sm FROM c$i GROUP BY dst),
        p$i AS (SELECT nodes.id,
            round(CAST(0.15 AS DOUBLE) / (SELECT n FROM meta)
              + CAST(0.85 AS DOUBLE)
                * coalesce(CAST(sm AS DOUBLE), CAST(0 AS DOUBLE)), 9) AS pr
          FROM nodes LEFT JOIN s$i ON s$i.dst = nodes.id)"""
      }
      s"""WITH e AS (
          SELECT user_id, ts, event_id, k FROM (
            SELECT user_id, ts, event_id,
              TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) AS k
            FROM events) WHERE k IS NOT NULL),
        seq AS (SELECT user_id, k,
            lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nk
          FROM e),
        edges AS (SELECT k AS src, nk AS dst, count(*) AS w
          FROM seq WHERE nk IS NOT NULL GROUP BY 1, 2),
        nodes AS (SELECT src AS id FROM edges
          UNION SELECT dst FROM edges),
        meta AS (SELECT count(*) AS n FROM nodes),
        outdeg AS (SELECT src, sum(w) AS outw FROM edges GROUP BY 1),
        p0 AS (SELECT id,
            CAST(1.0 AS DOUBLE) / (SELECT n FROM meta) AS pr FROM nodes),
        ${(1 to Iters).map(iter).mkString(",\n")}
        SELECT id, pr FROM p$Iters ORDER BY id"""
    })

  def qs: Seq[GQ] = Seq(pagerankQ)
}
