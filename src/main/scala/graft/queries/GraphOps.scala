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

  /** Weighted directed transition edges (src, dst, w) from consecutive
    * events of each user (shared by graph1/graph2). */
  private def transitionEdges(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("user_id"), col("ts"), col("event_id"),
      regexp_extract(col("props"), "\\d+", 0).cast("int").as("k"))
      .filter(col("k").isNotNull) // digitless props: drop in BOTH engines
    val wn = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("nk", lead(col("k"), 1).over(wn))
      .filter(col("nk").isNotNull)
      .groupBy(col("k").as("src"), col("nk").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** DuckDB mirror of [[transitionEdges]] — the `edges` CTE chain. */
  private val transitionEdgesSql =
    """e AS (
        SELECT user_id, ts, event_id, k FROM (
          SELECT user_id, ts, event_id,
            TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) AS k
          FROM events) WHERE k IS NOT NULL),
      seq AS (SELECT user_id, k,
          lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nk
        FROM e),
      edges AS (SELECT k AS src, nk AS dst, count(*) AS w
        FROM seq WHERE nk IS NOT NULL GROUP BY 1, 2)"""

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
      val edges = transitionEdges(s, dir).persist()
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
      s"""WITH $transitionEdgesSql,
        nodes AS (SELECT src AS id FROM edges
          UNION SELECT dst FROM edges),
        meta AS (SELECT count(*) AS n FROM nodes),
        outdeg AS (SELECT src, sum(w) AS outw FROM edges GROUP BY 1),
        p0 AS (SELECT id,
            CAST(1.0 AS DOUBLE) / (SELECT n FROM meta) AS pr FROM nodes),
        ${(1 to Iters).map(iter).mkString(",\n")}
        SELECT id, pr FROM p$Iters ORDER BY id"""
    })

  /** graph2 — exact TRIANGLE COUNTING over the undirected transition
    * graph, per node plus a total row under the sentinel id -1 (sorts
    * first; real page ids are non-negative). Edges are
    * DEGREE-ORIENTED first (each undirected edge points from its
    * (degree, id)-smaller endpoint to the larger), the standard
    * worst-case-optimal trick: every triangle is then found exactly
    * once by the two-hop equi-join `o(u,v) ⋈ o(v,w) ⋈ o(u,w)`, and a
    * high-degree hub never fans out more than O(√|E|) — the multi-way
    * self-join stays a pair of hash joins co-partitioned on node ids,
    * with nothing broadcast that scales with the graph. Exact integer
    * counts — oracle equality is trivial. */
  private val triangleQ = GQ(
    "graph2_triangles",
    (s, dir) => {
      val und = transitionEdges(s, dir)
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
        .persist()
      // deg feeds both orientation joins AND the final node list;
      // tri feeds the per-node explode AND the total row — persist
      // both (the harness clears caches between queries)
      val deg = und.select(col("a").as("id"))
        .unionByName(und.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .persist()
      val oriented = und
        .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
        .select(
          when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("u"), col("b").as("v")))
            .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .persist()
      val tri = oriented.as("e1")
        .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
        .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
        .join(oriented.as("e3"),
          col("x") === col("e3.u") && col("z") === col("e3.v"), "leftsemi")
        .persist()
      val perNode = tri
        .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_triangles"))
      val nodes = deg.select("id")
      nodes.join(perNode, Seq("id"), "left")
        .select(col("id").cast("long").as("id"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
        .unionByName(tri.agg(count(lit(1)).as("n_triangles"))
          .select(lit(-1L).as("id"), col("n_triangles")))
        .orderBy("id")
    },
    Some(s"""WITH $transitionEdgesSql,
      und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
      deg AS (
        SELECT id, count(*) AS deg FROM (
          SELECT a AS id FROM und UNION ALL SELECT b FROM und)
        GROUP BY id),
      o AS (
        SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
            THEN u.a ELSE u.b END AS u,
          CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
            THEN u.b ELSE u.a END AS v
        FROM und u
        JOIN deg da ON da.id = u.a
        JOIN deg db ON db.id = u.b),
      tri AS (
        SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM o e1
        JOIN o e2 ON e2.u = e1.v
        WHERE EXISTS (SELECT 1 FROM o e3 WHERE e3.u = e1.u AND e3.v = e2.v)),
      pn AS (
        SELECT id, count(*) AS n_triangles FROM (
          SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        GROUP BY id)
      SELECT CAST(d.id AS BIGINT) AS id,
        coalesce(pn.n_triangles, 0) AS n_triangles
      FROM deg d LEFT JOIN pn ON pn.id = d.id
      UNION ALL
      SELECT -1 AS id, count(*) AS n_triangles FROM tri
      ORDER BY id"""))

  def qs: Seq[GQ] = Seq(pagerankQ, triangleQ)
}
