package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Graph analytics over the document corpus — beyond-reference operators:
  * link-authority scoring (PageRank) and degree statistics, the curation
  * signals a crawl pipeline derives from its link graph (authority-
  * weighted quality scores, hub detection, crawl-frontier priorities).
  *
  * The corpus parquet carries no link column, so the graph is the pinned
  * deterministic multigraph every doc_id `i` induces: out-edges to
  * (i·2+3) % N (2-to-1 collapsing for even N — hub formation),
  * (i·i+1) % N (quadratic-residue clustering — heavy skew), and
  * (i·13+5) % N (a permutation — connectivity floor). Duplicates and
  * self-loops are KEPT: out-degree is exactly 3 for every node, so
  * there are no dangling nodes and no special cases, and both engines
  * build the identical graph from the same table. In-degrees spread
  * from ~1 to ~23 at N=500, so the stationary ranks are genuinely
  * non-uniform.
  *
  * PageRank runs in INTEGER units (1 rank = 10^12 units): per-edge
  * contribution is `u div 3`, the damped update is
  * `B + (Σ·85) div 100` with B = (0.15·10^12) div N — no floating point
  * until the final display division, so partial-aggregation order cannot
  * move a single bit and the DuckDB oracle replays all 8 unrolled
  * iterations exactly. Scale shape: one shuffle per iteration keyed on
  * dst (the Pregel layout); rank state is 16 bytes/node.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  private val Iters = 8
  private val Unit = 1000000000000L // 1.0 rank in integer units

  private def nodes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"))

  private def edges(docs: DataFrame, n: Long): DataFrame =
    docs.select(col("doc_id").as("src"),
      explode(array(
        pmod(col("doc_id") * 2 + 3, lit(n)),
        pmod(col("doc_id") * col("doc_id") + 1, lit(n)),
        pmod(col("doc_id") * 13 + 5, lit(n)))).as("dst"))

  private def grPagerank(s: SparkSession, dir: String): DataFrame = {
    val docs = nodes(s, dir).localCheckpoint()
    val n = docs.count()
    val e = edges(docs, n).localCheckpoint()
    val base = (Unit * 15L / 100L) / n // (1-d) mass per node, exact ints
    var r = docs.select(col("doc_id").as("v"), lit(Unit / n).as("u"))
    for (i <- 0 until Iters) {
      val contrib = e.join(r, e("src") === r("v"))
        .select(col("dst").as("v"), expr("u div 3").as("cu"))
        .groupBy(col("v")).agg(sum(col("cu")).as("sc"))
      // left join keeps in-degree-0 nodes alive at their base mass.
      // Lineage truncation is policy-driven (util.IterCheckpoint):
      // localCheckpoint per iteration here on local[...]; on a real
      // cluster set spark.graft.graph.reliableCheckpoint=true so an
      // executor loss mid-iteration cannot destroy the lineage-free
      // blocks and kill the job
      r = graft.util.IterCheckpoint.truncate(
        docs.select(col("doc_id").as("v"))
          .join(contrib, Seq("v"), "left")
          .select(col("v"),
            (lit(base) + expr("(coalesce(sc, 0L) * 85) div 100")).as("u")),
        i)
    }
    r.select(col("v").as("doc_id"), (col("u") / 1e12).as("pagerank"))
      .orderBy(col("doc_id"))
  }

  private val grPagerankSql = {
    val pre =
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |docs AS (SELECT doc_id FROM documents),
        |e AS (
        |  SELECT doc_id AS src, (doc_id*2 + 3) % n AS dst FROM docs, nn
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 1) % n FROM docs, nn
        |  UNION ALL
        |  SELECT doc_id, (doc_id*13 + 5) % n FROM docs, nn),
        |r0 AS (
        |  SELECT doc_id AS v, 1000000000000 // n AS u FROM docs, nn)"""
        .stripMargin
    val rounds = (1 to Iters).map { k =>
      s"""r$k AS (
         |  SELECT d.doc_id AS v,
         |    ((1000000000000 * 15 // 100) // nn.n)
         |      + ((coalesce(sum(p.u // 3), 0) * 85) // 100) AS u
         |  FROM docs d CROSS JOIN nn
         |  LEFT JOIN e ON e.dst = d.doc_id
         |  LEFT JOIN r${k - 1} p ON p.v = e.src
         |  GROUP BY d.doc_id, nn.n)""".stripMargin
    }.mkString(",\n")
    s"""$pre,
       |$rounds
       |SELECT v AS doc_id, u / 1000000000000.0 AS pagerank
       |FROM r$Iters ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // In-degree distribution — the link-graph health report (a spiky
  // in-degree histogram flags link farms / crawler traps before they
  // skew any authority-weighted sampling). Exact, partial-aggregated.
  private def grDegreeStats(s: SparkSession, dir: String): DataFrame = {
    val docs = nodes(s, dir)
    val n = docs.count()
    val indeg = docs.select(col("doc_id").as("v"))
      .join(edges(docs, n).groupBy(col("dst").as("v"))
        .agg(count(lit(1)).as("indeg")), Seq("v"), "left")
      .select(coalesce(col("indeg"), lit(0L)).as("indeg"))
    indeg.groupBy(col("indeg")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("indeg"))
  }

  private val grDegreeStatsSql =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |docs AS (SELECT doc_id FROM documents),
      |e AS (
      |  SELECT doc_id AS src, (doc_id*2 + 3) % n AS dst FROM docs, nn
      |  UNION ALL
      |  SELECT doc_id, (doc_id*doc_id + 1) % n FROM docs, nn
      |  UNION ALL
      |  SELECT doc_id, (doc_id*13 + 5) % n FROM docs, nn),
      |deg AS (
      |  SELECT d.doc_id, CAST(count(e.src) AS BIGINT) AS indeg
      |  FROM docs d LEFT JOIN e ON e.dst = d.doc_id GROUP BY d.doc_id)
      |SELECT indeg, count(*) AS n_nodes FROM deg
      |GROUP BY indeg ORDER BY indeg""".stripMargin

  // ---------------------------------------------------------------------
  // Connected components as a first-class GRAPH query (the dedup keep-
  // manifests use operators.Components internally; this row exposes the
  // operator itself, fully oracled). The multigraph above is one giant
  // component (the permutation edge guarantees connectivity), so this
  // query uses the pinned BLOCK-LOCAL sparse graph instead: every doc_id
  // i in a complete 16-node block gets one edge to
  // blockStart + ((i·5+3) mod 16) — the functional graph inside each
  // block splits into several genuine components, trailing nodes past
  // the last complete block are edge-free singletons, and component
  // diameter is ≤ 16, so the DuckDB oracle's transitive closure is
  // bounded while the Spark side runs the real large-star/small-star
  // machinery (O(log n) rounds at any diameter; the ≤1M-edge driver
  // union-find guard applies at oracle scale, both paths spec-covered in
  // ScaleOpsSpec).
  private def grComponents(s: SparkSession, dir: String): DataFrame = {
    val docs = nodes(s, dir).localCheckpoint()
    val n = docs.count()
    val nfull = n - (n % 16)
    val pairs = docs.filter(col("doc_id") < nfull)
      .select(col("doc_id").as("id_a"),
        ((col("doc_id") - pmod(col("doc_id"), lit(16))) +
          pmod(col("doc_id") * 5 + 3, lit(16))).as("id_b"))
    val comp = graft.operators.Components.resolve(pairs)
    docs.join(comp, docs("doc_id") === comp("id"), "left")
      .select(coalesce(col("comp"), col("doc_id")).as("component_id"))
      .groupBy(col("component_id"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("component_id"))
  }

  private val grComponentsSql =
    """WITH RECURSIVE nn AS (
      |  SELECT count(*) - (count(*) % 16) AS nfull FROM documents),
      |docs AS (SELECT doc_id FROM documents),
      |e0 AS (
      |  SELECT doc_id AS u,
      |    (doc_id - doc_id % 16) + ((doc_id*5 + 3) % 16) AS v
      |  FROM docs, nn WHERE doc_id < nfull),
      |edges AS (
      |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      |reach AS (
      |  SELECT u AS src, v AS dst FROM edges
      |  UNION
      |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
      |canon AS (
      |  SELECT d.doc_id,
      |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS component_id
      |  FROM docs d LEFT JOIN reach r ON r.src = d.doc_id
      |  GROUP BY d.doc_id)
      |SELECT component_id, count(*) AS n_nodes
      |FROM canon GROUP BY component_id ORDER BY component_id""".stripMargin

  // ---------------------------------------------------------------------
  // Triangle counting + global clustering coefficient — the cohesion
  // metric of the link graph (high clustering = template farms / tight
  // communities; near-random = healthy crawl frontier). Runs the
  // DEGREE-ORDERED orientation algorithm (the standard scale trick:
  // orient every undirected edge from its (degree, id)-smaller endpoint,
  // so each triangle is counted exactly once AND the wedge join fans out
  // from LOW-degree vertices — the hub that would make a naive wedge
  // join quadratic only ever appears as a join target). Two equi-joins,
  // no windows; everything integer-exact, fully DuckDB-oracled on the
  // pinned multigraph.
  private def grTriangles(s: SparkSession, dir: String): DataFrame = {
    val docs = nodes(s, dir).localCheckpoint()
    val n = docs.count()
    // distinct undirected edges, self-loops dropped
    val und = edges(docs, n)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    val deg = und.select(col("u").as("x"))
      .unionAll(und.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    // orient each edge from its (degree, id)-smaller endpoint
    val withDeg = und
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("u"))
        .otherwise(col("v")).as("a"),
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("v"))
        .otherwise(col("u")).as("b")).localCheckpoint()
    val wedges = oriented.select(col("a"), col("b"))
      .join(oriented.select(col("a").as("a2"), col("b").as("c")),
        col("b") === col("a2"))
      .select(col("a"), col("b"), col("c"))
    val tri = wedges.join(oriented.select(col("a").as("ta"),
        col("b").as("tc")),
      col("a") === col("ta") && col("c") === col("tc"), "left_semi")
    val nTri = tri.count()
    val nEdges = und.count()
    val nWedges = deg.select(expr("sum(d * (d - 1) div 2)").as("w"))
      .first().getLong(0)
    import s.implicits._
    Seq((n, nEdges, nWedges, nTri,
      BigDecimal(3.0 * nTri / nWedges)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles", "clustering")
  }

  private val grTrianglesSql =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |docs AS (SELECT doc_id FROM documents),
      |e0 AS (
      |  SELECT doc_id AS src, (doc_id*2 + 3) % n AS dst FROM docs, nn
      |  UNION ALL
      |  SELECT doc_id, (doc_id*doc_id + 1) % n FROM docs, nn
      |  UNION ALL
      |  SELECT doc_id, (doc_id*13 + 5) % n FROM docs, nn),
      |und AS (
      |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |  FROM e0 WHERE src <> dst),
      |deg AS (
      |  SELECT x, count(*) AS d FROM (
      |    SELECT u AS x FROM und UNION ALL SELECT v FROM und)
      |  GROUP BY x),
      |o AS (
      |  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
      |           THEN u ELSE v END AS a,
      |         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
      |           THEN v ELSE u END AS b
      |  FROM und JOIN deg du ON du.x = und.u JOIN deg dv ON dv.x = und.v),
      |tri AS (
      |  SELECT count(*) AS t
      |  FROM o o1 JOIN o o2 ON o1.b = o2.a
      |  WHERE EXISTS (SELECT 1 FROM o o3
      |                WHERE o3.a = o1.a AND o3.b = o2.b)),
      |agg AS (
      |  SELECT (SELECT n FROM nn) AS n_nodes,
      |    (SELECT count(*) FROM und) AS n_edges,
      |    (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg)
      |      AS n_wedges,
      |    (SELECT t FROM tri) AS n_triangles)
      |SELECT n_nodes, n_edges, n_wedges, CAST(n_triangles AS BIGINT)
      |    AS n_triangles,
      |  round(3.0 * n_triangles / n_wedges, 6) AS clustering
      |FROM agg""".stripMargin

  val queries: Map[String, Q] = Map(
    "gr_pagerank" -> grPagerank _,
    "gr_degree_stats" -> grDegreeStats _,
    "gr_components" -> grComponents _,
    "gr_triangles" -> grTriangles _
  )

  val oracle: Map[String, String] = Map(
    "gr_pagerank" -> grPagerankSql,
    "gr_degree_stats" -> grDegreeStatsSql,
    "gr_components" -> grComponentsSql,
    "gr_triangles" -> grTrianglesSql
  )
}
