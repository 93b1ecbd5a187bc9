package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.GraphOps

/** Graph tier (queries.GraphOps): integer-unit PageRank invariants and
  * degree-histogram consistency on the pinned multigraph.
  */
class GraphOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  test("pagerank: mass conserved up to integer-division leakage, skewed") {
    val rows = GraphOps.queries("gr_pagerank")(spark, sfSmoke).collect()
    val n = rows.length
    assert(n > 0)
    val total = rows.map(_.getAs[Double]("pagerank")).sum
    // every div floors, so each of the 8 iterations leaks < (3N + 2)
    // units of 1e-12 — total stays just under 1, never over
    assert(total <= 1.0 + 1e-9, s"rank mass exceeds 1: $total")
    assert(total >= 0.99, s"rank mass leaked too far: $total")
    // the pinned graph is genuinely skewed: ranks must not be uniform
    val distinct = rows.map(_.getAs[Double]("pagerank")).distinct.length
    assert(distinct > n / 2, s"ranks look uniform: $distinct distinct of $n")
  }

  test("pagerank follows in-degree: heaviest hub outranks leaf nodes") {
    val pr = GraphOps.queries("gr_pagerank")(spark, sfSmoke).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("pagerank")).toMap
    val n = pr.size.toLong
    // recompute in-degrees of the pinned multigraph driver-side
    val indeg = new scala.collection.mutable.HashMap[Long, Int]()
    for (i <- 0L until n; d <- Seq((i * 2 + 3) % n, (i * i + 1) % n,
        (i * 13 + 5) % n))
      indeg(d) = indeg.getOrElse(d, 0) + 1
    val hub = indeg.maxBy(_._2)._1
    val leaves = (0L until n).filter(v => indeg.getOrElse(v, 0) <= 1)
    assert(leaves.nonEmpty)
    assert(leaves.forall(l => pr(hub) > pr(l)),
      s"hub $hub (indeg ${indeg(hub)}) should outrank every leaf")
  }

  test("degree histogram sums to the node count") {
    val rows = GraphOps.queries("gr_degree_stats")(spark, sfSmoke).collect()
    val total = rows.map(_.getAs[Long]("n_nodes")).sum
    val n = Tables.t(spark, sfSmoke, "documents").count()
    assert(total == n)
    // edge conservation: sum(indeg * nodes) == 3N (every node emits 3)
    val edgeSum = rows.map(r =>
      r.getAs[Long]("indeg") * r.getAs[Long]("n_nodes")).sum
    assert(edgeSum == 3 * n)
  }

  test("components partition the nodes; labels equal driver union-find") {
    val n = Tables.t(spark, sfSmoke, "documents").count()
    val rows = GraphOps.queries("gr_components")(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == n,
      "component sizes must sum to the node count")
    // ground truth: union-find over the same block-local edge rule
    val nfull = n - (n % 16)
    val parent = Array.tabulate(n.toInt)(identity)
    def find(x: Int): Int = { var r = x
      while (parent(r) != r) r = parent(r); r }
    for (i <- 0 until nfull.toInt) {
      val j = (i - i % 16) + ((i * 5 + 3) % 16)
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val expect = (0 until n.toInt).groupBy(find).map { case (_, m) =>
      (m.min.toLong, m.size.toLong) }.toSet
    val got = rows.map(r => (r.getAs[Long]("component_id"),
      r.getAs[Long]("n_nodes"))).toSet
    assert(got == expect, "component labels/sizes differ from union-find")
    // the sparse rule genuinely splits: more than one component
    assert(rows.length > 1)
  }

  test("triangles equal the brute-force count on the pinned multigraph") {
    val n = Tables.t(spark, sfSmoke, "documents").count()
    val r = GraphOps.queries("gr_triangles")(spark, sfSmoke).collect().head
    // driver-side ground truth over the same undirected simple graph
    val und = scala.collection.mutable.Set[(Long, Long)]()
    for (i <- 0L until n; d <- Seq((i * 2 + 3) % n, (i * i + 1) % n,
        (i * 13 + 5) % n) if i != d)
      und += ((math.min(i, d), math.max(i, d)))
    val adj = und.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    var brute = 0L
    for ((u, vs) <- adj; v <- vs; w <- vs if v < w
         if und.contains((math.min(v, w), math.max(v, w))))
      brute += 1
    assert(r.getAs[Long]("n_edges") == und.size.toLong)
    assert(r.getAs[Long]("n_triangles") == brute,
      s"degree-ordered count ${r.getAs[Long]("n_triangles")} != $brute")
    assert(brute > 0, "fixture graph must contain triangles")
    val cc = r.getAs[Double]("clustering")
    assert(cc > 0.0 && cc <= 1.0)
  }
}
